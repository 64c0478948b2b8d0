#!/usr/bin/env python3
"""Host control-plane demo: message strobes, the message debug sinks, a
rate probe and the packet credit loop.

Mirrors the reference examples messages.cpp / done_msg_sink.cpp /
packet_strobe.cpp — the GR4 async-message machinery maps to this
framework's host-side control plane (runtime/messages.py, runtime/flow.py;
docs/DESIGN.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


from gr4_packet_modem_tpu.runtime.flow import PacketCredit, ProbeRate, Throttle
from gr4_packet_modem_tpu.runtime.messages import (
    ItemStrobe,
    MessageDebug,
    MessageStrobe,
    PacketStrobe,
)

# MessageStrobe -> MessageDebug.store (message_strobe.hpp -> message_debug.hpp)
debug = MessageDebug()
strobe = MessageStrobe(debug.store, {"lifecycle": "ping"}, interval=0.05).start()
time.sleep(0.22)
strobe.stop()
print(f"MessageDebug stored {len(debug.messages())} strobe messages")

# ItemStrobe pull mode: one item per interval (item_strobe.hpp)
items = ItemStrobe(item=42, interval=0.02)
t0 = time.time()
pulled = [items.next_item() for _ in range(5)]
print(f"ItemStrobe pulled {pulled} in {time.time() - t0:.2f}s")

# PacketStrobe -> throttled sink with a rate probe (packet_strobe.hpp,
# probe_rate.hpp, throttle.hpp)
probe = ProbeRate(alpha=0.15)
throttle = Throttle(rate=200_000.0)
strobe = PacketStrobe(packet_length=256, interval=0.01)
sent = 0
for _ in range(20):
    pkt = strobe.next_packet()
    throttle.wait(pkt.size)
    rep = probe.update(pkt.size)
    if rep:
        print(f"rate_now={rep.rate_now:,.0f} items/s rate_avg={rep.rate_avg:,.0f}")
    sent += pkt.size
print(f"sent {sent} items")

# latency credit loop: at most 2 packets in flight (tun_source.hpp:69-78)
credit = PacketCredit(max_packets=2)
in_flight = []
for i in range(4):
    assert credit.acquire(timeout=0.1) or credit.in_flight < 2
    in_flight.append(i)
    if len(in_flight) == 2:  # downstream consumes
        credit.release(2)
        in_flight.clear()
print("credit loop done, in_flight =", credit.in_flight)
