#!/usr/bin/env python3
"""IP-over-modem walkthrough: TUN -> modem TX -> channel -> modem RX -> TUN.

Mirrors the reference's TUN plumbing test (examples/tun.cpp: TunSource in
the TX namespace wired straight to TunSink in the RX namespace) extended
through the full modem, i.e. a miniature apps/packet_transceiver.py. With
root and the `scripts/netns-setup` topology in place:

    sudo scripts/netns-setup
    sudo python examples/tun_loopback.py --netns
    # in another terminal:
    sudo ip netns exec pmtx ping -c 3 10.9.0.2

Ping requests from the `pmtx` namespace travel through the modem (TUN read
-> burst modulation -> AWGN channel -> acquisition/decode -> TUN write into
`pmrx`); replies return over the namespaces' veth path — exactly the
reference's docs/netns.md topology (see this repo's docs/netns.md).

Without root (default), the example runs the same data path in *loopback
demo mode*: synthetic IP packets stand in for the TUN reads and the decoded
packets are checked byte-exactly instead of written to a device.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()

import jax  # noqa: E402

from gr4_packet_modem_tpu.models.channel import awgn  # noqa: E402
from gr4_packet_modem_tpu.models.receiver import RxConfig  # noqa: E402
from gr4_packet_modem_tpu.models.transmitter import (  # noqa: E402
    Transmitter,
    TxConfig,
)
from gr4_packet_modem_tpu.runtime.streaming import (  # noqa: E402
    StreamingReceiver,
    StreamingTransmitter,
)


def fake_ip_packet(seq: int, size: int = 84) -> bytes:
    """A syntactically plausible IPv4 packet (what a TUN read yields)."""
    hdr = bytearray(20)
    hdr[0] = 0x45  # v4, IHL 5
    hdr[2:4] = size.to_bytes(2, "big")
    hdr[8] = 64  # TTL
    hdr[9] = 1  # ICMP
    hdr[12:16] = bytes([10, 9, 0, 1])
    hdr[16:20] = bytes([10, 9, 0, 2])
    body = bytes((seq + i) % 256 for i in range(size - 20))
    return bytes(hdr) + body


def modem_pipeline(max_len: int = 256, block: int = 1 << 14):
    tx = StreamingTransmitter(Transmitter(TxConfig(max_payload_len=max_len)))
    rx = StreamingReceiver(
        RxConfig(max_payload_len=max_len, max_detections=8, freq_bins=1),
        block=block,
    )
    return tx, rx


def run_demo(noise: float, count: int) -> int:
    tx, srx = modem_pipeline()
    sent = [fake_ip_packet(i) for i in range(count)]
    burst = tx.send_burst([np.frombuffer(p, np.uint8) for p in sent])
    x = np.asarray(
        awgn(jax.random.PRNGKey(3), burst, noise)
    )
    pkts = srx.process(x)
    pkts += srx.flush()
    ok = 0
    for p, exp in zip(sorted(pkts, key=lambda p: p.index), sent):
        match = bytes(p.data.tobytes()) == exp
        ok += match
        print(
            f"packet at {p.index}: {len(p.data)} B Es/N0={p.esn0_db:5.1f} dB"
            f" byte-exact={match}"
        )
    print(f"demo loopback: {ok}/{count} IP packets through the modem")
    return 0 if ok == count else 1


def run_netns(noise: float) -> int:
    from gr4_packet_modem_tpu.io.tun import TunDevice

    tx, srx = modem_pipeline()
    print("opening tun0 in pmtx (TX ingress) and pmrx (RX egress)...")
    with TunDevice("tun0", "pmtx") as tun_in, TunDevice("tun0", "pmrx") as tun_out:
        print("forwarding; ctrl-C to stop (try: "
              "sudo ip netns exec pmtx ping 10.9.0.2)")
        try:
            while True:
                pkt = tun_in.read_packet(timeout_ms=100)
                if pkt is None:
                    continue
                burst = tx.send_burst([np.frombuffer(pkt, np.uint8)])
                x = np.asarray(awgn(jax.random.PRNGKey(0), burst, noise))
                for out in srx.process(x) + srx.flush():
                    tun_out.write_packet(out.data.tobytes())
                    print(f"forwarded {len(out.data)} B "
                          f"(Es/N0 {out.esn0_db:.1f} dB)")
        except KeyboardInterrupt:
            pass
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--netns", action="store_true",
        help="use the real pmtx/pmrx TUN topology (root + netns-setup)",
    )
    ap.add_argument("--noise", type=float, default=0.05)
    ap.add_argument("--count", type=int, default=4)
    args = ap.parse_args()
    t0 = time.time()
    rc = run_netns(args.noise) if args.netns else run_demo(args.noise, args.count)
    print(f"done in {time.time() - t0:.1f} s")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
