#!/usr/bin/env python3
"""Ingress validation and packet-type filtering.

Mirrors the reference's ``examples/packet_ingress.cpp`` and the
PacketIngress / PacketTypeFilter pair (packet_ingress.hpp:104,
packet_type_filter.hpp): packets enter the TX chain through a validation
gate — oversized payloads are rejected up front (the reference drops >
65535 B; here the configured ``max_payload_len`` bounds the batch) — and
IDLE filler packets (stream mode keeps the radio keyed) are decoded by the
receiver but filtered from the user-data egress by their header type
field, exactly like the reference's PacketTypeFilter before the TUN sink.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()

import numpy as np

from gr4_packet_modem_tpu.models.receiver import RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.runtime.streaming import (
    StreamingReceiver,
    StreamingTransmitter,
)
from gr4_packet_modem_tpu.utils.constants import PacketType

MAX_LEN = 256

# --- ingress gate: validate payload sizes before they reach the modulator
candidates = {
    "user-40": np.arange(40, dtype=np.uint8),
    "user-200": (np.arange(200, dtype=np.uint8) * 3).astype(np.uint8),
    "oversized-300": np.zeros(300, np.uint8),  # > MAX_LEN: must be rejected
    "idle-64": np.zeros(64, np.uint8),  # stream filler, tagged IDLE
}
accepted, types, dropped = [], [], []
for name, payload in candidates.items():
    if payload.size > MAX_LEN:
        dropped.append(name)  # packet_ingress.hpp:104 (drop + warn)
        continue
    accepted.append(payload)
    types.append(
        int(PacketType.IDLE) if name.startswith("idle") else
        int(PacketType.USER_DATA)
    )
print(f"ingress: accepted {len(accepted)}, dropped oversized {dropped}")

# --- TX -> RX loopback
tx = StreamingTransmitter(Transmitter(TxConfig(max_payload_len=MAX_LEN)))
signal = tx.send_burst(accepted, types=types)
rx = StreamingReceiver(
    RxConfig(max_payload_len=MAX_LEN, max_detections=8), block=4096
)
decoded = rx.process(signal) + rx.flush()

# --- egress: the PacketTypeFilter equivalent runs INSIDE the receiver's
# jitted decode (Receiver accepts only header-valid + CRC-ok + USER_DATA,
# receiver.py "accepted"), so the idle filler never reaches the host —
# 3 packets entered the channel, 2 user packets egress
for p in decoded:
    print(f"user packet len={p.data.size} ok={p.data.size in (40, 200)}")
print(
    f"egress: {len(decoded)} user packets "
    f"({len(accepted) - len(decoded)} idle filtered in-device)"
)
assert len(decoded) == 2
assert all(p.packet_type == int(PacketType.USER_DATA) for p in decoded)
print("ok")
