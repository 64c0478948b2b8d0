#!/usr/bin/env python3
"""Streaming decode with the block-pipelined receiver driver.

Mirrors the intent of the reference's runtime-behavior examples
(examples/stop_flowgraph.cpp, examples/vector_{source,sink}.cpp): the
framework analogue of a running flowgraph is a `StreamingReceiver` fed
fixed-size blocks from any sample source — here a file-less in-memory
stream chopped into odd-sized chunks to show the overlap carry, the
depth-2 block pipeline, and `flush()` draining the tail."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()  # PM_PLATFORM backend override + persistent compile cache

import numpy as np

from gr4_packet_modem_tpu.models.receiver import RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.runtime.streaming import (
    StreamingReceiver,
    StreamingTransmitter,
)

tx = StreamingTransmitter(Transmitter(TxConfig(max_payload_len=256)))
payloads = [(np.arange(n) % 256).astype(np.uint8) for n in (40, 100, 256, 77)]
signal = tx.send_burst(payloads)

rx = StreamingReceiver(
    RxConfig(max_payload_len=256, max_detections=8), block=4096
)
decoded = []
for i in range(0, signal.size, 2500):  # odd chunks exercise the carry
    decoded += rx.process(signal[i : i + 2500])
decoded += rx.flush()

for pkt in decoded:
    print(
        f"packet len={pkt.data.size:4d} at sample {pkt.index:6d} "
        f"Es/N0={pkt.esn0_db:5.1f} dB  ok={pkt.data.size in [p.size for p in payloads]}"
    )
assert len(decoded) == len(payloads)
print(f"decoded {len(decoded)}/{len(payloads)} packets")
