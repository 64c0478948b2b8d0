#!/usr/bin/env python3
"""Burst -> continuous-stream demo: a constant-rate DAC pull loop that
zero-fills between packets when starved but never inside a packet.

Mirrors the reference example packet_to_stream.cpp
(packet_to_stream.hpp:17-45 starvation semantics).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gr4_packet_modem_tpu.runtime.streaming import PacketToStream

counts = []
p2s = PacketToStream(on_packet=counts.append)

burst_a = np.full(300, 1 + 1j, np.complex64)
burst_b = np.full(500, 2 + 0j, np.complex64)
p2s.push(burst_a)

# DAC pulls fixed 256-sample chunks regardless of what's queued
chunks = [p2s.pull(256)]          # 256 of burst_a
chunks.append(p2s.pull(256))      # 44 of burst_a + zeros (starved between)
p2s.push(burst_b)
chunks.append(p2s.pull(256))      # burst_b begins
stream = np.concatenate(chunks)

nz = np.flatnonzero(stream != 0)
print(f"pulled {stream.size} samples, {p2s.zeros_inserted} zeros inserted, "
      f"{len(counts)} packets started")
# burst_a is finished from its own samples before any zeros appear
assert np.all(stream[:300] == burst_a)
assert np.all(stream[300:512] == 0)
assert np.all(stream[512:768] == burst_b[:256])
print("zero-fill only between packets: OK")
