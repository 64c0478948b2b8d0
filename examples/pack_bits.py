#!/usr/bin/env python3
"""Bit packing/unpacking demo: bytes -> bits -> QPSK symbol indices -> bytes.

Mirrors the reference example pack_bits.cpp (pack_bits.hpp / unpack_bits.hpp):
the TX chain unpacks bytes to bits (MSB first) and re-packs bit pairs into
2-bit QPSK symbol indices; the RX chain reverses it. Both directions are
batched array ops here (one [N] -> [N*8] reshape-free bit expansion instead
of the reference's per-item Resampling state machine).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()

import jax.numpy as jnp  # noqa: E402

from gr4_packet_modem_tpu.ops.packing import pack_bits, unpack_bits  # noqa: E402

data = np.frombuffer(b"packet-modem", np.uint8)
print("bytes   :", data.tolist())

bits = np.asarray(unpack_bits(jnp.asarray(data), 8))  # [N*8] MSB-first
print("bits    :", "".join(map(str, bits[:16].tolist())), "...")

qpsk_idx = np.asarray(pack_bits(jnp.asarray(bits), 2))  # 2 bits -> 1 index
print("qpsk idx:", qpsk_idx[:8].tolist(), "...")

# round trip: indices -> bits -> bytes
bits_rt = unpack_bits(jnp.asarray(qpsk_idx), 2)
data_rt = np.asarray(pack_bits(bits_rt, 8)).astype(np.uint8)
assert data_rt.tobytes() == b"packet-modem"
print("round trip ok:", data_rt.tobytes())
