#!/usr/bin/env python3
"""Registry-style composition (mirrors the reference's
python/examples/qpsk_modulator.py, which builds unpack -> map by registry
name): bytes -> unpacked bits -> QPSK symbols."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()  # PM_PLATFORM backend override + persistent compile cache

import jax.numpy as jnp
import numpy as np

from gr4_packet_modem_tpu import registry
from gr4_packet_modem_tpu.utils.constants import QPSK_CONSTELLATION

unpack = registry.resolve("UnpackBits")
mapper = registry.resolve("Mapper")

data = jnp.asarray(np.frombuffer(b"\x11\x22\x33\x44", np.uint8))[None]
bits = unpack(data, 8)
symbol_idx = registry.resolve("PackBits")(bits, 2)
symbols = mapper(symbol_idx, jnp.asarray(QPSK_CONSTELLATION))
print(np.asarray(symbols)[0])
