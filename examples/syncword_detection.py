#!/usr/bin/env python3
"""Acquisition demo: detect a burst under CFO + noise and print the
estimated amplitude/phase/frequency/timing/Es-N0 against the truth.

Mirrors the reference example syncword_detection.cpp
(syncword_detection.hpp FFT correlation + CFAR + quadratic interpolation).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()  # PM_PLATFORM backend override + persistent compile cache

import jax
import numpy as np

from gr4_packet_modem_tpu.models.channel import awgn, rotate
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.utils.cplx import to_device
from gr4_packet_modem_tpu.utils.ragged import PacketBatch

CFO = 0.004  # rad/sample

tx = Transmitter(TxConfig(max_payload_len=64))
rng = np.random.default_rng(1)
batch = PacketBatch.from_list(
    [rng.integers(0, 256, 48, dtype=np.uint8)], max_len=64
)
bursts, lens = tx.modulate_bursts(batch)
burst = np.asarray(bursts)[0, : int(np.asarray(lens)[0])]

rx = Receiver(RxConfig(max_payload_len=64, max_detections=4))
gap = 3000
x = np.zeros(rx.front_pad + gap + burst.size + rx.pad_tail(), np.complex64)
x[rx.front_pad + gap : rx.front_pad + gap + burst.size] = burst
x = awgn(jax.random.PRNGKey(0), rotate(to_device(x), CFO), 0.05)

det = rx.acquirer.acquire(x)
i = int(np.argmax(np.asarray(det.valid)))
assert bool(np.asarray(det.valid)[i]), "no detection"
print(f"truth:    start={gap}  freq={CFO:+.5f} rad/sample")
print(
    f"detected: start={int(np.asarray(det.index)[i]) - rx.front_pad}"
    f"  freq={float(np.asarray(det.freq)[i]):+.5f}"
    f"  amp={float(np.asarray(det.amplitude)[i]):.3f}"
    f"  time_est={float(np.asarray(det.time_est)[i]):+.3f}"
    f"  esn0={float(np.asarray(det.esn0_db)[i]):.1f} dB"
)
