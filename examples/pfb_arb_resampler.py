#!/usr/bin/env python3
"""Polyphase arbitrary resampler demo: impose a sampling-frequency offset on
a tone and verify the frequency scales by the rate.

Mirrors the reference example pfb_arb_resampler.cpp
(pfb_arb_resampler.hpp 32-arm bank with derivative-filter interpolation).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()  # PM_PLATFORM backend override + persistent compile cache

import numpy as np

from gr4_packet_modem_tpu.models.channel import sfo

FREQ = 0.01  # cycles/sample
PPM = 2000.0

n = 1 << 14
t = np.arange(n)
x = np.exp(2j * np.pi * FREQ * t).astype(np.complex64)
y = np.asarray(sfo(x, ppm=PPM, num_out=n - 64))

# measure the output tone frequency by FFT peak with quadratic refinement
win = np.hanning(y.size)
spec = np.abs(np.fft.fft(y * win))
k = int(np.argmax(spec))
a, b, c = spec[k - 1], spec[k], spec[k + 1]
delta = 0.5 * (a - c) / (a - 2 * b + c)
f_meas = (k + delta) / y.size
expect = FREQ / (1.0 + PPM * 1e-6)
print(f"input tone {FREQ:.6f}, rate 1+{PPM}ppm -> expect {expect:.6f}, "
      f"measured {f_meas:.6f}")
assert abs(f_meas - expect) < 5e-6
assert abs(f_meas - FREQ) > 1e-5  # the SFO is actually visible
