#!/usr/bin/env python3
"""Syncword detection benchmark (mirrors benchmark_syncword_detection.cpp:
the acquisition block alone on a continuous stream; metric = samples/s).

Reference baseline: 49-51 / 29 / 20-21 / 16 / 13 Msps at 0/1/2/3/4 freq bins
on a Ryzen 7 5800X (results.md:35-41).

usage: benchmark_syncword_detection.py [freq_bins] [backend] [block_log2]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from benchmarks.common import report, tiled_burst_signal, time_fn
from gr4_packet_modem_tpu.ops.acquire import AcquisitionConfig, SyncwordAcquirer

BASELINES = {0: 50e6, 1: 29e6, 2: 20.5e6, 3: 16e6, 4: 13e6}


def main():
    bins = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    backend = sys.argv[2] if len(sys.argv) > 2 else "fft"
    block = 1 << (int(sys.argv[3]) if len(sys.argv) > 3 else 18)

    acq = SyncwordAcquirer(
        AcquisitionConfig(freq_bins=bins, backend=backend, max_detections=32)
    )
    from gr4_packet_modem_tpu.utils.cplx import to_device

    sig, _ = tiled_burst_signal(total=block)
    x = to_device(sig)
    step = jax.jit(acq.acquire)
    dt, compile_s = time_fn(step, x, iters=20)
    report(
        f"syncword_detection_{bins}bins_samples_per_sec",
        block / dt,
        "samples/s",
        BASELINES.get(bins),
        backend=backend,
        block=block,
        compile_s=round(compile_s, 1),
    )


if __name__ == "__main__":
    main()
