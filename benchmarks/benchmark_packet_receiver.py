#!/usr/bin/env python3
"""Full RX chain benchmark (mirrors benchmark_packet_receiver.cpp but fed a
fully-loaded packet stream instead of an idle one; metric = samples/s).

Reference baseline: 6-8 Msps at 4 freq bins on a Ryzen 7 5800X
(results.md:43-51).

usage: benchmark_packet_receiver.py [freq_bins] [channels] [block_log2]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import report, tiled_burst_signal, time_fn
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig

BASELINES = {0: 30e6, 1: 17e6, 2: 11.5e6, 3: 9e6, 4: 7e6}


def main():
    bins = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    block = 1 << (int(sys.argv[3]) if len(sys.argv) > 3 else 18)

    rx = Receiver(
        RxConfig(max_payload_len=1536, max_detections=32, freq_bins=bins)
    )
    sig, pkts = tiled_burst_signal(total=block)
    fp, pt = rx.front_pad, rx.pad_tail()
    from gr4_packet_modem_tpu.utils.cplx import to_device

    x = np.zeros((channels, fp + block + pt), np.complex64)
    for c in range(channels):
        x[c, fp : fp + block] = sig
    xj = to_device(x)

    def rx_step(samples):
        # lane-packed bank decode (models/receiver.py::decode_bank)
        det = jax.vmap(lambda xc: rx.acquirer.acquire(xc))(samples)
        _, _, res, _ = rx.decode_bank(samples, det)
        return res.accepted.sum()

    step = jax.jit(rx_step)
    dt, compile_s = time_fn(step, xj, iters=10)
    acc = np.asarray(step(xj))
    report(
        f"rx_chain_{bins}bins_samples_per_sec",
        channels * block / dt,
        "samples/s",
        BASELINES.get(bins),
        channels=channels,
        block=block,
        decoded_frac=round(float(acc.sum()) / (pkts * channels), 3),
        compile_s=round(compile_s, 1),
    )


if __name__ == "__main__":
    main()
