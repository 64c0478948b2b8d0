#!/usr/bin/env python3
"""Full transceiver benchmark (mirrors benchmark_packet_transceiver.cpp:
TX -> channel impairments -> RX as one program; metric = channel samples/s).

Reference baseline: 10-11 Msps at 2 freq bins burst mode; stalls at >= 3 bins
multithreaded (results.md:53-66) — no such limitation here.

usage: benchmark_packet_transceiver.py [freq_bins] [batch]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import report, time_fn
from gr4_packet_modem_tpu.models.channel import awgn, rotate
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

BASELINES = {0: 26e6, 1: 14.5e6, 2: 10.5e6, 3: 10.5e6, 4: 10.5e6}


def main():
    bins = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    tx = Transmitter(TxConfig(max_payload_len=1536))
    rx = Receiver(
        RxConfig(max_payload_len=1536, max_detections=max(32, batch_size + 8),
                 freq_bins=bins)
    )
    rng = np.random.default_rng(0)
    payloads = [
        rng.integers(0, 256, 1500, dtype=np.uint8) for _ in range(batch_size)
    ]
    batch = PacketBatch.from_list(payloads, max_len=1536)
    total = batch_size * 24912  # burst samples per 1500B packet
    fp, pt = rx.front_pad, rx.pad_tail()

    def step(b, key):
        samples, lens = tx.modulate_bursts(b)
        stream, _ = ragged_concat(samples, lens, total)
        x = rotate(stream, 0.005)
        x = awgn(key, x, 0.05)
        x = jnp.concatenate(
            [jnp.zeros(fp, jnp.complex64), x, jnp.zeros(pt, jnp.complex64)]
        )
        det = rx.acquirer.acquire(x)
        hdr, _ = rx.decode_headers(x, det)
        keep = rx.filter_detections(det, hdr)
        res = rx.decode_payloads(x, det, hdr, keep)
        return res.accepted.sum()

    jstep = jax.jit(step)
    key = jax.random.PRNGKey(0)
    dt, compile_s = time_fn(jstep, batch, key, iters=10)
    acc = int(jstep(batch, key))
    report(
        f"transceiver_{bins}bins_samples_per_sec",
        total / dt,
        "samples/s",
        BASELINES.get(bins),
        decoded=acc,
        expected=batch_size,
        compile_s=round(compile_s, 1),
    )


if __name__ == "__main__":
    main()
