#!/usr/bin/env python3
"""TX pipeline benchmark (mirrors benchmark_packet_transmitter_pdu.cpp:
continuous 1500-byte packets, 4 samples/symbol; metric = output samples/s).

Reference baseline: 156-167 Msps burst / 65-72 Msps stream on a Ryzen 7 5800X
(results.md:28-31).

usage: benchmark_packet_transmitter_pdu.py [stream|burst] [batch]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from benchmarks.common import report, time_fn
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.utils import constants as C
from gr4_packet_modem_tpu.utils.ragged import PacketBatch


def main():
    stream_mode = (sys.argv[1] if len(sys.argv) > 1 else "burst") == "stream"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    payload_len = 1500

    tx = Transmitter(TxConfig(max_payload_len=1536, stream_mode=stream_mode))
    rng = np.random.default_rng(0)
    payloads = [
        rng.integers(0, 256, payload_len, dtype=np.uint8)
        for _ in range(batch_size)
    ]
    batch = PacketBatch.from_list(payloads, max_len=1536)

    if stream_mode:
        out_syms = batch_size * C.stream_symbols(payload_len)

        def step(b):
            _, samples, total = tx.modulate_stream(b, out_syms)
            return samples

        samples_per_call = out_syms * 4
        baseline = 68e6  # results.md:30 midpoint
    else:
        step = jax.jit(lambda b: tx.modulate_bursts(b)[0])
        samples_per_call = batch_size * C.burst_symbols(payload_len) * 4
        baseline = 160e6  # results.md:28-31 midpoint

    dt, compile_s = time_fn(step, batch, iters=20)
    report(
        f"tx_{'stream' if stream_mode else 'burst'}_samples_per_sec",
        samples_per_call / dt,
        "samples/s",
        baseline,
        batch=batch_size,
        compile_s=round(compile_s, 1),
    )


if __name__ == "__main__":
    main()
