"""Shared benchmark harness utilities."""

from __future__ import annotations

import json
import time

import jax
import numpy as np


def time_fn(fn, *args, iters: int = 10, warmup: int = 1):
    """Time a jitted function; returns (seconds_per_call, compile_seconds)."""
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, compile_s


def report(metric: str, value: float, unit: str, baseline: float | None = None,
           **extra):
    rec = {"metric": metric, "value": float(f"{value:.4g}"), "unit": unit}
    if baseline:
        rec["vs_baseline"] = float(f"{value / baseline:.4g}")
    rec.update(extra)
    print(json.dumps(rec))
    return rec


def tiled_burst_signal(payload_len=1500, num_packets=12, total=1 << 18,
                       max_payload_len=1536, seed=0):
    """Continuous back-to-back burst stream tiled to ``total`` samples."""
    from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
    from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

    tx = Transmitter(TxConfig(max_payload_len=max_payload_len))
    rng = np.random.default_rng(seed)
    payloads = [
        rng.integers(0, 256, payload_len, dtype=np.uint8)
        for _ in range(num_packets)
    ]
    batch = PacketBatch.from_list(payloads, max_len=max_payload_len)
    from gr4_packet_modem_tpu.utils.cplx import to_host

    s, l = tx.modulate_bursts(batch)
    stream_len = int(np.sum(np.asarray(l)))
    concat = jax.jit(
        lambda ss, ll: ragged_concat(ss, ll, stream_len)[0]
    )
    stream = to_host(concat(s, l))
    reps = total // stream.size + 1
    sig = np.tile(stream, reps)[:total]
    # complete bursts inside the block
    bounds = np.cumsum(np.tile(np.asarray(l), reps))
    pkts_per_block = int(np.sum(bounds <= total))
    return sig, pkts_per_block
