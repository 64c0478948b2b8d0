#!/usr/bin/env python3
"""Produce the multi-chip scaling evidence record (SCALING_r0N.json).

Gathers, in one run:

1. **per-chip rate** of the sharded receiver bank on the real device(s)
   (BASELINE config #5; with one chip this is the N=1 point),
2. **halo-overhead projection**: the time-shard halo (front_pad + pad_tail)
   is the only per-shard cost that does not scale, so measured efficiency at
   N time shards of block B is rate(B) / rate(B + halo) of the same
   single-device program — measured on hardware, not assumed,
3. **DCN bring-up proof**: the 2-process jax.distributed receiver-bank run
   (tests/multihost_worker.py), recording its PASS marker,
4. optionally (PM_VIRTUAL=1) the 8-virtual-device CPU-mesh functional sweep
   (shared-core host: total stays flat; recorded as functional evidence
   only).

usage: record_scaling.py [out.json]
"""

import json
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()


def measure_bank(block_log2=18, ch_per_dev=8, iters=10):
    from benchmarks.common import tiled_burst_signal
    from gr4_packet_modem_tpu.models.receiver import RxConfig
    from gr4_packet_modem_tpu.parallel import multihost

    sig, _ = tiled_burst_signal(
        total=1 << block_log2, max_payload_len=256, payload_len=200
    )
    return multihost.measure_scaling(
        sig,
        device_counts=(1, None),
        channels_per_device=ch_per_dev,
        iters=iters,
        rx_config=RxConfig(max_payload_len=256, max_detections=32),
    )


def measure_halo_overhead(block_log2=18, channels=8, iters=10, rounds=7):
    """Single-device rate with vs without the halo extension: the measured
    per-time-shard overhead a (ch x time) mesh pays.

    Both programs are compiled and warmed up front, then timed in
    ALTERNATING rounds so run-to-run device drift hits both equally; the
    overhead is reported from the per-round medians WITH its spread.
    (Round 4 recorded a single-pass ordering artifact — a >1 'efficiency',
    i.e. the bigger program measuring faster — which this replaces.)"""

    from benchmarks.common import tiled_burst_signal
    from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
    from gr4_packet_modem_tpu.utils.cplx import to_device

    rx = Receiver(RxConfig(max_payload_len=256, max_detections=32))
    halo = rx.front_pad + rx.pad_tail()
    block = 1 << block_log2
    sig, _ = tiled_burst_signal(
        total=block + halo, max_payload_len=256, payload_len=200
    )
    sig = np.asarray(sig)

    def build(n):
        x = np.tile(sig[:n][None], (channels, 1))
        xj = to_device(x)

        def step(s2d):
            det = jax.vmap(lambda xc: rx.acquirer.acquire(xc))(s2d)
            return rx.decode_bank(s2d, det)[2].accepted.sum()

        fn = jax.jit(step)
        jax.block_until_ready(fn(xj))  # compile + warm
        return fn, xj

    progs = [build(block), build(block + halo)]

    def time_once(fn, xj):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(xj)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    samples = [[], []]
    for _ in range(rounds):
        for i, (fn, xj) in enumerate(progs):
            samples[i].append(time_once(fn, xj))
    med = [float(np.median(s)) for s in samples]
    spread = [
        float(np.max(s) - np.min(s)) / m for s, m in zip(samples, med)
    ]
    overhead = med[1] / med[0] - 1.0
    return {
        "block": block,
        "halo_samples": halo,
        "rounds": rounds,
        "step_s_block_median": round(med[0], 6),
        "step_s_block_plus_halo_median": round(med[1], 6),
        "run_spread_frac": [round(s, 4) for s in spread],
        "halo_overhead_frac": round(overhead, 4),
        "note": "alternating-round medians on one device; a time-sharded "
        "mesh pays this overhead per shard (halo fraction shrinks "
        "~1/block). Overhead below the run spread is reported as measured "
        "but is statistically indistinguishable from zero.",
    }


def run_dcn_proof():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    worker = os.path.join(
        os.path.dirname(__file__), "..", "tests", "multihost_worker.py"
    )
    env_base = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PM_", "XLA_FLAGS", "JAX_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker],
            env=dict(
                env_base,
                PM_COORDINATOR=f"127.0.0.1:{port}",
                PM_NUM_PROCESSES="2",
                PM_PROCESS_ID=str(pid),
            ),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs) and any(
        "MULTIHOST_RESULT PASS" in o for o in outs
    )
    return {
        "processes": 2,
        "pass": bool(ok),
        "detail": "2-process jax.distributed receiver bank, packet "
        "straddling the cross-process time-shard boundary decoded via "
        "ppermute halo (tests/multihost_worker.py)",
    }


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r03.json"
    record = {
        "device": str(jax.devices()[0]),
        "num_devices": len(jax.devices()),
    }
    record["bank"] = [
        {k: (round(v, 4) if isinstance(v, float) else v) for k, v in r.items()}
        for r in measure_bank()
    ]
    record["halo_overhead"] = measure_halo_overhead()
    record["dcn_two_process"] = run_dcn_proof()
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
