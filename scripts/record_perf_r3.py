#!/usr/bin/env python3
"""Round-3 performance recording: run bench.py across the configurations the
round-3 verdict asks for and append one JSON line per run to PERF_R3.jsonl.

Configs:
- default headline (16ch x 2^19, vv, fused, int8 sustained with parity gate)
- loop-exact costas carrier (north-star: >= 320 Msps/chip)
- channel sweep 16/24/32/64 validating the lane-packed decode fix
  (target: 64-channel within 10% of the 16-channel optimum)

Each run is a subprocess (fresh process = honest compile/cache behavior;
the persistent JAX cache makes repeats cheap). Run on the real TPU.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "PERF_R3.jsonl")

CONFIGS = [
    # (label, env overrides)
    ("default_vv", {}),
    ("costas_loop_exact", {"BENCH_CARRIER": "costas", "BENCH_SUSTAINED": "0"}),
    ("ch16", {"BENCH_CHANNELS": "16", "BENCH_SUSTAINED": "0"}),
    ("ch24", {"BENCH_CHANNELS": "24", "BENCH_SUSTAINED": "0"}),
    ("ch32", {"BENCH_CHANNELS": "32", "BENCH_SUSTAINED": "0"}),
    ("ch64", {"BENCH_CHANNELS": "64", "BENCH_SUSTAINED": "0"}),
    (
        "ch64_costas",
        {
            "BENCH_CHANNELS": "64",
            "BENCH_CARRIER": "costas",
            "BENCH_SUSTAINED": "0",
        },
    ),
    # channel-group pipelining (Receiver.bank_step group=16): the ch>16
    # runs above were recorded with the monolithic program (BENCH_GROUP=0)
    # to document the working-set regression; these are the shipping path
    ("ch32_g16", {"BENCH_CHANNELS": "32", "BENCH_SUSTAINED": "0"}),
    ("ch64_g16", {"BENCH_CHANNELS": "64", "BENCH_SUSTAINED": "0"}),
    (
        "ch64_costas_g16",
        {
            "BENCH_CHANNELS": "64",
            "BENCH_CARRIER": "costas",
            "BENCH_SUSTAINED": "0",
        },
    ),
    ("ch128_g16", {"BENCH_CHANNELS": "128", "BENCH_SUSTAINED": "0"}),
]


def main():
    only = sys.argv[1:] or None
    for label, env_over in CONFIGS:
        if only and label not in only:
            continue
        env = dict(os.environ, **env_over)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True,
            text=True,
            env=env,
            timeout=1800,
        )
        wall = time.time() - t0
        line = None
        for ln in reversed(proc.stdout.strip().splitlines()):
            if ln.startswith("{"):
                line = ln
                break
        rec = {"label": label, "wall_s": round(wall, 1), "rc": proc.returncode}
        if line:
            rec.update(json.loads(line))
        else:
            rec["stderr_tail"] = proc.stderr[-500:]
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
