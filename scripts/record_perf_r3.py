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
    # monolithic (ungrouped) programs, documenting the working-set regression
    (
        "ch32",
        {"BENCH_CHANNELS": "32", "BENCH_SUSTAINED": "0", "BENCH_GROUP": "0"},
    ),
    (
        "ch64",
        {"BENCH_CHANNELS": "64", "BENCH_SUSTAINED": "0", "BENCH_GROUP": "0"},
    ),
    (
        "ch64_costas",
        {
            "BENCH_CHANNELS": "64",
            "BENCH_CARRIER": "costas",
            "BENCH_SUSTAINED": "0",
            "BENCH_GROUP": "0",
        },
    ),
    # channel-group pipelining (Receiver.bank_step group=16): the shipping
    # path for banks wider than 16 channels
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
    # bf16-matmul fused correlator (acquisition is the dominant stage)
    ("default_vv_bf16", {"BENCH_ACQ": "fused_bf16"}),
    (
        "ch64_g16_bf16",
        {
            "BENCH_CHANNELS": "64",
            "BENCH_ACQ": "fused_bf16",
            "BENCH_SUSTAINED": "0",
        },
    ),
]


def _git_rev() -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True,
                text=True,
                cwd=ROOT,
            ).stdout.strip()
            or "unknown"
        )
    except OSError:
        return "unknown"


def main():
    only = sys.argv[1:] or None
    rev = _git_rev()
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
        rec = {
            "label": label,
            "git": rev,
            "wall_s": round(wall, 1),
            "rc": proc.returncode,
        }
        if line:
            rec.update(json.loads(line))
        else:
            rec["stderr_tail"] = proc.stderr[-500:]
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
