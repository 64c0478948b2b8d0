#!/usr/bin/env python3
"""Round-4 performance recording: run bench.py across the configurations the
round-4 verdict asks for and append one JSON line per run to PERF_R4.jsonl.

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
OUT = os.path.join(ROOT, "PERF_R4.jsonl")

CONFIGS = [
    # (label, env overrides)
    # north-star 64-channel default: vv carrier, fused acq, group=16,
    # sustained single-stream + 8-channel bank with parity gates
    ("default_64", {}),
    # r3 headline comparison point
    ("ch16", {"BENCH_CHANNELS": "16", "BENCH_SUSTAINED": "0", "BENCH_BANK": "0"}),
    # loop-exact costas at north-star width (target >= 320 Msps/chip)
    (
        "ch64_costas_g16",
        {"BENCH_CARRIER": "costas", "BENCH_SUSTAINED": "0", "BENCH_BANK": "0"},
    ),
    ("ch16_costas", {
        "BENCH_CHANNELS": "16", "BENCH_CARRIER": "costas",
        "BENCH_SUSTAINED": "0", "BENCH_BANK": "0",
    }),
    # A/B: the round-4 depthwise matched-filter kernel vs the XLA grouped conv
    ("ch64_matched_off", {
        "PM_PALLAS_MATCHED": "0", "BENCH_SUSTAINED": "0", "BENCH_BANK": "0",
    }),
    # A/B: fused Pallas correlator vs the reference-style XLA FFT backend
    ("ch16_fft", {
        "BENCH_CHANNELS": "16", "BENCH_ACQ": "fft",
        "BENCH_SUSTAINED": "0", "BENCH_BANK": "0",
    }),
    # bank-sustained scaling: 16 and 64 host-fed channels
    ("bank16", {"BENCH_BANK_CHANNELS": "16", "BENCH_SUSTAINED": "0"}),
    ("bank64", {"BENCH_BANK_CHANNELS": "64", "BENCH_SUSTAINED": "0"}),
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
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                capture_output=True,
                text=True,
                env=env,
                timeout=1800,
            )
        except subprocess.TimeoutExpired:
            # a wedged tunnel must not kill the whole matrix: record the
            # timeout and move on (the next config gets a fresh process)
            with open(OUT, "a") as f:
                f.write(json.dumps({
                    "label": label, "git": rev, "rc": -9,
                    "wall_s": round(time.time() - t0, 1),
                    "error": "timeout 1800s",
                }) + "\n")
            continue
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
