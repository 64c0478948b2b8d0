#!/usr/bin/env python3
"""Round-5 performance recording: append one JSON line per run to
PERF_R5.jsonl (same subprocess-per-config methodology as record_perf_r4).

Covers the round-4 verdict's asks: the 64-channel headline at HEAD, the
compacted-wire serving path (single stream / bank 16 / bank 64 / sharded
bank), a compaction A/B (BENCH_BUDGET=0), TX burst+stream throughput at
HEAD (last recorded r2), and the end-to-end transceiver benchmark."""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "PERF_R5.jsonl")

BENCH = [
    # (label, env overrides) -> bench.py
    ("default_64", {}),
    ("ch16", {"BENCH_CHANNELS": "16", "BENCH_SUSTAINED": "0",
              "BENCH_BANK": "0", "BENCH_SHARDED": "0"}),
    ("ch64_costas_g16", {"BENCH_CARRIER": "costas", "BENCH_SUSTAINED": "0",
                         "BENCH_BANK": "0", "BENCH_SHARDED": "0"}),
    # serving: compacted wire at bank widths (+ sharded driver, 1x1 mesh)
    ("bank16", {"BENCH_BANK_CHANNELS": "16", "BENCH_SUSTAINED": "0",
                "BENCH_SHARDED": "0"}),
    ("bank64", {"BENCH_BANK_CHANNELS": "64", "BENCH_SUSTAINED": "0",
                "BENCH_SHARDED": "0"}),
    ("sharded64", {"BENCH_BANK_CHANNELS": "64", "BENCH_SUSTAINED": "0",
                   "BENCH_BANK": "0"}),
    # compaction A/B: same bank64 with the uncompacted wire
    ("bank64_nobudget", {"BENCH_BANK_CHANNELS": "64", "BENCH_SUSTAINED": "0",
                         "BENCH_SHARDED": "0", "BENCH_BUDGET": "0"}),
    # async-d2h A/B on the sharded driver (its copy_to_host_async showed up
    # in dispatch time on the first run)
    ("sharded64_noasync", {"BENCH_BANK_CHANNELS": "64",
                           "BENCH_SUSTAINED": "0", "BENCH_BANK": "0",
                           "PM_ASYNC_D2H": "0"}),
    # packed-int4 wire (2 samples/byte): halves h2d + ICI bytes, parity-gated
    ("bank64_int4", {"BENCH_BANK_CHANNELS": "64", "BENCH_SUSTAINED": "0",
                     "BENCH_SHARDED": "0", "BENCH_XFER": "int4"}),
]

SCRIPTS = [
    # (label, argv) -> benchmarks/*.py printing one report() JSON line
    ("tx_burst", ["benchmarks/benchmark_packet_transmitter_pdu.py", "burst"]),
    ("tx_stream", ["benchmarks/benchmark_packet_transmitter_pdu.py",
                   "stream"]),
    ("transceiver_4bins", ["benchmarks/benchmark_packet_transceiver.py",
                           "4"]),
]


def _git_rev() -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, cwd=ROOT,
            ).stdout.strip()
            or "unknown"
        )
    except OSError:
        return "unknown"


def run_one(label, argv, env_over, rev):
    env = dict(os.environ, **env_over)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable] + argv,
            capture_output=True, text=True, env=env, timeout=1800, cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        rec = {"label": label, "git": rev, "rc": -9,
               "wall_s": round(time.time() - t0, 1), "error": "timeout 1800s"}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        return
    wall = time.time() - t0
    line = None
    for ln in reversed(proc.stdout.strip().splitlines()):
        if ln.startswith("{"):
            line = ln
            break
    rec = {"label": label, "git": rev, "wall_s": round(wall, 1),
           "rc": proc.returncode}
    if line:
        rec.update(json.loads(line))
    else:
        rec["stderr_tail"] = proc.stderr[-500:]
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    only = sys.argv[1:] or None
    rev = _git_rev()
    for label, env_over in BENCH:
        if only and label not in only:
            continue
        run_one(label, ["bench.py"], env_over, rev)
    for label, argv in SCRIPTS:
        if only and label not in only:
            continue
        run_one(label, argv, {}, rev)


if __name__ == "__main__":
    main()
