#!/usr/bin/env python3
"""Render docs/PERF_R4.md's headline table from PERF_R4.jsonl.

Every number in the perf doc must cite a recorded artifact (round-2/3
discipline); this renders the table FROM the artifact so the two cannot
drift. Run after scripts/record_perf_r4.py / record_perf_oneproc.py.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    recs = {}
    with open(path) as f:
        for ln in f:
            r = json.loads(ln)
            if r.get("rc") == 0 and r.get("value"):
                recs[r["label"]] = r  # last successful run wins
    return recs


def msps(v):
    return f"{v / 1e6:.1f}"


def main():
    path = os.path.join(ROOT, "PERF_R4.jsonl")
    recs = load(path)
    missing = []

    def get(label, field="value"):
        if label not in recs:
            missing.append(label)
            return None
        return recs[label].get(field)

    rows = [
        ("RX chain, vv carrier, 64-channel north-star (group=16)",
         get("default_64"), "`default_64`"),
        ("RX chain, vv carrier (16ch x 2^19)", get("ch16"), "`ch16`"),
        ("RX chain, loop-exact costas, 64ch (north star >= 320)",
         get("ch64_costas_g16"), "`ch64_costas_g16`"),
        ("RX chain, loop-exact costas (16ch)", get("ch16_costas"),
         "`ch16_costas`"),
        ("64ch with the depthwise matched kernel DISABLED (XLA conv)",
         get("ch64_matched_off"), "`ch64_matched_off`"),
        ("16ch with the fft acquisition backend (reference scheme)",
         get("ch16_fft"), "`ch16_fft`"),
    ]
    print("| Metric | Msps/chip | Source (PERF_R4.jsonl label) |")
    print("|---|---|---|")
    for name, v, src in rows:
        print(f"| {name} | {'**' + msps(v) + '**' if v else 'MISSING'} | {src} |")
    print()
    for label in ("default_64", "bank16", "bank64"):
        r = recs.get(label)
        if not r:
            continue
        print(
            f"- `{label}`: sustained single-stream "
            f"{r.get('sustained_stream_sps', 0)/1e6:.2f} Msps "
            f"(parity_ok={r.get('sustained_parity_ok')}), bank "
            f"{r.get('bank_channels')}ch "
            f"{r.get('bank_sustained_sps', 0)/1e6:.2f} Msps aggregate "
            f"(parity_ok={r.get('bank_sustained_parity_ok')}, "
            f"h2d {r.get('bank_h2d_ms_per_block')} ms/blk)"
        )
    if missing:
        print("\nMISSING LABELS:", ", ".join(missing), file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
