#!/usr/bin/env python3
"""One-process round-4 perf recording.

Same config matrix as record_perf_r4.py, but every bench.py run happens in
THIS process (env swapped between calls, stdout captured): on the dev axon
tunnel, per-config client processes pay a multi-minute device
teardown/bringup serialization (fresh clients right after a heavy client
hang for ~15 min), which the one-process form avoids entirely. Appends the
same JSON lines to PERF_R4.jsonl (config isolation is by env only —
compile caches persist in-process, which only makes repeats cheaper).
"""

import contextlib
import io
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(ROOT, "PERF_R4.jsonl")

from record_perf_r4 import CONFIGS, _git_rev  # noqa: E402


def main():
    only = sys.argv[1:] or None
    rev = _git_rev()
    import bench

    for label, env_over in CONFIGS:
        if only and label not in only:
            continue
        saved = {}
        for k, v in env_over.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        t0 = time.time()
        buf = io.StringIO()
        rc = 0
        err = ""
        try:
            with contextlib.redirect_stdout(buf):
                bench.main()
        except Exception as e:  # noqa: BLE001
            rc = 1
            err = f"{type(e).__name__}: {e}"[:300]
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        wall = time.time() - t0
        line = None
        for ln in reversed(buf.getvalue().strip().splitlines()):
            if ln.startswith("{"):
                line = ln
                break
        rec = {"label": label, "git": rev, "wall_s": round(wall, 1), "rc": rc}
        if line:
            rec.update(json.loads(line))
        if err:
            rec["error"] = err
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(label, "done", round(wall, 1), "s", flush=True)


if __name__ == "__main__":
    main()
