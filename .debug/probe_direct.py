"""Run each Pallas capability probe directly, surfacing exceptions.

usage: probe_direct.py [matched fetch costas ldpc fused]
"""
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

names = sys.argv[1:] or ["matched", "fetch", "costas", "ldpc", "fused"]

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup
_pm_setup()
import jax  # noqa: E402
print("backend:", jax.default_backend(), flush=True)

for name in names:
    t0 = time.time()
    try:
        if name == "matched":
            from gr4_packet_modem_tpu.ops import matched_pallas as m
            ok = m._probe(4, 44)
        elif name == "fetch":
            from gr4_packet_modem_tpu.ops import fetch_pallas as m
            ok = m._probe()
        elif name == "costas":
            from gr4_packet_modem_tpu.ops import costas_pallas as m
            ok = m._probe()
        elif name == "ldpc":
            from gr4_packet_modem_tpu.ops import ldpc_pallas as m
            ok = m._probe()
        elif name == "fused":
            from gr4_packet_modem_tpu.ops import acquire_pallas as m
            ok = m._probe(2048, 297, 9)
        print(f"{name}: ok={ok} dt={time.time()-t0:.1f}s", flush=True)
    except Exception:
        print(f"{name}: EXCEPTION dt={time.time()-t0:.1f}s", flush=True)
        traceback.print_exc()
