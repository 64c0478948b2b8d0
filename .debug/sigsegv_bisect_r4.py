"""Bisect which kernel/config makes the bank_step compile SIGSEGV the
remote TPU compiler (round 4). One process; env toggles consulted per
probe_verdict call so in-process swapping works. Compile-only (no iters).

usage: sigsegv_bisect_r4.py [label ...]   (default: all)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup
_pm_setup()

import numpy as np
import jax

CONFIGS = [
    ("default_vv", {}),
    ("acq_fft", {"ACQ": "fft"}),
    ("costas_off", {"PM_PALLAS_COSTAS": "0"}),
    ("matched_off", {"PM_PALLAS_MATCHED": "0"}),
    ("fetch_off", {"PM_PALLAS_FETCH": "0"}),
    ("carrier_costas", {"CARRIER": "costas"}),
    ("ldpc_off", {"PM_PALLAS_LDPC": "0"}),
]

only = sys.argv[1:] or None


def try_compile(label, env):
    from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig

    saved = {}
    for k, v in env.items():
        if k in ("ACQ", "CARRIER"):
            continue
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        rx = Receiver(RxConfig(
            max_payload_len=1536, max_detections=96, freq_bins=4,
            payload_carrier=env.get("CARRIER", "vv"),
            acquisition_backend=env.get("ACQ", "fused"),
        ))
        block = 1 << 19
        x = np.zeros((16, rx.front_pad + block + rx.pad_tail()), np.complex64)
        from gr4_packet_modem_tpu.utils.cplx import to_device
        xj = to_device(x)

        def rx_step(samples_2d):
            _, _, res, _ = rx.bank_step(samples_2d, 16)
            return res.accepted.sum(), res.crc_ok.sum()

        t0 = time.time()
        out = jax.block_until_ready(jax.jit(rx_step)(xj))
        print(f"{label}: OK compile+run {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


for label, env in CONFIGS:
    if only and label not in only:
        continue
    try_compile(label, env)
