"""Acquisition sub-profile: fft vs conv correlate, full acquire, CFAR parts."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from gr4_packet_modem_tpu.ops.acquire import AcquisitionConfig, SyncwordAcquirer

CH = int(os.environ.get("BENCH_CHANNELS", "8"))
BLOCK = int(os.environ.get("BENCH_BLOCK", str(1 << 18)))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))
T = 3604 + BLOCK + 30000

rng = np.random.default_rng(0)
x = (rng.standard_normal((CH, T)) + 1j * rng.standard_normal((CH, T))).astype(np.complex64)
from gr4_packet_modem_tpu.utils.cplx import to_device
xj = to_device(x)

acq_fft = SyncwordAcquirer(AcquisitionConfig(freq_bins=4, max_detections=32, backend="fft"))
acq_conv = SyncwordAcquirer(AcquisitionConfig(freq_bins=4, max_detections=32, backend="conv"))


def timeit(name, fn):
    f = jax.jit(lambda a: jax.vmap(fn)(a))
    t0 = time.time()
    out = jax.block_until_ready(f(xj))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        out = f(xj)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    print(json.dumps({"part": name, "ms": round(dt * 1e3, 3),
                      "compile_s": round(comp, 1)}), flush=True)


parts = os.environ.get("PARTS", "corr_fft,corr_conv,acq_fft,acq_conv,powmax").split(",")
if "corr_fft" in parts:
    timeit("correlate_fft", lambda xc: acq_fft.correlate(xc))
if "corr_conv" in parts:
    timeit("correlate_conv", lambda xc: acq_conv.correlate(xc))
if "acq_fft" in parts:
    timeit("acquire_fft", lambda xc: acq_fft.acquire(xc))
if "acq_conv" in parts:
    timeit("acquire_conv", lambda xc: acq_conv.acquire(xc))
if "powmax" in parts:
    # correlation -> power -> sliding max/CFAR part in isolation
    def powmax(xc):
        corr = acq_fft.correlate(xc)
        power = jnp.abs(corr) ** 2
        return power.max(axis=0), power.argmax(axis=0)
    timeit("corr+power+binmax", powmax)
