"""Acquisition sub-stage profile on TPU — inline harness (the pattern
cross-checked in profile_acq5.py; .debug/profile_acq{,3,4}.py used a harness
that produced impossible sub-ms times, do not trust those numbers).

Every number here should be cross-checked against the profile_r2/profile_rx
stage differences before being recorded in docs/PERF_R2.md.
"""

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

from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.ops.acquire import AcquisitionConfig, SyncwordAcquirer, _sliding_max
from gr4_packet_modem_tpu.utils.cplx import to_device

channels = int(os.environ.get("BENCH_CHANNELS", "8"))
block = int(os.environ.get("BENCH_BLOCK", str(1 << 18)))
iters = int(os.environ.get("BENCH_ITERS", "10"))
only = os.environ.get("STAGES")

rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4))
acq = rx.acquirer
fp, pt = rx.front_pad, rx.pad_tail()
T = fp + block + pt
rng = np.random.default_rng(0)
x = (rng.standard_normal((channels, T)) + 1j * rng.standard_normal((channels, T))).astype(np.complex64) * 0.3
xj = to_device(x)

w = acq.config.time_threshold
n, s = acq.config.fft_size, acq.stride
nf = (T - n) // s + 1
tlen = nf * s
d = acq.config.max_detections
bp = np.abs(rng.standard_normal((channels, tlen)).astype(np.float32))
bpj = jax.device_put(bp)

acq8k = SyncwordAcquirer(AcquisitionConfig(freq_bins=4, max_detections=32, fft_size=8192))
acq_conv = SyncwordAcquirer(AcquisitionConfig(freq_bins=4, max_detections=32, backend="conv"))
acq_bf16 = SyncwordAcquirer(AcquisitionConfig(freq_bins=4, max_detections=32, backend="conv_bf16"))


def detect_tail(b):
    wmax = _sliding_max(b, w, w)
    prevmax = _sliding_max(b, w, -1)
    is_peak = (b >= wmax) & (b > prevmax)
    pos = jnp.arange(b.shape[0])
    is_peak &= (pos >= w) & (pos < b.shape[0] - w)
    cand = jnp.where(is_peak, b, -1.0)
    nch = b.shape[0] // w
    chunks = cand[: nch * w].reshape(nch, w)
    cmax = jnp.max(chunks, axis=1)
    cidx = jnp.argmax(chunks, axis=1).astype(jnp.int32) + jnp.arange(nch, dtype=jnp.int32) * w
    tp, ts = jax.lax.top_k(cmax, d)
    return tp.sum() + cidx[ts].sum()


cases = [
    ("acquire_full", lambda: jax.jit(lambda x2: jax.vmap(lambda xc: acq.acquire(xc).valid.sum())(x2)), xj),
    ("acquire_8k", lambda: jax.jit(lambda x2: jax.vmap(lambda xc: acq8k.acquire(xc).valid.sum())(x2)), xj),
    ("acquire_conv", lambda: jax.jit(lambda x2: jax.vmap(lambda xc: acq_conv.acquire(xc).valid.sum())(x2)), xj),
    ("acquire_bf16", lambda: jax.jit(lambda x2: jax.vmap(lambda xc: acq_bf16.acquire(xc).valid.sum())(x2)), xj),
    ("correlate_fft", lambda: jax.jit(lambda x2: jax.vmap(lambda xc: jnp.abs(acq.correlate(xc)).sum())(x2)), xj),
    ("correlate_conv", lambda: jax.jit(lambda x2: jax.vmap(lambda xc: jnp.abs(acq_conv.correlate(xc)).sum())(x2)), xj),
    ("correlate_bf16", lambda: jax.jit(lambda x2: jax.vmap(lambda xc: jnp.abs(acq_bf16.correlate(xc)).sum())(x2)), xj),
    ("detect_tail", lambda: jax.jit(lambda b2: jax.vmap(detect_tail)(b2)), bpj),
    ("sliding_maxes", lambda: jax.jit(lambda b2: jax.vmap(lambda b: (_sliding_max(b, w, w) + _sliding_max(b, w, -1)).sum())(b2)), bpj),
]

for name, mk, arg in cases:
    if only and name not in only.split(","):
        continue
    fn = mk()
    t0 = time.time()
    out = jax.block_until_ready(fn(arg))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(arg)
    out = jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(json.dumps({"stage": name, "ms": round(dt, 3), "compile_s": round(comp, 1),
                      "val": float(np.asarray(out).sum())}), flush=True)
