"""Cumulative acquire sub-stage profile (run SOLO on the tunnel)."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from gr4_packet_modem_tpu.ops.acquire import (
    AcquisitionConfig, SyncwordAcquirer, _sliding_max, _sliding_mean_at)
from gr4_packet_modem_tpu.utils.cplx import to_device

CH, BLOCK, ITERS = 8, 1 << 18, 10
T = 3604 + BLOCK + 30000
rng = np.random.default_rng(0)
x = (rng.standard_normal((CH, T)) + 1j * rng.standard_normal((CH, T))).astype(np.complex64)
xj = to_device(x)
acq = SyncwordAcquirer(AcquisitionConfig(freq_bins=4, max_detections=32, backend="fft"))
cfg = acq.config
w = cfg.time_threshold

def upto(stage):
    def fn(xc):
        corr = acq.correlate(xc)
        power = jnp.abs(corr) ** 2
        best_pow = jnp.max(power, axis=0)
        best_bin = jnp.argmax(power, axis=0).astype(jnp.int32)
        if stage == "binmax":
            return best_pow, best_bin
        tlen = best_pow.shape[0]
        wmax = _sliding_max(best_pow, w, w)
        prevmax = _sliding_max(best_pow, w, -1)
        is_peak = (best_pow >= wmax) & (best_pow > prevmax)
        pos = jnp.arange(tlen)
        is_peak &= (pos >= w) & (pos < tlen - w)
        if stage == "peaks":
            return is_peak, best_pow
        d = cfg.max_detections
        cand_pow = jnp.where(is_peak, best_pow, -1.0)
        top_pow, top_idx = jax.lax.top_k(cand_pow, d)
        if stage == "topk":
            return top_pow, top_idx
        thr = top_pow / cfg.power_threshold
        def below_count(i, th):
            win = jax.lax.dynamic_slice(best_pow, (i - w,), (2 * w + 1,))
            return jnp.sum((win < th).astype(jnp.int32))
        below = jax.vmap(below_count)(jnp.maximum(top_idx, w), thr)
        if stage == "cfar":
            return below, top_pow
        h = jnp.asarray(acq._noise_filter)
        hp = jax.lax.complex(
            jnp.convolve(xc.real, h, mode="same"),
            jnp.convolve(xc.imag, h, mode="same"))
        npow = _sliding_mean_at(hp, top_idx, w)
        if stage == "noise":
            return npow, below
        return acq.acquire(xc)
    return fn

for stage in os.environ.get("PARTS", "binmax,peaks,topk,cfar,noise,full").split(","):
    f = jax.jit(lambda a, _s=stage: jax.vmap(upto(_s))(a))
    t0 = time.time(); out = jax.block_until_ready(f(xj)); comp = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS): out = f(xj)
    jax.block_until_ready(out)
    print(json.dumps({"part": stage, "ms": round((time.time()-t0)/ITERS*1e3, 3),
                      "compile_s": round(comp, 1)}), flush=True)
