"""Extraction cost breakdown on TPU: slices vs derot vs conv, hdr vs payload."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig

channels, block, iters = 8, 1 << 18, 10
rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4))
fp, pt = rx.front_pad, rx.pad_tail()
T = fp + block + pt
rng = np.random.default_rng(0)
from gr4_packet_modem_tpu.utils.cplx import to_device
x = (rng.standard_normal((channels, T)) + 1j*rng.standard_normal((channels, T))).astype(np.complex64)*0.3
xj = to_device(x)
D = 32
sps, kk = 4, rx.arm_len
nb_ = np.sort(rng.integers(fp, fp+block-110000, (channels, D))).astype(np.int32)
nbj = jax.device_put(nb_)
arm = jax.device_put(rng.integers(0, 32, (channels, D)).astype(np.int32))
freq = jax.device_put((rng.uniform(-0.05, 0.05, (channels, D))).astype(np.float32))
amp = jax.device_put(np.ones((channels, D), np.float32))

def variant(num_syms, mode):
    region = sps*(num_syms-1) + kk
    def per_channel(xc, nb, ar, fq, am):
        start = jnp.clip(nb - (kk-1), 0, xc.shape[0]-region)
        rr = jax.vmap(lambda s: jax.lax.dynamic_slice(xc.real, (s,), (region,)))(start)
        ri = jax.vmap(lambda s: jax.lax.dynamic_slice(xc.imag, (s,), (region,)))(start)
        if mode == "slices":
            return rr.sum() + ri.sum()
        j = jnp.arange(region, dtype=jnp.int32)[None, :]
        ph = -fq[:, None] * (start[:, None] + j).astype(jnp.float32)
        cph, sph = jnp.cos(ph), jnp.sin(ph)
        dr = rr*cph - ri*sph
        di = rr*sph + ri*cph
        if mode == "derot":
            return dr.sum() + di.sum()
        out = rx._extract_symbols(xc, nb, ar, fq, nb*0, am, 0, num_syms)
        return jnp.abs(out).sum()
    return jax.jit(lambda x2, nb2, a2, f2, m2: jax.vmap(per_channel)(x2, nb2, a2, f2, m2))

for num_syms, tag in [(192, "hdr"), (6160, "pay")]:
    for mode in ["slices", "derot", "full"]:
        fn = variant(num_syms, mode)
        t0 = time.time(); out = jax.block_until_ready(fn(xj, nbj, arm, freq, amp)); comp = time.time()-t0
        t0 = time.time()
        for _ in range(iters): out = fn(xj, nbj, arm, freq, amp)
        out = jax.block_until_ready(out)
        print(json.dumps({"case": f"{tag}_{mode}", "ms": round((time.time()-t0)/iters*1e3, 3),
                          "compile_s": round(comp, 1)}), flush=True)
