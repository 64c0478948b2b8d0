"""Test: do data-DEPENDENT slice starts cause the extraction cost?"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.utils.cplx import to_device

channels, block, iters = 8, 1 << 18, 10
rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4))
fp, pt = rx.front_pad, rx.pad_tail()
T = fp + block + pt
rng = np.random.default_rng(0)
x = (rng.standard_normal((channels, T)) + 1j*rng.standard_normal((channels, T))).astype(np.complex64)*0.3
xj = to_device(x)
D = 32
nb_ = np.sort(rng.integers(fp, fp+block-110000, (channels, D))).astype(np.int32)
nbj = jax.device_put(nb_)
region = 4*(6160-1)+45

def mk(dep):
    def per_channel(xc, nb):
        if dep:
            # make starts depend on the data (like det.index does)
            nb = nb + (xc.real[:D] > 1e30).astype(jnp.int32)
        start = jnp.clip(nb - 44, 0, xc.shape[0]-region)
        rr = jax.vmap(lambda s: jax.lax.dynamic_slice(xc.real, (s,), (region,)))(start)
        ri = jax.vmap(lambda s: jax.lax.dynamic_slice(xc.imag, (s,), (region,)))(start)
        return rr.sum() + ri.sum()
    return jax.jit(lambda x2, nb2: jax.vmap(per_channel)(x2, nb2))

for dep in [False, True]:
    fn = mk(dep)
    t0 = time.time(); out = jax.block_until_ready(fn(xj, nbj)); comp = time.time()-t0
    t0 = time.time()
    for _ in range(iters): out = fn(xj, nbj)
    out = jax.block_until_ready(out)
    print(json.dumps({"dep": dep, "ms": round((time.time()-t0)/iters*1e3,3), "compile_s": round(comp,1),
                      "val": float(np.asarray(out).sum())}), flush=True)
