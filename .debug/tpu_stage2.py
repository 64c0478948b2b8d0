import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from gr4_packet_modem_tpu.ops.acquire import SyncwordAcquirer, AcquisitionConfig, _sliding_max
acq = SyncwordAcquirer(AcquisitionConfig(freq_bins=4, backend="fft", max_detections=32))
T = (1<<17) + 3000
x = jnp.zeros(T, jnp.complex64)
def timed(name, f, *a):
    g = jax.jit(f)
    t0=time.time(); r = g(*a); jax.block_until_ready(jax.tree.leaves(r)[0])
    print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
    t0=time.time()
    for _ in range(5): r = g(*a)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    print(f"  run {(time.time()-t0)/5*1e3:.1f}ms", flush=True)
    return r

corr = timed("correlate_fft", acq._correlate_fft, x)
power = jnp.abs(corr)**2
bp = jnp.max(power, axis=0)
timed("best+argmax", lambda p: (jnp.max(p, axis=0), jnp.argmax(p, axis=0)), power)
timed("sliding_max", lambda b: _sliding_max(b, 768, 768), bp)
timed("topk", lambda b: jax.lax.top_k(b, 32), bp)
def cand_and_below(b):
    tp, ti = jax.lax.top_k(b, 32)
    def below(i, th):
        win = jax.lax.dynamic_slice(b, (i-768,), (1537,))
        return jnp.sum((win < th).astype(jnp.int32))
    return jax.vmap(below)(jnp.maximum(ti,768), tp/9.5)
timed("below_count", cand_and_below, bp)
timed("full_acquire", acq.acquire, x)
