import sys; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp, time
from gr4_packet_modem_tpu.ops.acquire import SyncwordAcquirer, AcquisitionConfig, _sliding_max, _sliding_mean_at
T = 32768
x = jnp.zeros(T, jnp.complex64)
acq = SyncwordAcquirer(AcquisitionConfig(freq_bins=4, backend="fft", max_detections=16))

def timed(name, f, *a):
    t0=time.time()
    try:
        r = jax.block_until_ready(jax.jit(f)(*a))
        print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
        t0=time.time(); jax.block_until_ready(jax.jit(f)(*a)); print(f"  run {1e3*(time.time()-t0):.1f}ms", flush=True)
        return r
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:150]}", flush=True)
        return None

timed("correlate_fft", acq._correlate_fft, x)
w = 768
bp = jnp.abs(jnp.sin(jnp.arange(T-290)*0.1))
timed("sliding_max_c", lambda b: _sliding_max(b, w, w), bp)
timed("sliding_max_p", lambda b: _sliding_max(b, w, -1), bp)
def cand(b):
    wmax=_sliding_max(b,w,w); prev=_sliding_max(b,w,-1)
    pos=jnp.arange(b.shape[0])
    pk=(b>=wmax)&(b>prev)&(pos>=w)&(pos<b.shape[0]-w)
    cp=jnp.where(pk,b,-1.0)
    tp,ti=jax.lax.top_k(cp,16)
    def below(i,th):
        win=jax.lax.dynamic_slice(b,(i-w,),(2*w+1,))
        return jnp.sum((win<th).astype(jnp.int32))
    bl = jax.vmap(below)(jnp.maximum(ti,w), tp/9.5)
    return tp, ti, bl
timed("candidates", cand, bp)
timed("mean_at", lambda xx: _sliding_mean_at(xx, jnp.arange(16)*100+800, w), x)
timed("acquire_fft", acq.acquire, x)
acq2 = SyncwordAcquirer(AcquisitionConfig(freq_bins=4, backend="conv", max_detections=16))
timed("acquire_conv", acq2.acquire, x)
