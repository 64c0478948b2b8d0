import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from gr4_packet_modem_tpu.ops.acquire import SyncwordAcquirer, AcquisitionConfig
from gr4_packet_modem_tpu.utils.cplx import to_device
T = 1 << 17
from benchmarks.common import tiled_burst_signal
t0=time.time()
sig, _ = tiled_burst_signal(total=T)
print(f"TX signal built on TPU: {time.time()-t0:.1f}s", flush=True)
x = to_device(sig)
for backend in ["fft", "conv"]:
    acq = SyncwordAcquirer(AcquisitionConfig(freq_bins=4, backend=backend, max_detections=32))
    g = jax.jit(acq.acquire)
    t0=time.time()
    try:
        det = jax.block_until_ready(g(x)); print(f"{backend} acquire compile {time.time()-t0:.1f}s, valid={int(np.asarray(det.valid).sum())}", flush=True)
    except Exception as e:
        print(f"{backend} acquire FAIL {str(e)[:150]}", flush=True); continue
    t0=time.time()
    for _ in range(10): r=g(x)
    jax.block_until_ready(r.index); dt=(time.time()-t0)/10
    print(f"  run {dt*1e3:.1f}ms -> {T/dt/1e6:.1f} Msps", flush=True)
