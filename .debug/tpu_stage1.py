import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4))
T = 1<<17
x = jnp.zeros(T + rx.front_pad + rx.pad_tail(), jnp.complex64)
g = jax.jit(rx.acquirer.acquire)
t0=time.time(); det = g(x); jax.block_until_ready(det.index)
print(f"acquire compile+run: {time.time()-t0:.1f}s", flush=True)
t0=time.time()
for _ in range(10): det = g(x)
jax.block_until_ready(det.index); dt=(time.time()-t0)/10
print(f"acquire run: {dt*1e3:.1f}ms -> {T/dt/1e6:.1f} Msps", flush=True)
