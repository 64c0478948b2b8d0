"""Reconcile: acquire on bench signal vs noise, sum vs full pytree."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.utils.cplx import to_device, to_host
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

CH, BLOCK, ITERS = 8, 1 << 18, 10
tx = Transmitter(TxConfig(max_payload_len=1536))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 1500, dtype=np.uint8) for _ in range(12)]
batch = PacketBatch.from_list(payloads, max_len=1536)
s, l = tx.modulate_bursts(batch)
stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
stream = to_host(stream)
signal = np.tile(stream, BLOCK // stream.size + 1)[:BLOCK]
rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4))
fp, pt = rx.front_pad, rx.pad_tail()
x = np.zeros((CH, fp + BLOCK + pt), np.complex64)
for c in range(CH):
    x[c, fp : fp + BLOCK] = signal * np.exp(1j * 0.1 * c)
xj = to_device(x)
noise = (np.random.default_rng(1).standard_normal(x.shape) +
         1j * np.random.default_rng(2).standard_normal(x.shape)).astype(np.complex64)
nj = to_device(noise)

def timeit(name, f, arg):
    out = jax.block_until_ready(f(arg))
    t0 = time.time()
    for _ in range(ITERS): out = f(arg)
    jax.block_until_ready(out)
    print(json.dumps({"part": name, "ms": round((time.time()-t0)/ITERS*1e3, 3)}), flush=True)

f_full = jax.jit(lambda a: jax.vmap(rx.acquirer.acquire)(a))
f_sum = jax.jit(lambda a: jax.vmap(lambda xc: rx.acquirer.acquire(xc).valid.sum())(a))
timeit("acquire_full_signal", f_full, xj)
timeit("acquire_full_noise", f_full, nj)
timeit("acquire_sum_signal", f_sum, xj)
timeit("acquire_sum_noise", f_sum, nj)
