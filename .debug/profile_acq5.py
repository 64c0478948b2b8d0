"""Resolve the 9.7ms-vs-0.037ms acquire discrepancy: same jit, noise input
vs real bench signal input."""

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
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.utils.cplx import to_device, to_host
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

channels = 8
block = 1 << 18
iters = 10

rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4,
                       payload_carrier="vv"))
acq = rx.acquirer
fp, pt = rx.front_pad, rx.pad_tail()
T = fp + block + pt

# real signal
tx = Transmitter(TxConfig(max_payload_len=1536))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 1500, dtype=np.uint8) for _ in range(12)]
batch = PacketBatch.from_list(payloads, max_len=1536)
s, l = tx.modulate_bursts(batch)
stream, total = ragged_concat(s, l, int(np.asarray(l).sum()))
stream = to_host(stream)
signal = np.tile(stream, block // stream.size + 1)[:block]

x_sig = np.zeros((channels, T), np.complex64)
for c in range(channels):
    x_sig[c, fp:fp + block] = signal * np.exp(1j * 0.1 * c)
x_noise = (np.random.default_rng(1).standard_normal((channels, T))
           + 1j * np.random.default_rng(2).standard_normal((channels, T))
           ).astype(np.complex64) * 0.1

fn = jax.jit(lambda x2: jax.vmap(lambda xc: acq.acquire(xc).valid.sum())(x2))

for name, xx in [("noise", x_noise), ("signal", x_sig), ("noise2", x_noise),
                 ("signal2", x_sig)]:
    xj = to_device(xx)
    t0 = time.time()
    out = jax.block_until_ready(fn(xj))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(xj)
    out = jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(json.dumps({"input": name, "ms": round(dt, 3),
                      "first_call_s": round(comp, 2),
                      "valid": int(np.asarray(out).sum())}), flush=True)
