"""Sub-stage profile of acquisition at HEAD (16ch x 2^19, device-resident).

Stages (cumulative, fenced): fused best-power | +peak detect | +full acquire.
Also times the noise high-pass convolve separately.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup
_pm_setup()
import jax
import jax.numpy as jnp
import numpy as np

from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.ops.acquire import chunked_peak_detect
from gr4_packet_modem_tpu.utils.cplx import to_device
from benchmarks.common import tiled_burst_signal

C, block = 16, 1 << 19
rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4))
acq = rx.acquirer
sig, _ = tiled_burst_signal(total=block, max_payload_len=1536, payload_len=1500)
x = np.stack([sig * np.exp(1j * 0.1 * c) for c in range(C)]).astype(np.complex64)
fp, pt = rx.front_pad, rx.pad_tail()
xp = np.zeros((C, fp + block + pt), np.complex64)
xp[:, fp:fp + block] = x
xj = to_device(xp)
print("backend:", jax.default_backend(), "shape:", xp.shape, flush=True)

def timeit(label, fn, iters=10):
    out = jax.block_until_ready(fn(xj))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(xj)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {dt:7.2f} ms", flush=True)
    return dt

w = acq.config.time_threshold

@jax.jit
def f_bp(xc):
    bp, bb = jax.vmap(acq._best_power_fused)(xc)
    return bp.sum(), bb.sum()

@jax.jit
def f_bp_detect(xc):
    bp, bb = jax.vmap(acq._best_power_fused)(xc)
    tp, ti, ov = jax.vmap(
        lambda p: chunked_peak_detect(p, w, 32, acq.config.power_threshold)
    )(bp)
    return tp.sum(), ti.sum()

@jax.jit
def f_acquire(xc):
    det = jax.vmap(acq.acquire)(xc)
    return det.index.sum(), det.amplitude.sum()

@jax.jit
def f_noise(xc):
    h = jnp.asarray(acq._noise_filter)
    def one(x):
        return jax.lax.complex(
            jnp.convolve(x.real, h, mode="same"),
            jnp.convolve(x.imag, h, mode="same"),
        )
    hp = jax.vmap(one)(xc)
    return jnp.abs(hp).sum()

timeit("fused best-power         ", f_bp)
timeit("+ chunked peak detect    ", f_bp_detect)
timeit("full acquire             ", f_acquire)
timeit("noise high-pass convolve ", f_noise)
