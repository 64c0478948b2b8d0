"""Acquisition sub-stage profile on TPU at bench shapes (16ch x 2^19).

Stages: fwd-FFT only, fused correlate (kernel incl. fwd FFT + transposes),
full acquire (adds detect tail), full bank_step. Differences isolate the
detect tail and the decode passes.
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.utils.cplx import to_device, to_host
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

channels = int(os.environ.get("CH", "16"))
block = 1 << int(os.environ.get("LOGBLOCK", "19"))
iters = int(os.environ.get("ITERS", "10"))

tx = Transmitter(TxConfig(max_payload_len=1536))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 1500, dtype=np.uint8) for _ in range(12)]
batch = PacketBatch.from_list(payloads, max_len=1536)
s, l = tx.modulate_bursts(batch)
stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
stream = to_host(stream)
signal = np.tile(stream, block // stream.size + 1)[:block]
rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4,
                       payload_carrier="vv"))
fp, pt = rx.front_pad, rx.pad_tail()
x = np.zeros((channels, fp + block + pt), np.complex64)
for c in range(channels):
    x[c, fp:fp + block] = signal * np.exp(1j * 0.1 * c)
xj = to_device(x)

acq = rx.acquirer


def fwd_fft(xc):
    fr = acq._frames(xc)
    y = jnp.fft.fft(fr, axis=-1)
    return jnp.abs(y).sum()


def corr_only(xc):
    bp, bb = acq._best_power_fused(xc)
    return bp.sum() + bb.sum()


def planes_only(xc):
    n, s = acq.config.fft_size, acq.stride
    f = (xc.shape[0] - n) // s + 1
    fpad = -(-f // 16) * 16
    ar, ai, br, bi = acq._frames_planes(xc, fpad)
    return ar.sum() + ai.sum() + br.sum() + bi.sum()


def corr_bf16(xc):
    bp, bb = acq._best_power_fused(xc, bf16=True)
    return bp.sum() + bb.sum()


def acquire_full(xc):
    det = acq.acquire(xc)
    return det.index.sum() + det.valid.sum() + det.amplitude.sum()


rx_bf16 = Receiver(RxConfig(max_payload_len=1536, max_detections=32,
                            freq_bins=4, payload_carrier="vv",
                            acquisition_backend="fused_bf16"))

stages = {
    "fwd_fft": jax.jit(lambda s2d: jax.vmap(fwd_fft)(s2d).sum()),
    "corr_only": jax.jit(lambda s2d: jax.vmap(corr_only)(s2d).sum()),
    "planes_only": jax.jit(lambda s2d: jax.vmap(planes_only)(s2d).sum()),
    "corr_bf16": jax.jit(lambda s2d: jax.vmap(corr_bf16)(s2d).sum()),
    "acquire_full": jax.jit(lambda s2d: jax.vmap(acquire_full)(s2d).sum()),
    "bank_step": jax.jit(
        lambda s2d: rx.bank_step(s2d)[2].accepted.sum()
    ),
    "bank_step_bf16": jax.jit(
        lambda s2d: rx_bf16.bank_step(s2d)[2].accepted.sum()
    ),
}
which = os.environ.get("STAGES")
if which:
    stages = {k: stages[k] for k in which.split(",")}
for name, fn in stages.items():
    t0 = time.time(); out = jax.block_until_ready(fn(xj)); comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(xj)
    out = jax.block_until_ready(out)
    print(json.dumps({"stage": name,
                      "ms": round((time.time() - t0) / iters * 1e3, 3),
                      "compile_s": round(comp, 1),
                      "val": float(np.asarray(out))}), flush=True)
