"""Fine-grained acquisition profile on the bench workload shapes.

Times each acquisition sub-stage as its own jit over [C, T] to find where
the 9.7 ms acquire stage goes. Also measures candidate fixes:
  - frames via vmapped dynamic_slice instead of index-matrix cgather
  - top_k over per-chunk maxima instead of the full array
"""

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
from gr4_packet_modem_tpu.ops.acquire import _sliding_max
from gr4_packet_modem_tpu.utils.cplx import to_device

channels = int(os.environ.get("BENCH_CHANNELS", "8"))
block = int(os.environ.get("BENCH_BLOCK", str(1 << 18)))
iters = int(os.environ.get("BENCH_ITERS", "10"))

rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4))
acq = rx.acquirer
fp, pt = rx.front_pad, rx.pad_tail()
T = fp + block + pt
rng = np.random.default_rng(0)
x = (rng.standard_normal((channels, T)) + 1j * rng.standard_normal((channels, T))).astype(np.complex64)
xj = to_device(x)

n, s, L, nb = acq.config.fft_size, acq.stride, acq.sync_len, acq.num_bins
w = acq.config.time_threshold
d = acq.config.max_detections
nf = (T - n) // s + 1
tlen = nf * s
print(json.dumps({"T": T, "frames": nf, "stride": s, "tlen": tlen}), flush=True)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(json.dumps({"stage": name, "ms": round(dt, 3), "compile_s": round(comp, 1)}), flush=True)
    return out


# ---- full acquire (reference point)
timeit("acquire_full", lambda x2: jax.vmap(lambda xc: acq.acquire(xc).valid.sum())(x2), xj)

# ---- correlation only, current cgather frames
def corr_only(x2):
    return jax.vmap(lambda xc: jnp.abs(acq.correlate(xc)).sum())(x2)

timeit("correlate_cgather", corr_only, xj)


# ---- correlation with vmapped dynamic_slice frames
def corr_vslice_one(xc):
    starts = jnp.arange(nf, dtype=jnp.int32) * s
    fr = jax.vmap(lambda st: jax.lax.dynamic_slice(xc.real, (st,), (n,)))(starts)
    fi = jax.vmap(lambda st: jax.lax.dynamic_slice(xc.imag, (st,), (n,)))(starts)
    frames = jax.lax.complex(fr, fi)
    f = jnp.fft.fft(frames, axis=-1)
    rep = jax.lax.complex(
        jnp.zeros((nb, n), jnp.float32).at[:, :L].set(acq.replicas.real),
        jnp.zeros((nb, n), jnp.float32).at[:, :L].set(acq.replicas.imag),
    )
    rf = jnp.conj(jnp.fft.fft(rep, axis=-1))
    prod = f[:, None, :] * rf[None]
    corr = jnp.fft.ifft(prod, axis=-1)[..., :s]
    return jnp.abs(jnp.moveaxis(corr, 1, 0).reshape(nb, nf * s)).sum()

timeit("correlate_vslice", lambda x2: jax.vmap(corr_vslice_one)(x2), xj)


# ---- reshape-based frames (stride framing without gather: take [nf*s]
# contiguous, reshape [nf, s], then concat lookahead tail of n-s from the
# next frame via a shifted slice)
def corr_reshape_one(xc):
    body = xc[: nf * s].reshape(nf, s)
    tail_src = jnp.concatenate([xc[s : nf * s], jnp.zeros(s, xc.dtype)]).reshape(nf, s)[:, : n - s]
    frames = jnp.concatenate([body, tail_src], axis=1)
    f = jnp.fft.fft(frames, axis=-1)
    rep = jax.lax.complex(
        jnp.zeros((nb, n), jnp.float32).at[:, :L].set(acq.replicas.real),
        jnp.zeros((nb, n), jnp.float32).at[:, :L].set(acq.replicas.imag),
    )
    rf = jnp.conj(jnp.fft.fft(rep, axis=-1))
    prod = f[:, None, :] * rf[None]
    corr = jnp.fft.ifft(prod, axis=-1)[..., :s]
    return jnp.abs(jnp.moveaxis(corr, 1, 0).reshape(nb, nf * s)).sum()

timeit("correlate_reshape", lambda x2: jax.vmap(corr_reshape_one)(x2), xj)


# ---- conv backend
acq_conv = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4,
                             acquisition_backend="conv")).acquirer
if os.environ.get("CONV", "0") == "1":
    timeit(
        "correlate_conv",
        lambda x2: jax.vmap(lambda xc: jnp.abs(acq_conv._correlate_conv(xc)).sum())(x2),
        xj,
    )

# ---- downstream pieces on a precomputed best_pow
bp = jnp.abs(rng.standard_normal((channels, tlen)).astype(np.float32))
bpj = jax.device_put(bp)

timeit(
    "sliding_maxes",
    lambda b2: jax.vmap(lambda b: (_sliding_max(b, w, w) + _sliding_max(b, w, -1)).sum())(b2),
    bpj,
)

timeit(
    "topk_full",
    lambda b2: jax.vmap(lambda b: jax.lax.top_k(b, d)[0].sum())(b2),
    bpj,
)


def topk_chunked(b):
    nch = tlen // w
    chunks = b[: nch * w].reshape(nch, w)
    cmax = chunks.max(axis=1)
    cidx = chunks.argmax(axis=1) + jnp.arange(nch) * w
    tp, ti = jax.lax.top_k(cmax, d)
    return tp.sum() + cidx[ti].sum()

timeit("topk_chunked", lambda b2: jax.vmap(topk_chunked)(b2), bpj)


def cfar_below(b):
    thr = jnp.abs(rng.standard_normal(d).astype(np.float32))
    idx = jnp.clip(jnp.arange(d, dtype=jnp.int32) * (tlen // d), w, tlen - w - 1)

    def below_count(i, th):
        win = jax.lax.dynamic_slice(b, (i - w,), (2 * w + 1,))
        return jnp.sum((win < th).astype(jnp.int32))

    return jax.vmap(below_count)(idx, jnp.asarray(thr)).sum()

timeit("cfar_below", lambda b2: jax.vmap(cfar_below)(b2), bpj)


def noise_est(x2):
    def one(xc):
        h = jnp.asarray(acq._noise_filter)
        hp = jax.lax.complex(
            jnp.convolve(xc.real, h, mode="same"),
            jnp.convolve(xc.imag, h, mode="same"),
        )
        p = jnp.abs(hp) ** 2
        return jnp.cumsum(p).sum()

    return jax.vmap(one)(x2)

timeit("noise_conv_cumsum", noise_est, xj)
