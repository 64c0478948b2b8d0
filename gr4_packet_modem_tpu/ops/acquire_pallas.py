"""Fused Pallas correlator for syncword acquisition.

The acquisition bottleneck on TPU is not FLOPs but HBM traffic: the
overlap-save path materializes the ``[frames, 9 bins, fft_size]`` complex
product and its inverse FFT (hundreds of MB per step) just to reduce them to
a per-sample best-bin power. The XLA FFT and an MXU matmul-FFT both measure
~4 ms per 8x291k step because of exactly this traffic (docs/PERF_R2.md).

This kernel fuses the per-bin product, the inverse FFT and the
power/max-over-bins reduction into one Pallas program so the per-bin
intermediates never leave VMEM. Only the forward FFT of the frames (one
cheap batched XLA FFT) happens outside; the kernel writes just the
``best_pow``/``best_bin`` planes (2 x T' values instead of 9 x T' complex).

Inverse-FFT factorization (N = 16 x N2, k = k1 + 16 k2, n = N2 n1 + n2 with
n1 in [0,16), n2 in [0,N2)):

    y[N2 n1 + n2] = 1/N * sum_k1 W_16^{+n1 k1} W_N^{+n2 k1}
                        * sum_k2 Y[k1 + 16 k2] W_N2^{+n2 k2}

With the spectrum laid out ``[k1, frame, k2]`` both contractions are plain
lane-dim matmuls — ``[(16*BF), N2] @ [N2, N2]`` (the bulk of the FLOPs, full
128-lane tiles for N2 >= 128) then ``[16, 16] @ [16, BF*N2]`` — with no
in-kernel transposes; the frame batch rides the MXU sublanes. Candidate
*estimation* (phase, adjacent-bin powers) is recomputed exactly at the few
detected points by direct correlation in the caller (ops/acquire.py), so the
kernel only has to get detection decisions and interpolation ratios right
(f32 matmuls, ~1e-5 relative).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_best_power"]

_N1 = 16  # small radix on the sublane side; N2 = fft_size // 16 rides lanes


@lru_cache(maxsize=8)
def _inv_tables(n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(W2c [N2,N2], TW [16,1,N2], W1c [16,16]) inverse-DFT factors with the
    1/N scaling folded in (complex64 numpy)."""
    n2 = n // _N1
    k2 = np.arange(n2)
    w2c = np.exp(2j * np.pi * np.outer(k2, k2) / n2) / n2
    k1 = np.arange(_N1)
    tw = np.exp(2j * np.pi * np.outer(k1, np.arange(n2)) / n)[:, None, :]
    w1c = np.exp(2j * np.pi * np.outer(k1, k1) / _N1) / _N1  # [n1(out), k1]
    return (
        w2c.astype(np.complex64),
        tw.astype(np.complex64),
        w1c.astype(np.complex64),
    )


def _make_kernel(nb: int, n2: int, bf: int, bf16: bool = False):
    def kernel(
        y2r_ref, y2i_ref,   # [16, BF, N2] spectrum block (k1, frame, k2)
        rr_ref, ri_ref,     # [nb, 16, 1, N2] conj replica spectrum
        w2r_ref, w2i_ref,   # [N2, N2]
        twr_ref, twi_ref,   # [16, 1, N2]
        w1r_ref, w1i_ref,   # [16, 16]
        pow_ref, bin_ref,   # out [16, BF, N2]
    ):
        y2r = y2r_ref[:]
        y2i = y2i_ref[:]
        w2r, w2i = w2r_ref[:], w2i_ref[:]
        twr, twi = twr_ref[:], twi_ref[:]
        w1r, w1i = w1r_ref[:], w1i_ref[:]
        if bf16:
            # bf16 matmul inputs, f32 accumulation: the MXU runs bf16 at 4x
            # its f32 rate and the kernel is bound by the bulk [.,N2]@[N2,N2]
            # contraction. ~2^-8 relative error on powers only moves
            # detection decisions/interpolation ratios (phase and adjacent
            # powers are recomputed exactly at the few candidates by
            # _corr_points); PER parity is gated in tests/test_per_snr.py.
            w2r, w2i = w2r.astype(jnp.bfloat16), w2i.astype(jnp.bfloat16)
            w1r, w1i = w1r.astype(jnp.bfloat16), w1i.astype(jnp.bfloat16)

        def dot(a, b):
            if bf16:
                a = a.astype(jnp.bfloat16)
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        pmax = jnp.full((_N1, bf, n2), -1.0, jnp.float32)
        pbin = jnp.zeros((_N1, bf, n2), jnp.int32)
        for b in range(nb):
            rr = rr_ref[b]  # [16, 1, N2]
            ri = ri_ref[b]
            pr = (y2r * rr - y2i * ri).reshape(_N1 * bf, n2)
            pi = (y2r * ri + y2i * rr).reshape(_N1 * bf, n2)
            ur = (dot(pr, w2r) - dot(pi, w2i)).reshape(_N1, bf, n2)
            ui = (dot(pr, w2i) + dot(pi, w2r)).reshape(_N1, bf, n2)
            vr = (ur * twr - ui * twi).reshape(_N1, bf * n2)
            vi = (ur * twi + ui * twr).reshape(_N1, bf * n2)
            yr = dot(w1r, vr) - dot(w1i, vi)
            yi = dot(w1r, vi) + dot(w1i, vr)
            p = (yr * yr + yi * yi).reshape(_N1, bf, n2)
            upd = p > pmax
            pmax = jnp.where(upd, p, pmax)
            pbin = jnp.where(upd, b, pbin)
        pow_ref[:] = pmax
        bin_ref[:] = pbin

    return kernel


@partial(
    jax.jit,
    static_argnames=("fft_size", "interpret", "block_frames", "bf16"),
)
def fused_best_power(
    frames: jax.Array,
    replica_fft_conj_r: jax.Array,
    replica_fft_conj_i: jax.Array,
    fft_size: int,
    interpret: bool = False,
    block_frames: int = 16,
    bf16: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Best-bin correlation power per sample over all frequency bins.

    frames: complex64 ``[F, N]`` overlap-save frames.
    replica_fft_conj_{r,i}: ``[nb, N]`` conj FFT of the modulated replicas.
    Returns ``(best_pow [F, N] f32, best_bin [F, N] i32)`` in natural
    per-frame sample order (caller slices the valid ``[:stride]`` part).
    """
    n = fft_size
    n2 = n // _N1
    nb = replica_fft_conj_r.shape[0]
    f = frames.shape[0]
    bf = block_frames
    fpad = -(-f // bf) * bf

    y = jnp.fft.fft(frames, axis=-1)  # [F, N] natural order
    # k = k1 + 16*k2 -> view [k2, k1]; kernel layout [k1, F, k2].
    # planes split BEFORE the transpose: complex transposes hit
    # UNIMPLEMENTED paths on this backend (see CLAUDE.md)
    y2r_n = y.real.reshape(f, n2, _N1).transpose(2, 0, 1)  # [16, F, N2]
    y2i_n = y.imag.reshape(f, n2, _N1).transpose(2, 0, 1)
    y2r = jnp.zeros((_N1, fpad, n2), jnp.float32).at[:, :f].set(y2r_n)
    y2i = jnp.zeros((_N1, fpad, n2), jnp.float32).at[:, :f].set(y2i_n)

    rep2r = replica_fft_conj_r.reshape(nb, n2, _N1).transpose(0, 2, 1)[
        :, :, None, :
    ]  # [nb, 16, 1, N2]
    rep2i = replica_fft_conj_i.reshape(nb, n2, _N1).transpose(0, 2, 1)[
        :, :, None, :
    ]
    w2c, tw, w1c = _inv_tables(n)

    grid = (fpad // bf,)
    const = lambda i: (0, 0)  # noqa: E731
    const3 = lambda i: (0, 0, 0)  # noqa: E731
    const4 = lambda i: (0, 0, 0, 0)  # noqa: E731
    blk = lambda i: (0, i, 0)  # noqa: E731
    out_pow, out_bin = pl.pallas_call(
        _make_kernel(nb, n2, bf, bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_N1, bf, n2), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((_N1, bf, n2), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, _N1, 1, n2), const4, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, _N1, 1, n2), const4, memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((_N1, 1, n2), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((_N1, 1, n2), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((_N1, _N1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((_N1, _N1), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_N1, bf, n2), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((_N1, bf, n2), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((_N1, fpad, n2), jnp.float32),
            jax.ShapeDtypeStruct((_N1, fpad, n2), jnp.int32),
        ),
        interpret=interpret,
    )(
        y2r, y2i,
        rep2r.astype(jnp.float32), rep2i.astype(jnp.float32),
        jnp.asarray(w2c.real), jnp.asarray(w2c.imag),
        jnp.asarray(tw.real), jnp.asarray(tw.imag),
        jnp.asarray(w1c.real), jnp.asarray(w1c.imag),
    )
    # [16, F, N2] -> [F, 16, N2] -> [F, N] (n = N2*n1 + n2)
    best_pow = out_pow[:, :f].transpose(1, 0, 2).reshape(f, n)
    best_bin = out_bin[:, :f].transpose(1, 0, 2).reshape(f, n)
    return best_pow, best_bin
