"""Fused Pallas correlator for syncword acquisition.

The acquisition bottleneck on TPU is not FLOPs but HBM traffic and the XLA
FFT: the overlap-save path materializes the ``[frames, 9 bins, fft_size]``
complex product and its inverse FFT (hundreds of MB per step) just to
reduce them to a per-sample best-bin power, and even the *forward* XLA FFT
alone measured 6.4 ms per 16x524k step — ~20x its HBM floor
(docs/PERF_R3.md round-3b profile).

This kernel therefore fuses the ENTIRE correlation: the forward DFT of the
frames, the per-bin product, the inverse DFT and the power/max-over-bins
reduction run in one Pallas program, so the spectrum and every per-bin
intermediate live only in VMEM. The kernel reads the framed time samples
once and writes just the ``best_pow``/``best_bin`` planes (2 x T' values
instead of 9 x T' complex + a spectrum round trip).

Both DFTs use the same N = 16 x N2 MXU factorization. Forward, with time
index n = N2 m1 + m2 and output k = k1 + 16 k2 (m1, k1 in [0,16)):

    Y[k1 + 16 k2] = sum_m2 W_N2^{-k2 m2} * W_N^{-k1 m2}
                        * sum_m1 W_16^{-k1 m1} x[N2 m1 + m2]

i.e. a small sublane matmul ``[16,16] @ [16, BF*N2]``, a twiddle, then a
bulk lane matmul ``[(16*BF), N2] @ [N2, N2]`` producing the spectrum
directly in the ``[k1, frame, k2]`` layout the inverse stage wants. Inverse
(k = k1 + 16 k2, n = N2 n1 + n2):

    y[N2 n1 + n2] = 1/N * sum_k1 W_16^{+n1 k1} W_N^{+n2 k1}
                        * sum_k2 Y[k1 + 16 k2] W_N2^{+n2 k2}

All contractions are plain lane/sublane matmuls with no in-kernel
transposes; the frame batch rides the MXU sublanes. Candidate *estimation*
(phase, adjacent-bin powers) is recomputed exactly at the few detected
points by direct correlation in the caller (ops/acquire.py), so the kernel
only has to get detection decisions and interpolation ratios right. (On
TPU the MXU multiplies f32 matmul inputs at bf16 by default — the
``bf16`` flag only makes that explicit — and its casts apply in interpret
mode too, so the fused_bf16 CPU test loosens its tolerances.)

**Wide layout (round 5).** Counting MXU passes of the layout above shows
the small radix-16 dots dominate: a ``[16,16] @ [16, BF*N2]`` dot issues
one (padded) 128-wide pass per 128-lane output tile with only 16 of 128
sublanes and 16 of 128 K-steps used, so the forward small DFT costs 64
passes/frame-block and the 9 per-bin inverse small DFTs cost 576 — 89% of
all passes are padding against the bulk DFTs' 8. The ``wide=True`` kernel
removes the padding by folding 8 frames into the sublane axis: rows become
``(group, k1)`` with ``frame = group * BF/8 + f'``, the radix-16 factors
become exact block-diagonal ``kron(I_8, W)`` [128,128] tables, twiddle and
replica tables tile over the 8 groups, and the bulk N2 contractions are
row-order-agnostic so they run unchanged. Every matmul is then a
full-width [128,...] @ [128-deep] pass and the layout shuffles stay two
per block (one at entry, one at emit), exactly as before. Numerically
identical factorization — the block-diagonal zeros contribute nothing.

MEASURED NEGATIVE (round-5 A/B, v5e, 16ch x 2^19 full step): wide 14.19 ms
vs narrow 10.46 ms. The pass-counting model was wrong about padding: the
MXU streams only M rows through a [M,16]@[16,N] dot, so the narrow small
dots never paid a 128-row pad, while the block-diagonal form streams
K=128 (8x the MACs) per row. Wide stays available via ``PM_ACQ_WIDE=1``
for re-measurement on other TPU generations; production default is narrow.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_best_power", "fused_enabled"]

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


@lru_cache(maxsize=8)
def _fwd_tables(n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(F1 [16,16], TWF [16,1,N2], F2 [N2,N2]) forward-DFT factors: with
    time index n = N2 m1 + m2 the spectrum lands directly in the
    [k1, frame, k2] layout (k = k1 + 16 k2) the inverse stage consumes."""
    n2 = n // _N1
    k1 = np.arange(_N1)
    f1 = np.exp(-2j * np.pi * np.outer(k1, k1) / _N1)  # [k1(out), m1]
    m2 = np.arange(n2)
    twf = np.exp(-2j * np.pi * np.outer(k1, m2) / n)[:, None, :]
    f2 = np.exp(-2j * np.pi * np.outer(m2, m2) / n2)  # [m2, k2(out)]
    return (
        f1.astype(np.complex64),
        twf.astype(np.complex64),
        f2.astype(np.complex64),
    )


_GROUPS = 128 // _N1  # sublane groups in the wide layout (8)


@lru_cache(maxsize=8)
def _wide_tables(n: int) -> tuple[np.ndarray, ...]:
    """Block-diagonal / group-tiled factor tables for the wide layout:
    (F1blk [128,128], TWF128 [128,1,N2], W2c [N2,N2], F2 [N2,N2],
    TW128 [128,1,N2], W1blk [128,128]) — the radix-16 factors as exact
    kron(I_8, W) blocks, twiddles tiled over the 8 sublane groups, the
    bulk N2 factors unchanged."""
    n2 = n // _N1
    w2c, tw, w1c = _inv_tables(n)
    f1, twf, f2 = _fwd_tables(n)
    eye = np.eye(_GROUPS)
    f1blk = np.kron(eye, f1).astype(np.complex64)    # [128, 128]
    w1blk = np.kron(eye, w1c).astype(np.complex64)   # [128, 128]
    twf128 = np.tile(twf, (_GROUPS, 1, 1))           # [128, 1, N2]
    tw128 = np.tile(tw, (_GROUPS, 1, 1))             # [128, 1, N2]
    return f1blk, twf128, w2c, f2, tw128, w1blk


def _make_kernel_wide(nb: int, n2: int, bf: int, bf16: bool = False):
    """Wide-layout kernel: frames folded into the sublane axis so every
    matmul runs at full 128-wide MXU occupancy (see module docstring)."""
    fg = bf // _GROUPS  # frames per sublane group

    def kernel(
        ar_ref, ai_ref,      # [BF, S] frame bodies
        br_ref, bi_ref,      # [BF, S] shifted view (lookahead)
        rr_ref, ri_ref,      # [nb, 128, 1, N2] group-tiled replica spectrum
        f1r_ref, f1i_ref,    # [128, 128] block-diag forward small DFT
        twfr_ref, twfi_ref,  # [128, 1, N2] forward twiddle (group-tiled)
        f2r_ref, f2i_ref,    # [N2, N2] forward bulk DFT
        w2r_ref, w2i_ref,    # [N2, N2] inverse bulk DFT
        twr_ref, twi_ref,    # [128, 1, N2] inverse twiddle (group-tiled)
        w1r_ref, w1i_ref,    # [128, 128] block-diag inverse small DFT
        pow_ref, bin_ref,    # out [BF, 16, N2]
    ):
        w2r, w2i = w2r_ref[:], w2i_ref[:]
        twr, twi = twr_ref[:], twi_ref[:]
        w1r, w1i = w1r_ref[:], w1i_ref[:]
        f1r, f1i = f1r_ref[:], f1i_ref[:]
        twfr, twfi = twfr_ref[:], twfi_ref[:]
        f2r, f2i = f2r_ref[:], f2i_ref[:]
        if bf16:
            cast = lambda a: a.astype(jnp.bfloat16)  # noqa: E731
            w2r, w2i, w1r, w1i = map(cast, (w2r, w2i, w1r, w1i))
            f1r, f1i, f2r, f2i = map(cast, (f1r, f1i, f2r, f2i))

        def dot(a, b):
            if bf16:
                a = a.astype(jnp.bfloat16)
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        s = ar_ref.shape[-1]
        n = _N1 * n2
        w_r = jnp.concatenate([ar_ref[:], br_ref[:][:, : n - s]], axis=1)
        w_i = jnp.concatenate([ai_ref[:], bi_ref[:][:, : n - s]], axis=1)
        # entry shuffle: [f, m1, m2] -> rows (g, m1), cols (f', m2) with
        # f = g*fg + f' (the only transpose besides the emit, as before)
        shuf = lambda w: (  # noqa: E731
            w.reshape(_GROUPS, fg, _N1, n2)
            .transpose(0, 2, 1, 3)
            .reshape(128, fg * n2)
        )
        xr, xi = shuf(w_r), shuf(w_i)
        # forward: block-diag small DFT, twiddle, bulk lane DFT over m2
        ar = dot(f1r, xr) - dot(f1i, xi)  # [128, fg*N2] rows (g, k1)
        ai = dot(f1r, xi) + dot(f1i, xr)
        ar = ar.reshape(128, fg, n2)
        ai = ai.reshape(128, fg, n2)
        br = (ar * twfr - ai * twfi).reshape(128 * fg, n2)
        bi = (ar * twfi + ai * twfr).reshape(128 * fg, n2)
        y2r = (dot(br, f2r) - dot(bi, f2i)).reshape(128, fg, n2)
        y2i = (dot(br, f2i) + dot(bi, f2r)).reshape(128, fg, n2)

        pmax = jnp.full((128, fg, n2), -1.0, jnp.float32)
        pbin = jnp.zeros((128, fg, n2), jnp.int32)
        for b in range(nb):
            rr = rr_ref[b]  # [128, 1, N2]
            ri = ri_ref[b]
            pr = (y2r * rr - y2i * ri).reshape(128 * fg, n2)
            pi = (y2r * ri + y2i * rr).reshape(128 * fg, n2)
            ur = (dot(pr, w2r) - dot(pi, w2i)).reshape(128, fg, n2)
            ui = (dot(pr, w2i) + dot(pi, w2r)).reshape(128, fg, n2)
            vr = (ur * twr - ui * twi).reshape(128, fg * n2)
            vi = (ur * twi + ui * twr).reshape(128, fg * n2)
            yr = dot(w1r, vr) - dot(w1i, vi)  # rows (g, n1)
            yi = dot(w1r, vi) + dot(w1i, vr)
            p = (yr * yr + yi * yi).reshape(128, fg, n2)
            upd = p > pmax
            pmax = jnp.where(upd, p, pmax)
            pbin = jnp.where(upd, b, pbin)
        # emit frame-major [f, n1, n2]: rows (g, n1), cols (f', c) ->
        # (g, f', n1, c); f = g*fg + f' makes the reshape exact
        emit = lambda a: (  # noqa: E731
            a.reshape(_GROUPS, _N1, fg, n2)
            .transpose(0, 2, 1, 3)
            .reshape(bf, _N1, n2)
        )
        pow_ref[:] = emit(pmax)
        bin_ref[:] = emit(pbin)

    return kernel


def _make_kernel(nb: int, n2: int, bf: int, bf16: bool = False):
    def kernel(
        ar_ref, ai_ref,     # [BF, S] frame bodies (contiguous stride view)
        br_ref, bi_ref,     # [BF, S] one-stride-shifted view (lookahead)
        rr_ref, ri_ref,     # [nb, 16, 1, N2] conj replica spectrum
        f1r_ref, f1i_ref,   # [16, 16] forward small DFT
        twfr_ref, twfi_ref,  # [16, 1, N2] forward twiddle
        f2r_ref, f2i_ref,   # [N2, N2] forward bulk DFT
        w2r_ref, w2i_ref,   # [N2, N2] inverse bulk DFT
        twr_ref, twi_ref,   # [16, 1, N2] inverse twiddle
        w1r_ref, w1i_ref,   # [16, 16] inverse small DFT
        pow_ref, bin_ref,   # out [16, BF, N2]
    ):
        w2r, w2i = w2r_ref[:], w2i_ref[:]
        twr, twi = twr_ref[:], twi_ref[:]
        w1r, w1i = w1r_ref[:], w1i_ref[:]
        if bf16:
            # explicit bf16 matmul inputs (f32 accumulation). On TPU this is
            # what DEFAULT precision already does for f32 inputs — measured
            # identical (docs/PERF_R3.md round-3b) — so the flag mostly
            # documents the numeric contract. The casts apply in interpret
            # mode too (which is why the fused_bf16 CPU test loosens its
            # tolerances).
            w2r, w2i = w2r.astype(jnp.bfloat16), w2i.astype(jnp.bfloat16)
            w1r, w1i = w1r.astype(jnp.bfloat16), w1i.astype(jnp.bfloat16)

        def dot(a, b):
            if bf16:
                a = a.astype(jnp.bfloat16)
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        # assemble the overlap-save frames IN VMEM from the two contiguous
        # stride views (body + (n-s)-sample lookahead from the next stride),
        # then shuffle into the forward-DFT matmul layout. The caller passes
        # zero host-side framing copies — building [F, N] frames on the
        # host cost 2.7 ms of the 4.8 ms correlate (docs/PERF_R3.md r3b).
        s = ar_ref.shape[-1]
        n = _N1 * n2
        w_r = jnp.concatenate([ar_ref[:], br_ref[:][:, : n - s]], axis=1)
        w_i = jnp.concatenate([ai_ref[:], bi_ref[:][:, : n - s]], axis=1)
        # forward DFT: sublane small DFT over m1, twiddle, bulk lane DFT
        # over m2 -> spectrum [k1, frame, k2]
        xr = w_r.reshape(bf, _N1, n2).transpose(1, 0, 2).reshape(
            _N1, bf * n2
        )
        xi = w_i.reshape(bf, _N1, n2).transpose(1, 0, 2).reshape(
            _N1, bf * n2
        )
        f1r, f1i = f1r_ref[:], f1i_ref[:]
        twfr, twfi = twfr_ref[:], twfi_ref[:]
        f2r, f2i = f2r_ref[:], f2i_ref[:]
        if bf16:
            f1r, f1i = f1r.astype(jnp.bfloat16), f1i.astype(jnp.bfloat16)
            f2r, f2i = f2r.astype(jnp.bfloat16), f2i.astype(jnp.bfloat16)
        ar = (dot(f1r, xr) - dot(f1i, xi)).reshape(_N1, bf, n2)
        ai = (dot(f1r, xi) + dot(f1i, xr)).reshape(_N1, bf, n2)
        br = (ar * twfr - ai * twfi).reshape(_N1 * bf, n2)
        bi = (ar * twfi + ai * twfr).reshape(_N1 * bf, n2)
        y2r = (dot(br, f2r) - dot(bi, f2i)).reshape(_N1, bf, n2)
        y2i = (dot(br, f2i) + dot(bi, f2r)).reshape(_N1, bf, n2)

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
        # emit in natural frame-major order [frame, n1, n2] (sample
        # j = N2 n1 + n2): the VMEM transpose here replaces a full HBM
        # round trip of both output planes in the caller
        pow_ref[:] = pmax.transpose(1, 0, 2)
        bin_ref[:] = pbin.transpose(1, 0, 2)

    return kernel


@partial(
    jax.jit,
    static_argnames=("fft_size", "interpret", "block_frames", "bf16",
                     "wide"),
)
def fused_best_power(
    ar: jax.Array,
    ai: jax.Array,
    br: jax.Array,
    bi: jax.Array,
    replica_fft_conj_r: jax.Array,
    replica_fft_conj_i: jax.Array,
    fft_size: int,
    interpret: bool = False,
    block_frames: int = 16,
    bf16: bool = False,
    wide: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Best-bin correlation power per sample over all frequency bins.

    ar/ai: f32 ``[FPAD, S]`` frame *bodies* — ``x[f*S : (f+1)*S]`` per
    plane, a free contiguous reshape; br/bi: the same view shifted one
    stride (``x[(f+1)*S : (f+2)*S]``), whose first ``N - S`` samples are
    frame f's lookahead. The kernel assembles the overlap-save frames in
    VMEM, so the caller performs no framing copies at all (build with
    SyncwordAcquirer._frames_planes). FPAD must be a multiple of
    ``block_frames``; S must satisfy ``N - S <= S``.
    replica_fft_conj_{r,i}: ``[nb, N]`` conj FFT of the modulated replicas.
    Returns ``(best_pow [FPAD, N] f32, best_bin [FPAD, N] i32)`` in natural
    frame-major sample order (caller slices valid frames/[:stride]).
    """
    n = fft_size
    n2 = n // _N1
    nb = replica_fft_conj_r.shape[0]
    fpad, s = ar.shape
    bf = block_frames
    if fpad % bf:
        raise ValueError(f"FPAD={fpad} must be a multiple of {bf}")
    if not (0 < n - s <= s):
        raise ValueError(f"stride {s} must satisfy N-S <= S (N={n})")
    if wide and bf % _GROUPS:
        raise ValueError(f"wide layout needs block_frames % {_GROUPS} == 0")

    # spectrum k = k1 + 16*k2 -> view [k2, k1]; kernel layout [k1, 1, k2]
    rep2r = replica_fft_conj_r.reshape(nb, n2, _N1).transpose(0, 2, 1)[
        :, :, None, :
    ]  # [nb, 16, 1, N2]
    rep2i = replica_fft_conj_i.reshape(nb, n2, _N1).transpose(0, 2, 1)[
        :, :, None, :
    ]
    if wide:
        # group-tiled replica spectrum + block-diagonal small-DFT tables
        rep2r = jnp.tile(rep2r, (1, _GROUPS, 1, 1))  # [nb, 128, 1, N2]
        rep2i = jnp.tile(rep2i, (1, _GROUPS, 1, 1))
        f1, twf, w2c, f2, tw, w1c = _wide_tables(n)
        sm = 128  # small-DFT table side
        kern = _make_kernel_wide(nb, n2, bf, bf16)
    else:
        w2c, tw, w1c = _inv_tables(n)
        f1, twf, f2 = _fwd_tables(n)
        sm = _N1
        kern = _make_kernel(nb, n2, bf, bf16)

    grid = (fpad // bf,)
    const = lambda i: (0, 0)  # noqa: E731
    const3 = lambda i: (0, 0, 0)  # noqa: E731
    const4 = lambda i: (0, 0, 0, 0)  # noqa: E731
    body_blk = lambda i: (i, 0)  # noqa: E731
    out_blk = lambda i: (i, 0, 0)  # noqa: E731  (frame-major)
    out_pow, out_bin = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bf, s), body_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, s), body_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, s), body_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, s), body_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, sm, 1, n2), const4, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, sm, 1, n2), const4, memory_space=pltpu.VMEM),
            pl.BlockSpec((sm, sm), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((sm, sm), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((sm, 1, n2), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((sm, 1, n2), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((sm, 1, n2), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((sm, 1, n2), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((sm, sm), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((sm, sm), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bf, _N1, n2), out_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, _N1, n2), out_blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((fpad, _N1, n2), jnp.float32),
            jax.ShapeDtypeStruct((fpad, _N1, n2), jnp.int32),
        ),
        interpret=interpret,
    )(
        ar, ai, br, bi,
        rep2r.astype(jnp.float32), rep2i.astype(jnp.float32),
        jnp.asarray(f1.real), jnp.asarray(f1.imag),
        jnp.asarray(twf.real), jnp.asarray(twf.imag),
        jnp.asarray(f2.real), jnp.asarray(f2.imag),
        jnp.asarray(w2c.real), jnp.asarray(w2c.imag),
        jnp.asarray(tw.real), jnp.asarray(tw.imag),
        jnp.asarray(w1c.real), jnp.asarray(w1c.imag),
    )
    # already frame-major [FPAD, 16, N2]; j = N2*n1 + n2 flattens directly
    return out_pow.reshape(fpad, n), out_bin.reshape(fpad, n)


def _probe(
    fft_size: int, sync_len: int, num_bins: int, wide: bool = False
) -> bool:
    """Compile-and-validate the fused correlator on the live TPU at the
    production geometry (real fft_size/stride/bin count): random replica
    spectra, a strong known echo embedded at a known sample, and the whole
    best-power plane checked against a numpy FFT reference. MXU matmuls run
    bf16-precision by default on this backend, so tolerances are relative
    (~2^-8), but a corrupt lowering fails the peak and plane checks by
    orders of magnitude."""
    if jax.default_backend() != "tpu":
        return False
    n, nb = fft_size, num_bins
    s = n - sync_len + 1
    bf = 16
    fpad = 16
    # exactly fpad frames: frame fpad-1 spans [.., (fpad-1)*s + n) and the
    # shifted B view reads up to (fpad+1)*s <= fpad*s + n = t (since n > s)
    t = fpad * s + n
    rng = np.random.default_rng(11)
    reps = (
        rng.standard_normal((nb, sync_len)) + 1j * rng.standard_normal((nb, sync_len))
    ).astype(np.complex64) / np.sqrt(sync_len)
    rep_pad = np.zeros((nb, n), np.complex64)
    rep_pad[:, :sync_len] = reps
    rf = np.conj(np.fft.fft(rep_pad, axis=-1)).astype(np.complex64)
    x = (
        0.05 * (rng.standard_normal(t) + 1j * rng.standard_normal(t))
    ).astype(np.complex64)
    pos, bin_true = 3 * s + 137, nb // 2
    x[pos : pos + sync_len] += 5.0 * reps[bin_true]
    f = fpad  # the kernel's [fpad, n] output covers exactly fpad frames

    def views(xf):
        return (
            xf[: fpad * s].reshape(fpad, s),
            xf[s : (fpad + 1) * s].reshape(fpad, s),
        )

    ar, br = views(x.real.astype(np.float32))
    ai, bi = views(x.imag.astype(np.float32))
    bp, bb = fused_best_power(
        jnp.asarray(ar), jnp.asarray(ai), jnp.asarray(br), jnp.asarray(bi),
        jnp.asarray(rf.real), jnp.asarray(rf.imag), n, block_frames=bf,
        wide=wide,
    )
    bp = np.asarray(bp)[:f, :s].reshape(-1)
    bb = np.asarray(bb)[:f, :s].reshape(-1)
    # numpy overlap-save reference
    frames = np.stack([x[i * s : i * s + n] for i in range(f)])
    spec = np.fft.fft(frames, axis=-1)
    corr = np.fft.ifft(spec[:, None, :] * rf[None], axis=-1)[..., :s]
    p = np.abs(corr) ** 2  # [F, nb, S]
    ref_bp = p.max(axis=1).reshape(-1)
    ref_bin = p.argmax(axis=1).reshape(-1)
    pk = int(bp.argmax())
    scale = float(ref_bp.max())
    plane_ok = np.abs(bp - ref_bp).max() < 0.05 * scale
    bin_ok = (bb == ref_bin).mean() > 0.9  # noise-floor bins may tie
    return bool(
        plane_ok
        and bin_ok
        and pk == pos
        and bb[pk] == bin_true
        and abs(bp[pk] - ref_bp[pos]) < 0.05 * scale
    )


def fused_enabled(
    fft_size: int, sync_len: int, num_bins: int, wide: bool = False
) -> bool:
    """Whether the fused Pallas correlator is usable on this backend at the
    given geometry (probe-compiled + output-validated once per machine per
    kernel-source version; ``PM_PALLAS_FUSED=1/0`` / ``PM_PALLAS_FUSEDW``
    force the narrow/wide variants)."""
    import sys

    from .pallas_probe import probe_verdict, source_tag

    name = "fusedw" if wide else "fused"
    tag = f"{source_tag(sys.modules[__name__])}_{fft_size}_{sync_len}_{num_bins}"
    return probe_verdict(
        name, tag, lambda: _probe(fft_size, sync_len, num_bins, wide=wide)
    )
