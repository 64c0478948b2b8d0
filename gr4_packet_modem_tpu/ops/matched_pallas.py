"""Pallas depthwise matched filter: per-detection polyphase-arm filtering.

The receiver's symbol extraction filters each detection's sample region with
that detection's own PFB arm taps and decimates by sps
(symbol_filter.hpp:208-238, vectorized over detections). As an XLA
convolution this is a feature_group_count=2D depthwise conv — which this
backend lowers catastrophically: ~2.6-3 ms per call at bench shapes almost
independent of region size, the dominant cost of BOTH decode passes
(docs/PERF_R3.md round-3b; an "all 32 arms on the MXU + one-hot select"
normal conv measured no better and compiled for 343 s).

This kernel does the literal depthwise work on the VPU at full lane
utilization: detections ride the 128 lanes (each lane with its own taps),
symbols ride the sublanes, and the K-tap accumulation unrolls over
statically-sliced views of the strided sample window:

    out[s, d] = sum_k z[sps*s + k, d] * taps[k, d]

Sample rows arrive as two adjacent ``[sps*SB, 128]`` blocks of the
transposed region plane (the sliding window spans at most one block
boundary since K-1 <= sps*SB), so everything stays in VMEM with no
overlapping-block tricks. ~0.5 ms of VPU work at the 512-detection payload
shape vs 2.6 ms for the XLA conv.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["matched_filter_pallas"]

_SB = 128  # symbols per grid step ([SB, 128] output tile)


def _make_kernel(k_taps: int, sps: int, sb: int):
    rb = sps * sb

    def kernel(zr_c, zr_n, zi_c, zi_n, taps_ref, or_ref, oi_ref):
        wr = jnp.concatenate([zr_c[:], zr_n[:]], axis=0)  # [2*RB, 128]
        wi = jnp.concatenate([zi_c[:], zi_n[:]], axis=0)
        # strided window view: row sps*s + k = w4[s + k//sps, k%sps]
        w4r = wr.reshape(2 * rb // sps, sps, 128)
        w4i = wi.reshape(2 * rb // sps, sps, 128)
        nq = -(-k_taps // sps)

        # fori over the tap quotient with the sps phases unrolled inside:
        # a fully unrolled K-tap loop (594 vector ops) sent the remote
        # Mosaic compiler into the weeds
        def body(q, acc):
            accr, acci = acc
            for p in range(sps):
                k = q * sps + p
                hk = jax.lax.dynamic_slice(taps_ref[:], (k, 0), (1, 128))
                hk = jnp.where(k < k_taps, hk, 0.0)
                br = jax.lax.dynamic_slice(w4r, (q, p, 0), (sb, 1, 128))
                bi = jax.lax.dynamic_slice(w4i, (q, p, 0), (sb, 1, 128))
                accr = accr + br[:, 0, :] * hk
                acci = acci + bi[:, 0, :] * hk
            return accr, acci

        accr = jnp.zeros((sb, 128), jnp.float32)
        acci = jnp.zeros((sb, 128), jnp.float32)
        accr, acci = jax.lax.fori_loop(0, nq, body, (accr, acci))
        or_ref[:] = accr
        oi_ref[:] = acci

    return kernel


@partial(jax.jit, static_argnames=("sps", "num_syms", "interpret"))
def matched_filter_pallas(
    zr: jax.Array,
    zi: jax.Array,
    taps: jax.Array,
    sps: int,
    num_syms: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Filter+decimate each detection's region with its own taps.

    zr/zi: f32 ``[D, R]`` (derotated region I/Q planes);
    taps: f32 ``[D, K]`` time-reversed taps (correlation form:
    ``out[d, s] = sum_k z[d, sps*s + k] * taps[d, k]``).
    Returns ``(out_r, out_i)`` f32 ``[D, num_syms]``.
    """
    d, r = zr.shape
    k_taps = taps.shape[1]
    rb = sps * _SB
    if k_taps - 1 > rb:
        raise ValueError(f"K={k_taps} must be <= sps*{_SB}+1 (window span)")
    dpad = -(-d // 128) * 128
    ns = -(-num_syms // _SB)
    # rows: ns blocks of RB plus one lookahead block for the window tail
    rpad = (ns + 1) * rb

    def padT(a, rows):
        # [D, R] -> [rows, Dpad] transposed + zero-padded
        out = jnp.zeros((rows, dpad), jnp.float32)
        return out.at[: min(r, rows), :d].set(a.T[:rows])

    zrt = padT(zr, rpad)
    zit = padT(zi, rpad)
    tp = jnp.zeros((k_taps, dpad), jnp.float32).at[:, :d].set(taps.T)

    cur = lambda di, si: (si, di)  # noqa: E731
    nxt = lambda di, si: (si + 1, di)  # noqa: E731
    tap_blk = lambda di, si: (0, di)  # noqa: E731
    out_blk = lambda di, si: (si, di)  # noqa: E731
    out_r, out_i = pl.pallas_call(
        _make_kernel(k_taps, sps, _SB),
        grid=(dpad // 128, ns),
        in_specs=[
            pl.BlockSpec((rb, 128), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 128), nxt, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 128), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 128), nxt, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_taps, 128), tap_blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_SB, 128), out_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((_SB, 128), out_blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ns * _SB, dpad), jnp.float32),
            jax.ShapeDtypeStruct((ns * _SB, dpad), jnp.float32),
        ),
        interpret=interpret,
    )(zrt, zrt, zit, zit, tp)
    return out_r[:num_syms, :d].T, out_i[:num_syms, :d].T


def matched_filter_reference(
    zr: np.ndarray, zi: np.ndarray, taps: np.ndarray, sps: int, num_syms: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sequential host oracle for the kernel contract tests."""
    d = zr.shape[0]
    k = taps.shape[1]
    outr = np.zeros((d, num_syms), np.float32)
    outi = np.zeros((d, num_syms), np.float32)
    for di in range(d):
        for s in range(num_syms):
            lo = sps * s
            if lo + k <= zr.shape[1]:
                outr[di, s] = np.dot(zr[di, lo : lo + k], taps[di])
                outi[di, s] = np.dot(zi[di, lo : lo + k], taps[di])
            else:
                n = max(0, zr.shape[1] - lo)
                outr[di, s] = np.dot(zr[di, lo : lo + n], taps[di, :n])
                outi[di, s] = np.dot(zi[di, lo : lo + n], taps[di, :n])
    return outr, outi
