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
symbols ride the sublanes, and the K-tap accumulation runs as a fori loop
over the tap quotient q = k // sps with the sps phases unrolled inside:

    out[s, d] = sum_k z[sps*s + k, d] * taps[k, d]
              = sum_p sum_q zp[p][s + q, d] * tp[p][q, d]

where zp/tp are the phase-split (k % sps) planes. All dynamic addressing is
``pl.ds`` loads from VMEM refs at dynamic sublane starts — the pattern the
Costas kernel (ops/costas_pallas.py:97-98) already proves on this Mosaic
toolchain. (The round-3 version dynamic-sliced *values* inside the loop,
which Mosaic does not lower — NotImplementedError: dynamic_slice — and a
fully unrolled K-tap loop, 594 vector ops, sent the remote compiler into
the weeds.)

Sample rows arrive as two adjacent ``[sps, SB, 128]`` phase-split blocks of
the transposed region plane (the sliding window spans at most one block
boundary since ceil(K/sps) <= SB), concatenated into a ``[sps, 2*SB, 128]``
VMEM scratch so everything stays resident with no overlapping-block tricks.
~0.5 ms of VPU work at the 512-detection payload shape vs 2.6 ms for the
XLA conv.
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_probe import probe_verdict, source_tag

__all__ = ["matched_filter_pallas", "matched_enabled", "max_taps"]

_SB = 128  # symbols per grid step ([SB, 128] output tile)


def max_taps(sps: int) -> int:
    """Largest tap count the kernel's two-block sliding window supports
    (the receiver gates the backend choice on this, not on a hardcoded
    block size)."""
    return sps * _SB


def _make_kernel(nq: int, sps: int, sb: int):
    def kernel(
        zr_c, zr_n, zi_c, zi_n, taps_ref, or_ref, oi_ref, ws_r, ws_i
    ):
        # assemble the two adjacent phase-split blocks into one scratch
        # window [sps, 2*SB, 128] so the q-loop can slide across the block
        # boundary with plain dynamic-start ref loads
        ws_r[:, :sb, :] = zr_c[:]
        ws_r[:, sb:, :] = zr_n[:]
        ws_i[:, :sb, :] = zi_c[:]
        ws_i[:, sb:, :] = zi_n[:]

        def body(q, acc):
            accr, acci = acc
            for p in range(sps):
                hk = taps_ref[p, pl.ds(q, 1), :]  # [1, 128]
                accr = accr + ws_r[p, pl.ds(q, sb), :] * hk
                acci = acci + ws_i[p, pl.ds(q, sb), :] * hk
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
    if k_taps > max_taps(sps):
        raise ValueError(f"K={k_taps} must be <= sps*{_SB} (window span)")
    nq = -(-k_taps // sps)
    dpad = -(-d // 128) * 128
    ns = -(-num_syms // _SB)
    # per-phase rows: ns blocks of SB plus one lookahead block for the tail
    rows_ps = (ns + 1) * _SB
    rpad = rows_ps * sps

    def pad_ps(a):
        # [D, R] -> [sps, rows_ps, Dpad] phase-split transposed planes:
        # out[p, t, dd] = a[dd, sps*t + p] (zero-padded)
        out = jnp.zeros((rpad, dpad), jnp.float32)
        out = out.at[: min(r, rpad), :d].set(a.T[:rpad])
        return out.reshape(rows_ps, sps, dpad).transpose(1, 0, 2)

    zrp = pad_ps(zr)
    zip_ = pad_ps(zi)
    tp = jnp.zeros((nq * sps, dpad), jnp.float32).at[:k_taps, :d].set(taps.T)
    tp = tp.reshape(nq, sps, dpad).transpose(1, 0, 2)  # [sps, nq, Dpad]

    cur = lambda di, si: (0, si, di)  # noqa: E731
    nxt = lambda di, si: (0, si + 1, di)  # noqa: E731
    tap_blk = lambda di, si: (0, 0, di)  # noqa: E731
    out_blk = lambda di, si: (si, di)  # noqa: E731
    out_r, out_i = pl.pallas_call(
        _make_kernel(nq, sps, _SB),
        grid=(dpad // 128, ns),
        in_specs=[
            pl.BlockSpec((sps, _SB, 128), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((sps, _SB, 128), nxt, memory_space=pltpu.VMEM),
            pl.BlockSpec((sps, _SB, 128), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((sps, _SB, 128), nxt, memory_space=pltpu.VMEM),
            pl.BlockSpec((sps, nq, 128), tap_blk, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_SB, 128), out_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((_SB, 128), out_blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ns * _SB, dpad), jnp.float32),
            jax.ShapeDtypeStruct((ns * _SB, dpad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((sps, 2 * _SB, 128), jnp.float32),
            pltpu.VMEM((sps, 2 * _SB, 128), jnp.float32),
        ],
        interpret=interpret,
    )(zrp, zrp, zip_, zip_, tp)
    return out_r[:num_syms, :d].T, out_i[:num_syms, :d].T


def _probe(sps: int, k_taps: int) -> bool:
    """Compile-and-validate the kernel on the live TPU at a shape with the
    production lowering features: the real tap count (dynamic-start range),
    sps, a multi-step grid in both dims, and distinguishable random data
    checked against a host sliding-window reference."""
    if jax.default_backend() != "tpu":
        return False
    d, num_syms = 256, 2 * _SB
    r = sps * (num_syms - 1) + k_taps
    rng = np.random.default_rng(42)
    zr = rng.standard_normal((d, r), dtype=np.float32)
    zi = rng.standard_normal((d, r), dtype=np.float32)
    taps = rng.standard_normal((d, k_taps), dtype=np.float32)
    outr, outi = matched_filter_pallas(
        jnp.asarray(zr), jnp.asarray(zi), jnp.asarray(taps), sps, num_syms
    )
    outr, outi = np.asarray(outr), np.asarray(outi)
    win = np.lib.stride_tricks.sliding_window_view(zr, k_taps, axis=1)
    refr = np.einsum("dsk,dk->ds", win[:, :: sps][:, :num_syms], taps)
    win_i = np.lib.stride_tricks.sliding_window_view(zi, k_taps, axis=1)
    refi = np.einsum("dsk,dk->ds", win_i[:, :: sps][:, :num_syms], taps)
    tol = 1e-3 * np.sqrt(k_taps)
    return bool(
        np.allclose(outr, refr, atol=tol) and np.allclose(outi, refi, atol=tol)
    )


def matched_enabled(sps: int, k_taps: int) -> bool:
    """Whether the depthwise Pallas matched filter is usable on this backend
    at the given geometry. Probe-compiled once per machine per kernel-source
    version (``PM_PALLAS_MATCHED=1/0`` forces)."""
    if k_taps > max_taps(sps):
        return False
    tag = f"{source_tag(sys.modules[__name__])}_{sps}_{k_taps}"
    return probe_verdict("matched", tag, lambda: _probe(sps, k_taps))


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
