"""Pallas batched region fetch: gather D dynamic sample windows by DMA.

Per-detection symbol extraction needs ``D`` contiguous regions
``x[start_d : start_d + R]`` whose starts are data-dependent (computed from
the acquisition output inside the same program). As vmapped
``lax.dynamic_slice`` ops each slice pays a vector->scalar readback stall on
this backend, which dominates both decode passes. This kernel makes the
starts a *scalar-prefetch* operand (one readback for the whole [D] array
into SMEM) and fetches ``_BATCH`` regions per grid step — all of a step's
HBM->VMEM DMAs are in flight before its first wait, so they overlap each
other and the extracts (one region per step measured ~4.5 us of DMA-wait
stall each, round 5).

Alignment: Mosaic requires HBM slice indices/shapes to be *provably*
divisible by the source tiling (1024 for 1-D f32; 8 rows for a [.., 128]
2-D view) — arbitrary dynamic starts are rejected at compile time ("Failed
to prove that a tile index ... is divisible"). The kernel therefore views
the samples as ``[T/128, 128]``, DMAs the enclosing window at row
``(s0 // 1024) * 8`` (divisible by construction), and extracts the
residual offset with exact one-hot selection matmuls (row shift + lane
shift with carry). The selections run at ``Precision.HIGHEST``: the MXU's
default bf16 multiply corrupts f32 sample values even against an exact
one-hot (measured: 517 -> 516).

The caller clips starts to [0, T - R]; derotation/filtering stay in XLA
(they are fast once the regions are materialized).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_probe import probe_verdict, source_tag

__all__ = ["fetch_regions", "fetch_rows", "fetch_enabled"]


def _probe() -> bool:
    """Compile-and-VALIDATE the fetch kernel once on the live backend, at a
    *representative* shape: an unaligned region length (the receiver fetches
    297-tap syncword windows -> rpad 384) and odd dynamic starts. Mosaic
    toolchains differ in what they accept (the r2-era chipless AOT compiler
    rejected make_async_copy outright), so the fetched windows are checked
    against the expected slices of distinguishable (arange) data — a
    toolchain that silently clamps or misaligns the DMA, or a lowering that
    loses sample bits, must fail the probe, not corrupt every later
    extraction (advisor r3)."""
    import numpy as np

    if jax.default_backend() != "tpu":
        return False
    # small geometry: the 297-tap syncword refinement windows
    x = np.arange(8192, dtype=np.float32)
    starts = np.asarray([3, 517, 1023, 4099], np.int32)
    out = np.asarray(
        fetch_rows(jnp.asarray(x), jnp.asarray(starts), 297)
    )
    expect = np.stack([x[s : s + 297] for s in starts])
    ok1 = bool((out == expect).all())
    outr, outi = fetch_regions(
        jnp.asarray(x), jnp.asarray(-x), jnp.asarray(starts), 297
    )
    ok2 = bool(
        (np.asarray(outr) == expect).all()
        and (np.asarray(outi) == -expect).all()
    )
    # production-payload geometry: the symbol-extraction regions reach
    # sps*(chunk-1)+arm_len ~ 24.7k samples (receiver._extract_symbols) —
    # an order of magnitude more VMEM scratch per grid step than the small
    # shape, so it must be probed separately (round-3 lesson: probes at
    # non-production shapes lie)
    rl = 24676
    x2 = np.arange(32768, dtype=np.float32)
    starts2 = np.asarray([5, 1023, 32768 - rl], np.int32)
    outr2, outi2 = fetch_regions(
        jnp.asarray(x2), jnp.asarray(-x2), jnp.asarray(starts2), rl
    )
    expect2 = np.stack([x2[s : s + rl] for s in starts2])
    ok3 = bool(
        (np.asarray(outr2) == expect2).all()
        and (np.asarray(outi2) == -expect2).all()
    )
    # candidate-local noise-window geometry (2*time_threshold + 33 taps —
    # ops/acquire.py round-5 noise estimator)
    rl3 = 1569
    starts3 = np.asarray([0, 7, 2049, 8192 - rl3], np.int32)
    outr3, _ = fetch_regions(
        jnp.asarray(x), jnp.asarray(-x), jnp.asarray(starts3), rl3
    )
    expect3 = np.stack([x[s : s + rl3] for s in starts3])
    ok4 = bool((np.asarray(outr3) == expect3).all())
    return ok1 and ok2 and ok3 and ok4


def fetch_enabled() -> bool:
    """Whether the scalar-prefetch DMA fetch path is usable on this backend.

    ``PM_PALLAS_FETCH=1/0`` forces the verdict; otherwise the kernel is
    probe-compiled and output-validated once per machine per kernel-source
    version (verdict cached in-process and in ``/tmp/pm_probe_fetch_*``), so
    deployments with a working Mosaic compiler get the fast path
    automatically."""
    return probe_verdict("fetch", source_tag(sys.modules[__name__]), _probe)


_HI = jax.lax.Precision.HIGHEST  # exact f32 one-hot selection (see module doc)


def _extract(w, s0, rpr: int):
    """Select rows ``[off : off + rpr*128)`` (flattened) from the aligned
    window ``w [WR, 128]``, where ``off = s0 % 1024``: a row-shift one-hot
    matmul then a lane shift with cross-row carry. Returns ``[rpr, 128]``."""
    wr = w.shape[0]
    off = s0 - (s0 // 1024) * 1024
    sub = off // 128
    r = off - sub * 128
    # row shift: v[t] = w[t + sub]
    t = jax.lax.broadcasted_iota(jnp.int32, (rpr + 1, wr), 0)
    u = jax.lax.broadcasted_iota(jnp.int32, (rpr + 1, wr), 1)
    m1 = (u == t + sub).astype(jnp.float32)
    v = jnp.dot(m1, w, preferred_element_type=jnp.float32, precision=_HI)
    # lane shift: out[t, b] = v[t, b+r] (b+r < 128) else v[t+1, b+r-128]
    a = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    rm = (a == b + r).astype(jnp.float32)
    rc = (a == b + r - 128).astype(jnp.float32)
    return jnp.dot(
        v[:rpr], rm, preferred_element_type=jnp.float32, precision=_HI
    ) + jnp.dot(
        v[1:], rc, preferred_element_type=jnp.float32, precision=_HI
    )


import os as _os

_BATCH = int(_os.environ.get("PM_FETCH_BATCH", "4"))
# regions per grid step: their DMAs are all in flight before the first
# wait (each overlaps the previous region's extract), and the per-step
# grid overhead amortizes — one region per step measured ~4.5 us each, a
# DMA-wait stall per step (round 5). PM_FETCH_BATCH overrides for A/Bs
# (read at import; the /tmp probe verdict is batch-agnostic).


def _kernel(starts_ref, xr_hbm, xi_hbm, outr_ref, outi_ref, semr, semi,
            wr_scr, wi_scr):
    d = pl.program_id(0)
    g, wr = wr_scr.shape[0], wr_scr.shape[1]
    rpr = outr_ref.shape[-2]

    def copies(j):
        s0 = starts_ref[d * g + j]
        row0 = (s0 // 1024) * 8  # divisible by 8 by construction
        cr = pltpu.make_async_copy(
            xr_hbm.at[pl.ds(row0, wr)], wr_scr.at[j], semr.at[j]
        )
        ci = pltpu.make_async_copy(
            xi_hbm.at[pl.ds(row0, wr)], wi_scr.at[j], semi.at[j]
        )
        return s0, cr, ci

    for j in range(g):
        _, cr, ci = copies(j)
        cr.start()
        ci.start()
    for j in range(g):
        s0, cr, ci = copies(j)
        cr.wait()
        ci.wait()
        outr_ref[j] = _extract(wr_scr[j], s0, rpr)
        outi_ref[j] = _extract(wi_scr[j], s0, rpr)


def _kernel1(starts_ref, x_hbm, out_ref, sem, w_scr):
    d = pl.program_id(0)
    g, wr = w_scr.shape[0], w_scr.shape[1]
    rpr = out_ref.shape[-2]

    def copy(j):
        s0 = starts_ref[d * g + j]
        row0 = (s0 // 1024) * 8
        return s0, pltpu.make_async_copy(
            x_hbm.at[pl.ds(row0, wr)], w_scr.at[j], sem.at[j]
        )

    for j in range(g):
        copy(j)[1].start()
    for j in range(g):
        s0, c = copy(j)
        c.wait()
        out_ref[j] = _extract(w_scr[j], s0, rpr)


def _geometry(t: int, region_len: int) -> tuple[int, int, int]:
    """(rpad, wsize, t2): padded region, aligned DMA window covering any
    ``off < 1024`` plus the region, and the padded sample length that keeps
    every window in bounds (starts are caller-clipped to T - region_len, so
    bases reach at most T - region_len rounded down; t2 >= that + wsize)."""
    rpad = -(-region_len // 128) * 128
    wsize = 1024 * (-(-(1023 + rpad) // 1024))
    t2 = -(-t // 1024) * 1024 + wsize
    return rpad, wsize, t2


def _pad_starts(starts: jax.Array, d: int, g: int) -> tuple[jax.Array, int]:
    dpad = -(-d // g) * g
    s = starts.astype(jnp.int32)
    if dpad != d:
        s = jnp.concatenate([s, jnp.zeros(dpad - d, jnp.int32)])
    return s, dpad


def _fetch_rows_impl(
    x: jax.Array, starts: jax.Array, region_len: int, interpret: bool
) -> jax.Array:
    d = starts.shape[0]
    g = _BATCH
    rpad, wsize, t2 = _geometry(x.shape[0], region_len)
    x = jnp.concatenate([x, jnp.zeros(t2 - x.shape[0], x.dtype)])
    x2 = x.reshape(t2 // 128, 128)
    starts_p, dpad = _pad_starts(starts, d, g)
    out = pl.pallas_call(
        _kernel1,
        grid=(dpad // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((g, rpad // 128, 128), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((g,)),
            pltpu.VMEM((g, wsize // 128, 128), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((dpad, rpad // 128, 128), jnp.float32),
        interpret=interpret,
    )(starts_p, x2)
    return out.reshape(dpad, rpad)[:d, :region_len]


def fetch_rows(
    x: jax.Array,
    starts: jax.Array,
    region_len: int,
    interpret: bool = False,
) -> jax.Array:
    """Single-plane variant of :func:`fetch_regions` (one DMA per window).

    vmap-safe: Pallas auto-batching cannot batch the SMEM scalar-prefetch
    operand, so a custom batching rule flattens a batched call (e.g. the
    per-channel vmap in the receiver bank) into ONE flat-grid kernel over the
    row-major-flattened sample plane — exactly the lane-packed form the
    kernel wants anyway."""

    @jax.custom_batching.custom_vmap
    def _f(x, starts):
        return _fetch_rows_impl(x, starts, region_len, interpret)

    @_f.def_vmap
    def _rule(axis_size, in_batched, x, starts):  # noqa: ANN001
        xb, sb = in_batched
        if not sb:  # same windows from every row: broadcast the starts
            starts_b = jnp.broadcast_to(starts, (axis_size,) + starts.shape)
        else:
            starts_b = starts
        dd = starts_b.shape[-1]
        if xb:
            t = x.shape[-1]
            xf = x.reshape(-1)
            # per-row clipped starts address the flattened plane; the padded
            # fetch tail may cross into the next row but only within the
            # discarded [region_len, rpad) part
            off = (jnp.arange(axis_size, dtype=jnp.int32) * t)[:, None]
            sf = (starts_b.astype(jnp.int32) + off).reshape(-1)
        else:
            xf = x
            sf = starts_b.reshape(-1)
        out = _f(xf, sf)
        return out.reshape(axis_size, dd, region_len), True

    return _f(x, starts)


def _fetch_regions_impl(
    xr: jax.Array,
    xi: jax.Array,
    starts: jax.Array,
    region_len: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    d = starts.shape[0]
    g = _BATCH
    rpad, wsize, t2 = _geometry(xr.shape[0], region_len)
    ext = jnp.zeros(t2 - xr.shape[0], xr.dtype)
    x2r = jnp.concatenate([xr, ext]).reshape(t2 // 128, 128)
    x2i = jnp.concatenate([xi, ext]).reshape(t2 // 128, 128)
    starts_p, dpad = _pad_starts(starts, d, g)
    out_spec = pl.BlockSpec((g, rpad // 128, 128), lambda i: (i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((dpad, rpad // 128, 128), jnp.float32)
    outr, outi = pl.pallas_call(
        _kernel,
        grid=(dpad // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((g,)),
            pltpu.SemaphoreType.DMA((g,)),
            pltpu.VMEM((g, wsize // 128, 128), jnp.float32),
            pltpu.VMEM((g, wsize // 128, 128), jnp.float32),
        ],
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(starts_p, x2r, x2i)
    return (
        outr.reshape(dpad, rpad)[:d, :region_len],
        outi.reshape(dpad, rpad)[:d, :region_len],
    )


def fetch_regions(
    xr: jax.Array,
    xi: jax.Array,
    starts: jax.Array,
    region_len: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fetch ``[D, region_len]`` I/Q planes at ``starts`` (int32 ``[D]``,
    pre-clipped to ``[0, T - region_len]``).

    vmap-safe via the same flat-grid batching rule as :func:`fetch_rows`."""

    @jax.custom_batching.custom_vmap
    def _f(xr, xi, starts):
        return _fetch_regions_impl(xr, xi, starts, region_len, interpret)

    @_f.def_vmap
    def _rule(axis_size, in_batched, xr, xi, starts):  # noqa: ANN001
        xrb, xib, sb = in_batched
        assert xrb == xib, "I/Q planes must be batched together"
        if not sb:
            starts_b = jnp.broadcast_to(starts, (axis_size,) + starts.shape)
        else:
            starts_b = starts
        dd = starts_b.shape[-1]
        if xrb:
            t = xr.shape[-1]
            xrf, xif = xr.reshape(-1), xi.reshape(-1)
            off = (jnp.arange(axis_size, dtype=jnp.int32) * t)[:, None]
            sf = (starts_b.astype(jnp.int32) + off).reshape(-1)
        else:
            xrf, xif = xr, xi
            sf = starts_b.reshape(-1)
        outr, outi = _f(xrf, xif, sf)
        shp = (axis_size, dd, region_len)
        return (outr.reshape(shp), outi.reshape(shp)), (True, True)

    return _f(xr, xi, starts)
