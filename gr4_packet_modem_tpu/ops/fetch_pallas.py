"""Pallas batched region fetch: gather D dynamic sample windows by DMA.

Per-detection symbol extraction needs ``D`` contiguous regions
``x[start_d : start_d + R]`` whose starts are data-dependent (computed from
the acquisition output inside the same program). As vmapped
``lax.dynamic_slice`` ops each slice pays a vector->scalar readback stall on
this backend, which dominates both decode passes. This kernel makes the
starts a *scalar-prefetch* operand (one readback for the whole [D] array
into SMEM) and issues one HBM->VMEM DMA per grid step.

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

__all__ = ["fetch_regions", "fetch_enabled"]


def _probe() -> bool:
    """Compile-and-VALIDATE the fetch kernel once on the live backend, at a
    *representative* shape: an unaligned region length (the receiver fetches
    297-tap syncword windows -> rpad 384) and odd dynamic starts. Mosaic
    toolchains differ in what they accept — the r2-era chipless AOT compiler
    rejected make_async_copy outright, while the current one compiles the
    kernel but requires HBM->VMEM slice shapes aligned to the source tiling
    (1024 for a 1-D f32 memref), which arbitrary-start sample windows cannot
    satisfy. Probing a tiny aligned shape would report capability the
    production shapes don't have (that bug shipped briefly in round 3), so
    the probe mirrors production. The fetched windows are checked against
    the expected slices of distinguishable (arange) data — a toolchain that
    silently clamps or misaligns the DMA must fail the probe, not corrupt
    every later extraction (advisor r3)."""
    import numpy as np

    if jax.default_backend() != "tpu":
        return False
    x = np.arange(8192, dtype=np.float32)
    starts = np.asarray([3, 517, 4099], np.int32)
    out = np.asarray(
        fetch_rows(jnp.asarray(x), jnp.asarray(starts), 297)
    )
    expect = np.stack([x[s : s + 297] for s in starts])
    return bool((out == expect).all())


def fetch_enabled() -> bool:
    """Whether the scalar-prefetch DMA fetch path is usable on this backend.

    ``PM_PALLAS_FETCH=1/0`` forces the verdict; otherwise the kernel is
    probe-compiled and output-validated once per machine per kernel-source
    version (verdict cached in-process and in ``/tmp/pm_probe_fetch_*``), so
    deployments with a working Mosaic compiler get the fast path
    automatically."""
    return probe_verdict("fetch", source_tag(sys.modules[__name__]), _probe)


def _kernel(starts_ref, xr_hbm, xi_hbm, outr_ref, outi_ref, semr, semi):
    d = pl.program_id(0)
    s0 = starts_ref[d]
    r = outr_ref.shape[-1]
    cr = pltpu.make_async_copy(
        xr_hbm.at[pl.ds(s0, r)], outr_ref.at[0, 0], semr
    )
    ci = pltpu.make_async_copy(
        xi_hbm.at[pl.ds(s0, r)], outi_ref.at[0, 0], semi
    )
    cr.start()
    ci.start()
    cr.wait()
    ci.wait()


def _kernel1(starts_ref, x_hbm, out_ref, sem):
    d = pl.program_id(0)
    s0 = starts_ref[d]
    r = out_ref.shape[-1]
    c = pltpu.make_async_copy(x_hbm.at[pl.ds(s0, r)], out_ref.at[0, 0], sem)
    c.start()
    c.wait()


def _fetch_rows_impl(
    x: jax.Array, starts: jax.Array, region_len: int, interpret: bool
) -> jax.Array:
    d = starts.shape[0]
    rpad = -(-region_len // 128) * 128
    if rpad != region_len:
        x = jnp.concatenate([x, jnp.zeros(rpad - region_len, x.dtype)])
    out = pl.pallas_call(
        _kernel1,
        grid=(d,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, rpad), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct((d, 1, rpad), jnp.float32),
        interpret=interpret,
    )(starts.astype(jnp.int32), x)
    return out[:, 0, :region_len]


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
    # TPU blocks need a 128-divisible trailing dim; regions are padded and
    # the input extended so the padded tail never reads out of bounds
    rpad = -(-region_len // 128) * 128
    if rpad != region_len:
        ext = jnp.zeros(rpad - region_len, xr.dtype)
        xr = jnp.concatenate([xr, ext])
        xi = jnp.concatenate([xi, ext])
    outr, outi = pl.pallas_call(
        _kernel,
        grid=(d,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, rpad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, rpad), lambda i: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((d, 1, rpad), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, rpad), jnp.float32),
        ),
        interpret=interpret,
    )(starts.astype(jnp.int32), xr, xi)
    return outr[:, 0, :region_len], outi[:, 0, :region_len]


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
