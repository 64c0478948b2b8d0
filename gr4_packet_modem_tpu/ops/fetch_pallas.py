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

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fetch_regions", "fetch_enabled"]


def fetch_enabled() -> bool:
    """Manual-DMA kernels cannot be built by this environment's *chipless*
    remote AOT compiler (tpu_compile_helper exits 1 on make_async_copy
    kernels), so the fetch path is opt-in: set PM_PALLAS_FETCH=1 on
    deployments whose compiler has device context."""
    return os.environ.get("PM_PALLAS_FETCH", "0") == "1"


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


@partial(jax.jit, static_argnames=("region_len", "interpret"))
def fetch_rows(
    x: jax.Array,
    starts: jax.Array,
    region_len: int,
    interpret: bool = False,
) -> jax.Array:
    """Single-plane variant of :func:`fetch_regions` (one DMA per window)."""
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


@partial(jax.jit, static_argnames=("region_len", "interpret"))
def fetch_regions(
    xr: jax.Array,
    xi: jax.Array,
    starts: jax.Array,
    region_len: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fetch ``[D, region_len]`` I/Q planes at ``starts`` (int32 ``[D]``,
    pre-clipped to ``[0, T - region_len]``)."""
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
