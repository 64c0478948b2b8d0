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

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fetch_regions"]


def _kernel(starts_ref, xr_hbm, xi_hbm, outr_ref, outi_ref, semr, semi):
    d = pl.program_id(0)
    s0 = starts_ref[d]
    r = outr_ref.shape[-1]
    cr = pltpu.make_async_copy(
        xr_hbm.at[pl.ds(s0, r)], outr_ref.at[0], semr
    )
    ci = pltpu.make_async_copy(
        xi_hbm.at[pl.ds(s0, r)], outi_ref.at[0], semi
    )
    cr.start()
    ci.start()
    cr.wait()
    ci.wait()


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
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, region_len), lambda i, s: (i, 0)),
            pl.BlockSpec((1, region_len), lambda i, s: (i, 0)),
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((d, region_len), jnp.float32),
            jax.ShapeDtypeStruct((d, region_len), jnp.float32),
        ),
        interpret=interpret,
    )(starts.astype(jnp.int32), xr, xi)
