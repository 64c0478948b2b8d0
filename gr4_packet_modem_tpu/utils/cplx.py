"""Complex-array helpers for TPU-safe indexing.

The TPU backend does not implement gather on complex64 operands (dynamic
slices are fine, gathers are not), so every data-dependent complex indexing
site routes through these helpers, which gather the real and imaginary planes
separately and recombine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ctake", "cgather"]


def ctake(a: jax.Array, indices, axis: int = 0) -> jax.Array:
    """``jnp.take`` that is safe for complex arrays on TPU."""
    if jnp.iscomplexobj(a):
        return jax.lax.complex(
            jnp.take(a.real, indices, axis=axis),
            jnp.take(a.imag, indices, axis=axis),
        )
    return jnp.take(a, indices, axis=axis)


def cgather(a: jax.Array, *idx) -> jax.Array:
    """``a[idx...]`` advanced indexing, safe for complex arrays on TPU."""
    if jnp.iscomplexobj(a):
        return jax.lax.complex(a.real[idx], a.imag[idx])
    return a[idx]
