"""DMA region-fetch kernel (ops/fetch_pallas.py), interpret mode.

On TPU the kernel is probe-enabled at runtime (fetch_enabled tries one
compile and caches the verdict — toolchains without device context reject
make_async_copy kernels). Its correctness contract, including the
custom_vmap batching rule the receiver bank relies on, is pinned here in
interpret mode so every deployment exercises the same code path.
"""

import numpy as np

import jax
import jax.numpy as jnp

from gr4_packet_modem_tpu.ops.fetch_pallas import fetch_regions


def test_fetch_regions_matches_slices():
    rng = np.random.default_rng(0)
    t, d, r = 50000, 16, 809  # r not a multiple of 128 (pad path)
    x = (rng.standard_normal(t) + 1j * rng.standard_normal(t)).astype(
        np.complex64
    )
    starts = rng.integers(0, t - r, d).astype(np.int32)
    fr, fi = fetch_regions(
        jnp.asarray(x.real), jnp.asarray(x.imag), jnp.asarray(starts), r,
        interpret=True,
    )
    ref = np.stack([x[s : s + r] for s in starts])
    np.testing.assert_array_equal(np.asarray(fr), ref.real)
    np.testing.assert_array_equal(np.asarray(fi), ref.imag)


def test_fetch_regions_vmap():
    rng = np.random.default_rng(1)
    c, t, d, r = 3, 20000, 4, 512
    x = rng.standard_normal((c, t)).astype(np.float32)
    starts = rng.integers(0, t - r, (c, d)).astype(np.int32)
    fr, _ = jax.vmap(
        lambda xr, s: fetch_regions(xr, xr, s, r, interpret=True)
    )(jnp.asarray(x), jnp.asarray(starts))
    ref = np.stack([[x[i, s : s + r] for s in starts[i]] for i in range(c)])
    np.testing.assert_array_equal(np.asarray(fr), ref)


def test_fetch_rows_vmap_shared_x():
    # batched starts over a SHARED sample plane (in_batched = (False, True))
    rng = np.random.default_rng(3)
    c, t, d, r = 4, 20000, 5, 384
    x = rng.standard_normal(t).astype(np.float32)
    starts = rng.integers(0, t - r, (c, d)).astype(np.int32)
    from gr4_packet_modem_tpu.ops.fetch_pallas import fetch_rows

    out = jax.vmap(
        lambda s: fetch_rows(jnp.asarray(x), s, r, interpret=True)
    )(jnp.asarray(starts))
    ref = np.stack([[x[s : s + r] for s in starts[i]] for i in range(c)])
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_fetch_rows_vmap_jit_last_row_edge():
    # jit(vmap(...)) with a window ending exactly at the last row's end: the
    # padded tail must read the kernel's zero extension, not out of bounds
    rng = np.random.default_rng(4)
    c, t, d, r = 3, 4096, 2, 300
    x = rng.standard_normal((c, t)).astype(np.float32)
    starts = np.tile([0, t - r], (c, 1)).astype(np.int32)
    from gr4_packet_modem_tpu.ops.fetch_pallas import fetch_rows

    fn = jax.jit(
        jax.vmap(lambda xr, s: fetch_rows(xr, s, r, interpret=True))
    )
    out = fn(jnp.asarray(x), jnp.asarray(starts))
    ref = np.stack([[x[i, s : s + r] for s in starts[i]] for i in range(c)])
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_fetch_rows_single_plane():
    rng = np.random.default_rng(2)
    t, d, r = 30000, 8, 1537
    x = rng.standard_normal(t).astype(np.float32)
    starts = rng.integers(0, t - r, d).astype(np.int32)
    from gr4_packet_modem_tpu.ops.fetch_pallas import fetch_rows

    out = fetch_rows(jnp.asarray(x), jnp.asarray(starts), r, interpret=True)
    ref = np.stack([x[s : s + r] for s in starts])
    np.testing.assert_array_equal(np.asarray(out), ref)
