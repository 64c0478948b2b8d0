"""Depthwise matched-filter kernel (ops/matched_pallas.py), interpret mode:
bit-level contract vs a sequential host oracle and vs the XLA grouped-conv
formulation it replaces on TPU."""

import numpy as np

import jax
import jax.numpy as jnp

from gr4_packet_modem_tpu.ops.matched_pallas import (
    matched_filter_pallas,
    matched_filter_reference,
)


def _rand(d, r, k, seed=0):
    rng = np.random.default_rng(seed)
    zr = rng.standard_normal((d, r)).astype(np.float32)
    zi = rng.standard_normal((d, r)).astype(np.float32)
    taps = rng.standard_normal((d, k)).astype(np.float32)
    return zr, zi, taps


def test_matches_reference_oracle():
    d, k, sps, s = 5, 297, 4, 50
    r = sps * (s - 1) + k
    zr, zi, taps = _rand(d, r, k)
    outr, outi = matched_filter_pallas(
        jnp.asarray(zr), jnp.asarray(zi), jnp.asarray(taps), sps, s,
        interpret=True,
    )
    refr, refi = matched_filter_reference(zr, zi, taps, sps, s)
    np.testing.assert_allclose(np.asarray(outr), refr, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(outi), refi, rtol=1e-5, atol=1e-4)


def test_matches_grouped_conv():
    # the exact formulation _extract_symbols used on the conv path
    d, k, sps, s = 12, 297, 4, 300
    r = sps * (s - 1) + k
    zr, zi, taps = _rand(d, r, k, seed=1)
    kern = np.tile(taps.T[:, None, :], (1, 1, 2)).astype(np.float32)
    inp = np.concatenate([zr, zi], axis=0).T[None]
    out = jax.lax.conv_general_dilated(
        jnp.asarray(inp), jnp.asarray(kern), window_strides=(sps,),
        padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=2 * d, preferred_element_type=jnp.float32,
    )[0]
    refr, refi = np.asarray(out[:, :d]).T, np.asarray(out[:, d:]).T
    outr, outi = matched_filter_pallas(
        jnp.asarray(zr), jnp.asarray(zi), jnp.asarray(taps), sps, s,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(outr), refr, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(outi), refi, rtol=1e-5, atol=1e-4)


def test_multi_lane_and_symbol_blocks():
    # > 128 detections (2 lane blocks) and > 128 symbols (3 symbol blocks)
    d, k, sps, s = 130, 33, 4, 260
    r = sps * (s - 1) + k
    zr, zi, taps = _rand(d, r, k, seed=2)
    outr, outi = matched_filter_pallas(
        jnp.asarray(zr), jnp.asarray(zi), jnp.asarray(taps), sps, s,
        interpret=True,
    )
    refr, refi = matched_filter_reference(zr, zi, taps, sps, s)
    np.testing.assert_allclose(np.asarray(outr), refr, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(outi), refi, rtol=1e-5, atol=1e-4)
