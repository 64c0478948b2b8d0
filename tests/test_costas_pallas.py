"""Pallas Costas kernel vs the lax.scan reference (ops/costas_pallas.py).

The kernel must reproduce the scan recursion exactly (same discriminants,
gains and wrap logic — costas_loop.hpp:113-146) including the positional
PILOT/QPSK-header/QPSK-payload schedule, final loop state handoff, batch
padding and vmap batching. Runs in interpret mode on the CPU backend.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gr4_packet_modem_tpu.ops.costas import costas_run, costas_segments
from gr4_packet_modem_tpu.ops.costas_pallas import costas_track_pallas


def _ref(syms, ph0, fr0, offset):
    cid, k1, k2 = costas_segments(syms.shape[-1], offset=offset)
    return costas_run(syms, ph0, fr0, cid, k1, k2)


@pytest.mark.parametrize(
    "b,s,offset",
    [
        (32, 192, 0),     # header pass shape
        (32, 512, 192),   # payload continuation
        (5, 300, 192),    # batch not a tile multiple
        (160, 192, 0),    # batch wider than one 128-lane tile
        (8, 2600, 192),   # symbols spanning two SYM_BLOCK grid steps
        (200, 4500, 0),   # multi lane-block x multi symbol-block + tail
    ],
)
def test_pallas_matches_scan(b, s, offset):
    rng = np.random.default_rng(b + s)
    syms = (
        rng.standard_normal((b, s)) + 1j * rng.standard_normal((b, s))
    ).astype(np.complex64)
    ph0 = rng.uniform(-np.pi, np.pi, b).astype(np.float32)
    fr0 = rng.uniform(-0.01, 0.01, b).astype(np.float32)
    ref, ph_ref, fr_ref = _ref(jnp.asarray(syms), jnp.asarray(ph0),
                               jnp.asarray(fr0), offset)
    out, ph, fr = costas_track_pallas(
        jnp.asarray(syms), jnp.asarray(ph0), jnp.asarray(fr0),
        offset=offset, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ph), np.asarray(ph_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fr), np.asarray(fr_ref), atol=1e-6)


def test_pallas_vmap_batching():
    """The receiver calls the kernel under jax.vmap over channels."""
    rng = np.random.default_rng(7)
    syms = (
        rng.standard_normal((3, 8, 192)) + 1j * rng.standard_normal((3, 8, 192))
    ).astype(np.complex64)
    ph0 = rng.uniform(-1, 1, (3, 8)).astype(np.float32)
    fr0 = np.zeros((3, 8), np.float32)
    out, ph, fr = jax.vmap(
        lambda s, p, q: costas_track_pallas(s, p, q, offset=0, interpret=True)
    )(jnp.asarray(syms), jnp.asarray(ph0), jnp.asarray(fr0))
    ref, ph_ref, fr_ref = jax.vmap(
        lambda s, p, q: _ref(s, p, q, 0)
    )(jnp.asarray(syms), jnp.asarray(ph0), jnp.asarray(fr0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ph), np.asarray(ph_ref), atol=1e-5)
