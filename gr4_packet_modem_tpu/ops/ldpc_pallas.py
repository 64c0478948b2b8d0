"""Pallas TPU kernel for the (128,32) header LDPC BP decoder.

The XLA decoder (ops/ldpc.py) runs 25 flooding iterations as a ``lax.scan``
whose per-iteration tensors are tiny ([B,96,5] messages, [B,480]x[480,128]
matmuls) — on this backend each iteration pays dispatch/latency far exceeding
its arithmetic. This kernel runs all iterations inside one Pallas program
with everything VMEM-resident.

Layout: check-to-variable messages as five [B, 128] planes (one per check
slot, the 96 checks in lanes padded to 128; check degree <= 5,
header_fec_decoder.hpp alist). Per iteration:

- variable totals: five [B,128] @ [128,128] MXU matmuls against padded
  scatter matrices S_d[c, v] = (vidx[c,d] == v) * mask[c,d]
- edge gather: five matmuls against G_d = S_d^T (mask applied via the
  magnitude/sign masking, matching the XLA decoder)
- normalized-min-sum check update: sign product and two smallest magnitudes
  accumulated elementwise across the five planes (no cross-lane ops)

The final variable totals are returned; hard decision and the H-syndrome
check stay in XLA (two trivial ops).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


__all__ = ["ldpc_totals_pallas", "ldpc_enabled"]

_INF = np.float32(3.0e38)


@lru_cache(maxsize=1)
def _tables() -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    from .ldpc import load_parity_check

    h = load_parity_check()
    m, n = h.shape  # 96, 128
    deg = int(h.sum(axis=1).max())
    mpad = 128
    scat = np.zeros((deg, mpad, n), np.float32)  # S_d[c, v]
    mask = np.zeros((deg, 1, mpad), np.float32)
    for c in range(m):
        vs = np.nonzero(h[c])[0]
        for d, v in enumerate(vs):
            scat[d, c, v] = 1.0
            mask[d, 0, c] = 1.0
    gath = np.ascontiguousarray(np.transpose(scat, (0, 2, 1)))  # G_d[v, c]
    return scat, gath, mask, deg


def _make_kernel(num_iterations: int, normalization: float, deg: int):
    alpha = np.float32(normalization)

    def kernel(llr_ref, s_ref, g_ref, m_ref, out_ref):
        llrs = llr_ref[:]  # [B, 128]
        masks = [m_ref[d] for d in range(deg)]  # [1, 128] each

        def var_sum(c2v):
            acc = jnp.zeros_like(llrs)
            for d in range(deg):
                acc = acc + jnp.dot(
                    c2v[d] * masks[d], s_ref[d],
                    preferred_element_type=jnp.float32,
                )
            return acc

        def body(_, c2v):
            total = llrs + var_sum(c2v)
            gathered = [
                jnp.dot(total, g_ref[d], preferred_element_type=jnp.float32)
                for d in range(deg)
            ]
            v2c = [gathered[d] - c2v[d] for d in range(deg)]
            sgn = [
                jnp.where(
                    masks[d] > 0, jnp.where(v2c[d] >= 0, 1.0, -1.0), 1.0
                )
                for d in range(deg)
            ]
            mag = [
                jnp.where(masks[d] > 0, jnp.abs(v2c[d]), _INF)
                for d in range(deg)
            ]
            tot_sgn = sgn[0]
            for d in range(1, deg):
                tot_sgn = tot_sgn * sgn[d]
            m1 = jnp.full_like(llrs, _INF)
            m2 = jnp.full_like(llrs, _INF)
            for d in range(deg):
                x = mag[d]
                m2 = jnp.minimum(m2, jnp.maximum(m1, x))
                m1 = jnp.minimum(m1, x)
            return tuple(
                alpha
                * (tot_sgn * sgn[d])
                * jnp.minimum(jnp.where(mag[d] == m1, m2, m1), _INF)
                for d in range(deg)
            )

        c2v0 = tuple(jnp.zeros_like(llrs) for _ in range(deg))
        c2v = jax.lax.fori_loop(0, num_iterations, body, c2v0)
        out_ref[:] = llrs + var_sum(c2v)

    return kernel


# rows per grid step: ~20 live [ROW_BLOCK, 128] f32 planes inside the BP
# iteration stay well under VMEM while the MXU matmuls remain full-width
ROW_BLOCK = 256


@partial(
    jax.jit, static_argnames=("num_iterations", "normalization", "interpret")
)
def ldpc_totals_pallas(
    llrs: jax.Array,
    num_iterations: int = 25,
    normalization: float = 0.75,
    interpret: bool = False,
) -> jax.Array:
    """Final per-variable LLR totals after BP. llrs: float32 ``[B, 128]``;
    any B (tiled into ROW_BLOCK grid steps — a lane-packed receiver bank
    decodes C x D headers in one call)."""
    scat, gath, mask, deg = _tables()
    b, n = llrs.shape
    row_block = min(ROW_BLOCK, -(-b // 8) * 8)
    nrb = -(-b // row_block)
    b_pad = nrb * row_block
    x = jnp.zeros((b_pad, n), jnp.float32).at[:b].set(
        llrs.astype(jnp.float32)
    )
    out = pl.pallas_call(
        _make_kernel(num_iterations, normalization, deg),
        grid=(nrb,),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        in_specs=[
            pl.BlockSpec((row_block, n), lambda i: (i, 0)),
            pl.BlockSpec(scat.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(gath.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(mask.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((row_block, n), lambda i: (i, 0)),
        interpret=interpret,
    )(x, jnp.asarray(scat), jnp.asarray(gath), jnp.asarray(mask))
    return out[:b]


def _probe() -> bool:
    """Semantic compile-and-validate probe on the live TPU: encode random
    headers, flip a few coded bits, decode with the Pallas path and demand
    every header comes back exactly (a corrupt lowering cannot pass a parity
    syndrome check on 128 random codewords by accident)."""
    if jax.default_backend() != "tpu":
        return False
    from .ldpc import HeaderLdpcDecoder, encode_header

    rng = np.random.default_rng(3)
    b = 128
    info = rng.integers(0, 2, (b, 32)).astype(np.uint8)
    coded = np.asarray(encode_header(jnp.asarray(info)))[:, :128]
    llr = (1.0 - 2.0 * coded).astype(np.float32) * 4.0
    for i in range(b):
        llr[i, rng.choice(128, 3, replace=False)] *= -1.0
    dec = HeaderLdpcDecoder(25, use_pallas=True)
    bits, ok = dec.decode(jnp.asarray(llr))
    return bool(np.asarray(ok).all() and (np.asarray(bits) == info).all())


def ldpc_enabled() -> bool:
    """Whether the Pallas LDPC kernel is usable on this backend
    (probe-compiled + output-validated once per machine per kernel-source
    version; ``PM_PALLAS_LDPC=1/0`` forces)."""
    import sys

    from .pallas_probe import probe_verdict, source_tag

    return probe_verdict("ldpc", source_tag(sys.modules[__name__]), _probe)
