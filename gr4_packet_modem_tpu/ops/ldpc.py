"""Header LDPC (128,32) code: batched encoder and belief-propagation decoder.

The air interface protects the 32-bit header with a systematic (128,32) LDPC
code followed by a x2 repetition (total rate 1/8). The generator is the dense
96x32 GF(2) matrix embedded in the reference encoder
(header_fec_encoder.hpp:29-46); the parity-check matrix is the alist embedded
in the reference decoder (header_fec_decoder.hpp:31-260). Both are shipped as
data files under ``gr4_packet_modem_tpu/data`` and verified against each other
(H @ G = 0) in the tests.

TPU design: encoding is a tiny GF(2) matmul batched over packets. Decoding is
a batched normalized-min-sum belief-propagation decoder with a flooding
schedule: the 96 checks (degrees 3-5) are stored as a dense padded ``[96, 5]``
edge table, so one iteration is a gather, a masked two-min sign/magnitude
reduction and a scatter — all vectorized over the codeword batch. (The
reference calls into the Rust ldpc-toolbox serial C FFI decoder instead,
algorithm "HLAminstari8" with 25 iterations.)
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import constants as C

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")

__all__ = [
    "load_generator",
    "load_parity_check",
    "encode_header",
    "HeaderLdpcDecoder",
    "make_header_decoder",
]


@lru_cache(maxsize=1)
def load_generator() -> np.ndarray:
    """Codeword-from-info GF(2) matrix ``[128, 32]``.

    Codeword = [info(32) | parity(96)]; parity r = parity(info & gen[r]) with
    the u32 rows applied MSB-first (header_fec_encoder.hpp:97-111).
    """
    gen = np.load(os.path.join(_DATA_DIR, "header_ldpc_generator.npy"))
    g = np.zeros((C.HEADER_LDPC_N, C.HEADER_LDPC_K), dtype=np.uint8)
    g[: C.HEADER_LDPC_K] = np.eye(C.HEADER_LDPC_K, dtype=np.uint8)
    for r in range(96):
        row = int(gen[r])
        for j in range(32):
            g[32 + r, j] = (row >> (31 - j)) & 1
    return g


@lru_cache(maxsize=1)
def load_parity_check() -> np.ndarray:
    """Parity-check matrix H ``[96, 128]`` parsed from the alist data file."""
    with open(os.path.join(_DATA_DIR, "header_ldpc.alist")) as f:
        lines = [ln for ln in f.read().split("\n") if ln.strip()]
    n, m = map(int, lines[0].split())
    h = np.zeros((m, n), dtype=np.uint8)
    for v in range(n):
        for c in map(int, lines[4 + v].split()):
            h[c - 1, v] = 1
    return h


@jax.jit
def encode_header(header_bits: jax.Array) -> jax.Array:
    """Encode header info bits -> repeated codeword bits.

    header_bits: uint8/int ``[B, 32]`` MSB-first info bits.
    Returns ``[B, 256]`` coded bits: the (128,32) codeword followed by its
    repetition (header_fec_encoder.hpp:93-115).
    """
    g = jnp.asarray(load_generator().T.astype(np.float32))  # [32, 128]
    acc = jnp.dot(
        header_bits.astype(jnp.float32), g, preferred_element_type=jnp.float32
    )
    cw = (acc.astype(jnp.int32) & 1).astype(jnp.uint8)
    return jnp.concatenate([cw, cw], axis=-1)


class HeaderLdpcDecoder:
    """Batched normalized-min-sum BP decoder for the (128,32) header code."""

    def __init__(
        self,
        num_iterations: int = 25,
        normalization: float = 0.75,
        use_pallas: bool | None = None,
    ):
        self.num_iterations = int(num_iterations)
        self.normalization = float(normalization)
        # None = auto: the VMEM-resident Pallas kernel (ops/ldpc_pallas.py,
        # all iterations in one program) on TPU, the lax.scan elsewhere
        self.use_pallas = use_pallas
        h = load_parity_check()
        m, n = h.shape
        self.n = n
        deg = h.sum(axis=1)
        self.max_deg = int(deg.max())
        # dense padded edge table: var index per (check, slot), -1 padding
        vidx = np.full((m, self.max_deg), 0, dtype=np.int32)
        vmask = np.zeros((m, self.max_deg), dtype=bool)
        for c in range(m):
            vs = np.nonzero(h[c])[0]
            vidx[c, : vs.size] = vs
            vmask[c, : vs.size] = True
        # numpy constants: embedded at trace time (no device residency)
        self._vidx = vidx
        self._vmask = vmask
        self._h = h.astype(np.float32)
        if use_pallas is None and jax.default_backend() == "tpu":
            # pre-warm the capability probe EAGERLY: decode() consults it at
            # trace time, where a cold probe cannot run (ops/pallas_probe.py)
            from .ldpc_pallas import ldpc_enabled

            ldpc_enabled()

    @partial(jax.jit, static_argnums=0)
    def decode(self, llrs: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Decode a batch of codewords.

        llrs: float ``[B, 128]``, positive = bit 0 more likely (the modem's
        LLR convention, constellation_llr_decoder.hpp:24-27).
        Returns ``(info_bits [B, 32] uint8, ok [B] bool)`` where ``ok`` is the
        parity-check success flag (failure -> invalid_header upstream).
        """
        use_pallas = self.use_pallas
        if use_pallas is None:
            # auto: require the compile+validate probe (ops/pallas_probe.py)
            from .ldpc_pallas import ldpc_enabled

            use_pallas = jax.default_backend() == "tpu" and ldpc_enabled()
        if use_pallas:
            from .ldpc_pallas import ldpc_totals_pallas

            total = ldpc_totals_pallas(
                llrs,
                self.num_iterations,
                self.normalization,
                # forced-on off-TPU (tests) runs the kernel interpreter
                interpret=jax.default_backend() != "tpu",
            )
            return self._finish(total)
        vidx, vmask = jnp.asarray(self._vidx), jnp.asarray(self._vmask)
        alpha = jnp.float32(self.normalization)
        m, dmax = self._vidx.shape
        e = m * dmax
        # edge<->variable selection matrix S[e, v] = (vidx[e] == v), built
        # from an iota comparison (no literal) — gathers/scatters with
        # batched operands are unimplemented/pathological on this TPU
        # backend, so edge gather and variable scatter-add both become
        # matmuls against S
        sel = (
            vidx.reshape(e, 1) == jnp.arange(self.n, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)  # [E, N]
        sel_masked = sel * vmask.reshape(e, 1).astype(jnp.float32)

        def check_update(v2c):
            # v2c: [B, M, D] variable-to-check messages (gathered)
            sgn = jnp.where(v2c >= 0, 1.0, -1.0)
            sgn = jnp.where(vmask[None], sgn, 1.0)
            mag = jnp.where(vmask[None], jnp.abs(v2c), jnp.inf)
            tot_sgn = jnp.prod(sgn, axis=-1, keepdims=True)
            # two smallest magnitudes
            m1 = jnp.min(mag, axis=-1, keepdims=True)
            arg1 = jnp.argmin(mag, axis=-1)
            mag2 = jnp.where(
                jax.nn.one_hot(arg1, mag.shape[-1], dtype=bool), jnp.inf, mag
            )
            m2 = jnp.min(mag2, axis=-1, keepdims=True)
            out_mag = jnp.where(mag == m1, m2, m1)
            out_sgn = tot_sgn * sgn  # product of the other signs
            return alpha * out_sgn * jnp.minimum(out_mag, jnp.float32(1e30))

        def body(carry, _):
            c2v = carry  # [B, M, D] check-to-variable messages
            # variable totals: sum of incoming c2v per variable + channel LLR
            contrib = jnp.where(vmask[None], c2v, 0.0)
            var_sum = jnp.dot(
                contrib.reshape(contrib.shape[0], e),
                sel_masked,
                preferred_element_type=jnp.float32,
            )  # [B, N] scatter-add as matmul
            total = llrs + var_sum
            gathered = jnp.dot(
                total, sel.T, preferred_element_type=jnp.float32
            ).reshape(total.shape[0], m, dmax)  # edge gather as matmul
            v2c = gathered - c2v  # extrinsic
            c2v_new = check_update(v2c)
            return c2v_new, None

        b = llrs.shape[0]
        # derive the zeros from llrs so the carry inherits sharding/vma type
        # (required under shard_map's varying-axis checking)
        c2v0 = jnp.zeros((b, vidx.shape[0], vidx.shape[1]), dtype=llrs.dtype) + (
            0.0 * llrs[:, :1, None]
        )
        c2v, _ = jax.lax.scan(body, c2v0, None, length=self.num_iterations)
        contrib = jnp.where(vmask[None], c2v, 0.0)
        var_sum = jnp.dot(
            contrib.reshape(contrib.shape[0], e),
            sel_masked,
            preferred_element_type=jnp.float32,
        )
        return self._finish(llrs + var_sum)

    def _finish(self, total):
        """Hard decision + parity syndrome check on the final totals."""
        hard = (total < 0).astype(jnp.uint8)  # positive LLR -> bit 0
        syndrome = jnp.dot(
            hard.astype(jnp.float32),
            jnp.asarray(self._h).T,
            preferred_element_type=jnp.float32,
        )
        ok = jnp.all((syndrome.astype(jnp.int32) & 1) == 0, axis=-1)
        return hard[:, : C.HEADER_LDPC_K], ok


@lru_cache(maxsize=4)
def make_header_decoder(num_iterations: int = 25) -> HeaderLdpcDecoder:
    return HeaderLdpcDecoder(num_iterations=num_iterations)


def combine_repetition(llrs256: jax.Array) -> jax.Array:
    """Sum the two repetition halves (header_fec_decoder.hpp:316-319)."""
    return llrs256[..., : C.HEADER_LDPC_N] + llrs256[..., C.HEADER_LDPC_N :]
