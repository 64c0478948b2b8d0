"""Pallas LDPC BP kernel vs the XLA scan decoder (ops/ldpc_pallas.py).

Both implement the same normalized-min-sum flooding decoder for the (128,32)
header code (header_fec_decoder.hpp alist); decoded bits and parity-ok flags
must agree exactly, including in the failure regime where some codewords do
not converge. Runs in interpret mode on the CPU backend.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gr4_packet_modem_tpu.ops import ldpc
from gr4_packet_modem_tpu.ops.ldpc_pallas import ldpc_totals_pallas


@pytest.mark.parametrize("snr_db", [-6.0, -2.0, 2.0])
def test_pallas_ldpc_matches_scan(snr_db):
    rng = np.random.default_rng(int(10 + snr_db))
    dec = ldpc.HeaderLdpcDecoder(25, use_pallas=False)
    b = 96
    bits = rng.integers(0, 2, (b, 32), dtype=np.uint8)
    cw = np.asarray(ldpc.encode_header(jnp.asarray(bits)))[:, :128]
    sigma = np.sqrt(1.0 / (2 * 10 ** (snr_db / 10)))
    bpsk = 1.0 - 2.0 * cw.astype(np.float32)
    llr = (2.0 / sigma**2) * (
        bpsk + sigma * rng.standard_normal(cw.shape).astype(np.float32)
    )
    ref_bits, ref_ok = dec.decode(jnp.asarray(llr))
    total = ldpc_totals_pallas(jnp.asarray(llr), 25, 0.75, interpret=True)
    hard = (np.asarray(total) < 0).astype(np.uint8)
    h = ldpc.load_parity_check()
    ok = ((hard @ h.T.astype(np.uint8)) % 2 == 0).all(axis=1)
    if snr_db <= -5.0:
        # the failure regime must actually be exercised
        assert 0.0 < np.asarray(ref_ok).mean() < 1.0
    np.testing.assert_array_equal(hard[:, :32], np.asarray(ref_bits))
    np.testing.assert_array_equal(ok, np.asarray(ref_ok))


def test_decoder_dispatch_flag():
    """use_pallas=True routes decode() through the kernel (off-TPU the
    dispatch falls back to the kernel interpreter, so the full wiring —
    argument order included — is exercised here)."""
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, (8, 32), dtype=np.uint8)
    cw = np.asarray(ldpc.encode_header(jnp.asarray(bits)))[:, :128]
    llr = 8.0 * (1.0 - 2.0 * cw.astype(np.float32))
    llr += 1.5 * rng.standard_normal(llr.shape).astype(np.float32)
    ref_bits, ref_ok = ldpc.HeaderLdpcDecoder(25, use_pallas=False).decode(
        jnp.asarray(llr)
    )
    pal_bits, pal_ok = ldpc.HeaderLdpcDecoder(25, use_pallas=True).decode(
        jnp.asarray(llr)
    )
    np.testing.assert_array_equal(np.asarray(pal_bits), np.asarray(ref_bits))
    np.testing.assert_array_equal(np.asarray(pal_ok), np.asarray(ref_ok))
