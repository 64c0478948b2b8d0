"""Unit tests for the core DSP ops against host reference implementations."""

import zlib

import jax.numpy as jnp
import numpy as np
import pytest

from gr4_packet_modem_tpu.ops import ldpc
from gr4_packet_modem_tpu.ops.crc import CrcRef, crc_bytes_be, make_crc32_engine
from gr4_packet_modem_tpu.ops.fir import interpolating_fir, stream_interpolating_fir
from gr4_packet_modem_tpu.ops.packing import (
    bits_to_bytes,
    bytes_to_bits,
    pack_bits,
    unpack_bits,
)
from gr4_packet_modem_tpu.ops.scramble import descramble_soft, scramble_bits
from gr4_packet_modem_tpu.utils import constants as C
from gr4_packet_modem_tpu.utils.firdes import (
    polyphase,
    root_raised_cosine,
    rx_pfb_taps,
    rx_rrc_taps,
    tx_rrc_taps,
)
from gr4_packet_modem_tpu.utils.lfsr import additive_scrambler_keystream

import reference_impl as ref


class TestCrc:
    def test_ref_matches_zlib(self):
        rng = np.random.default_rng(0)
        for n in [1, 2, 7, 100, 1500]:
            msg = rng.integers(0, 256, n, dtype=np.uint8)
            assert CrcRef().compute(msg) == zlib.crc32(msg.tobytes())

    def test_crc16_ccitt(self):
        # CRC-16/CCITT-FALSE of "123456789" is 0x29B1 (non-reflected path)
        crc = CrcRef(16, 0x1021, 0xFFFF, 0x0000, False, False)
        assert crc.compute(np.frombuffer(b"123456789", np.uint8)) == 0x29B1

    def test_batched_engine(self):
        rng = np.random.default_rng(1)
        eng = make_crc32_engine(300)
        lens = np.array([1, 3, 17, 100, 300, 255, 2, 64], dtype=np.int32)
        data = np.zeros((len(lens), 300), np.uint8)
        expected = []
        for i, n in enumerate(lens):
            m = rng.integers(0, 256, n, dtype=np.uint8)
            data[i, :n] = m
            expected.append(zlib.crc32(m.tobytes()))
        got = np.asarray(eng.compute(jnp.asarray(data), jnp.asarray(lens)))
        np.testing.assert_array_equal(got, np.array(expected, np.uint32))

    def test_crc_bytes_be(self):
        out = np.asarray(crc_bytes_be(jnp.asarray([0x01020304], jnp.uint32)))
        np.testing.assert_array_equal(out[0], [1, 2, 3, 4])


class TestLdpc:
    def test_h_g_orthogonal(self):
        h = ldpc.load_parity_check()
        g = ldpc.load_generator()
        assert not ((h @ g) % 2).any()

    def test_encode_matches_reference(self):
        rng = np.random.default_rng(2)
        headers = rng.integers(0, 256, (5, 4), dtype=np.uint8)
        coded = np.asarray(
            bits_to_bytes(ldpc.encode_header(bytes_to_bits(jnp.asarray(headers))))
        )
        for i in range(5):
            np.testing.assert_array_equal(coded[i], ref.ldpc_encode_bytes(headers[i]))

    def test_decode_clean_and_noisy(self):
        rng = np.random.default_rng(3)
        dec = ldpc.make_header_decoder()
        info = rng.integers(0, 2, (32, 32)).astype(np.uint8)
        cw = np.asarray(ldpc.encode_header(jnp.asarray(info)))
        sigma = 0.7  # Es/N0 = 0 dB design point with repetition gain
        tx = 1.0 - 2.0 * cw.astype(np.float32)
        llr = 2 / sigma**2 * (tx + rng.normal(0, sigma, tx.shape))
        comb = ldpc.combine_repetition(jnp.asarray(llr, jnp.float32))
        bits, ok = dec.decode(comb)
        assert np.asarray(ok).mean() > 0.9
        good = np.asarray(ok)
        np.testing.assert_array_equal(np.asarray(bits)[good], info[good])

    def test_decode_flags_garbage(self):
        rng = np.random.default_rng(4)
        dec = ldpc.make_header_decoder()
        llr = jnp.asarray(rng.normal(0, 4, (8, 128)), jnp.float32)
        _, ok = dec.decode(llr)
        assert not np.asarray(ok).all()


class TestPacking:
    def test_roundtrip(self):
        rng = np.random.default_rng(5)
        data = jnp.asarray(rng.integers(0, 256, (3, 16), dtype=np.uint8))
        bits = bytes_to_bits(data)
        np.testing.assert_array_equal(
            np.asarray(bits[0]), np.unpackbits(np.asarray(data)[0])
        )
        np.testing.assert_array_equal(np.asarray(bits_to_bytes(bits)), np.asarray(data))

    def test_pack_2bit_msb(self):
        bits = jnp.asarray([[1, 0, 0, 1, 1, 1, 0, 0]], jnp.uint8)
        np.testing.assert_array_equal(
            np.asarray(pack_bits(bits, 2)), [[2, 1, 3, 0]]
        )

    def test_unpack_lsb(self):
        out = unpack_bits(jnp.asarray([[0b01]], jnp.uint8), 2, 1, msb_first=False)
        np.testing.assert_array_equal(np.asarray(out), [[1, 0]])


class TestScramble:
    def test_keystream_known_prefix(self):
        # CCSDS 131.0-B-5 scrambler: seed 0x18E38 emits its LSBs first
        ks = additive_scrambler_keystream(8)
        assert list(ks) == [0, 0, 0, 1, 1, 1, 0, 0]

    def test_involution(self):
        rng = np.random.default_rng(6)
        bits = jnp.asarray(rng.integers(0, 2, (2, 128), dtype=np.uint8))
        assert np.array_equal(
            np.asarray(scramble_bits(scramble_bits(bits))), np.asarray(bits)
        )

    def test_soft_matches_hard(self):
        rng = np.random.default_rng(7)
        bits = rng.integers(0, 2, 64).astype(np.uint8)
        soft = (1.0 - 2.0 * bits).astype(np.float32)  # bit0 -> +1
        scr_hard = np.asarray(scramble_bits(jnp.asarray(bits)))
        scr_soft = np.asarray(descramble_soft(jnp.asarray(soft)))
        np.testing.assert_allclose(scr_soft, 1.0 - 2.0 * scr_hard)


class TestFirdes:
    def test_rrc_basic_properties(self):
        taps = root_raised_cosine(1.0, 4.0, 1.0, 0.35, 44)
        assert taps.size == 45  # forced odd
        assert abs(taps.sum() - 1.0) < 1e-6
        np.testing.assert_allclose(taps, taps[::-1], rtol=1e-6)  # symmetric
        assert np.argmax(taps) == 22

    def test_tx_taps_scaling(self):
        taps = tx_rrc_taps(4)
        sums = [np.abs(taps[j::4]).sum() for j in range(4)]
        np.testing.assert_allclose(max(sums), 0.9, rtol=1e-6)

    def test_rx_taps_unit_norm(self):
        taps, norm = rx_rrc_taps(4)
        np.testing.assert_allclose(np.sum(taps**2), 1.0, rtol=1e-6)
        assert norm > 0

    def test_pfb_arm0_matches_rrc(self):
        # first arm of the PFB equals the normalized RRC taps
        # (packet_receiver.hpp:97-99)
        pfb = rx_pfb_taps(4, 32)
        taps, _ = rx_rrc_taps(4)
        assert pfb.size == 32 * 4 * 11
        # approximately equal: the PFB prototype is designed at the 32x rate,
        # so arm 0 matches the direct RRC design only to design accuracy
        np.testing.assert_allclose(pfb[::32], taps[:44], atol=5e-4)

    def test_polyphase(self):
        taps = np.arange(10, dtype=np.float32)
        p = polyphase(taps, 4)
        assert p.shape == (4, 3)
        np.testing.assert_array_equal(p[1], [1, 5, 9])
        np.testing.assert_array_equal(p[2], [2, 6, 0])

    def test_independent_designer_matches_golden(self):
        # the production tap vectors are golden data (protocol constants);
        # the textbook-closed-form designer must reproduce them to f32
        # precision (cross-check that the golden data is what the formula
        # says, and that the independent derivation is correct)
        from gr4_packet_modem_tpu.utils.firdes import _golden

        g = _golden()
        raw = root_raised_cosine(1.0, 4.0, 1.0, 0.35, 45)
        np.testing.assert_allclose(
            raw, g["rrc_g1_fs4_sr1_a035_n45"], atol=3e-7
        )
        # PFB prototype recomputed through the independent designer
        _, norm = rx_rrc_taps(4)
        pfb_calc = root_raised_cosine(
            32.0 / norm, 128.0, 1.0, 0.35, 32 * 4 * 11
        )[:-1]
        np.testing.assert_allclose(
            pfb_calc, g["rx_pfb_sps4_arms32"], atol=2e-5
        )

    def test_designer_nondefault_geometry(self):
        # non-golden geometries go through the designer directly
        taps = tx_rrc_taps(2)
        assert taps.size == 23
        sums = [np.abs(taps[j::2]).sum() for j in range(2)]
        np.testing.assert_allclose(max(sums), 0.9, rtol=1e-6)
        taps8, norm8 = rx_rrc_taps(8)
        assert taps8.size == 89 and norm8 > 0
        np.testing.assert_allclose(np.sum(taps8**2), 1.0, rtol=1e-6)


class TestFir:
    def test_interp_matches_reference(self):
        rng = np.random.default_rng(8)
        syms = (rng.normal(size=40) + 1j * rng.normal(size=40)).astype(np.complex64)
        taps = tx_rrc_taps(4)
        mine = np.asarray(interpolating_fir(jnp.asarray(syms), taps, 4))
        theirs = ref.interp_fir(syms, taps, 4)
        np.testing.assert_allclose(mine, theirs, atol=1e-5)

    def test_stream_fir_matches_batch(self):
        rng = np.random.default_rng(9)
        syms = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype(np.complex64)
        taps = tx_rrc_taps(4)
        full = np.asarray(interpolating_fir(jnp.asarray(syms), taps, 4))
        carry = None
        chunks = []
        state = jnp.zeros(11, jnp.complex64)
        for part in np.split(syms, [10, 30, 45]):
            state, y = stream_interpolating_fir(state, jnp.asarray(part), taps, 4)
            chunks.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(chunks), full, atol=1e-5)
