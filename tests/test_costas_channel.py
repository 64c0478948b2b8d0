"""Costas loop and channel model unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gr4_packet_modem_tpu.models.channel import (
    awgn,
    esn0_db_to_noise_sigma,
    pfb_arb_taps,
    rotate,
    sfo,
)
from gr4_packet_modem_tpu.ops.costas import (
    costas_coefficients,
    costas_run,
    costas_segments,
    vv_phase_estimate,
)
from gr4_packet_modem_tpu.utils import constants as C


def _qpsk_symbols(rng, n):
    bits = rng.integers(0, 4, n)
    return np.asarray(C.QPSK_CONSTELLATION)[bits]


class TestCostas:
    def test_coefficients_positive_stable(self):
        for bw in [0.005, 0.01, 0.02]:
            for qpsk in [False, True]:
                k1, k2 = costas_coefficients(bw, qpsk)
                assert 0 < k2 < k1 < 1

    def test_segments_schedule(self):
        const, k1, k2 = (np.asarray(v) for v in costas_segments(400))
        assert (const[:64] == int(C.Constellation.PILOT)).all()
        assert (const[64:] == int(C.Constellation.QPSK)).all()
        # three distinct gain segments
        assert len({k1[0], k1[100], k1[300]}) == 3

    def test_locks_onto_static_phase_offset(self):
        """With the acquisition phase preset (as in real operation,
        costas_loop.hpp:101-105) the loop tracks a static offset closely;
        a large unpreset offset still pulls in, with the second-order slow
        tail the reference shares (k2 integrator bleed-off)."""
        rng = np.random.default_rng(0)
        n = 400
        syms = _qpsk_symbols(rng, n)
        phase_off = 0.6
        recv = syms * np.exp(1j * phase_off)
        const, k1, k2 = (jnp.asarray(v) for v in costas_segments(n))
        # pilot segment: syncword replaced by all-ones pilot
        recv[:64] = np.exp(1j * phase_off)
        out, ph, fr = costas_run(
            jnp.asarray(recv[None], jnp.complex64),
            jnp.asarray([phase_off - 0.05]),  # acquisition preset
            jnp.zeros(1),
            const,
            k1,
            k2,
        )
        out = np.asarray(out)[0]
        err = np.abs(out[100:] - syms[100:])
        assert np.median(err) < 0.03
        # unpreset large offset: pulls in but with a slow residual tail
        out2, _, _ = costas_run(
            jnp.asarray(recv[None], jnp.complex64),
            jnp.zeros(1),
            jnp.zeros(1),
            const,
            k1,
            k2,
        )
        err2 = np.abs(np.asarray(out2)[0][200:] - syms[200:])
        assert np.median(err2) < 0.15

    def test_tracks_residual_frequency(self):
        rng = np.random.default_rng(1)
        n = 2000
        syms = _qpsk_symbols(rng, n)
        f = 2e-4  # rad/symbol residual CFO
        recv = syms * np.exp(1j * f * np.arange(n))
        recv[:64] = np.exp(1j * f * np.arange(64))
        const, k1, k2 = (jnp.asarray(v) for v in costas_segments(n))
        out, _, fr = costas_run(
            jnp.asarray(recv[None], jnp.complex64),
            jnp.zeros(1),
            jnp.zeros(1),
            const,
            k1,
            k2,
        )
        out = np.asarray(out)[0]
        err = np.abs(out[1000:] - syms[1000:])
        assert np.median(err) < 0.05
        # loop frequency state should approach the true offset
        assert abs(float(fr[0]) - f) < 5e-5

    def test_vv_estimate_tracks_phase(self):
        rng = np.random.default_rng(2)
        n = 1024
        syms = _qpsk_symbols(rng, n)
        phase = 0.3 + 1e-4 * np.arange(n)
        recv = (syms * np.exp(1j * phase)).astype(np.complex64)
        est = np.asarray(vv_phase_estimate(jnp.asarray(recv)))
        # 4th-power estimate has a pi/2 ambiguity; compare modulo pi/2
        d = (est - phase + np.pi / 4) % (np.pi / 2) - np.pi / 4
        assert np.abs(d[64:]).mean() < 0.08


class TestChannel:
    def test_rotate_phase_accuracy(self):
        n = 1 << 20
        x = jnp.ones(n, jnp.complex64)
        w = 0.006
        y = np.asarray(rotate(x, w))
        expected = np.exp(1j * w * np.arange(n))
        # phase error stays tiny even after a million samples
        err = np.angle(y[-1000:] * np.conj(expected[-1000:]))
        assert np.abs(err).max() < 5e-3

    def test_awgn_statistics(self):
        x = jnp.zeros(100000, jnp.complex64)
        y = np.asarray(awgn(jax.random.PRNGKey(0), x, 0.5))
        assert abs(np.std(y.real) - 0.5) < 0.01
        assert abs(np.std(y.imag) - 0.5) < 0.01

    def test_esn0_to_sigma_roundtrip(self):
        sigma = esn0_db_to_noise_sigma(20.0, signal_power=0.25, sps=4)
        # Es = 1.0, N0 = 0.01, sigma = sqrt(0.005)
        assert abs(sigma - np.sqrt(0.005)) < 1e-9

    def test_pfb_arb_taps_spectrum(self):
        # the reference design (pfb_arb_taps.hpp:8-12): 32*40 = 1280 taps,
        # symmetric, 80 dB stopband — scipy remez converges to the same
        # equiripple optimum (2.7e-5 max relative deviation, measured)
        taps = pfb_arb_taps()
        assert taps.size == 1280
        np.testing.assert_allclose(taps, taps[::-1], rtol=1e-5)
        spec = np.abs(np.fft.rfft(taps / 32, 1 << 16))
        f = np.linspace(0, 0.5, spec.size)
        stop = spec[f > 0.55 / 32]
        assert 20 * np.log10(stop.max() / spec[0]) < -78

    def test_sfo_resamples(self):
        # a pure tone keeps its (scaled) frequency through the resampler
        n = 8192
        f0 = 0.01
        x = jnp.asarray(
            np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
        )
        y = np.asarray(sfo(x, ppm=100.0, num_out=n - 64))[64:-64]
        # instantaneous frequency of the output
        dphi = np.angle(y[1:] * np.conj(y[:-1])) / (2 * np.pi)
        f_out = dphi.mean()
        assert abs(f_out - f0 / (1 + 1e-4)) < 1e-5
