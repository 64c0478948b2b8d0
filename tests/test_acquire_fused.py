"""Fused Pallas correlator backend vs the reference fft backend
(ops/acquire_pallas.py): identical detections and near-identical estimates.

The fused backend reduces to best-bin power inside the kernel and recomputes
phase/adjacent-bin powers exactly at the detected points by direct
correlation, so estimates match the fft backend to f32 matmul accuracy.
Runs in interpret mode on the CPU backend.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gr4_packet_modem_tpu.models.channel import awgn, rotate
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.ops.acquire import AcquisitionConfig, SyncwordAcquirer
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat


def _multi_burst_signal(total=1 << 15, cfo=0.004, noise=0.05):
    tx = Transmitter(TxConfig(max_payload_len=64))
    rng = np.random.default_rng(3)
    payloads = [rng.integers(0, 256, n, dtype=np.uint8) for n in (40, 64, 25)]
    batch = PacketBatch.from_list(payloads, max_len=64)
    s, l = tx.modulate_bursts(batch)
    stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
    x = np.zeros(total, np.complex64)
    st = np.asarray(stream)
    x[2000 : 2000 + st.size] = st
    xj = rotate(jnp.asarray(x), cfo)
    return awgn(jax.random.PRNGKey(1), xj, noise)


@pytest.mark.parametrize("fft_size", [2048, 4096])
def test_fused_matches_fft_best_power(fft_size):
    rng = np.random.default_rng(0)
    t = 1 << 14
    x = (rng.standard_normal(t) + 1j * rng.standard_normal(t)).astype(
        np.complex64
    )
    a_fft = SyncwordAcquirer(
        AcquisitionConfig(freq_bins=4, max_detections=8, fft_size=fft_size)
    )
    a_fus = SyncwordAcquirer(
        AcquisitionConfig(
            freq_bins=4, max_detections=8, backend="fused", fft_size=fft_size
        )
    )
    p = jnp.abs(a_fft.correlate(jnp.asarray(x))) ** 2
    bp_ref = np.asarray(jnp.max(p, axis=0))
    bb_ref = np.asarray(jnp.argmax(p, axis=0))
    bp, bb = a_fus._best_power_fused(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(bp), bp_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bb), bb_ref)


@pytest.mark.parametrize("fft_size", [2048, 4096])
def test_wide_layout_matches_narrow(fft_size, monkeypatch):
    """The wide (block-diagonal kron) layout computes the identical
    factorization; only the f32 summation tree differs (the K=128 dot
    groups the 16 nonzero terms differently), so the power plane matches
    the narrow layout to f32 rounding and the best-bin plane up to
    noise-floor ties."""
    rng = np.random.default_rng(5)
    t = 1 << 14
    x = (rng.standard_normal(t) + 1j * rng.standard_normal(t)).astype(
        np.complex64
    )
    a = SyncwordAcquirer(
        AcquisitionConfig(
            freq_bins=4, max_detections=8, backend="fused", fft_size=fft_size
        )
    )
    monkeypatch.setenv("PM_ACQ_WIDE", "0")
    bp_n, bb_n = a._best_power_fused(jnp.asarray(x))
    monkeypatch.setenv("PM_ACQ_WIDE", "1")
    bp_w, bb_w = a._best_power_fused(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(bp_w), np.asarray(bp_n), rtol=1e-4, atol=1e-3
    )
    assert (np.asarray(bb_w) == np.asarray(bb_n)).mean() > 0.999


def test_fused_estimates_at_clipped_noise_region():
    """A syncword starting inside [w, w+16) clips the shared noise/corr
    fetch region at the buffer start; the one-hot shift must still carve
    the exact syncword window (estimates match the fft backend, which
    never fetches)."""
    tx = Transmitter(TxConfig(max_payload_len=64))
    rng = np.random.default_rng(9)
    payload = rng.integers(0, 256, 30, dtype=np.uint8)
    batch = PacketBatch.from_list([payload], max_len=64)
    s, l = tx.modulate_bursts(batch)
    burst = np.asarray(s)[0, : int(np.asarray(l)[0])]
    x = np.zeros(1 << 14, np.complex64)
    start = 771  # eligible (>= time_threshold 768) but region-clipped
    x[start : start + burst.size] = burst
    xj = awgn(jax.random.PRNGKey(2), jnp.asarray(x), 0.03)

    det_ref = SyncwordAcquirer(
        AcquisitionConfig(freq_bins=4, max_detections=4)
    ).acquire(xj)
    det = SyncwordAcquirer(
        AcquisitionConfig(freq_bins=4, max_detections=4, backend="fused")
    ).acquire(xj)
    vref, v = np.asarray(det_ref.valid), np.asarray(det.valid)
    assert vref[0] and int(np.asarray(det_ref.index)[0]) == start
    np.testing.assert_array_equal(v, vref)
    np.testing.assert_array_equal(
        np.asarray(det.index)[vref], np.asarray(det_ref.index)[vref]
    )
    for field, tol in [("phase", 1e-3), ("freq", 1e-6), ("esn0_db", 1e-2),
                       ("amplitude", 1e-3)]:
        np.testing.assert_allclose(
            np.asarray(getattr(det, field))[vref],
            np.asarray(getattr(det_ref, field))[vref],
            rtol=2e-3, atol=tol, err_msg=field,
        )


@pytest.mark.parametrize("backend", ["fused", "fused_bf16"])
def test_fused_acquire_detections_match(backend):
    x = _multi_burst_signal()
    det_ref = SyncwordAcquirer(
        AcquisitionConfig(freq_bins=4, max_detections=8)
    ).acquire(x)
    det = SyncwordAcquirer(
        AcquisitionConfig(freq_bins=4, max_detections=8, backend=backend)
    ).acquire(x)
    vref = np.asarray(det_ref.valid)
    v = np.asarray(det.valid)
    assert vref.sum() == 3  # all three bursts found by the reference backend
    np.testing.assert_array_equal(v, vref)
    m = vref
    np.testing.assert_array_equal(
        np.asarray(det.index)[m], np.asarray(det_ref.index)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(det.freq_bin)[m], np.asarray(det_ref.freq_bin)[m]
    )
    # bf16 matmul inputs perturb the kernel's power surface by ~2^-8
    # relative; estimates derived from kernel powers (time_est via the
    # neighbour-sample powers, amplitude via the peak power) wear that,
    # while phase/freq come from exact f32 recomputation at the candidates
    bf16 = backend == "fused_bf16"
    for field, tol in [
        ("amplitude", 1e-2 if bf16 else 1e-3),
        ("phase", 2e-2 if bf16 else 1e-3),
        ("freq", 1e-4 if bf16 else 1e-6),
        ("time_est", 5e-2 if bf16 else 1e-3),
        ("esn0_db", 1e-1 if bf16 else 1e-2),
    ]:
        np.testing.assert_allclose(
            np.asarray(getattr(det, field))[m],
            np.asarray(getattr(det_ref, field))[m],
            rtol=1e-2 if bf16 else 2e-3,
            atol=tol,
            err_msg=field,
        )
