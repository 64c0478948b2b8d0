"""Fence the acquisition estimation tail: corr+peaks -> +corr_points ->
+noise -> full acquire (16ch x 2^19, fused)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()

import jax
import jax.numpy as jnp

from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.ops.acquire import (
    AcquisitionConfig,
    SyncwordAcquirer,
    chunked_peak_detect,
)
from gr4_packet_modem_tpu.ops.fetch_pallas import fetch_enabled, fetch_regions
from gr4_packet_modem_tpu.utils.cplx import to_device, to_host
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

CH = 16
BLOCK = 1 << 19
ITERS = 20

tx = Transmitter(TxConfig(max_payload_len=1536))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 1500, dtype=np.uint8) for _ in range(12)]
batch = PacketBatch.from_list(payloads, max_len=1536)
s, l = tx.modulate_bursts(batch)
stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
stream = to_host(stream)
signal = np.tile(stream, BLOCK // stream.size + 1)[:BLOCK]

acq = SyncwordAcquirer(
    AcquisitionConfig(samples_per_symbol=4, freq_bins=4, max_detections=24,
                      backend="fused")
)
pad = 5556
x = np.zeros((CH, BLOCK + pad), np.complex64)
for c in range(CH):
    x[c, : BLOCK] = signal * np.exp(1j * 0.1 * c)
xj = to_device(x)

w = acq.config.time_threshold
d = acq.config.max_detections
thr = acq.config.power_threshold


def peaks_only(xc):
    bp, bb = acq._best_power_fused(xc)
    tp, ti, ovf = chunked_peak_detect(bp, w, d, thr)
    return bp, bb, tp, ti, ovf


def f_peaks(s2d):
    outs = jax.vmap(peaks_only)(s2d)
    return jax.tree.map(jnp.sum, outs[2:])


def f_corr_points(s2d):
    def one(xc):
        bp, bb, tp, ti, ovf = peaks_only(xc)
        bi = bb[ti]
        cr, ci, p3 = acq._corr_points(xc, bi, ti)
        return cr.sum() + ci.sum() + p3.sum()

    return jax.vmap(one)(s2d).sum()


def f_noise(s2d):
    k = acq._noise_filter.size
    region = 2 * w + k

    def one(xc):
        bp, bb, tp, ti, ovf = peaks_only(xc)
        tc2 = jnp.clip(ti - w - (k - 1) // 2, 0, xc.shape[0] - region)
        if jax.default_backend() == "tpu" and fetch_enabled():
            wnr, wni = fetch_regions(xc.real, xc.imag, tc2, region)
        else:
            wnr = jax.vmap(
                lambda t: jax.lax.dynamic_slice(xc.real, (t,), (region,))
            )(tc2)
            wni = jax.vmap(
                lambda t: jax.lax.dynamic_slice(xc.imag, (t,), (region,))
            )(tc2)
        return wnr.sum() + wni.sum()

    return jax.vmap(one)(s2d).sum()


def f_full(s2d):
    det = jax.vmap(lambda xc: acq.acquire(xc))(s2d)
    return det.valid.sum(), det.esn0_db.sum()


for name, fn in [("peaks", f_peaks), ("peaks+corr_points", f_corr_points),
                 ("peaks+noise_fetch", f_noise), ("full", f_full)]:
    jf = jax.jit(fn)
    t0 = time.time()
    out = jax.block_until_ready(jf(xj))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        out = jf(xj)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
