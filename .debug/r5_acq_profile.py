"""Fence the acquire stage's internals (16ch x 2^19, fused backend):
correlator only -> + peak detect -> full acquire. Differences locate the
estimation/noise-filter tail (suspected: the noise estimator runs a 33-tap
convolve + cumsum over the ENTIRE buffer for values needed only at <= D
candidate points)."""

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
    AcquisitionConfig(
        samples_per_symbol=4, freq_bins=4, max_detections=24,
        backend="fused",
    )
)
pad = 5556  # front_pad-ish + tail margin; absolute size is irrelevant here
x = np.zeros((CH, BLOCK + pad), np.complex64)
for c in range(CH):
    x[c, : BLOCK] = signal * np.exp(1j * 0.1 * c)
xj = to_device(x)

w = acq.config.time_threshold
d = acq.config.max_detections
thr = acq.config.power_threshold


def f_corr(s2d):
    bp, bb = jax.vmap(acq._best_power_fused)(s2d)
    return bp.sum(), bb.sum()


def f_peaks(s2d):
    def one(xc):
        bp, bb = acq._best_power_fused(xc)
        tp, ti, ovf = chunked_peak_detect(bp, w, d, thr)
        return tp.sum(), ti.sum(), ovf

    return jax.tree.map(jnp.sum, jax.vmap(one)(s2d))


def f_full(s2d):
    det = jax.vmap(lambda xc: acq.acquire(xc))(s2d)
    return det.valid.sum(), det.esn0_db.sum()


for name, fn in [("corr", f_corr), ("corr+peaks", f_peaks),
                 ("full_acquire", f_full)]:
    jf = jax.jit(fn)
    t0 = time.time()
    out = jax.block_until_ready(jf(xj))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        out = jf(xj)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    print(json.dumps({
        "stage": name, "ms": round(dt * 1e3, 3),
        "compile_s": round(compile_s, 1),
    }), flush=True)
