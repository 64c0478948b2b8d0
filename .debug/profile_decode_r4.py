"""Fenced decode-side profile at 16ch x 2^19 (device-resident bench shapes).

Stages: acquire | decode_headers | filter | decode_payloads, each timed as
a separate jit over the same inputs (cost = own stage only, since inputs
are precomputed device arrays).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup
_pm_setup()
import jax
import jax.numpy as jnp
import numpy as np

from gr4_packet_modem_tpu.models.receiver import (
    Receiver, RxConfig, flatten_detections,
)
from gr4_packet_modem_tpu.utils.cplx import to_device
from benchmarks.common import tiled_burst_signal

C, block = 16, 1 << 19
carrier = "vv"
rx = Receiver(RxConfig(
    max_payload_len=1536, max_detections=32, freq_bins=4,
    payload_carrier=carrier,
))
sig, _ = tiled_burst_signal(total=block, max_payload_len=1536, payload_len=1500)
x = np.stack([sig * np.exp(1j * 0.1 * c) for c in range(C)]).astype(np.complex64)
fp, pt = rx.front_pad, rx.pad_tail()
xp = np.zeros((C, fp + block + pt), np.complex64)
xp[:, fp:fp + block] = x
xj = to_device(xp)
print("backend:", jax.default_backend(), flush=True)


def timeit(label, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {dt:7.2f} ms", flush=True)
    return out


@jax.jit
def f_acquire(xc):
    det = jax.vmap(rx.acquirer.acquire)(xc)
    return det

det = timeit("acquire        ", f_acquire, xj)

@jax.jit
def f_headers(xc, det):
    detf, chan = flatten_detections(det)
    hdr, corr = rx.decode_headers(xc, detf, chan)
    return detf, chan, hdr

detf, chan, hdr = timeit("decode_headers ", f_headers, xj, det)

@jax.jit
def f_filter(det, hdr):
    from gr4_packet_modem_tpu.models.receiver import (
        packet_extent_samples, suppress_overlapping,
    )
    extent = packet_extent_samples(
        hdr.packet_length, hdr.header_ok, rx.config.samples_per_symbol
    )
    dd = rx.config.max_detections
    _, keep = jax.vmap(suppress_overlapping)(
        det.index, det.valid, extent.reshape(C, dd),
        jnp.full((C,), -(1 << 30), jnp.int32),
    )
    return keep.reshape(-1)

keep = timeit("filter         ", f_filter, det, hdr)

@jax.jit
def f_payload(xc, detf, hdr, keep, chan):
    res = rx.decode_payloads(xc, detf, hdr, keep, chan)
    return res.accepted.sum(), res.crc_ok.sum(), res.data.sum()

timeit("decode_payloads", f_payload, xj, detf, hdr, keep, chan)
