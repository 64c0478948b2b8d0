"""Fence the header pass internals: acquire+extract -> +costas -> full
headers (incl. LDPC) -> +payload extract (16ch x 2^19, det24, fused)."""

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

from gr4_packet_modem_tpu.models.receiver import (
    Receiver, RxConfig, flatten_detections,
)
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.utils import constants as C
from gr4_packet_modem_tpu.utils.cplx import to_device, to_host
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

CH = 16
BLOCK = 1 << 19
ITERS = 15
HREG = C.SYNCWORD_LEN + C.HEADER_SYMBOLS  # 192

tx = Transmitter(TxConfig(max_payload_len=1536))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 1500, dtype=np.uint8) for _ in range(12)]
batch = PacketBatch.from_list(payloads, max_len=1536)
s, l = tx.modulate_bursts(batch)
stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
stream = to_host(stream)
signal = np.tile(stream, BLOCK // stream.size + 1)[:BLOCK]

rx = Receiver(
    RxConfig(max_payload_len=1536, max_detections=24, freq_bins=4,
             payload_carrier="vv", acquisition_backend="fused")
)
fp, pt = rx.front_pad, rx.pad_tail()
x = np.zeros((CH, fp + BLOCK + pt), np.complex64)
for c in range(CH):
    x[c, fp : fp + BLOCK] = signal * np.exp(1j * 0.1 * c)
xj = to_device(x)


def base(s2d):
    det = jax.vmap(lambda xc: rx.acquirer.acquire(xc))(s2d)
    detf, chan = flatten_detections(det)
    arm, n_base, phase0 = rx._timing(detf)
    amp_scale = 1.0 / jnp.maximum(detf.amplitude, 1e-9)
    return detf, chan, arm, n_base, phase0, amp_scale


def f_extract(s2d):
    detf, chan, arm, n_base, phase0, amp_scale = base(s2d)
    syms = rx._extract_symbols(
        s2d, n_base, arm, detf.freq, detf.index, amp_scale, 0, HREG, chan
    )
    return syms.real.sum(), syms.imag.sum()


def f_costas(s2d):
    detf, chan, arm, n_base, phase0, amp_scale = base(s2d)
    syms = rx._extract_symbols(
        s2d, n_base, arm, detf.freq, detf.index, amp_scale, 0, HREG, chan
    )
    wipe = jnp.concatenate(
        [jnp.asarray(rx._sync_bipolar), jnp.ones(C.HEADER_SYMBOLS, jnp.float32)]
    )
    syms = syms * wipe[None]
    corrected, ph, fr = rx._carrier_track(
        syms, phase0, jnp.zeros_like(phase0), offset=0
    )
    return corrected.real.sum(), ph.sum(), fr.sum()


def f_headers(s2d):
    detf, chan = flatten_detections(
        jax.vmap(lambda xc: rx.acquirer.acquire(xc))(s2d)
    )
    hdr, _ = rx.decode_headers(s2d, detf, chan)
    return hdr.header_ok.sum(), hdr.packet_length.sum(), hdr.phase.sum()


def f_pay_extract(s2d):
    detf, chan, arm, n_base, phase0, amp_scale = base(s2d)
    syms = rx._extract_symbols(
        s2d, n_base, arm, detf.freq, detf.index, amp_scale, HREG,
        rx.config.max_payload_syms, chan,
    )
    return syms.real.sum(), syms.imag.sum()


for name, fn in [("acq+hdr_extract", f_extract), ("acq+extract+costas", f_costas),
                 ("acq+headers_full", f_headers),
                 ("acq+payload_extract", f_pay_extract)]:
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
