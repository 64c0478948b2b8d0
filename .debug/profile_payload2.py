"""Bisect decode_payloads with REAL bench inputs, full-array outputs."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig, _HEADER_REGION_SYMS
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.ops.scramble import keystream
from gr4_packet_modem_tpu.ops.packing import pack_bits
from gr4_packet_modem_tpu.utils import constants as C
from gr4_packet_modem_tpu.utils.cplx import to_device, to_host
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

CH = int(os.environ.get("BENCH_CHANNELS", "8"))
BLOCK = int(os.environ.get("BENCH_BLOCK", str(1 << 18)))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))

tx = Transmitter(TxConfig(max_payload_len=1536))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 1500, dtype=np.uint8) for _ in range(12)]
batch = PacketBatch.from_list(payloads, max_len=1536)
s, l = tx.modulate_bursts(batch)
stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
stream = to_host(stream)
signal = np.tile(stream, BLOCK // stream.size + 1)[:BLOCK]

rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4,
                       payload_carrier="vv"))
fp, pt = rx.front_pad, rx.pad_tail()
x = np.zeros((CH, fp + BLOCK + pt), np.complex64)
for c in range(CH):
    x[c, fp : fp + BLOCK] = signal * np.exp(1j * 0.1 * c)
xj = to_device(x)

# concrete det/hdr/keep from one header pass
prep = jax.jit(lambda s2d: jax.vmap(
    lambda xc: (rx.acquirer.acquire(xc),) )(s2d))
det = jax.block_until_ready(jax.vmap(rx.acquirer.acquire)(xj))
hdr, _ = jax.vmap(rx.decode_headers)(xj, det)
keep = jax.vmap(rx.filter_detections)(det, hdr)
jax.block_until_ready((det, hdr, keep))
print("prep done", flush=True)

S_PAY = rx.config.max_payload_syms


def ext_only(xc, det, hdr):
    return rx._extract_symbols(
        xc, hdr.n_base, hdr.arm, det.freq, det.index, hdr.amp_scale,
        _HEADER_REGION_SYMS, S_PAY)


def ext_vv(xc, det, hdr):
    syms = ext_only(xc, det, hdr)
    return rx._vv_track(syms, hdr.phase, hdr.freq)


def full(xc, det, hdr, keep):
    return rx.decode_payloads(xc, det, hdr, keep)


def post_ext(corrected, hdr, keep):
    """Everything after carrier correction: llr/descramble/pack/crc."""
    cfg = rx.config
    llrs = jnp.stack([corrected.real, corrected.imag], axis=-1).reshape(
        corrected.shape[0], -1) * rx._llr_scale
    ks = keystream(C.HEADER_LLRS + 2 * S_PAY)[C.HEADER_LLRS:]
    llrs = jnp.where(ks.astype(bool)[None], -llrs, llrs)
    bits = (llrs < 0).astype(jnp.uint8)
    all_bytes = pack_bits(bits, 8).astype(jnp.uint8)
    plen = hdr.packet_length
    payload = all_bytes[:, : cfg.max_payload_len]
    pos = jnp.arange(cfg.max_payload_len, dtype=jnp.int32)[None, :]
    payload = jnp.where(pos < plen[:, None], payload, 0)
    crc = rx._crc.compute(payload, jnp.clip(plen, 0, cfg.max_payload_len))
    return payload, crc


def run(name, fn, args):
    f = jax.jit(lambda *a: jax.vmap(fn)(*a))
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    print(json.dumps({"part": name, "ms": round(dt * 1e3, 3),
                      "compile_s": round(comp, 1)}), flush=True)


corr = jax.block_until_ready(jax.jit(lambda x, d, h: jax.vmap(ext_vv)(x, d, h))(xj, det, hdr))

parts = os.environ.get("PARTS", "ext,vv,post,full").split(",")
if "ext" in parts:
    run("ext_only", ext_only, (xj, det, hdr))
if "vv" in parts:
    run("ext+vv", ext_vv, (xj, det, hdr))
if "post" in parts:
    run("post_ext", post_ext, (corr, hdr, keep))
if "full" in parts:
    run("full_payload", full, (xj, det, hdr, keep))
