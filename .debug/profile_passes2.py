"""Lane-packed decode pass sub-stages on TPU (bench shapes, flat batch).

Cumulative stages through the flat-batch internals so differences isolate:
timing+extract(hdr), +costas(hdr), +ldpc(hdr full), payload extract, +vv,
+llr/pack, full payload decode. Acquisition runs in every stage (cached
baseline measured separately as acq).
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import (
    Receiver, RxConfig, _HEADER_REGION_SYMS, flatten_detections)
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.utils.cplx import to_device, to_host
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat
from gr4_packet_modem_tpu.ops import ldpc
from gr4_packet_modem_tpu.ops.scramble import keystream
from gr4_packet_modem_tpu.ops.packing import pack_bits
from gr4_packet_modem_tpu.utils import constants as C

channels = int(os.environ.get("CH", "16"))
block = 1 << int(os.environ.get("LOGBLOCK", "19"))
iters = int(os.environ.get("ITERS", "10"))

tx = Transmitter(TxConfig(max_payload_len=1536))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 1500, dtype=np.uint8) for _ in range(12)]
batch = PacketBatch.from_list(payloads, max_len=1536)
s, l = tx.modulate_bursts(batch)
stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
stream = to_host(stream)
signal = np.tile(stream, block // stream.size + 1)[:block]
rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4,
                       payload_carrier="vv"))
fp, pt = rx.front_pad, rx.pad_tail()
x = np.zeros((channels, fp + block + pt), np.complex64)
for c in range(channels):
    x[c, fp:fp + block] = signal * np.exp(1j * 0.1 * c)
xj = to_device(x)

S_PAY = rx.config.max_payload_syms


def mk(upto):
    def fn(x2d):
        det = jax.vmap(lambda xc: rx.acquirer.acquire(xc))(x2d)
        detf, chan = flatten_detections(det)
        if upto == "acq":
            return detf.index.sum() + detf.valid.sum()
        arm, n_base, phase0 = rx._timing(detf)
        amp = 1.0 / jnp.maximum(detf.amplitude, 1e-9)
        if upto == "hdr_extract":
            syms = rx._extract_symbols(x2d, n_base, arm, detf.freq,
                                       detf.index, amp, 0,
                                       _HEADER_REGION_SYMS, chan)
            return jnp.abs(syms).sum()
        if upto == "hdr_costas":
            syms = rx._extract_symbols(x2d, n_base, arm, detf.freq,
                                       detf.index, amp, 0,
                                       _HEADER_REGION_SYMS, chan)
            corrected, ph, fr = rx._carrier_track(
                syms, phase0, jnp.zeros_like(phase0), 0)
            return jnp.abs(corrected).sum() + ph.sum()
        hdr, _ = rx.decode_headers(x2d, detf, chan)
        if upto == "hdr_full":
            return hdr.header_ok.sum() + hdr.n_base.sum()
        if upto == "pay_extract":
            syms = rx._extract_symbols(x2d, hdr.n_base, hdr.arm, detf.freq,
                                       detf.index, hdr.amp_scale,
                                       _HEADER_REGION_SYMS, S_PAY, chan)
            return jnp.abs(syms).sum()
        if upto == "pay_vv":
            syms = rx._extract_symbols(x2d, hdr.n_base, hdr.arm, detf.freq,
                                       detf.index, hdr.amp_scale,
                                       _HEADER_REGION_SYMS, S_PAY, chan)
            corrected = rx._vv_track(syms, hdr.phase, hdr.freq)
            return jnp.abs(corrected).sum()
        if upto == "pay_llrpack":
            syms = rx._extract_symbols(x2d, hdr.n_base, hdr.arm, detf.freq,
                                       detf.index, hdr.amp_scale,
                                       _HEADER_REGION_SYMS, S_PAY, chan)
            corrected = rx._vv_track(syms, hdr.phase, hdr.freq)
            llrs = jnp.stack([corrected.real, corrected.imag],
                             axis=-1).reshape(corrected.shape[0], -1)
            ks = keystream(512 + 2 * S_PAY)[512:]
            llrs = jnp.where(ks.astype(bool)[None], -llrs, llrs)
            bits = (llrs < 0).astype(jnp.uint8)
            return pack_bits(bits, 8).astype(jnp.uint8).sum()
        # full
        extent_keep = rx.filter_detections
        _, hdr2, res, keep = rx.decode_bank(x2d, det)
        return res.accepted.sum()
    return jax.jit(fn)


names = os.environ.get(
    "STAGES",
    "acq,hdr_extract,hdr_costas,hdr_full,pay_extract,pay_vv,pay_llrpack,full",
).split(",")
for name in names:
    fn = mk(name)
    t0 = time.time(); out = jax.block_until_ready(fn(xj)); comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(xj)
    out = jax.block_until_ready(out)
    print(json.dumps({"stage": name,
                      "ms": round((time.time() - t0) / iters * 1e3, 3),
                      "compile_s": round(comp, 1),
                      "val": float(np.asarray(out))}), flush=True)
