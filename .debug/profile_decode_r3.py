"""Decode-pass sub-stage profile on TPU at bench shapes (lane-packed path).

Stages build cumulatively on the decode_bank(upto=...) hooks so differences
isolate: acquisition, header pass, suppression filter, payload pass.
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.utils.cplx import to_device, to_host
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

channels = int(os.environ.get("CH", "16"))
block = 1 << int(os.environ.get("LOGBLOCK", "19"))
iters = int(os.environ.get("ITERS", "10"))
carrier = os.environ.get("CARRIER", "vv")

tx = Transmitter(TxConfig(max_payload_len=1536))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 1500, dtype=np.uint8) for _ in range(12)]
batch = PacketBatch.from_list(payloads, max_len=1536)
s, l = tx.modulate_bursts(batch)
stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
stream = to_host(stream)
signal = np.tile(stream, block // stream.size + 1)[:block]
rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4,
                       payload_carrier=carrier))
fp, pt = rx.front_pad, rx.pad_tail()
x = np.zeros((channels, fp + block + pt), np.complex64)
for c in range(channels):
    x[c, fp:fp + block] = signal * np.exp(1j * 0.1 * c)
xj = to_device(x)


def acquire_only(s2d):
    det = jax.vmap(lambda xc: rx.acquirer.acquire(xc))(s2d)
    return det.index.sum() + det.valid.sum()


def upto_headers(s2d):
    det = jax.vmap(lambda xc: rx.acquirer.acquire(xc))(s2d)
    detf, hdr = rx.decode_bank(s2d, det, "headers")
    return hdr.header_ok.sum() + hdr.n_base.sum()


def upto_filter(s2d):
    det = jax.vmap(lambda xc: rx.acquirer.acquire(xc))(s2d)
    detf, hdr, keep = rx.decode_bank(s2d, det, "filter")
    return keep.sum() + hdr.header_ok.sum()


def full(s2d):
    det = jax.vmap(lambda xc: rx.acquirer.acquire(xc))(s2d)
    detf, hdr, res, keep = rx.decode_bank(s2d, det)
    return res.accepted.sum()


stages = {
    "acquire_only": jax.jit(acquire_only),
    "upto_headers": jax.jit(upto_headers),
    "upto_filter": jax.jit(upto_filter),
    "full": jax.jit(full),
}
which = os.environ.get("STAGES")
if which:
    stages = {k: stages[k] for k in which.split(",")}
for name, fn in stages.items():
    t0 = time.time(); out = jax.block_until_ready(fn(xj)); comp = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(xj)
    out = jax.block_until_ready(out)
    print(json.dumps({"stage": name,
                      "ms": round((time.time() - t0) / iters * 1e3, 3),
                      "compile_s": round(comp, 1),
                      "val": float(np.asarray(out))}), flush=True)
