import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig

STAGE = os.environ["STAGE"]
PLEN = int(os.environ.get("PLEN", "256"))
BLK = int(os.environ.get("BLK", "4096"))
DMAX = int(os.environ.get("DMAX", "64"))
cfg = RxConfig(max_payload_len=PLEN, max_detections=DMAX, freq_bins=4)
rx = Receiver(cfg)
x = jnp.zeros(rx.front_pad + BLK + rx.pad_tail(), jnp.complex64)

def step(xc):
    det = rx.acquirer.acquire(xc)
    if STAGE == "acquire":
        return det.valid.sum()
    hdr, _ = rx.decode_headers(xc, det)
    if STAGE == "headers":
        return hdr.header_ok.sum()
    keep = rx.filter_detections(det, hdr)
    if STAGE == "filter":
        return keep.sum()
    res = rx.decode_payloads(xc, det, hdr, keep)
    return res.accepted.sum()

t0 = time.time()
out = jax.block_until_ready(jax.jit(step)(x))
print(f"{STAGE} PLEN={PLEN} BLK={BLK} D={DMAX} OK", round(time.time() - t0, 1), int(out), flush=True)
