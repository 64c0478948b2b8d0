"""Which piece SIGSEGVs: small-config rx_step vs streaming step? One per run."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig

MODE = os.environ["MODE"]
cfg = RxConfig(max_payload_len=256, max_detections=64, freq_bins=4)

if MODE == "rx_step":
    rx = Receiver(cfg)
    t = 4096
    x = jnp.zeros(rx.front_pad + t + rx.pad_tail(), jnp.complex64)
    def step(xc):
        det = rx.acquirer.acquire(xc)
        hdr, _ = rx.decode_headers(xc, det)
        keep = rx.filter_detections(det, hdr)
        res = rx.decode_payloads(xc, det, hdr, keep)
        return res.accepted.sum()
    t0 = time.time()
    out = jax.block_until_ready(jax.jit(step)(x))
    print("rx_step OK", time.time() - t0, int(out), flush=True)
elif MODE == "streaming":
    from gr4_packet_modem_tpu.runtime.streaming import StreamingReceiver
    srx = StreamingReceiver(cfg, block=4096)
    t0 = time.time()
    out = srx.process(np.zeros(4096, np.complex64))
    print("streaming OK", time.time() - t0, len(out), flush=True)
