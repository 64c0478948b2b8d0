"""Round-2 per-stage RX profile on TPU (VERDICT item 1a).

Times each receiver stage as a separate jit over the bench.py workload:
  acquire | headers | filter | payload(costas) | payload(vv)
Env: BENCH_CHANNELS, BENCH_BLOCK, BENCH_ITERS, STAGES (csv subset).
Prints one JSON line per stage.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

cache = os.environ.get("JAX_CACHE", "/root/repo/.jax_cache")
if cache:
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax
import jax.numpy as jnp

from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.utils.cplx import to_device, to_host
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat


def build_signal(channels, block, payload_len=1500):
    tx = Transmitter(TxConfig(max_payload_len=1536))
    rng = np.random.default_rng(0)
    payloads = [rng.integers(0, 256, payload_len, dtype=np.uint8) for _ in range(12)]
    batch = PacketBatch.from_list(payloads, max_len=1536)
    s, l = tx.modulate_bursts(batch)
    lens = np.asarray(l)
    stream, total = ragged_concat(s, l, int(lens.sum()))
    stream = to_host(stream)
    reps = block // stream.size + 1
    return np.tile(stream, reps)[:block]


def main():
    channels = int(os.environ.get("BENCH_CHANNELS", "8"))
    block = int(os.environ.get("BENCH_BLOCK", str(1 << 18)))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    stages = os.environ.get(
        "STAGES", "acquire,headers,filter,full_vv,full_costas"
    ).split(",")
    backend = os.environ.get("ACQ_BACKEND", "fft")

    signal = build_signal(channels, block)
    rx_vv = Receiver(
        RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4,
                 payload_carrier="vv", acquisition_backend=backend)
    )
    rx_co = Receiver(
        RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4,
                 payload_carrier="costas", acquisition_backend=backend)
    )
    fp, pt = rx_vv.front_pad, rx_vv.pad_tail()
    x = np.zeros((channels, fp + block + pt), np.complex64)
    for c in range(channels):
        x[c, fp : fp + block] = signal * np.exp(1j * 0.1 * c)
    xj = to_device(x)

    def mk(rx, upto):
        def per_channel(xc):
            det = rx.acquirer.acquire(xc)
            if upto == "acquire":
                return det.valid.sum()
            hdr, _ = rx.decode_headers(xc, det)
            if upto == "headers":
                return hdr.header_ok.sum()
            keep = rx.filter_detections(det, hdr)
            if upto == "filter":
                return keep.sum()
            res = rx.decode_payloads(xc, det, hdr, keep)
            return res.accepted.sum()

        return jax.jit(lambda s2d: jax.vmap(per_channel)(s2d))

    fns = {
        "acquire": mk(rx_vv, "acquire"),
        "headers": mk(rx_vv, "headers"),
        "filter": mk(rx_vv, "filter"),
        "full_vv": mk(rx_vv, "full"),
        "full_costas": mk(rx_co, "full"),
    }
    for name in stages:
        name = name.strip()
        fn = fns[name]
        t0 = time.time()
        out = jax.block_until_ready(fn(xj))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn(xj)
        jax.block_until_ready(out)
        dt = time.time() - t0
        sps = channels * block * iters / dt
        print(json.dumps({
            "stage": name,
            "msps": round(sps / 1e6, 2),
            "ms_per_step": round(dt / iters * 1e3, 3),
            "compile_s": round(compile_s, 1),
            "check": int(np.asarray(out).sum()),
        }), flush=True)


if __name__ == "__main__":
    main()
