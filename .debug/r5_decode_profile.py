"""Round-5 TPU session: decompose the decode passes' cost.

Stage profile at HEAD shows acquire 4.63 / headers +2.84 / payload +3.6 ms
per 16ch x 2^19 step. This matrix varies ONE factor per config (full-step
timing, stage-difference methodology) to locate where the 6.4 ms of decode
lives: detection-row count, matched-filter kernel, costas kernel, LDPC
kernel. All configs share the process (warm tunnel), each gets its own
Receiver (jit cache keyed on self).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()

import jax

from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.utils.cplx import to_device, to_host
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

CH = 16
BLOCK = 1 << 19
ITERS = 15

tx = Transmitter(TxConfig(max_payload_len=1536))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 1500, dtype=np.uint8) for _ in range(12)]
batch = PacketBatch.from_list(payloads, max_len=1536)
s, l = tx.modulate_bursts(batch)
stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
stream = to_host(stream)
signal = np.tile(stream, BLOCK // stream.size + 1)[:BLOCK]

CONFIGS = [
    ("base_det32", 32, {}),
    ("det24", 24, {}),
    ("det16", 16, {}),
    ("matched_off", 32, {"PM_PALLAS_MATCHED": "0"}),
    ("costas_off", 32, {"PM_PALLAS_COSTAS": "0"}),
    ("ldpc_off", 32, {"PM_PALLAS_LDPC": "0"}),
]


def run(label, max_det, env):
    for k, v in env.items():
        os.environ[k] = v
    try:
        rx = Receiver(
            RxConfig(
                max_payload_len=1536, max_detections=max_det, freq_bins=4,
                payload_carrier="vv", acquisition_backend="fused",
            )
        )
        fp, pt = rx.front_pad, rx.pad_tail()
        x = np.zeros((CH, fp + BLOCK + pt), np.complex64)
        for c in range(CH):
            x[c, fp : fp + BLOCK] = signal * np.exp(1j * 0.1 * c)
        xj = to_device(x)

        def step(s2d):
            _, _, res, _ = rx.bank_step(s2d, 16)
            return res.accepted.sum()

        fn = jax.jit(step)
        t0 = time.time()
        out = jax.block_until_ready(fn(xj))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(xj)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / ITERS
        print(json.dumps({
            "label": label, "ms_per_step": round(dt * 1e3, 3),
            "msps": round(CH * BLOCK / dt / 1e6, 1),
            "compile_s": round(compile_s, 1),
            "accepted": int(np.asarray(out)),
        }), flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)


for label, max_det, env in CONFIGS:
    try:
        run(label, max_det, env)
    except Exception as e:
        print(json.dumps({"label": label, "error": repr(e)[:300]}),
              flush=True)
