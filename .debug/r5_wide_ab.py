"""Round-5 TPU session 1: A/B the wide-layout fused correlator.

Methodology per CLAUDE.md: stage-difference on the full bank step (16ch x
2^19, >5 ms programs), no d2h before the timings except probe internals.
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

CH = int(os.environ.get("AB_CHANNELS", "16"))
BLOCK = int(os.environ.get("AB_BLOCK", str(1 << 19)))
ITERS = int(os.environ.get("AB_ITERS", "20"))

t00 = time.time()
tx = Transmitter(TxConfig(max_payload_len=1536))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 1500, dtype=np.uint8) for _ in range(12)]
batch = PacketBatch.from_list(payloads, max_len=1536)
s, l = tx.modulate_bursts(batch)
stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
stream = to_host(stream)
signal = np.tile(stream, BLOCK // stream.size + 1)[:BLOCK]
print(json.dumps({"msg": "signal built", "s": round(time.time() - t00, 1)}),
      flush=True)


def run(wide_env, label):
    os.environ["PM_ACQ_WIDE"] = wide_env
    t0 = time.time()
    rx = Receiver(
        RxConfig(
            max_payload_len=1536, max_detections=32, freq_bins=4,
            payload_carrier="vv", acquisition_backend="fused",
        )
    )
    probe_s = time.time() - t0
    fp, pt = rx.front_pad, rx.pad_tail()
    x = np.zeros((CH, fp + BLOCK + pt), np.complex64)
    for c in range(CH):
        x[c, fp : fp + BLOCK] = signal * np.exp(1j * 0.1 * c)
    xj = to_device(x)

    def step(s2d):
        _, _, res, _ = rx.bank_step(s2d, 16)
        return res.accepted.sum(), res.crc_ok.sum()

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
        "label": label, "wide_env": wide_env,
        "ms_per_step": round(dt * 1e3, 3),
        "msps": round(CH * BLOCK / dt / 1e6, 1),
        "compile_s": round(compile_s, 1),
        "probe_s": round(probe_s, 1),
        "accepted": int(np.asarray(out[0])),
    }), flush=True)
    return dt


dt_n = run("0", "narrow")
dt_w = run("1", "wide")
print(json.dumps({"speedup_full_step": round(dt_n / dt_w, 3)}), flush=True)
