"""Fenced per-phase profile of StreamingBank at C channels.

Phases per block, each fenced with block_until_ready:
  quantize (host numpy) / h2d / step dispatch+complete / materialize d2h.
usage: profile_bank2.py [channels] [blocks]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup
_pm_setup()
import jax
import jax.numpy as jnp
import numpy as np

from gr4_packet_modem_tpu.models.receiver import RxConfig
from gr4_packet_modem_tpu.runtime.streaming import StreamingBank
from gr4_packet_modem_tpu.utils.cplx import to_transfer_planes
from benchmarks.common import tiled_burst_signal

C = int(sys.argv[1]) if len(sys.argv) > 1 else 16
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 4
block = 1 << 19

print("backend:", jax.default_backend(), "C =", C, flush=True)
bank = StreamingBank(
    RxConfig(max_payload_len=1536, max_detections=96, freq_bins=4),
    channels=C, block=block, transfer_dtype=jnp.int8,
    group=16 if C > 16 and C % 16 == 0 else 0,
)
sig, _ = tiled_burst_signal(total=block, max_payload_len=1536, payload_len=1500)
x_unit = np.stack([sig * np.exp(1j * 0.1 * c) for c in range(C)]).astype(
    np.complex64
)

# warm-up/compile one block through the public API
t0 = time.time()
n = len(bank.process(x_unit))
print(f"warmup (compile) {time.time()-t0:.1f}s", flush=True)

# fenced phases on the internals
for b in range(NB):
    t0 = time.perf_counter()
    planes_np = to_transfer_planes(x_unit[:, :block], jnp.int8)
    t1 = time.perf_counter()
    planes = jax.block_until_ready(jnp.asarray(planes_np))
    t2 = time.perf_counter()
    bank._abs_offset += block
    outs = bank._step(bank._buf, planes, bank._busy_dev)
    bank._buf = outs[0]
    bank._busy_dev = outs[2]
    jax.block_until_ready(outs[1])
    t3 = time.perf_counter()
    packed = np.asarray(outs[1])
    t4 = time.perf_counter()
    print(
        f"block {b}: quant {1e3*(t1-t0):7.1f}  h2d {1e3*(t2-t1):7.1f}  "
        f"step {1e3*(t3-t2):7.1f}  d2h {1e3*(t4-t3):7.1f}  ms  "
        f"(packed {packed.nbytes/1e6:.1f} MB)",
        flush=True,
    )
tot = None
