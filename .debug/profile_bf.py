"""A/B block_frames (and bf16) for the fused correlator at 16ch x 2^19."""
import sys
import time

sys.path.insert(0, "/root/repo")
from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup
_pm_setup()
import jax
import jax.numpy as jnp
import numpy as np

from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.ops.acquire_pallas import fused_best_power
from gr4_packet_modem_tpu.utils.cplx import to_device
from benchmarks.common import tiled_burst_signal

C, block = 16, 1 << 19
rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4))
acq = rx.acquirer
sig, _ = tiled_burst_signal(total=block, max_payload_len=1536, payload_len=1500)
x = np.stack([sig * np.exp(1j * 0.1 * c) for c in range(C)]).astype(np.complex64)
fp, pt = rx.front_pad, rx.pad_tail()
xp = np.zeros((C, fp + block + pt), np.complex64)
xp[:, fp:fp + block] = x
xj = to_device(xp)
n = acq.config.fft_size
s = acq.stride
print("backend:", jax.default_backend(), flush=True)

ref = None
for bf in (16, 32, 64):
    for use_bf16 in (False, True):
        @jax.jit
        def f(xc, bf=bf, use_bf16=use_bf16):
            def one(xrow):
                f_ = (xrow.shape[0] - n) // s + 1
                fpad = -(-f_ // bf) * bf
                ar, ai, br, bi = acq._frames_planes(xrow, fpad)
                rfr, rfi = acq._replica_fft_conj()
                bp, bb = fused_best_power(
                    ar, ai, br, bi, rfr, rfi, n,
                    block_frames=bf, bf16=use_bf16,
                )
                return bp[:f_, :s].reshape(-1), bb[:f_, :s].reshape(-1)
            bp, bb = jax.vmap(one)(xc)
            return bp.sum(), bp.max(), bb.astype(jnp.int32).sum()

        out = jax.block_until_ready(f(xj))
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(xj)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10 * 1e3
        if ref is None:
            ref = out
        match = (
            abs(float(out[1]) - float(ref[1])) / max(float(ref[1]), 1e-9) < 2e-2
        )
        print(
            f"bf={bf:3d} bf16={int(use_bf16)}: {dt:7.2f} ms  peak-match={match}",
            flush=True,
        )
