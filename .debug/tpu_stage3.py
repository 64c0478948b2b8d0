import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.utils.cplx import to_device
from benchmarks.common import tiled_burst_signal

T = 1 << 17
t0=time.time()
sig, npkts = tiled_burst_signal(total=T)
print(f"TX build (on TPU): {time.time()-t0:.1f}s, {npkts} packets/block", flush=True)

for carrier in ["costas", "vv"]:
    rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4, payload_carrier=carrier))
    fp, pt = rx.front_pad, rx.pad_tail()
    x = np.zeros(fp + T + pt, np.complex64)
    x[fp:fp+T] = sig
    xj = to_device(x)
    def timed(name, f, *a):
        t0=time.time(); r = f(*a); jax.block_until_ready(jax.tree.leaves(r)[0])
        print(f"[{carrier}] {name} compile+run: {time.time()-t0:.1f}s", flush=True)
        t0=time.time()
        for _ in range(10): r = f(*a)
        jax.block_until_ready(jax.tree.leaves(r)[0])
        dt = (time.time()-t0)/10
        print(f"[{carrier}]   run: {dt*1e3:.2f}ms -> {T/dt/1e6:.0f} Msps", flush=True)
        return r
    det = timed("acquire", rx.acquirer.acquire, xj)
    print(f"[{carrier}] detections: {int(np.asarray(det.valid).sum())}", flush=True)
    hdr, _ = timed("headers", rx.decode_headers, xj, det)
    print(f"[{carrier}] headers ok: {int(np.asarray(hdr.header_ok).sum())}", flush=True)
    keep = timed("filter", rx.filter_detections, det, hdr)
    res = timed("payloads", rx.decode_payloads, xj, det, hdr, keep)
    print(f"[{carrier}] accepted: {int(np.asarray(res.accepted).sum())}/{npkts}", flush=True)
