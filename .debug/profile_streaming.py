"""Fenced per-phase timing of the sustained streaming path (round 3)."""
import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from gr4_packet_modem_tpu.utils.platform import setup
setup()
from gr4_packet_modem_tpu.models.receiver import RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.runtime.streaming import StreamingReceiver
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat
from gr4_packet_modem_tpu.utils.cplx import to_host

block = int(os.environ.get("BENCH_BLOCK", str(1 << 19)))
tx = Transmitter(TxConfig(max_payload_len=1536))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 1500, dtype=np.uint8) for _ in range(12)]
batch = PacketBatch.from_list(payloads, max_len=1536)
s, l = tx.modulate_bursts(batch)
stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
stream = to_host(stream)
sig = np.tile(stream, block // stream.size + 1)[:block]

srx = StreamingReceiver(
    RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4,
             payload_carrier="vv"),
    block=block, transfer_dtype=jnp.int8, pipeline_depth=0,  # fenced mode
)
# warmup/compile
srx.process(sig); srx._drain()
srx.process(sig); srx._drain()
for it in range(3):
    from gr4_packet_modem_tpu.utils.cplx import to_transfer_planes
    t0 = time.perf_counter()
    pl_host = to_transfer_planes(sig, jnp.int8)
    tq = time.perf_counter()
    planes = jnp.asarray(pl_host)
    ta = time.perf_counter()
    jax.block_until_ready(planes)
    t1 = time.perf_counter()
    print(f"  quant {1e3*(tq-t0):6.1f} asarray {1e3*(ta-tq):6.1f} wait {1e3*(t1-ta):6.1f}", flush=True)
    # manual _process_block without pipeline
    srx._abs_offset += srx.block
    outs = srx._step(srx._buf, planes, srx._busy_dev)
    srx._buf = outs[0]
    srx._busy_dev = outs[2]
    jax.block_until_ready(outs[1])
    t2 = time.perf_counter()
    pkts = srx._materialize((outs, srx._abs_offset))
    t3 = time.perf_counter()
    print(f"h2d {1e3*(t1-t0):7.1f} ms | step {1e3*(t2-t1):7.1f} ms | mat {1e3*(t3-t2):7.1f} ms | pkts {len(pkts)}", flush=True)
