#!/bin/bash
# Round-2 TPU measurement batch — run top to bottom once the tunnel is
# healthy. Each step is independently resumable; keep an eye on wedging
# (if a trivial jit hangs afterwards, stop and wait).
set -x
cd /root/repo
export JAX_CACHE_DIR=/root/repo/.jax_cache

# 0. tunnel health
timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,128)); print('alive', float((x@x.T).sum()))" || exit 1

# 1. Pallas kernels gate (small compiles first)
timeout 560 python .debug/tpu_pallas_gate.py 2>&1 | grep -v -i warning

# 2. headline bench, vv (new kernels + acquisition changes)
timeout 560 python bench.py 2>&1 | tail -1

# 3. headline bench, costas (pallas loop-exact)
BENCH_CARRIER=costas timeout 560 python bench.py 2>&1 | tail -1

# 4. per-stage table
BENCH_ITERS=10 timeout 560 python scripts/profile_rx.py 2>&1 | grep -v -i warning

# 5. acquisition sub-stages + backend shootout
timeout 560 python .debug/profile_acq6.py 2>&1 | grep -v -i warning

# 6. scaling record
timeout 580 python scripts/record_scaling.py SCALING_r02.json 2>&1 | tail -5

# 7. TX benchmark
timeout 560 python benchmarks/benchmark_packet_transmitter_pdu.py 2>&1 | tail -3

# 8. compile time vs max_payload_len
for ML in 1536 4096 16384; do
  timeout 560 python - <<EOF
import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_nocache_$ML")
import numpy as np, jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.utils.cplx import to_device
rx = Receiver(RxConfig(max_payload_len=$ML, max_detections=8, payload_carrier="vv"))
T = rx.front_pad + (1<<18) + rx.pad_tail()
x = to_device(np.zeros((2, T), np.complex64))
t0 = time.time()
fn = jax.jit(lambda s2d: jax.vmap(lambda xc: rx.decode_payloads(xc, (d := rx.acquirer.acquire(xc)), (h := rx.decode_headers(xc, d)[0]), rx.filter_detections(d, h)).accepted.sum())(s2d))
out = jax.block_until_ready(fn(x))
print(f"max_payload_len=$ML compile+first-run {time.time()-t0:.1f}s")
EOF
done
echo BATCH DONE
