#!/bin/bash
# Round-2 TPU measurement batch v2 — one high-value step per tunnel window.
set -x
cd /root/repo
export JAX_CACHE_DIR=/root/repo/.jax_cache

timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,128)); print('alive', float((x@x.T).sum()))" || exit 1

# 1. THE number: fused acquisition + pallas fetch/costas/ldpc, vv carrier
BENCH_SUSTAINED=0 BENCH_ACQ=fused timeout 560 python bench.py 2>&1 | grep '"metric"'

# 2. loop-exact costas with all kernels
BENCH_SUSTAINED=0 BENCH_ACQ=fused BENCH_CARRIER=costas timeout 560 python bench.py 2>&1 | grep '"metric"'

# 3. stage table with fused config
BENCH_ITERS=10 timeout 560 python scripts/profile_rx.py 2>&1 | grep '"stage"'

# 4. full bench line incl. sustained streaming (the BENCH_rN record)
BENCH_ACQ=fused timeout 560 python bench.py 2>&1 | grep '"metric"'

# 5. scaling record
timeout 580 python scripts/record_scaling.py SCALING_r02.json 2>&1 | tail -5

# 6. TX benchmark
timeout 560 python benchmarks/benchmark_packet_transmitter_pdu.py 2>&1 | tail -3
echo BATCH DONE
