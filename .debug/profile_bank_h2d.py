"""Split the StreamingBank per-block h2d cost: numpy quantize vs jnp.asarray
(actual wire) at 8/16/64 channels."""
import sys
import time

sys.path.insert(0, "/root/repo")
from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup
_pm_setup()
import jax
import jax.numpy as jnp
import numpy as np

from gr4_packet_modem_tpu.utils.cplx import to_transfer_planes

print("backend:", jax.default_backend(), flush=True)
block = 1 << 19
rng = np.random.default_rng(0)

for c in (8, 16, 64):
    chunk = (
        rng.standard_normal((c, block)) + 1j * rng.standard_normal((c, block))
    ).astype(np.complex64)
    # warm
    planes = to_transfer_planes(chunk, jnp.int8)
    dev = jax.block_until_ready(jnp.asarray(planes))
    tq = th = 0.0
    reps = 3
    for _ in range(reps):
        t0 = time.perf_counter()
        planes = to_transfer_planes(chunk, jnp.int8)
        t1 = time.perf_counter()
        dev = jax.block_until_ready(jnp.asarray(planes))
        t2 = time.perf_counter()
        tq += t1 - t0
        th += t2 - t1
    mb = planes.nbytes / 1e6
    print(
        f"C={c:3d}: quantize {1e3*tq/reps:7.1f} ms  h2d {1e3*th/reps:7.1f} ms"
        f"  ({mb:.1f} MB, {mb/(th/reps):.0f} MB/s wire)",
        flush=True,
    )
