"""Probe which (start, shape) alignments this Mosaic accepts for 1-D f32
HBM->VMEM make_async_copy with scalar-prefetch dynamic starts."""
import sys
import traceback

sys.path.insert(0, "/root/repo")
from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup
_pm_setup()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)


def try_fetch(label, starts, shape):
    def kernel(starts_ref, x_hbm, out_ref, sem):
        d = pl.program_id(0)
        s0 = starts_ref[d]
        c = pltpu.make_async_copy(
            x_hbm.at[pl.ds(s0, shape)], out_ref.at[0, 0], sem
        )
        c.start()
        c.wait()

    x = np.arange(16384, dtype=np.float32)
    st = np.asarray(starts, np.int32)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(len(starts),),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, shape), lambda i: (i, 0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            out_shape=jax.ShapeDtypeStruct((len(starts), 1, shape), jnp.float32),
        )(jnp.asarray(st), jnp.asarray(x))
        out = np.asarray(out)[:, 0, :]
        expect = np.stack([x[s : s + shape] for s in starts])
        print(f"{label}: COMPILED, correct={bool((out == expect).all())}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{label}: FAIL {type(e).__name__}: {msg}", flush=True)


try_fetch("shape1024_arb_start", [3, 517, 4099], 1024)
try_fetch("shape1024_128al_start", [0, 512, 4096], 1024)
try_fetch("shape1024_1024al_start", [0, 1024, 4096], 1024)
try_fetch("shape2048_1024al_start", [0, 1024, 4096], 2048)
try_fetch("shape384_arb_start", [3, 517, 4099], 384)
