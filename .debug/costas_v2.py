"""Costas kernel v2 experiment: merged I/Q array + 4x unroll, vs v1."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial
from gr4_packet_modem_tpu.utils import constants as C
from gr4_packet_modem_tpu.ops.costas import costas_coefficients
from gr4_packet_modem_tpu.ops.costas_pallas import costas_track_pallas
from gr4_packet_modem_tpu.utils.cplx import to_device

_HDR_END = 192
_PI = np.float32(np.pi); _TWO_PI = np.float32(2*np.pi)

def make_kernel_v2(num_syms, offset, b, unroll=4):
    k1a, k2a = costas_coefficients(C.SYNCWORD_COSTAS_BW, False)
    k1b, k2b = costas_coefficients(C.HEADER_COSTAS_BW, True)
    k1c, k2c = costas_coefficients(C.PAYLOAD_COSTAS_BW, True)
    n_outer = -(-num_syms // unroll)

    def kernel(ph0_ref, fr0_ref, io_ref, out_ref, phe_ref, fre_ref):
        def sub(s, carry):
            ph, fr = carry
            g = s + offset
            pilot = g < C.SYNCWORD_LEN
            k1 = jnp.where(pilot, jnp.float32(k1a), jnp.where(g < _HDR_END, jnp.float32(k1b), jnp.float32(k1c)))
            k2 = jnp.where(pilot, jnp.float32(k2a), jnp.where(g < _HDR_END, jnp.float32(k2b), jnp.float32(k2c)))
            row = io_ref[pl.ds(s, 1), :]   # [1, 2B]
            xr = row[:, :b]; xi = row[:, b:]
            c = jnp.cos(ph); sn = jnp.sin(ph)
            zr = xr*c + xi*sn; zi = xi*c - xr*sn
            e = jnp.where(pilot, zi, jnp.where(zr > 0, zi, -zi) + jnp.where(zi > 0, -zr, zr))
            fr2 = fr + k2*e
            ph2 = ph + k1*e + fr2
            ph2 = jnp.where(ph2 >= _PI, ph2 - _TWO_PI, ph2)
            ph2 = jnp.where(ph2 < -_PI, ph2 + _TWO_PI, ph2)
            out_ref[pl.ds(s, 1), :] = jnp.concatenate([zr, zi], axis=1)
            ok = s < num_syms
            return jnp.where(ok, ph2, ph), jnp.where(ok, fr2, fr)

        def body(o, carry):
            s0 = o * unroll
            for u in range(unroll):
                carry = sub(s0 + u, carry)
            return carry

        ph, fr = jax.lax.fori_loop(0, n_outer, body, (ph0_ref[:], fr0_ref[:]))
        phe_ref[:] = ph; fre_ref[:] = fr
    return kernel

@partial(jax.jit, static_argnames=("offset",))
def costas_v2(symbols, phase0, freq0, offset=0):
    b, s = symbols.shape
    b_pad = max(128, -(-b//128)*128)
    s_pad = -(-s // 8) * 8
    io = jnp.zeros((s_pad, 2*b_pad), jnp.float32)
    io = io.at[:s, :b].set(symbols.real.T).at[:s, b_pad:b_pad+b].set(symbols.imag.T)
    ph0 = jnp.zeros((1, b_pad), jnp.float32).at[0, :b].set(phase0)
    fr0 = jnp.zeros((1, b_pad), jnp.float32).at[0, :b].set(freq0)
    out, phe, fre = pl.pallas_call(
        make_kernel_v2(s, offset, b_pad),
        out_shape=(jax.ShapeDtypeStruct((s_pad, 2*b_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, b_pad), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*3,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)]*3),
        input_output_aliases={2: 0},
    )(ph0, fr0, io)
    corrected = jax.lax.complex(out[:s, :b].T, out[:s, b_pad:b_pad+b].T)
    return corrected, phe[0, :b], fre[0, :b]

rng = np.random.default_rng(0)
B, S = 32, 6160
syms = (rng.standard_normal((B, S)) + 1j*rng.standard_normal((B, S))).astype(np.complex64)
ph0 = rng.uniform(-np.pi, np.pi, B).astype(np.float32)
fr0 = rng.uniform(-0.01, 0.01, B).astype(np.float32)
sj = to_device(syms)

out2, phe2, fre2 = costas_v2(sj, jnp.asarray(ph0), jnp.asarray(fr0), offset=192)
out1, phe1, fre1 = costas_track_pallas(sj, jnp.asarray(ph0), jnp.asarray(fr0), offset=192)
print("match:", float(jnp.max(jnp.abs(out1-out2))), float(jnp.max(jnp.abs(phe1-phe2))), flush=True)

for name, f in [("v1", lambda: costas_track_pallas(sj, jnp.asarray(ph0), jnp.asarray(fr0), offset=192)[0]),
                ("v2", lambda: costas_v2(sj, jnp.asarray(ph0), jnp.asarray(fr0), offset=192)[0])]:
    jax.block_until_ready(f())
    t0 = time.time()
    for _ in range(10): o = f()
    jax.block_until_ready(o)
    print(f"{name}: {(time.time()-t0)/10*1e3:.2f} ms", flush=True)
