"""Gate: Pallas kernels compile + match the scan paths on the real TPU.

Small shapes, run FIRST after the tunnel recovers (heavy compiles can wedge
it; keep this minimal)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)

from gr4_packet_modem_tpu.ops.costas import costas_run, costas_segments
from gr4_packet_modem_tpu.ops.costas_pallas import costas_track_pallas
from gr4_packet_modem_tpu.ops import ldpc
from gr4_packet_modem_tpu.ops.ldpc_pallas import ldpc_totals_pallas
from gr4_packet_modem_tpu.utils.cplx import to_device

rng = np.random.default_rng(0)

# ---- costas kernel, header shape
B, S = 32, 192
syms = (rng.standard_normal((B, S)) + 1j * rng.standard_normal((B, S))).astype(
    np.complex64
)
ph0 = rng.uniform(-np.pi, np.pi, B).astype(np.float32)
fr0 = rng.uniform(-0.01, 0.01, B).astype(np.float32)
sj = to_device(syms)
t0 = time.time()
out, phe, fre = costas_track_pallas(sj, jnp.asarray(ph0), jnp.asarray(fr0), offset=0)
out = jax.block_until_ready(out)
print(f"costas pallas compile+run {time.time()-t0:.1f}s", flush=True)
cid, k1, k2 = costas_segments(S)
ref, rph, rfr = costas_run(sj, jnp.asarray(ph0), jnp.asarray(fr0), cid, k1, k2)
err = float(jnp.max(jnp.abs(out - ref)))
eph = float(jnp.max(jnp.abs(phe - rph)))
print(f"costas max|dz|={err:.2e} |dph|={eph:.2e}", flush=True)
assert err < 1e-4, "COSTAS KERNEL MISMATCH"

# timing: payload shape
S2 = 6160
syms2 = (rng.standard_normal((B, S2)) + 1j * rng.standard_normal((B, S2))).astype(np.complex64)
s2 = to_device(syms2)
f = jax.jit(lambda s, p, q: costas_track_pallas(s, p, q, offset=192)[0])
t0 = time.time()
o = jax.block_until_ready(f(s2, jnp.asarray(ph0), jnp.asarray(fr0)))
print(f"costas payload compile {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(10):
    o = f(s2, jnp.asarray(ph0), jnp.asarray(fr0))
jax.block_until_ready(o)
print(f"costas pallas payload S=6160 B=32: {(time.time()-t0)/10*1e3:.2f} ms/step", flush=True)

# ---- ldpc kernel
bits = rng.integers(0, 2, (64, 32), dtype=np.uint8)
cw = np.asarray(ldpc.encode_header(jnp.asarray(bits)))[:, :128]
llr = 8.0 * (1.0 - 2.0 * cw.astype(np.float32))
llr += 2.0 * rng.standard_normal(llr.shape).astype(np.float32)
t0 = time.time()
tot = jax.block_until_ready(ldpc_totals_pallas(jnp.asarray(llr), 25))
print(f"ldpc pallas compile+run {time.time()-t0:.1f}s", flush=True)
hard = (np.asarray(tot) < 0).astype(np.uint8)
ref_bits, ref_ok = ldpc.HeaderLdpcDecoder(25, use_pallas=False).decode(jnp.asarray(llr))
assert (hard[:, :32] == np.asarray(ref_bits)).all(), "LDPC KERNEL MISMATCH"
print("ldpc bits match", flush=True)

fl = jax.jit(lambda x: ldpc_totals_pallas(x, 25))
jax.block_until_ready(fl(jnp.asarray(llr)))
t0 = time.time()
for _ in range(20):
    o = fl(jnp.asarray(llr))
jax.block_until_ready(o)
print(f"ldpc pallas B=64: {(time.time()-t0)/20*1e3:.2f} ms/step", flush=True)

fs = jax.jit(lambda x: ldpc.HeaderLdpcDecoder(25, use_pallas=False).decode(x)[0])
jax.block_until_ready(fs(jnp.asarray(llr)))
t0 = time.time()
for _ in range(20):
    o = fs(jnp.asarray(llr))
jax.block_until_ready(o)
print(f"ldpc scan   B=64: {(time.time()-t0)/20*1e3:.2f} ms/step", flush=True)

# scan costas timing for comparison
fc = jax.jit(lambda s, p, q: costas_run(s, p, q, *costas_segments(S2, offset=192))[0])
jax.block_until_ready(fc(s2, jnp.asarray(ph0), jnp.asarray(fr0)))
t0 = time.time()
for _ in range(3):
    o = fc(s2, jnp.asarray(ph0), jnp.asarray(fr0))
jax.block_until_ready(o)
print(f"costas scan payload: {(time.time()-t0)/3*1e3:.2f} ms/step", flush=True)
print("GATE PASS", flush=True)
