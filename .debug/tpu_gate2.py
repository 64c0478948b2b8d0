import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from gr4_packet_modem_tpu.ops.costas import costas_run, costas_segments
from gr4_packet_modem_tpu.ops.costas_pallas import costas_track_pallas
from gr4_packet_modem_tpu.ops import ldpc
from gr4_packet_modem_tpu.ops.ldpc_pallas import ldpc_totals_pallas
from gr4_packet_modem_tpu.utils.cplx import to_device
rng = np.random.default_rng(0)
B, S = 32, 192
syms = (rng.standard_normal((B, S)) + 1j*rng.standard_normal((B, S))).astype(np.complex64)
ph0 = rng.uniform(-np.pi, np.pi, B).astype(np.float32)
fr0 = rng.uniform(-0.01, 0.01, B).astype(np.float32)
sj = to_device(syms)
t0 = time.time()
out, phe, fre = costas_track_pallas(sj, jnp.asarray(ph0), jnp.asarray(fr0), offset=0)
out = jax.block_until_ready(out)
print(f"costas pallas hdr compile+run {time.time()-t0:.1f}s", flush=True)
cid, k1, k2 = costas_segments(S)
ref, rph, rfr = costas_run(sj, jnp.asarray(ph0), jnp.asarray(fr0), cid, k1, k2)
print(f"costas max|dz|={float(jnp.max(jnp.abs(out-ref))):.2e} |dph|={float(jnp.max(jnp.abs(phe-rph))):.2e}", flush=True)
# header-shape timing both paths
fh = jax.jit(lambda s,p,q: costas_track_pallas(s,p,q,offset=0)[0])
fhs = jax.jit(lambda s,p,q: costas_run(s,p,q,cid,k1,k2)[0])
for name, f in [("pallas_hdr", fh), ("scan_hdr", fhs)]:
    jax.block_until_ready(f(sj, jnp.asarray(ph0), jnp.asarray(fr0)))
    t0 = time.time()
    for _ in range(20): o = f(sj, jnp.asarray(ph0), jnp.asarray(fr0))
    jax.block_until_ready(o)
    print(f"costas {name} S=192 B=32: {(time.time()-t0)/20*1e3:.3f} ms", flush=True)
# payload shape
S2 = 6160
syms2 = (rng.standard_normal((B, S2)) + 1j*rng.standard_normal((B, S2))).astype(np.complex64)
s2 = to_device(syms2)
fp = jax.jit(lambda s,p,q: costas_track_pallas(s,p,q,offset=192)[0])
t0 = time.time(); jax.block_until_ready(fp(s2, jnp.asarray(ph0), jnp.asarray(fr0)))
print(f"costas pallas payload compile {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(10): o = fp(s2, jnp.asarray(ph0), jnp.asarray(fr0))
jax.block_until_ready(o)
print(f"costas pallas payload S=6160 B=32: {(time.time()-t0)/10*1e3:.3f} ms", flush=True)
# ldpc pallas
bits = rng.integers(0, 2, (64, 32), dtype=np.uint8)
cw = np.asarray(ldpc.encode_header(jnp.asarray(bits)))[:, :128]
llr = 8.0*(1.0-2.0*cw.astype(np.float32))
fl = jax.jit(lambda x: ldpc_totals_pallas(x, 25))
t0 = time.time(); tot = jax.block_until_ready(fl(jnp.asarray(llr)))
print(f"ldpc pallas compile+run {time.time()-t0:.1f}s", flush=True)
hard = (np.asarray(tot) < 0).astype(np.uint8)
print("ldpc clean-decode correct:", bool((hard[:, :32] == bits).all()), flush=True)
t0 = time.time()
for _ in range(20): o = fl(jnp.asarray(llr))
jax.block_until_ready(o)
print(f"ldpc pallas B=64: {(time.time()-t0)/20*1e3:.3f} ms", flush=True)
print("GATE2 PASS", flush=True)
