"""Prototype: syncword correlation via matmul-FFT (MXU) — timing + equivalence."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.utils.cplx import to_device

rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4))
acq = rx.acquirer
channels, block = 8, 1 << 18
fp, pt = rx.front_pad, rx.pad_tail()
T = fp + block + pt
rng = np.random.default_rng(0)
x = (rng.standard_normal((channels, T)) + 1j*rng.standard_normal((channels, T))).astype(np.complex64) * 0.3
xj = to_device(x)

N, s, L, nb = acq.config.fft_size, acq.stride, acq.sync_len, acq.num_bins
nf = (T - N) // s + 1
N1, N2 = 32, 64
assert N1 * N2 == N

# constants (numpy, trace-embedded)
W1 = np.exp(-2j*np.pi*np.outer(np.arange(N1), np.arange(N1))/N1).astype(np.complex64)
W2 = np.exp(-2j*np.pi*np.outer(np.arange(N2), np.arange(N2))/N2).astype(np.complex64)
TWt = np.exp(-2j*np.pi*np.outer(np.arange(N1), np.arange(N2))/N).astype(np.complex64)  # [k1, n2]
rep = np.zeros((nb, N), np.complex64); rep[:, :L] = acq.replicas
REPF = np.conj(np.fft.fft(rep, axis=-1))  # [nb, N] natural order
REP2 = REPF.reshape(nb, N2, N1).transpose(0, 2, 1).copy()  # X2 basis [nb, k1, k2]
W2cN = (np.conj(W2) / N2).astype(np.complex64)
W1cN = (np.conj(W1) / N1).astype(np.complex64)
TWc = np.conj(TWt).astype(np.complex64)

def cmm(ar, ai, br, bi, eq):
    rr = jnp.einsum(eq, ar, br, preferred_element_type=jnp.float32) - jnp.einsum(eq, ai, bi, preferred_element_type=jnp.float32)
    ri = jnp.einsum(eq, ar, bi, preferred_element_type=jnp.float32) + jnp.einsum(eq, ai, br, preferred_element_type=jnp.float32)
    return rr, ri

def frames_of(xc):
    body = xc[: nf*s].reshape(nf, s)
    pad = max(0, s + nf*s - T)
    shifted = xc[s:]
    if pad: shifted = jnp.concatenate([shifted, jnp.zeros(pad, xc.dtype)])
    tail = shifted[: nf*s].reshape(nf, s)[:, : N-s]
    return jnp.concatenate([body, tail], axis=1)

def correlate_mxu(xc):
    fr = frames_of(xc)  # [F, N] complex
    xr = fr.real.reshape(nf, N1, N2); xi = fr.imag.reshape(nf, N1, N2)
    s1r, s1i = cmm(xr, xi, W1.real, W1.imag, 'fnm,nk->fkm')   # contract n1 -> [F,k1,n2]
    twr, twi = TWt.real[None], TWt.imag[None]
    t_r = s1r*twr - s1i*twi; t_i = s1r*twi + s1i*twr
    X2r, X2i = cmm(t_r, t_i, W2.real, W2.imag, 'fkn,nm->fkm')  # contract n2 -> [F,k1,k2]
    # product with conj replica in X2 basis: [F,nb,k1,k2]
    pr = X2r[:, None]*REP2.real[None] - X2i[:, None]*REP2.imag[None]
    pi = X2r[:, None]*REP2.imag[None] + X2i[:, None]*REP2.real[None]
    # inverse: contract k2 with conj(W2)/N2
    u_r, u_i = cmm(pr, pi, W2cN.real.T, W2cN.imag.T, 'fbkm,mn->fbkn')  # [F,nb,k1,n2]
    v_r = u_r*TWc.real[None,None] - u_i*TWc.imag[None,None]
    v_i = u_r*TWc.imag[None,None] + u_i*TWc.real[None,None]
    y_r, y_i = cmm(v_r, v_i, W1cN.real.T, W1cN.imag.T, 'fbkm,kn->fbnm')  # [F,nb,n1,n2]
    p = (y_r*y_r + y_i*y_i).reshape(nf, nb, N)[..., :s]  # power [F,nb,s]
    best = jnp.max(p, axis=1)         # [F, s]
    bbin = jnp.argmax(p, axis=1)      # [F, s]
    return best.reshape(-1), bbin.reshape(-1).astype(jnp.int32)

fmx = jax.jit(lambda x2: jax.vmap(lambda xc: correlate_mxu(xc)[0].sum())(x2))
fref = jax.jit(lambda x2: jax.vmap(lambda xc: (jnp.abs(acq.correlate(xc))**2).max(axis=0).sum())(x2))

# equivalence on one small channel
xc = xj[0]
bp_mx, bb_mx = jax.jit(correlate_mxu)(xc)
corr = jax.jit(lambda q: acq.correlate(q))(xc)
p = jnp.abs(corr)**2
bp_ref = jnp.max(p, axis=0)
rel = float(jnp.max(jnp.abs(bp_mx - bp_ref) / (1e-6 + bp_ref)))
print(json.dumps({"check_rel_err": rel}), flush=True)

for name, f in [("mxufft", fmx), ("xla_fft_power", fref)]:
    t0 = time.time(); out = jax.block_until_ready(f(xj)); comp = time.time()-t0
    t0 = time.time()
    for _ in range(10): out = f(xj)
    out = jax.block_until_ready(out)
    print(json.dumps({"stage": name, "ms": round((time.time()-t0)/10*1e3, 3), "compile_s": round(comp,1)}), flush=True)
