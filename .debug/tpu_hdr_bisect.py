import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig, _HEADER_REGION_SYMS
from gr4_packet_modem_tpu.ops import ldpc
from gr4_packet_modem_tpu.ops.costas import costas_run, costas_segments
from gr4_packet_modem_tpu.ops.scramble import keystream
from gr4_packet_modem_tpu.ops.packing import pack_bits
from gr4_packet_modem_tpu.utils import constants as C

# tunnel health gate: abort early if the session is poisoned
import jax as _jax
try:
    _jax.block_until_ready(_jax.jit(lambda: _jax.numpy.arange(4)*2)())
    print("health: ok", flush=True)
except Exception as e:
    print("health: POISONED", str(e)[:60], flush=True)
    sys.exit(3)

rx = Receiver(RxConfig(max_payload_len=1536, max_detections=32, freq_bins=4))
T = 1 << 17
x = jnp.zeros(T + rx.front_pad + rx.pad_tail(), jnp.complex64)
D = 32
n_base = jnp.arange(D, dtype=jnp.int32)*100 + 900
arm = jnp.zeros(D, jnp.int32)
freq = jnp.zeros(D, jnp.float32)
n0 = n_base - 44
amp = jnp.ones(D, jnp.float32)

def timed(name, f, *a):
    t0=time.time()
    try:
        r = f(*a); jax.block_until_ready(jax.tree.leaves(r)[0])
        print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)
        t0=time.time()
        for _ in range(5): r = f(*a)
        jax.block_until_ready(jax.tree.leaves(r)[0])
        print(f"  run {(time.time()-t0)/5*1e3:.2f}ms", flush=True)
        return r
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:120]}", flush=True)
        return None

extract = jax.jit(lambda xx: rx._extract_symbols(xx, n_base, arm, freq, n0, amp, 0, _HEADER_REGION_SYMS))
syms = timed("extract192", extract, x)
if syms is None: sys.exit()
sch = costas_segments(_HEADER_REGION_SYMS)
cost = jax.jit(lambda s: costas_run(s, jnp.zeros(D), jnp.zeros(D), *sch))
cr = timed("costas192", cost, syms)
if cr is None: sys.exit()
corrected = cr[0]
def llr_descramble(c):
    h = c[:, 64:]
    llrs = jnp.stack([h.real, h.imag], axis=-1).reshape(D, -1) * 4.0
    ks = keystream(256)
    return jnp.where(ks.astype(bool)[None], -llrs, llrs)
llrs = timed("llr+descramble", jax.jit(llr_descramble), corrected)
if llrs is None: sys.exit()
comb = ldpc.combine_repetition(llrs)
dec = timed("ldpc_decode", rx._decoder.decode, comb)
if dec is None: sys.exit()
bits = dec[0]
timed("pack+parse", jax.jit(lambda b: pack_bits(b, 8)), bits)
det = rx.acquirer.acquire(x)
timed("full_headers", rx.decode_headers, x, det)
