"""Bisect the payload-pass cost on TPU: gather | derotate | conv | alternatives."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig

CH = int(os.environ.get("BENCH_CHANNELS", "8"))
BLOCK = int(os.environ.get("BENCH_BLOCK", str(1 << 18)))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))
D = 32
S = 6160  # payload symbols
SPS = 4

rx = Receiver(RxConfig(max_payload_len=1536, max_detections=D, freq_bins=4))
K = rx.arm_len  # 44
T = rx.front_pad + BLOCK + rx.pad_tail()
REGION = SPS * (S - 1) + K

rng = np.random.default_rng(0)
xr = rng.standard_normal((CH, T)).astype(np.float32)
xi = rng.standard_normal((CH, T)).astype(np.float32)
n_base = np.sort(rng.integers(rx.front_pad, rx.front_pad + BLOCK, (CH, D))).astype(np.int32)
arm = rng.integers(0, 32, (CH, D)).astype(np.int32)
freq = (rng.standard_normal((CH, D)) * 0.01).astype(np.float32)
amp = np.ones((CH, D), np.float32)

xr_j, xi_j = jnp.asarray(xr), jnp.asarray(xi)
nb_j, arm_j = jnp.asarray(n_base), jnp.asarray(arm)
fr_j, amp_j = jnp.asarray(freq), jnp.asarray(amp)
arm_taps_np = rx._arm_taps  # [32, 44]


def gather_only(xr, xi, nb):
    start = nb - (K - 1)
    ridx = jnp.clip(start[:, None] + jnp.arange(REGION, dtype=jnp.int32), 0, T - 1)
    return xr[ridx].sum() + xi[ridx].sum()


def gather_derot(xr, xi, nb, freq):
    start = nb - (K - 1)
    ridx = jnp.clip(start[:, None] + jnp.arange(REGION, dtype=jnp.int32), 0, T - 1)
    rr, ri = xr[ridx], xi[ridx]
    j = jnp.arange(REGION, dtype=jnp.int32)[None, :]
    ph = -freq[:, None] * (start[:, None] + j - nb[:, None]).astype(jnp.float32)
    cph, sph = jnp.cos(ph), jnp.sin(ph)
    dr = rr * cph - ri * sph
    di = rr * sph + ri * cph
    return dr.sum() + di.sum()


def extraction_conv(xr, xi, nb, arm, freq, amp):
    """Current path: gather + derot + grouped conv."""
    onehot = jax.nn.one_hot(arm, 32, dtype=jnp.float32)
    arm_taps = onehot @ jnp.asarray(arm_taps_np)
    kern = jnp.tile(arm_taps[:, ::-1].T[:, None, :], (1, 1, 2))
    start = nb - (K - 1)
    ridx = jnp.clip(start[:, None] + jnp.arange(REGION, dtype=jnp.int32), 0, T - 1)
    rr, ri = xr[ridx], xi[ridx]
    j = jnp.arange(REGION, dtype=jnp.int32)[None, :]
    ph = -freq[:, None] * (start[:, None] + j - nb[:, None]).astype(jnp.float32)
    cph, sph = jnp.cos(ph), jnp.sin(ph)
    dr = rr * cph - ri * sph
    di = rr * sph + ri * cph
    inp = jnp.concatenate([dr, di], axis=0).T[None]
    out = jax.lax.conv_general_dilated(
        inp, kern, window_strides=(SPS,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=2 * D, preferred_element_type=jnp.float32,
    )[0]
    return (amp[:, None] * out[:, :D].T).sum() + out[:, D:].sum()


def extraction_reshape(xr, xi, nb, arm, freq, amp):
    """Alternative: gather + derot + shifted-reshape frames + einsum."""
    onehot = jax.nn.one_hot(arm, 32, dtype=jnp.float32)
    arm_taps = onehot @ jnp.asarray(arm_taps_np)  # [D, K]
    start = nb - (K - 1)
    rl = SPS * S + K  # multiple of 4 padding for clean reshape
    ridx = jnp.clip(start[:, None] + jnp.arange(rl, dtype=jnp.int32), 0, T - 1)
    rr, ri = xr[ridx], xi[ridx]
    j = jnp.arange(rl, dtype=jnp.int32)[None, :]
    ph = -freq[:, None] * (start[:, None] + j - nb[:, None]).astype(jnp.float32)
    cph, sph = jnp.cos(ph), jnp.sin(ph)
    dr = rr * cph - ri * sph
    di = rr * sph + ri * cph
    # frames[d, s, k] = region[d, 4s + k], k in [0, K): K/SPS shifted reshapes
    nsh = K // SPS  # 11
    def frames(reg):
        shifts = [reg[:, 4 * t : 4 * t + SPS * S].reshape(D, S, SPS) for t in range(nsh)]
        return jnp.concatenate(shifts, axis=-1)  # [D, S, K]
    taps_rev = arm_taps[:, ::-1]
    fr_r = jnp.einsum("dsk,dk->ds", frames(dr), taps_rev, preferred_element_type=jnp.float32)
    fr_i = jnp.einsum("dsk,dk->ds", frames(di), taps_rev, preferred_element_type=jnp.float32)
    return (amp * 0 + fr_r.sum() + fr_i.sum()).sum()


def run(name, fn, args):
    f = jax.jit(lambda *a: jax.vmap(fn)(*a))
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    print(json.dumps({"part": name, "ms": round(dt * 1e3, 3),
                      "compile_s": round(comp, 1)}), flush=True)


parts = os.environ.get("PARTS", "gather,derot,conv,reshape").split(",")
if "gather" in parts:
    run("gather", gather_only, (xr_j, xi_j, nb_j))
if "derot" in parts:
    run("gather+derot", gather_derot, (xr_j, xi_j, nb_j, fr_j))
if "conv" in parts:
    run("extraction_conv", extraction_conv, (xr_j, xi_j, nb_j, arm_j, fr_j, amp_j))
if "reshape" in parts:
    run("extraction_reshape", extraction_reshape, (xr_j, xi_j, nb_j, arm_j, fr_j, amp_j))
