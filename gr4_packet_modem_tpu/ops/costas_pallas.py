"""Pallas TPU kernel for the Costas carrier-recovery loop.

The Costas loop (costas_loop.hpp:113-146) is a per-symbol nonlinear IIR — it
cannot be block-parallelized exactly, so as a ``lax.scan`` it costs one XLA
loop iteration (~2.7 us on this backend) per symbol: 16.7 ms for a 6160-symbol
payload pass. This kernel runs the identical recursion inside a single Pallas
program with every operand resident in VMEM: per step it reads one [1, 128]
symbol row, does ~15 VPU ops, and writes the corrected row back in place —
no per-step dispatch, no HBM round-trips.

Layout: each symbol is one ``[8, 128]`` sublane x lane tile carrying 1024
batch rows, so a single sequential step advances 1024 packets (the round-3
layout put the batch in lanes only — [1, 128] rows left 7/8 of the VPU's
sublanes idle and needed 8x more sequential chains). The grid is
``(lane_tiles, symbol_blocks)``:

- the **lane-tile** dimension packs the batch into 1024-row tiles — a
  receiver bank hands ALL channels' detections (C x D rows) to ONE kernel
  call, so the VPU runs at full utilization instead of one underfilled
  kernel instance per channel (the round-2 vmap serialization);
- the **symbol** dimension iterates sequentially (innermost grid dim) with
  the loop state (phase, freq) carried across blocks in VMEM scratch, so the
  packet length is unbounded — the full u16 payload envelope (65,535 bytes =
  262,156 symbols, packet_ingress.hpp:104) streams through block by block
  instead of hitting a VMEM cap.

The corrected output aliases the input buffers (read row -> write row, never
re-read), so VMEM holds just the two I/Q planes of one [SYM_BLOCK, 128] tile
pair per step.

The constellation/bandwidth schedule is *positional* (the modem's schedule is
a fixed function of symbol index: PILOT over the wiped-off syncword, QPSK at
header bandwidth, QPSK at payload bandwidth — payload_metadata_insert.hpp:
63-65), so the kernel takes a static symbol offset and bakes the three
(K1, K2) pairs in as compile-time scalars instead of carrying [S] schedule
arrays.
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import constants as C
from .costas import costas_coefficients
from .pallas_probe import probe_verdict, source_tag

__all__ = ["costas_track_pallas", "costas_enabled", "SYM_BLOCK"]

_HDR_END = C.SYNCWORD_LEN + C.HEADER_SYMBOLS  # 192

# symbols per grid step: two f32 [SYM_BLOCK, 128] I/Q tiles = 2 MB in VMEM
# (aliased in/out); small enough to double-buffer, large enough that the
# per-block pipeline overhead is negligible against the per-symbol loop
SYM_BLOCK = 2048

_PI = np.float32(np.pi)
_TWO_PI = np.float32(2 * np.pi)


_LW = 8  # sublane width: batch rows advanced per sequential step = _LW * 128


def _make_kernel(num_syms: int, offset: int, sym_block: int):
    k1a, k2a = costas_coefficients(C.SYNCWORD_COSTAS_BW, False)
    k1b, k2b = costas_coefficients(C.HEADER_COSTAS_BW, True)
    k1c, k2c = costas_coefficients(C.PAYLOAD_COSTAS_BW, True)

    def kernel(
        ph0_ref, fr0_ref, re_ref, im_ref,
        out_re_ref, out_im_ref, ph_end_ref, fr_end_ref,
        ph_scr, fr_scr,
    ):
        sb = pl.program_id(1)
        nsb = pl.num_programs(1)

        # first symbol block of each lane tile: seed the carried state
        @pl.when(sb == 0)
        def _seed():
            ph_scr[:] = ph0_ref[0]
            fr_scr[:] = fr0_ref[0]

        base = sb * sym_block

        def body(s, carry):
            ph, fr = carry  # [_LW, 128] float32 — 1024 packets per step
            g = base + s + offset  # global symbol index in the packet
            pilot = g < C.SYNCWORD_LEN
            k1 = jnp.where(
                pilot,
                jnp.float32(k1a),
                jnp.where(g < _HDR_END, jnp.float32(k1b), jnp.float32(k1c)),
            )
            k2 = jnp.where(
                pilot,
                jnp.float32(k2a),
                jnp.where(g < _HDR_END, jnp.float32(k2b), jnp.float32(k2c)),
            )
            # one symbol = one [_LW, 128] tile (sublane start 8-aligned)
            xr = re_ref[0, pl.ds(_LW * s, _LW), :]
            xi = im_ref[0, pl.ds(_LW * s, _LW), :]
            c = jnp.cos(ph)
            sn = jnp.sin(ph)
            zr = xr * c + xi * sn
            zi = xi * c - xr * sn
            e_qpsk = jnp.where(zr > 0, zi, -zi) + jnp.where(zi > 0, -zr, zr)
            e = jnp.where(pilot, zi, e_qpsk)
            fr = fr + k2 * e
            ph = ph + k1 * e + fr
            ph = jnp.where(ph >= _PI, ph - _TWO_PI, ph)
            ph = jnp.where(ph < -_PI, ph + _TWO_PI, ph)
            out_re_ref[0, pl.ds(_LW * s, _LW), :] = zr
            out_im_ref[0, pl.ds(_LW * s, _LW), :] = zi
            return ph, fr

        # partial trailing block: loop only over the real symbols
        n = jnp.minimum(jnp.int32(sym_block), jnp.int32(num_syms) - base)
        ph, fr = jax.lax.fori_loop(0, n, body, (ph_scr[:], fr_scr[:]))
        ph_scr[:] = ph
        fr_scr[:] = fr

        @pl.when(sb == nsb - 1)
        def _finish():
            ph_end_ref[0] = ph_scr[:]
            fr_end_ref[0] = fr_scr[:]

    return kernel


@partial(jax.jit, static_argnames=("offset", "interpret"))
def costas_track_pallas(
    symbols: jax.Array,
    phase0: jax.Array,
    freq0: jax.Array,
    offset: int = 0,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Loop-exact Costas tracking of ``symbols [B, S]`` complex64 starting at
    packet symbol ``offset``. Returns ``(corrected [B, S], phase_end [B],
    freq_end [B])`` — the same contract as ``costas_run`` with the receiver's
    positional schedule. Any B (tiled into 128-lane blocks) and any S (tiled
    into SYM_BLOCK grid steps with the loop state carried in scratch)."""
    b, s = symbols.shape
    lanes = _LW * 128  # 1024 batch rows per lane tile
    nlt = -(-b // lanes)
    b_pad = nlt * lanes
    # symbol rows per grid step: _LW sublanes per symbol, so divide the
    # VMEM budget accordingly (1 MB per plane block at the default)
    sym_block = min(max(SYM_BLOCK // _LW, 8), -(-s // 8) * 8)
    nsb = -(-s // sym_block)
    s_pad = nsb * sym_block

    def to_plane(a):
        # [B, S] real -> [nlt, s_pad*_LW, 128]: row _LW*t + j of tile l
        # holds symbol t of batch rows l*1024 + j*128 + lane
        p = jnp.zeros((s_pad, b_pad), jnp.float32).at[:s, :b].set(a.T)
        return p.reshape(s_pad, nlt, _LW, 128).transpose(1, 0, 2, 3).reshape(
            nlt, s_pad * _LW, 128
        )

    re = to_plane(symbols.real)
    im = to_plane(symbols.imag)

    def to_state(a):
        return (
            jnp.zeros(b_pad, jnp.float32)
            .at[:b].set(a.astype(jnp.float32))
            .reshape(nlt, _LW, 128)
        )

    ph0 = to_state(phase0)
    fr0 = to_state(freq0)
    state_spec = pl.BlockSpec((1, _LW, 128), lambda l, sb: (l, 0, 0))
    plane_spec = pl.BlockSpec(
        (1, sym_block * _LW, 128), lambda l, sb: (l, sb, 0)
    )
    out_re, out_im, ph_end, fr_end = pl.pallas_call(
        _make_kernel(s, offset, sym_block),
        grid=(nlt, nsb),
        out_shape=(
            jax.ShapeDtypeStruct((nlt, s_pad * _LW, 128), jnp.float32),
            jax.ShapeDtypeStruct((nlt, s_pad * _LW, 128), jnp.float32),
            jax.ShapeDtypeStruct((nlt, _LW, 128), jnp.float32),
            jax.ShapeDtypeStruct((nlt, _LW, 128), jnp.float32),
        ),
        in_specs=[state_spec, state_spec, plane_spec, plane_spec],
        out_specs=(plane_spec, plane_spec, state_spec, state_spec),
        scratch_shapes=[
            pltpu.VMEM((_LW, 128), jnp.float32),
            pltpu.VMEM((_LW, 128), jnp.float32),
        ],
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(ph0, fr0, re, im)

    def from_plane(p):
        return p.reshape(nlt, s_pad, _LW, 128).transpose(1, 0, 2, 3).reshape(
            s_pad, b_pad
        )

    corrected = jax.lax.complex(
        from_plane(out_re)[:s, :b].T, from_plane(out_im)[:s, :b].T
    )
    return (
        corrected,
        ph_end.reshape(b_pad)[:b],
        fr_end.reshape(b_pad)[:b],
    )


def _np_costas(sym, ph0, fr0, offset):
    """Host reference of the identical recursion (f32 numpy) for the
    capability probe."""
    k1a, k2a = costas_coefficients(C.SYNCWORD_COSTAS_BW, False)
    k1b, k2b = costas_coefficients(C.HEADER_COSTAS_BW, True)
    k1c, k2c = costas_coefficients(C.PAYLOAD_COSTAS_BW, True)
    ph = ph0.astype(np.float32).copy()
    fr = fr0.astype(np.float32).copy()
    out = np.empty_like(sym)
    for s in range(sym.shape[1]):
        g = s + offset
        if g < C.SYNCWORD_LEN:
            k1, k2 = k1a, k2a
        elif g < _HDR_END:
            k1, k2 = k1b, k2b
        else:
            k1, k2 = k1c, k2c
        z = sym[:, s] * np.exp(-1j * ph)
        zr, zi = z.real.astype(np.float32), z.imag.astype(np.float32)
        if g < C.SYNCWORD_LEN:
            e = zi
        else:
            e = np.where(zr > 0, zi, -zi) + np.where(zi > 0, -zr, zr)
        fr = fr + np.float32(k2) * e
        ph = ph + np.float32(k1) * e + fr
        ph = np.where(ph >= _PI, ph - _TWO_PI, ph)
        ph = np.where(ph < -_PI, ph + _TWO_PI, ph)
        out[:, s] = zr + 1j * zi
    return out, ph, fr


def _probe() -> bool:
    """Compile-and-validate the kernel on the live TPU at a production-like
    shape (two lane blocks, a multi-block symbol grid with a partial tail,
    all three schedule segments) against the host recursion. The loop is
    contractive, so backend trig ULP differences stay bounded — a corrupt
    lowering diverges wildly instead."""
    if jax.default_backend() != "tpu":
        return False
    rng = np.random.default_rng(7)
    b, s = 256, SYM_BLOCK + 160
    bits = rng.integers(0, 4, (b, s))
    clean = np.exp(1j * (np.pi / 4 + bits * np.pi / 2)).astype(np.complex64)
    clean[:, : C.SYNCWORD_LEN] = 1.0  # wiped-off pilot segment
    cfo = 1e-4 * rng.standard_normal((b, 1))
    sym = clean * np.exp(
        1j * (0.05 * rng.standard_normal((b, 1)) + cfo * np.arange(s))
    )
    sym = (sym + 0.01 * rng.standard_normal((b, s))).astype(np.complex64)
    ph0 = np.zeros(b, np.float32)
    fr0 = np.zeros(b, np.float32)

    # probe through a real-plane jit boundary, as production always runs it
    # (the receiver inlines the kernel in a larger program; a STANDALONE
    # program with complex64 inputs/outputs hits an unrelated unimplemented
    # path on this backend — complex h2d and complex-boundary staging)
    @jax.jit
    def probe_fn(re, im, p0, f0):
        out, ph, fr = costas_track_pallas(
            jax.lax.complex(re, im), p0, f0, offset=0
        )
        return out.real, out.imag, ph, fr

    outr, outi, ph, fr = probe_fn(
        jnp.asarray(sym.real), jnp.asarray(sym.imag),
        jnp.asarray(ph0), jnp.asarray(fr0),
    )
    out = np.asarray(outr) + 1j * np.asarray(outi)
    ref, ph_ref, fr_ref = _np_costas(sym, ph0, fr0, 0)
    return bool(
        np.allclose(out, ref, atol=2e-2)
        and np.allclose(np.asarray(ph), ph_ref, atol=2e-2)
        and np.allclose(np.asarray(fr), fr_ref, atol=1e-3)
    )


def costas_enabled() -> bool:
    """Whether the Pallas Costas kernel is usable on this backend
    (probe-compiled + output-validated once per machine per kernel-source
    version; ``PM_PALLAS_COSTAS=1/0`` forces)."""
    return probe_verdict("costas", source_tag(sys.modules[__name__]), _probe)
