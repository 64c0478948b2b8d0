"""Pallas TPU kernel for the Costas carrier-recovery loop.

The Costas loop (costas_loop.hpp:113-146) is a per-symbol nonlinear IIR — it
cannot be block-parallelized exactly, so as a ``lax.scan`` it costs one XLA
loop iteration (~2.7 us on this backend) per symbol: 16.7 ms for a 6160-symbol
payload pass. This kernel runs the identical recursion inside a single Pallas
program with every operand resident in VMEM: per step it reads one [1, B]
symbol row, does ~15 VPU ops, and writes the corrected row back in place —
no per-step dispatch, no HBM round-trips.

Layout: symbols ``[S, B]`` (batch in lanes, symbols in sublanes); the packet
batch B is zero-padded to the 128-lane tile. The corrected output aliases the
input buffers (read row -> write row, never re-read), so VMEM holds just the
two I/Q planes.

The constellation/bandwidth schedule is *positional* (the modem's schedule is
a fixed function of symbol index: PILOT over the wiped-off syncword, QPSK at
header bandwidth, QPSK at payload bandwidth — payload_metadata_insert.hpp:
63-65), so the kernel takes a static symbol offset and bakes the three
(K1, K2) pairs in as compile-time scalars instead of carrying [S] schedule
arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import constants as C
from .costas import costas_coefficients

__all__ = ["costas_track_pallas", "PALLAS_MAX_SYMBOLS"]

_HDR_END = C.SYNCWORD_LEN + C.HEADER_SYMBOLS  # 192

# past this many symbols the [S, 128] I/Q planes stop fitting comfortably in
# VMEM (2 * S * 128 * 4 B); callers fall back to the lax.scan path
PALLAS_MAX_SYMBOLS = 12 * 1024

_PI = np.float32(np.pi)
_TWO_PI = np.float32(2 * np.pi)


def _make_kernel(num_syms: int, offset: int):
    k1a, k2a = costas_coefficients(C.SYNCWORD_COSTAS_BW, False)
    k1b, k2b = costas_coefficients(C.HEADER_COSTAS_BW, True)
    k1c, k2c = costas_coefficients(C.PAYLOAD_COSTAS_BW, True)

    def kernel(
        ph0_ref, fr0_ref, re_ref, im_ref,
        out_re_ref, out_im_ref, ph_end_ref, fr_end_ref,
    ):
        def body(s, carry):
            ph, fr = carry  # [1, B] float32
            g = s + offset  # global symbol index in the packet
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
            xr = re_ref[pl.ds(s, 1), :]
            xi = im_ref[pl.ds(s, 1), :]
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
            out_re_ref[pl.ds(s, 1), :] = zr
            out_im_ref[pl.ds(s, 1), :] = zi
            return ph, fr

        ph, fr = jax.lax.fori_loop(
            0, num_syms, body, (ph0_ref[:], fr0_ref[:])
        )
        ph_end_ref[:] = ph
        fr_end_ref[:] = fr

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
    positional schedule."""
    b, s = symbols.shape
    b_pad = max(128, -(-b // 128) * 128)
    s_pad = -(-s // 8) * 8
    re = jnp.zeros((s_pad, b_pad), jnp.float32).at[:s, :b].set(symbols.real.T)
    im = jnp.zeros((s_pad, b_pad), jnp.float32).at[:s, :b].set(symbols.imag.T)
    ph0 = jnp.zeros((1, b_pad), jnp.float32).at[0, :b].set(
        phase0.astype(jnp.float32)
    )
    fr0 = jnp.zeros((1, b_pad), jnp.float32).at[0, :b].set(
        freq0.astype(jnp.float32)
    )
    out_re, out_im, ph_end, fr_end = pl.pallas_call(
        _make_kernel(s, offset),
        out_shape=(
            jax.ShapeDtypeStruct((s_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((s_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(ph0, fr0, re, im)
    corrected = jax.lax.complex(out_re[:s, :b].T, out_im[:s, :b].T)
    return corrected, ph_end[0, :b], fr_end[0, :b]
