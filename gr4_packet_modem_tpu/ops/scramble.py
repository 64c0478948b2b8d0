"""Vectorized CCSDS additive scrambling.

The scrambler LFSR restarts at every packet (TX: per PDU,
additive_scrambler.hpp:128-131; RX: on the "header_start" reset tag,
packet_receiver.hpp:131-135), so the keystream seen by any packet is the same
fixed bit sequence. On TPU the keystream is precomputed once and applied as a
masked XOR (hard bits) or sign flip (soft LLRs) across the whole packet batch
— there is no sequential state at all.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..utils.lfsr import additive_scrambler_keystream

__all__ = ["keystream", "scramble_bits", "descramble_soft"]


@lru_cache(maxsize=8)
def _keystream_np(num_bits: int) -> np.ndarray:
    return additive_scrambler_keystream(num_bits)


def keystream(num_bits: int) -> jnp.ndarray:
    """First ``num_bits`` scrambler keystream bits (cached)."""
    return jnp.asarray(_keystream_np(int(num_bits)))


def scramble_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """XOR hard bits ``[..., N]`` with the keystream (restart at index 0)."""
    ks = keystream(bits.shape[-1])
    return bits ^ ks.astype(bits.dtype)


def descramble_soft(llrs: jnp.ndarray) -> jnp.ndarray:
    """Sign-flip soft values where the keystream bit is 1
    (additive_scrambler.hpp:89-93 soft-symbol branch)."""
    ks = keystream(llrs.shape[-1])
    return jnp.where(ks.astype(bool), -llrs, llrs)
