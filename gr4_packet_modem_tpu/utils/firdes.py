"""FIR filter design utilities.

Numerically equivalent to the reference root-raised-cosine designer
(reference: blocks/include/gnuradio-4.0/packet-modem/firdes.hpp:30-78, which is
itself equivalent to GR3 ``gr::filter::firdes::root_raised_cosine``), plus the
tap post-processing used by the TX pulse shaper
(packet_transmitter_rrc_taps.hpp:8-28) and the RX polyphase matched filter
(packet_receiver.hpp:60-110).

All functions here run at graph-construction time on the host and return numpy
arrays; they are not traced by JAX.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "root_raised_cosine",
    "tx_rrc_taps",
    "rx_rrc_taps",
    "rx_pfb_taps",
    "polyphase",
]


def root_raised_cosine(
    gain: float,
    sampling_freq: float,
    symbol_rate: float,
    alpha: float,
    ntaps: int,
    dtype=np.float32,
) -> np.ndarray:
    """Root-raised-cosine taps, numerically equal to the reference designer.

    ``ntaps`` is forced odd (``ntaps |= 1``). The taps are normalized so that
    their sum equals ``gain``.
    """
    ntaps = int(ntaps) | 1
    spb = sampling_freq / symbol_rate  # samples per symbol
    taps = np.zeros(ntaps, dtype=np.float64)
    for i in range(ntaps):
        xindx = float(i - ntaps // 2)
        x1 = np.pi * xindx / spb
        x2 = 4.0 * alpha * xindx / spb
        x3 = x2 * x2 - 1.0
        if abs(x3) >= 1e-6:  # avoid rounding errors
            if i != ntaps // 2:
                num = np.cos((1.0 + alpha) * x1) + np.sin((1.0 - alpha) * x1) / (
                    4.0 * alpha * xindx / spb
                )
            else:
                num = np.cos((1.0 + alpha) * x1) + (1.0 - alpha) * np.pi / (4.0 * alpha)
            den = x3 * np.pi
        else:
            if alpha == 1.0:
                taps[i] = -1.0
                continue
            x3 = (1.0 - alpha) * x1
            x2 = (1.0 + alpha) * x1
            num = (
                np.sin(x2) * (1.0 + alpha) * np.pi
                - np.cos(x3) * ((1.0 - alpha) * np.pi * spb) / (4.0 * alpha * xindx)
                + np.sin(x3) * spb * spb / (4.0 * alpha * xindx * xindx)
            )
            den = -32.0 * np.pi * alpha * alpha * xindx / spb
        taps[i] = 4.0 * alpha * num / den
    scale = taps.sum()
    return ((taps * gain / scale)).astype(dtype)


def tx_rrc_taps(samples_per_symbol: int = 4) -> np.ndarray:
    """TX pulse-shaping RRC taps with DAC-range power scaling.

    Equivalent to ``packet_transmitter_rrc_taps()``
    (packet_transmitter_rrc_taps.hpp:8-28): RRC with 11-symbol span, alpha
    0.35, scaled so the worst-case polyphase |sum| reaches 0.9 of DAC full
    scale.
    """
    sps = int(samples_per_symbol)
    ntaps = sps * 11
    taps = root_raised_cosine(1.0, float(sps), 1.0, 0.35, ntaps).astype(np.float32)
    sum_abs_max = np.float32(0.0)
    for j in range(sps):
        s = np.float32(0.0)
        for k in range(j, taps.size, sps):
            s += np.float32(abs(taps[k]))
        sum_abs_max = max(sum_abs_max, s)
    return (taps * (np.float32(0.9) / sum_abs_max)).astype(np.float32)


def rx_rrc_taps(samples_per_symbol: int = 4) -> tuple[np.ndarray, float]:
    """RX reference RRC taps normalized to unit RMS norm, plus the norm.

    Equivalent to the normalization in packet_receiver.hpp:60-74. Returns
    ``(taps, norm)`` where ``norm`` is the pre-normalization L2 norm (used to
    scale the PFB bank gain).
    """
    sps = int(samples_per_symbol)
    taps = root_raised_cosine(1.0, float(sps), 1.0, 0.35, sps * 11).astype(np.float32)
    norm = np.float32(np.sqrt(np.sum(taps.astype(np.float32) ** 2)))
    return (taps / norm).astype(np.float32), float(norm)


def rx_pfb_taps(samples_per_symbol: int = 4, num_arms: int = 32) -> np.ndarray:
    """Polyphase matched-filter bank taps for the symbol filter.

    Equivalent to packet_receiver.hpp:96-110: an RRC designed at
    ``num_arms * sps`` rate with gain ``num_arms / ||rrc||``, with the odd
    trailing tap dropped so the bank has exactly ``num_arms`` arms of
    ``sps * 11`` taps each. Arm ``j`` is ``taps[j::num_arms]``.
    """
    sps = int(samples_per_symbol)
    _, norm = rx_rrc_taps(sps)
    taps = root_raised_cosine(
        float(num_arms) / norm,
        float(num_arms * sps),
        1.0,
        0.35,
        num_arms * sps * 11,
    ).astype(np.float32)
    return taps[:-1]  # drop the extra odd tap


def polyphase(taps: np.ndarray, num_branches: int) -> np.ndarray:
    """Organize ``taps`` into a zero-padded polyphase matrix.

    Returns an array of shape ``[num_branches, ceil(len(taps)/num_branches)]``
    where row ``j`` holds ``taps[j::num_branches]`` (newest-first inner-product
    convention is up to the caller). Missing entries are zero.
    """
    taps = np.asarray(taps)
    arm_len = -(-taps.size // num_branches)
    out = np.zeros((num_branches, arm_len), dtype=taps.dtype)
    for j in range(num_branches):
        arm = taps[j::num_branches]
        out[j, : arm.size] = arm
    return out
