#!/usr/bin/env python3
"""Header format -> FEC encode -> decode -> parse round trip.

Mirrors the reference examples header_formatter.cpp + the qa_header_formatter
golden vector: metadata {packet_length: 1234} formats to the 4-byte header
0x04 0xd2 0x00 0x55 (u16 BE length, type byte, 0x55 spare —
header_formatter.hpp:110-113), which rate-1/8 LDPC-encodes to 32 bytes and
survives decode + parse even with flipped bits.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()

import jax.numpy as jnp  # noqa: E402

from gr4_packet_modem_tpu.ops import ldpc  # noqa: E402
from gr4_packet_modem_tpu.ops.packing import pack_bits, unpack_bits  # noqa: E402
from gr4_packet_modem_tpu.utils import constants as C  # noqa: E402

header = C.format_header(1234, int(C.PacketType.USER_DATA))
print("header bytes:", [hex(b) for b in header])  # 0x4 0xd2 0x0 0x55
assert list(header) == [0x04, 0xD2, 0x00, 0x55]

bits = np.asarray(unpack_bits(jnp.asarray(header), 8))[None]  # [1, 32]
coded = np.asarray(ldpc.encode_header(jnp.asarray(bits)))  # [1, 256]
print("coded bits:", coded.size, "(= 4 B * 8 * rate 1/8)")

# soft demod at perfect SNR, flip a few bits, decode
llrs = (1.0 - 2.0 * coded.astype(np.float32)) * 4.0
llrs[0, [7, 40, 200]] *= -1.0
comb = ldpc.combine_repetition(jnp.asarray(llrs))
dec = ldpc.HeaderLdpcDecoder(25)
info_bits, ok = dec.decode(comb)
parsed = np.asarray(pack_bits(info_bits, 8))[0]
length = int(parsed[0]) << 8 | int(parsed[1])
print(f"ldpc ok={bool(np.asarray(ok)[0])} parsed length={length} "
      f"type={int(parsed[2])}")
assert bool(np.asarray(ok)[0]) and length == 1234
print("header round trip ok")
