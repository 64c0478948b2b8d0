#!/usr/bin/env python3
"""Header path round trip: format -> rate-1/8 LDPC encode -> soft decode ->
parse, with one header corrupted beyond repair.

Mirrors the reference example header_formatter.cpp plus the
HeaderFecEncoder/HeaderFecDecoder/HeaderParser chain
(header_formatter.hpp:110-168, header_fec_encoder.hpp, header_parser.hpp).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()  # PM_PLATFORM backend override + persistent compile cache

import numpy as np
import jax.numpy as jnp

from gr4_packet_modem_tpu.ops import ldpc
from gr4_packet_modem_tpu.ops.packing import bytes_to_bits, pack_bits

# format headers for three packets (u16 BE length, type, 0x55 spare)
lengths = [1234, 64, 4096]
headers = np.array(
    [[ln >> 8, ln & 0xFF, 0x00, 0x55] for ln in lengths], np.uint8
)
print("headers:", [bytes(h).hex() for h in headers])

bits = bytes_to_bits(jnp.asarray(headers))           # [B, 32] MSB-first
coded = ldpc.encode_header(bits)                     # [B, 256] incl. repeat

# BPSK LLRs at ~2 dB, with header 1 hit by gross noise
rng = np.random.default_rng(0)
llr = 4.0 * (1.0 - 2.0 * np.asarray(coded, np.float32))
llr += 2.5 * rng.standard_normal(llr.shape).astype(np.float32)
llr[1] = rng.standard_normal(256).astype(np.float32) * 8.0

comb = ldpc.combine_repetition(jnp.asarray(llr))
dec_bits, ok = ldpc.HeaderLdpcDecoder(25).decode(comb)
out = np.asarray(pack_bits(dec_bits, 8))
for i, (h, flag) in enumerate(zip(out, np.asarray(ok))):
    if not flag:
        print(f"header {i}: invalid_header (LDPC failure)")  # header_parser.hpp:61-83
        continue
    print(
        f"header {i}: packet_length={int(h[0]) << 8 | int(h[1])} "
        f"type={'user_data' if h[2] == 0 else 'idle'}"
    )
assert list(np.asarray(ok)) == [True, False, True]
