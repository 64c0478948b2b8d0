"""CrcAppend/CrcCheck option parity (crc_append.hpp:66-73, crc_check.hpp):
swap_endianness and skip_header_bytes in the batched engines, verified
against the generic host CRC oracle."""

import numpy as np
import pytest

from gr4_packet_modem_tpu.ops.crc import (
    BatchedCrcAppend,
    BatchedCrcCheck,
    CrcRef,
)

MAX_LEN = 64


def _packets(rng, n=6):
    lens = rng.integers(5, MAX_LEN + 1, n)
    data = np.zeros((n, MAX_LEN), np.uint8)
    for i, l in enumerate(lens):
        data[i, :l] = rng.integers(0, 256, l, dtype=np.uint8)
    return data, lens.astype(np.int32)


@pytest.mark.parametrize("swap", [False, True])
@pytest.mark.parametrize("skip", [0, 3])
def test_append_matches_host_oracle(swap, skip):
    rng = np.random.default_rng(42)
    data, lens = _packets(rng)
    eng = BatchedCrcAppend(MAX_LEN, swap_endianness=swap, skip_header_bytes=skip)
    out, out_lens = eng.append(data, lens)
    out, out_lens = np.asarray(out), np.asarray(out_lens)
    ref = CrcRef()
    for i in range(data.shape[0]):
        l = int(lens[i])
        crc = ref.compute(data[i, skip:l])
        cb = crc.to_bytes(4, "little" if swap else "big")
        assert out_lens[i] == l + 4
        np.testing.assert_array_equal(out[i, :l], data[i, :l])
        assert bytes(out[i, l : l + 4]) == cb


def test_append_short_packet_passthrough():
    # packets not longer than skip pass through unchanged
    eng = BatchedCrcAppend(MAX_LEN, skip_header_bytes=8)
    data = np.zeros((2, MAX_LEN), np.uint8)
    data[0, :5] = 7
    data[1, :20] = 9
    lens = np.array([5, 20], np.int32)
    out, out_lens = eng.append(data, lens)
    assert int(out_lens[0]) == 5  # <= skip: unchanged
    assert int(out_lens[1]) == 24


@pytest.mark.parametrize("swap", [False, True])
@pytest.mark.parametrize("skip", [0, 3])
def test_check_roundtrip_and_corruption(swap, skip):
    rng = np.random.default_rng(1)
    data, lens = _packets(rng)
    app = BatchedCrcAppend(MAX_LEN, swap_endianness=swap, skip_header_bytes=skip)
    out, out_lens = app.append(data, lens)
    out, out_lens = np.asarray(out), np.asarray(out_lens)
    chk = BatchedCrcCheck(
        MAX_LEN + 4, swap_endianness=swap, skip_header_bytes=skip
    )
    ok, stripped, slens = chk.check(out, out_lens)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(slens), lens)
    for i in range(data.shape[0]):
        np.testing.assert_array_equal(
            np.asarray(stripped)[i, : lens[i]], data[i, : lens[i]]
        )
    # corrupt one payload byte after the skip region -> that row fails
    bad = out.copy()
    bad[2, skip] ^= 0xFF
    ok2, _, _ = chk.check(bad, out_lens)
    ok2 = np.asarray(ok2)
    assert not ok2[2]
    assert ok2[[0, 1, 3, 4, 5]].all()
    # corruption inside the skipped header region is NOT detected (the CRC
    # does not cover it) — documents the reference semantics
    if skip:
        bad2 = out.copy()
        bad2[1, 0] ^= 0xFF
        ok3, _, _ = chk.check(bad2, out_lens)
        assert np.asarray(ok3)[1]
