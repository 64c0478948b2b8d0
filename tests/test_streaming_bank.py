"""StreamingBank: multi-channel host-fed sustained serving path.

The bank must decode every channel's packets exactly once with correct
channel attribution — including packets straddling the driver's internal
block boundaries — matching what a per-channel StreamingReceiver produces
(the serving analogue of the reference's real-time apps,
apps/packet_transceiver.cpp:99-131, scaled to a channel bank).
"""

import numpy as np
import pytest

from gr4_packet_modem_tpu.models.receiver import RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.runtime.streaming import StreamingBank
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

BLOCK = 4096
CFG = dict(max_payload_len=128, max_detections=4, freq_bins=1)


def _burst_stream(payloads, seed_phase=0.0):
    tx = Transmitter(TxConfig(max_payload_len=128))
    batch = PacketBatch.from_list(payloads, max_len=128)
    s, l = tx.modulate_bursts(batch)
    stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
    return (np.asarray(stream) * np.exp(1j * seed_phase)).astype(np.complex64)


def test_bank_decodes_all_channels_exactly_once():
    rng = np.random.default_rng(5)
    ch_payloads = [
        [rng.integers(0, 256, n, dtype=np.uint8) for n in lens]
        for lens in ([100, 77, 128], [55, 120, 33])
    ]
    streams = [
        _burst_stream(p, 0.4 * c) for c, p in enumerate(ch_payloads)
    ]
    # stagger channel 1 so its packets straddle block boundaries differently
    total = max(s.size for s in streams) + 3000
    x = np.zeros((2, total), np.complex64)
    x[0, 100 : 100 + streams[0].size] = streams[0]
    x[1, 2500 : 2500 + streams[1].size] = streams[1]

    bank = StreamingBank(
        RxConfig(**CFG), channels=2, block=BLOCK, group=0
    )
    pkts = bank.process(x)
    pkts += bank.flush()
    assert bank.overflow_blocks == 0
    by_ch = {0: [], 1: []}
    for p in sorted(pkts, key=lambda p: p.index):
        by_ch[p.channel].append(p.data)
    for c in (0, 1):
        assert len(by_ch[c]) == len(ch_payloads[c]), (
            f"channel {c}: {len(by_ch[c])} of {len(ch_payloads[c])} packets"
        )
        for got, exp in zip(by_ch[c], ch_payloads[c]):
            np.testing.assert_array_equal(got, exp)


def test_bank_int8_wire_parity():
    """int8 fixed-point wire must stay decode-lossless (the parity gate the
    bench relies on)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    payloads = [rng.integers(0, 256, 90, dtype=np.uint8) for _ in range(2)]
    stream = _burst_stream(payloads)
    x = np.zeros((2, stream.size + 1000), np.complex64)
    for c in range(2):
        x[c, 50 + 17 * c : 50 + 17 * c + stream.size] = stream

    bank = StreamingBank(
        RxConfig(**CFG), channels=2, block=BLOCK, group=0,
        transfer_dtype=jnp.int8,
    )
    pkts = bank.process(x) + bank.flush()
    assert len(pkts) == 4 and bank.overflow_blocks == 0
    for c in range(2):
        got = [p.data for p in sorted(pkts, key=lambda p: p.index)
               if p.channel == c]
        assert len(got) == 2
        for g, e in zip(got, payloads):
            np.testing.assert_array_equal(g, e)


def test_bank_int4_wire_parity():
    """Packed-int4 wire (two samples per byte): ~21.7 dB quantization SNR
    floor must stay decode-lossless on noisy traffic (the half-size h2d
    wire the serving bench can select with BENCH_XFER=int4)."""
    import jax
    import jax.numpy as jnp

    from gr4_packet_modem_tpu.models.channel import awgn

    rng = np.random.default_rng(8)
    payloads = [rng.integers(0, 256, 90, dtype=np.uint8) for _ in range(2)]
    stream = _burst_stream(payloads)
    x = np.zeros((2, stream.size + 1000), np.complex64)
    for c in range(2):
        x[c, 40 + 13 * c : 40 + 13 * c + stream.size] = stream
    # moderate channel noise on top of the quantization floor
    x = np.asarray(awgn(jax.random.PRNGKey(4), jnp.asarray(x), 0.05))

    bank = StreamingBank(
        RxConfig(**CFG), channels=2, block=BLOCK, group=0,
        transfer_dtype="int4",
    )
    pkts = bank.process(x) + bank.flush()
    assert len(pkts) == 4 and bank.overflow_blocks == 0
    for c in range(2):
        got = [p.data for p in sorted(pkts, key=lambda p: p.index)
               if p.channel == c]
        assert len(got) == 2
        for g, e in zip(got, payloads):
            np.testing.assert_array_equal(g, e)


def test_bank_group_pipelining_matches_monolithic():
    rng = np.random.default_rng(7)
    payloads = [rng.integers(0, 256, 64, dtype=np.uint8)]
    stream = _burst_stream(payloads)
    x = np.zeros((4, 2 * BLOCK), np.complex64)
    for c in range(4):
        x[c, 200 * c : 200 * c + stream.size] = stream * np.exp(0.3j * c)

    results = {}
    for group in (0, 2):
        bank = StreamingBank(
            RxConfig(**CFG), channels=4, block=BLOCK, group=group
        )
        pkts = bank.process(x) + bank.flush()
        results[group] = sorted(
            (p.channel, p.index, p.data.tobytes()) for p in pkts
        )
    assert len(results[0]) == 4
    assert results[0] == results[2]
