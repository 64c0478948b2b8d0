"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Mirrors the SURVEY §4 implication: a sharded run must decode exactly what the
single-device run decodes (bit-identity of the decoded packets).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gr4_packet_modem_tpu.models.channel import awgn
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.parallel.bank import BankConfig, ReceiverBank, make_mesh
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

RXCFG = RxConfig(max_payload_len=64, max_detections=4, freq_bins=1)


def _make_signal(block_total, seed=0):
    tx = Transmitter(TxConfig(max_payload_len=64))
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, n, dtype=np.uint8) for n in [50, 20]]
    batch = PacketBatch.from_list(payloads, max_len=64)
    s, l = tx.modulate_bursts(batch)
    stream, _ = ragged_concat(s, l, block_total)
    return np.asarray(stream), payloads


def test_bank_decodes_all_channels():
    mesh = make_mesh(8, time_shards=2)
    bank = ReceiverBank(mesh, BankConfig(num_channels=8, rx=RXCFG))
    stream, payloads = _make_signal(8192)
    x = jnp.tile(jnp.asarray(stream)[None], (8, 1))
    res = bank.step(x)
    acc = np.asarray(res.accepted)
    assert (acc.sum(axis=1) == 2).all()
    lens = np.asarray(res.lengths)
    for c in range(8):
        got = sorted(lens[c][acc[c]].tolist())
        assert got == sorted(len(p) for p in payloads)


def test_bank_matches_single_device():
    """Sharded decode == single-chip decode, including a packet that crosses
    the time-shard boundary (decoded via the right halo)."""
    mesh = make_mesh(8, time_shards=2)
    bank = ReceiverBank(mesh, BankConfig(num_channels=8, rx=RXCFG))
    # craft a stream where the second packet starts just before the boundary
    # (time shard size 4096): place bursts at offsets 0 and ~3900
    tx = Transmitter(TxConfig(max_payload_len=64))
    rng = np.random.default_rng(1)
    payloads = [rng.integers(0, 256, n, dtype=np.uint8) for n in [30, 60]]
    batch = PacketBatch.from_list(payloads, max_len=64)
    s, l = tx.modulate_bursts(batch)
    s = np.asarray(s)
    l = np.asarray(l)
    stream = np.zeros(8192, np.complex64)
    stream[: l[0]] = s[0, : l[0]]
    start2 = 3900
    stream[start2 : start2 + l[1]] = s[1, : l[1]]
    noisy = np.asarray(
        awgn(jax.random.PRNGKey(2), jnp.asarray(stream), 0.05)
    )
    x = jnp.tile(jnp.asarray(noisy)[None], (8, 1))
    res = bank.step(x)
    acc = np.asarray(res.accepted)
    data = np.asarray(res.data)
    lens = np.asarray(res.lengths)
    # single-device reference
    rx1 = Receiver(RXCFG)
    res1 = rx1.receive(noisy)
    acc1 = np.asarray(res1.accepted)
    d1 = np.asarray(res1.data)
    l1 = np.asarray(res1.lengths)
    ref_pkts = sorted(
        (d1[i, : l1[i]].tobytes() for i in range(len(acc1)) if acc1[i])
    )
    assert len(ref_pkts) == 2
    for c in range(8):
        got = sorted(
            data[c][i, : lens[c][i]].tobytes()
            for i in range(acc.shape[1])
            if acc[c][i]
        )
        assert got == ref_pkts


def test_false_syncword_after_shard_boundary_suppressed():
    """A complete, CRC-clean 'packet' embedded inside a straddling packet's
    payload region just after the time-shard boundary must be suppressed
    exactly as on the single-chip path (the in-packet suppression chain
    crosses shard boundaries — round-4 verdict item 3). Without the chain,
    shard 1's fresh scan state never sees shard 0's claim and decodes the
    embedded packet as real."""
    tx = Transmitter(TxConfig(max_payload_len=64))
    rng = np.random.default_rng(3)

    def burst(n):
        payload = rng.integers(0, 256, n, dtype=np.uint8)
        s, l = tx.modulate_bursts(PacketBatch.from_list([payload], max_len=64))
        return np.asarray(s)[0, : int(np.asarray(l)[0])], payload

    b_a, p_a = burst(50)     # control packet, fully in shard 0
    b_outer, _ = burst(60)   # straddles the boundary at 4096
    b_inner, p_inner = burst(8)  # embedded false packet after the boundary

    stream = np.zeros(8192, np.complex64)
    stream[: b_a.size] = b_a
    stream[3600 : 3600 + b_outer.size] = b_outer
    # overwrite the outer packet's payload samples: the inner syncword START
    # must sit after the outer header region (ends 3600 + 192*4 = 4368, so
    # the outer header still decodes) and inside the outer extent claim
    # (ends 3600 + 4*(192+4*64) = 5392) so the single-chip path suppresses
    # it; the inner burst's trailing ramp may spill past the claim end
    assert 4400 >= 4368 and 4400 < 5392
    stream[4400 : 4400 + b_inner.size] = b_inner

    rx1 = Receiver(RXCFG)
    res1 = rx1.receive(stream)
    acc1 = np.asarray(res1.accepted)
    d1, l1 = np.asarray(res1.data), np.asarray(res1.lengths)
    ref_pkts = sorted(
        d1[i, : l1[i]].tobytes() for i in range(len(acc1)) if acc1[i]
    )
    # single-chip: only the control packet decodes (outer fails CRC from the
    # overwrite, inner is suppressed inside the outer claim)
    assert ref_pkts == [p_a.tobytes()]

    mesh = make_mesh(8, time_shards=2)
    bank = ReceiverBank(mesh, BankConfig(num_channels=4, rx=RXCFG))
    x = jnp.tile(jnp.asarray(stream)[None], (4, 1))
    res = bank.step(x)
    acc = np.asarray(res.accepted)
    data, lens = np.asarray(res.data), np.asarray(res.lengths)
    for c in range(4):
        got = sorted(
            data[c][i, : lens[c][i]].tobytes()
            for i in range(acc.shape[1])
            if acc[c][i]
        )
        assert got == ref_pkts, (
            f"channel {c}: embedded packet not suppressed across the shard "
            f"boundary ({len(got)} packets)"
        )


def test_halo_peaks_do_not_consume_detection_slots():
    """A strong syncword near the boundary (owned by shard 0 but visible in
    shard 1's left halo) must not consume shard 1's max_detections slots:
    candidate selection is fresh-window-restricted BEFORE the top-k
    (round-4 verdict item 3). With the old post-hoc own-mask, the halo peak
    wins a slot by power and one of shard 1's real packets is dropped."""
    tx = Transmitter(TxConfig(max_payload_len=64))
    rng = np.random.default_rng(4)

    def burst(n):
        payload = rng.integers(0, 256, n, dtype=np.uint8)
        s, l = tx.modulate_bursts(PacketBatch.from_list([payload], max_len=64))
        return np.asarray(s)[0, : int(np.asarray(l)[0])], payload

    b_h, p_h = burst(8)    # strong packet at the end of shard 0
    b_1, p_1 = burst(8)
    b_2, p_2 = burst(8)
    stream = np.zeros(8192, np.complex64)
    # start inside shard 1's eligible left-halo view ([4032, 4096) after the
    # time-threshold margin) so the halo peak competes for slots in old code
    stream[4040 : 4040 + b_h.size] = 2.0 * b_h  # 4x power
    stream[5200 : 5200 + b_1.size] = b_1
    stream[6800 : 6800 + b_2.size] = b_2

    cfg = RxConfig(max_payload_len=64, max_detections=2, freq_bins=1)
    mesh = make_mesh(8, time_shards=2)
    bank = ReceiverBank(mesh, BankConfig(num_channels=4, rx=cfg))
    x = jnp.tile(jnp.asarray(stream)[None], (4, 1))
    res = bank.step(x)
    acc = np.asarray(res.accepted)
    data, lens = np.asarray(res.data), np.asarray(res.lengths)
    expected = sorted(p.tobytes() for p in (p_h, p_1, p_2))
    for c in range(4):
        got = sorted(
            data[c][i, : lens[c][i]].tobytes()
            for i in range(acc.shape[1])
            if acc[c][i]
        )
        assert got == expected, (
            f"channel {c}: {len(got)}/3 packets — halo peak consumed a "
            "detection slot"
        )


def test_graft_entry_points():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (16,)
    g.dryrun_multichip(8)
