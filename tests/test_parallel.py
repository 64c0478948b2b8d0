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


def test_graft_entry_points():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (16,)
    g.dryrun_multichip(8)
