#!/usr/bin/env python3
"""Sharded receiver bank over a device mesh (multi-chip scale-out demo).

Runs the (ch, time)-sharded `ReceiverBank` on whatever devices are
available; on a CPU host set
``XLA_FLAGS=--xla_force_host_platform_device_count=8 PM_PLATFORM=cpu`` to
simulate an 8-device mesh. Each device decodes its own time shard; packets
straddling shard boundaries are recovered through the ppermute halo
exchange (parallel/bank.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()  # PM_PLATFORM backend override + persistent compile cache

import jax
import numpy as np

from gr4_packet_modem_tpu.models.receiver import RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.parallel.bank import BankConfig, ReceiverBank, make_mesh
from gr4_packet_modem_tpu.utils.cplx import to_host
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

mesh = make_mesh()
ch_shards, t_shards = mesh.devices.shape
print(f"mesh: {ch_shards} channel shards x {t_shards} time shards "
      f"({mesh.devices.size} devices)")

block = 8192
channels = 2 * ch_shards
bank = ReceiverBank(
    mesh,
    BankConfig(
        num_channels=channels,
        block_samples=block,
        rx=RxConfig(max_payload_len=128, max_detections=8, freq_bins=1),
    ),
)

tx = Transmitter(TxConfig(max_payload_len=128))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 96, dtype=np.uint8) for _ in range(3)]
batch = PacketBatch.from_list(payloads, max_len=128)
s, l = tx.modulate_bursts(batch)
stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
burst = to_host(stream)

total = block * t_shards
x = np.zeros((channels, total), np.complex64)
for c in range(channels):
    x[c, 37 + 101 * c : 37 + 101 * c + burst.size] = burst  # staggered

xg = jax.device_put(x, bank.sharding())
res = bank.step(xg)
accepted = np.asarray(res.accepted)
print(f"decoded {int(accepted.sum())} packets "
      f"(expected {channels * len(payloads)}) across {mesh.devices.size} devices")
assert int(accepted.sum()) == channels * len(payloads)
