#!/usr/bin/env python3
"""PER vs Es/N0 sweep of the full modem (stream-mode channel sweep config)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from gr4_packet_modem_tpu.models.channel import (
    awgn,
    esn0_db_to_noise_sigma,
    rotate,
)
from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

NUM = 32
LEN = 200

tx = Transmitter(TxConfig(max_payload_len=256))
rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, LEN, dtype=np.uint8) for _ in range(NUM)]
batch = PacketBatch.from_list(payloads, max_len=256)
s, l = tx.modulate_bursts(batch)
stream, _ = ragged_concat(s, l, int(np.sum(np.asarray(l))))
duty = np.sum(np.asarray(l)) / np.asarray(stream).size
sig_power = float(np.mean(np.abs(np.asarray(stream)) ** 2)) / duty

rx = Receiver(RxConfig(max_payload_len=256, max_detections=64))
print("Es/N0[dB]  PER")
for esn0 in np.arange(5.0, 21.0, 1.5):
    sigma = esn0_db_to_noise_sigma(esn0, sig_power)
    x = awgn(jax.random.PRNGKey(int(esn0 * 10)), rotate(stream, 0.005), sigma)
    res = rx.receive(x)
    acc = np.asarray(res.accepted)
    data = np.asarray(res.data)
    lens = np.asarray(res.lengths)
    good = sum(
        1
        for i in np.nonzero(acc)[0]
        for p in payloads
        if lens[i] == p.size and np.array_equal(data[i, : p.size], p)
    )
    print(f"{esn0:8.1f}  {1.0 - good / NUM:.3f}")
