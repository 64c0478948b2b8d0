"""Worker process for the 2-process jax.distributed test (not a test file).

Each process contributes 2 virtual CPU devices; the global mesh is
(ch=2, time=2) over 4 devices spanning both processes, so the receiver
bank's ppermute halo exchange crosses the process (DCN) boundary.
Run by tests/test_multihost.py with PM_* env vars set.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from gr4_packet_modem_tpu.parallel import multihost  # noqa: E402


def main():
    assert multihost.initialize(), "PM_COORDINATOR must be set"
    pid = jax.process_index()
    n_glob = len(jax.devices())
    assert jax.process_count() == 2, jax.process_count()
    assert n_glob == 4, f"expected 4 global devices, got {n_glob}"

    from gr4_packet_modem_tpu.models.receiver import RxConfig
    from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
    from gr4_packet_modem_tpu.parallel.bank import BankConfig, ReceiverBank, make_mesh
    from gr4_packet_modem_tpu.utils.cplx import to_host
    from gr4_packet_modem_tpu.utils.ragged import PacketBatch, ragged_concat

    mesh = make_mesh(4, time_shards=2)  # (ch=2, time=2) across processes
    rxcfg = RxConfig(max_payload_len=64, max_detections=4, freq_bins=1)
    block = 4096
    bank = ReceiverBank(
        mesh, BankConfig(num_channels=2, block_samples=block, rx=rxcfg)
    )

    # one packet per channel; the second packet straddles the time-shard
    # boundary so its decode requires the cross-process right halo
    tx = Transmitter(TxConfig(max_payload_len=64))
    payload = np.arange(48, dtype=np.uint8)
    batch = PacketBatch.from_list([payload], max_len=64)
    s, l = tx.modulate_bursts(batch)
    stream, _ = ragged_concat(s, l, int(np.asarray(l).sum()))
    burst = to_host(stream)
    total = 2 * block
    x = np.zeros((2, total), np.complex64)
    x[0, 100 : 100 + burst.size] = burst
    straddle = block - burst.size // 2  # crosses the shard edge
    x[1, straddle : straddle + burst.size] = burst

    sharding = bank.sharding()
    xg = jax.make_array_from_callback(
        x.shape, sharding, lambda idx: x[idx]
    )
    res = bank.step(xg)
    n_acc = int(jax.jit(lambda a: a.sum())(res.accepted))
    ok = n_acc == 2
    print(f"proc {pid}: accepted={n_acc} ok={ok}", flush=True)
    if pid == 0:
        print("MULTIHOST_RESULT " + ("PASS" if ok else "FAIL"), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
