"""Multi-chip receiver bank: channels x time sharding with halo exchange.

The reference is a single-process dataflow program (SURVEY.md §2.4); its
TPU-native scale-out shards a many-channel receiver bank over a device mesh:

- ``ch`` axis (data-parallel analogue): independent RF channels.
- ``time`` axis (sequence-parallel analogue): each device owns a contiguous
  time shard of every channel it holds; the overlap-save style lookback and
  lookahead that the reference implements with ring-buffer history
  (syncword_detection.hpp:236-238, HistoryBuffer) becomes a **halo exchange**
  between time-neighbour devices via ``lax.ppermute`` over ICI.

Each device then runs the identical single-chip receiver program (acquire ->
header pass -> filter -> payload pass) on its extended local block, keeping
only detections whose syncword start falls inside its own shard; packets
crossing the shard boundary are decoded by the owning shard via the right
halo (sized to the maximum packet extent). Per-device results are returned
sharded; no collective is needed on the data path beyond the halos.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.receiver import Receiver, RxConfig

__all__ = ["BankConfig", "ReceiverBank", "make_mesh"]


def make_mesh(n_devices: int | None = None, time_shards: int | None = None) -> Mesh:
    """Build a 2D (ch, time) mesh over the available devices."""
    devices = np.array(jax.devices())
    n = n_devices or devices.size
    devices = devices[:n]
    if time_shards is None:
        # prefer a modest time dimension; channels carry most parallelism
        time_shards = 2 if n % 2 == 0 and n >= 2 else 1
    ch_shards = n // time_shards
    return Mesh(devices.reshape(ch_shards, time_shards), ("ch", "time"))


@dataclass(frozen=True)
class BankConfig:
    num_channels: int = 64
    block_samples: int = 1 << 17  # per time shard, per channel
    rx: RxConfig = RxConfig()
    # channel-group pipelining within each device's local step: bounds the
    # [C_loc*D, region] working set (Receiver.bank_step; PERF_R3.md —
    # monolithic >16-channel programs degrade super-linearly on v5e)
    channel_group: int = 16


class ReceiverBank:
    """Sharded receiver bank over a (ch, time) mesh."""

    def __init__(self, mesh: Mesh, config: BankConfig = BankConfig()):
        self.mesh = mesh
        self.config = config
        self.rx = Receiver(config.rx)
        # halo sizes: left lookback for CFAR + filter history, right lookahead
        # for packets extending past the shard end
        self.left_halo = self.rx.front_pad
        self.right_halo = self.rx.pad_tail()
        self._step = self._build_step()

    # ------------------------------------------------------------------ build

    def _build_step(self):
        rx = self.rx
        mesh = self.mesh
        lh, rh = self.left_halo, self.right_halo
        t_axis = "time"

        def local_step(x_loc: jax.Array):
            """x_loc: [C_loc, T_loc] complex64 — this device's shard."""
            t_loc = x_loc.shape[1]
            nt = jax.lax.psum(1, t_axis)
            idx_t = jax.lax.axis_index(t_axis)
            # left halo: last lh samples of the left time-neighbour
            left_src = [(i, (i + 1) % nt) for i in range(nt)]
            left = jax.lax.ppermute(x_loc[:, -lh:], t_axis, left_src)
            left = jnp.where(idx_t == 0, 0.0, 1.0).astype(x_loc.dtype) * left
            # right halo: first rh samples of the right time-neighbour
            right_src = [(i, (i - 1) % nt) for i in range(nt)]
            right = jax.lax.ppermute(x_loc[:, :rh], t_axis, right_src)
            right = (
                jnp.where(idx_t == nt - 1, 0.0, 1.0).astype(x_loc.dtype) * right
            )
            ext = jnp.concatenate([left, x_loc, right], axis=1)

            import dataclasses

            from ..models.receiver import flatten_grouped_results

            def decode_group(g):
                det = jax.vmap(
                    lambda xc: rx.acquirer.acquire(xc, index0=0)
                )(g)
                # own only detections starting inside this shard
                own = (det.index >= lh) & (det.index < lh + t_loc)
                det = dataclasses.replace(det, valid=det.valid & own)
                # lane-packed decode: the group's detections in one batch
                return rx.decode_bank(g, det)

            c_loc = ext.shape[0]
            cg = self.config.channel_group
            if 0 < cg < c_loc and c_loc % cg == 0:
                # channel-group pipelining (see BankConfig.channel_group)
                outs = jax.lax.map(
                    decode_group, ext.reshape(c_loc // cg, cg, ext.shape[1])
                )
                _, _, res, _ = flatten_grouped_results(*outs)
            else:
                _, _, res, _ = decode_group(ext)
            dd = rx.config.max_detections
            # back to [C_loc, D, ...] rows for the (ch, time) out sharding
            return jax.tree.map(
                lambda a: a.reshape((c_loc, dd) + a.shape[1:]), res
            )

        in_spec = P("ch", "time")
        out_spec = P("ch")  # per-channel results, time-sharded work reduced
        # results stay sharded over ch; each time shard returns its own rows —
        # stack along a new leading 'time' axis instead of reducing
        step = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(in_spec,),
            out_specs=P("ch", "time"),
            # the receiver's Pallas kernels return ShapeDtypeStruct outputs
            # without vma annotations; every output of local_step is fully
            # local to its shard, so the varying-axis check adds nothing
            check_vma=False,
        )
        return jax.jit(step)

    # -------------------------------------------------------------------- api

    def sharding(self):
        return NamedSharding(self.mesh, P("ch", "time"))

    def step(self, samples: jax.Array):
        """samples: [num_channels, total_samples] with total_samples divisible
        by the time-mesh size. Returns per-(channel, det) PayloadResult with
        fields shaped [C, time_shards * D, ...]."""
        return self._step(samples)
