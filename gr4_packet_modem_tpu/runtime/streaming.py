"""Streaming drivers: block-wise modem execution with carried state.

The reference runs its modem as a free-running dataflow graph; here the
compiled kernels are driven block-by-block by a host loop with fixed-size
device buffers (the TPU equivalent of the scheduler + ring buffers):

- ``StreamingReceiver``: feeds fixed-size sample blocks through the receiver
  with an overlap carry so packets crossing block boundaries decode exactly
  once; the in-packet suppression state (busy_until) carries across blocks.
- ``StreamingTransmitter``: batches ingress packets into burst/stream sample
  blocks, carrying the GLFSR packet index and stream-mode FIR history.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.receiver import Receiver, RxConfig
from ..models.transmitter import Transmitter
from ..utils import constants as C
from ..utils.cplx import to_device, to_host
from ..utils.ragged import PacketBatch, ragged_concat

__all__ = ["StreamingReceiver", "StreamingTransmitter", "DecodedPacket"]


@dataclass
class DecodedPacket:
    data: np.ndarray
    index: int            # absolute sample index of the syncword start
    packet_type: int
    esn0_db: float


class StreamingReceiver:
    """Block-streaming wrapper around the batched Receiver."""

    def __init__(self, config: RxConfig = RxConfig(), block: int = 1 << 18):
        self.rx = Receiver(config)
        self.block = block
        fp, pt = self.rx.front_pad, self.rx.pad_tail()
        self.fp, self.pt = fp, pt
        self.buf_len = fp + block + pt
        self._buf = jnp.zeros(self.buf_len, jnp.complex64)
        # absolute stream index of buf[0]; the first real sample lands at
        # buffer position fp + pt after the first block append
        self._abs_offset = -(fp + pt + block)
        self._busy_until = -(1 << 62)
        self._pending = np.zeros(0, np.complex64)
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        rx = self.rx

        def step(buf, fresh_lo, fresh_hi, busy0):
            det = rx.acquirer.acquire(buf)
            import dataclasses

            fresh = (det.index >= fresh_lo) & (det.index < fresh_hi)
            det = dataclasses.replace(det, valid=det.valid & fresh)
            hdr, _ = rx.decode_headers(buf, det)
            # in-packet suppression carried across blocks via busy0
            sps = rx.config.samples_per_symbol
            payload_syms = 4 * (hdr.packet_length + C.CRC_NUM_BYTES)
            extent = jnp.where(
                hdr.header_ok,
                sps * (192 + payload_syms),
                sps * 192,
            )

            def sstep(busy_until, xs):
                idx, valid, ext = xs
                keep = valid & (idx >= busy_until)
                busy_until = jnp.where(keep, idx + ext, busy_until)
                return busy_until, keep

            busy_end, keep = jax.lax.scan(
                sstep, busy0 + det.index[0] * 0, (det.index, det.valid, extent)
            )
            res = rx.decode_payloads(buf, det, hdr, keep)
            return det, hdr, res, busy_end

        return step

    def process(self, samples: np.ndarray) -> list[DecodedPacket]:
        """Feed samples; returns packets decoded from newly-complete blocks."""
        self._pending = np.concatenate(
            [self._pending, np.asarray(samples, np.complex64)]
        )
        out: list[DecodedPacket] = []
        while self._pending.size >= self.block:
            chunk, self._pending = (
                self._pending[: self.block],
                self._pending[self.block :],
            )
            out.extend(self._process_block(to_device(chunk)))
        return out

    def flush(self) -> list[DecodedPacket]:
        """Process any buffered tail (pads with zeros)."""
        if self._pending.size == 0:
            return []
        pad = np.zeros(self.block - self._pending.size, np.complex64)
        return self.process(pad)

    def _process_block(self, chunk: jax.Array) -> list[DecodedPacket]:
        # slide the fixed buffer left by one block, append the new chunk
        self._buf = jnp.concatenate([self._buf[self.block :], chunk])
        self._abs_offset += self.block
        # fresh region within the buffer: [fp, fp + block)
        busy0_local = np.int32(
            np.clip(self._busy_until - self._abs_offset, -(1 << 30), 1 << 30)
        )
        det, hdr, res, busy_end = self._step(
            self._buf,
            jnp.int32(self.fp),
            jnp.int32(self.fp + self.block),
            jnp.int32(busy0_local),
        )
        self._busy_until = int(busy_end) + self._abs_offset
        accepted = np.asarray(res.accepted)
        out = []
        if accepted.any():
            data = np.asarray(res.data)
            lens = np.asarray(res.lengths)
            idxs = np.asarray(det.index)
            types = np.asarray(hdr.packet_type)
            esn0 = np.asarray(det.esn0_db)
            for i in np.nonzero(accepted)[0]:
                out.append(
                    DecodedPacket(
                        data=data[i, : lens[i]].copy(),
                        index=int(idxs[i]) + self._abs_offset,
                        packet_type=int(types[i]),
                        esn0_db=float(esn0[i]),
                    )
                )
        return out


class StreamingTransmitter:
    """Host driver around the batched Transmitter with carried TX state."""

    def __init__(self, tx: Transmitter):
        self.tx = tx
        self._packet_index = 0
        self._fir_carry = None

    def send_burst(self, payloads, types=None) -> np.ndarray:
        """Modulate a list of payloads as back-to-back bursts."""
        batch = PacketBatch.from_list(
            payloads, max_len=self.tx.config.max_payload_len, types=types
        )
        samples, lens = self.tx.modulate_bursts(
            batch, packet_index0=self._packet_index
        )
        self._packet_index += len(payloads)
        n = int(np.sum(np.asarray(lens)))
        stream, total = jax.jit(
            lambda ss, ll: ragged_concat(ss, ll, n)
        )(samples, lens)
        return to_host(stream)[: int(total)]

    def send_stream(self, payloads, types=None) -> np.ndarray:
        """Modulate payloads in stream mode (continuous FIR state)."""
        batch = PacketBatch.from_list(
            payloads, max_len=self.tx.config.max_payload_len, types=types
        )
        out_syms = sum(C.stream_symbols(len(p)) for p in payloads)
        carry, samples, total = self.tx.modulate_stream(
            batch, out_syms, self._fir_carry
        )
        self._fir_carry = carry
        return to_host(samples)[: int(total)]
