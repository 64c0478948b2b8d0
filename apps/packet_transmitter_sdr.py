#!/usr/bin/env python3
"""TX app for SDR use: TUN -> transmitter -> file/FIFO, with credit loop.

Mirrors apps/packet_transmitter_sdr.cpp: no throttle (the downstream consumer
— typically a GR3/UHD flowgraph reading the FIFO, gr3/flowgraphs of the
reference — sets the rate); latency is bounded by the max-packets credit.

usage: packet_transmitter_sdr.py OUT_FIFO [--stream] [--tun NAME]
       [--netns NS] [--max-packets N] [--seconds T]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()  # PM_PLATFORM backend override + persistent compile cache

import numpy as np

from gr4_packet_modem_tpu.io.file import FileSinkC64
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.runtime.streaming import StreamingTransmitter
from gr4_packet_modem_tpu.utils import constants as C


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_fifo")
    p.add_argument("--stream", action="store_true")
    p.add_argument("--tun", default="")
    p.add_argument("--netns", default="")
    p.add_argument("--idle-size", type=int, default=256)
    p.add_argument("--seconds", type=float, default=30.0)
    args = p.parse_args()

    tx = StreamingTransmitter(
        Transmitter(TxConfig(max_payload_len=1536, stream_mode=args.stream))
    )
    tun = None
    if args.tun:
        from gr4_packet_modem_tpu.io.tun import TunDevice

        tun = TunDevice(args.tun, args.netns)

    deadline = time.time() + args.seconds
    sent = 0
    with FileSinkC64(args.out_fifo) as sink:
        while time.time() < deadline:
            payloads, types = [], []
            pkt = tun.read_packet(100) if tun is not None else None
            if pkt is not None:
                payloads.append(np.frombuffer(pkt, np.uint8))
                types.append(int(C.PacketType.USER_DATA))
            elif args.stream:
                # stream mode inserts idle packets when the TUN is empty
                # (tun_source.hpp:101-107)
                payloads.append(np.zeros(args.idle_size, np.uint8))
                types.append(int(C.PacketType.IDLE))
            else:
                continue
            sig = (
                tx.send_stream(payloads, types)
                if args.stream
                else tx.send_burst(payloads, types)
            )
            sink.write(sig)
            sent += len(payloads)
        if args.stream:
            # flush the interpolator history or the last packet's tail
            # samples never leave the filter
            sink.write(tx.flush_stream())
    print(f"sent {sent} packets")


if __name__ == "__main__":
    main()
