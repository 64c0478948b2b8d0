#!/usr/bin/env python3
"""RX-only app: decode packets from a raw complex64 IQ file.

Mirrors apps/packet_receiver_file.cpp: FileSource -> PacketReceiver ->
(TunSink | hexdump). Decoded user packets are written to a TUN device when
``--tun`` is given (needs root), otherwise summarized to stdout.

usage: packet_receiver_file.py IQ_FILE [--tun NAME] [--netns NS]
       [--bins N] [--threshold X] [--max-len N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()  # PM_PLATFORM backend override + persistent compile cache

from gr4_packet_modem_tpu.io.file import stream_c64_blocks
from gr4_packet_modem_tpu.models.receiver import RxConfig
from gr4_packet_modem_tpu.runtime.streaming import StreamingReceiver


def main():
    p = argparse.ArgumentParser()
    p.add_argument("iq_file")
    p.add_argument("--tun", default="")
    p.add_argument("--netns", default="")
    p.add_argument("--bins", type=int, default=4)
    p.add_argument("--threshold", type=float, default=9.5)
    p.add_argument("--max-len", type=int, default=1536)
    p.add_argument("--block", type=int, default=1 << 18)
    p.add_argument(
        "--zmq",
        action="store_true",
        help="publish post-Costas header/payload symbols on tcp://*:5000 "
        "and :5001 for scripts/plot_symbols.py (packet_receiver.hpp:159-189)",
    )
    p.add_argument(
        "--log-packets",
        action="store_true",
        help="per-packet RX debug line (index/len/type/esn0/freq/arm), the "
        "reference's PayloadMetadataInsert{log:true} "
        "(payload_metadata_insert.hpp:66)",
    )
    args = p.parse_args()
    if args.log_packets:
        import logging

        logging.basicConfig(level=logging.INFO, format="%(name)s %(message)s")

    tun = None
    if args.tun:
        from gr4_packet_modem_tpu.io.tun import TunDevice

        tun = TunDevice(args.tun, args.netns)

    header_tap = payload_tap = None
    if args.zmq:
        from gr4_packet_modem_tpu.io.zmq_pub import ZmqPduPubSink

        header_tap = ZmqPduPubSink("tcp://*:5000")
        payload_tap = ZmqPduPubSink("tcp://*:5001")

    rx = StreamingReceiver(
        RxConfig(
            max_payload_len=args.max_len,
            freq_bins=args.bins,
            power_threshold=args.threshold,
        ),
        block=args.block,
        header_tap=header_tap,
        payload_tap=payload_tap,
        log=args.log_packets,
    )
    total = 0
    for block in stream_c64_blocks(args.iq_file, args.block):
        for pkt in rx.process(block):
            total += 1
            if tun is not None:
                tun.write_packet(pkt.data.tobytes())
            else:
                print(
                    f"packet {total}: len={pkt.data.size} at sample "
                    f"{pkt.index}, Es/N0={pkt.esn0_db:.2f} dB"
                )
    for pkt in rx.flush():
        total += 1
        if tun is not None:
            tun.write_packet(pkt.data.tobytes())
        else:
            print(f"packet {total}: len={pkt.data.size} at sample {pkt.index}")
    print(f"decoded {total} packets")


if __name__ == "__main__":
    main()
