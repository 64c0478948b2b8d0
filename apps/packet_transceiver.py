#!/usr/bin/env python3
"""Full transceiver app: TX -> channel model -> RX, IP over radio via TUN.

Mirrors apps/packet_transceiver.cpp: TunSource -> PacketTransmitterPdu ->
[throttle @ samp_rate] -> channel (SFO resampler, CFO rotator, AWGN) ->
PacketReceiver -> PacketTypeFilter -> TunSink, with the latency-management
credit loop bounding in-flight packets. Without --tun-in it runs a self-test
loopback with generated packets.

usage: packet_transceiver.py [--stream] [--esn0 DB] [--cfo RAD_PER_SAMPLE]
       [--sfo PPM] [--bins N] [--samp-rate SPS] [--tun-in NAME]
       [--tun-out NAME] [--netns-in NS] [--netns-out NS] [--seconds T]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()  # PM_PLATFORM backend override + persistent compile cache

import numpy as np

import jax
import jax.numpy as jnp

from gr4_packet_modem_tpu.models.channel import (
    awgn,
    esn0_db_to_noise_sigma,
    rotate,
    sfo,
)
from gr4_packet_modem_tpu.models.receiver import RxConfig
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.runtime.flow import PacketCredit, ProbeRate, Throttle
from gr4_packet_modem_tpu.runtime.streaming import (
    StreamingReceiver,
    StreamingTransmitter,
)
from gr4_packet_modem_tpu.utils import constants as C


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stream", action="store_true")
    p.add_argument("--esn0", type=float, default=20.0)
    p.add_argument("--cfo", type=float, default=0.0)
    p.add_argument("--sfo", type=float, default=0.0)
    p.add_argument("--bins", type=int, default=4)
    p.add_argument("--samp-rate", type=float, default=3.2e6)
    p.add_argument("--max-len", type=int, default=1536)
    p.add_argument("--max-packets", type=int, default=2, help="credit limit")
    p.add_argument("--idle-size", type=int, default=256)
    p.add_argument("--tun-in", default="")
    p.add_argument("--tun-out", default="")
    p.add_argument("--netns-in", default="")
    p.add_argument("--netns-out", default="")
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument(
        "--log-packets",
        action="store_true",
        help="per-packet RX debug line (index/len/type/esn0/freq/arm), the "
        "reference's PayloadMetadataInsert{log:true}",
    )
    p.add_argument(
        "--zmq",
        action="store_true",
        help="publish post-Costas header/payload symbols on tcp://*:5000 "
        "and :5001 for scripts/plot_symbols.py",
    )
    args = p.parse_args()
    if args.log_packets:
        import logging

        logging.basicConfig(level=logging.INFO, format="%(name)s %(message)s")

    tx = StreamingTransmitter(
        Transmitter(
            TxConfig(max_payload_len=args.max_len, stream_mode=args.stream)
        )
    )
    header_tap = payload_tap = None
    if args.zmq:
        from gr4_packet_modem_tpu.io.zmq_pub import ZmqPduPubSink

        header_tap = ZmqPduPubSink("tcp://*:5000")
        payload_tap = ZmqPduPubSink("tcp://*:5001")
    rx = StreamingReceiver(
        RxConfig(max_payload_len=args.max_len, freq_bins=args.bins),
        block=1 << 17,
        header_tap=header_tap,
        payload_tap=payload_tap,
        log=args.log_packets,
    )
    throttle = Throttle(args.samp_rate)
    probe = ProbeRate()
    credit = PacketCredit(args.max_packets)

    tun_in = tun_out = None
    if args.tun_in:
        from gr4_packet_modem_tpu.io.tun import TunDevice

        tun_in = TunDevice(args.tun_in, args.netns_in)
    if args.tun_out:
        from gr4_packet_modem_tpu.io.tun import TunDevice

        tun_out = TunDevice(args.tun_out, args.netns_out)

    # noise sigma from Es/N0 at the TX output power
    probe_sig = tx.send_burst([np.zeros(256, np.uint8)])
    sig_power = float(np.mean(np.abs(probe_sig) ** 2))
    tx._packet_index = 0  # the probe burst was out-of-band
    sigma = esn0_db_to_noise_sigma(args.esn0, sig_power)
    key = jax.random.PRNGKey(int(time.time()))

    # channel impairments shared by the main loop and the stream-mode tail
    # flush: the CFO rotator phase is continuous across chunks (rotate's n0
    # carries the absolute sample index), so the final in-flight packet sees
    # no phase discontinuity at the flush boundary
    chan_state = {"key": key, "n_abs": 0}

    def through_channel(sig):
        x = jnp.asarray(sig)
        if args.sfo:
            x = sfo(x, args.sfo)
        if args.cfo:
            x = rotate(x, args.cfo, n0=chan_state["n_abs"])
        chan_state["n_abs"] += int(x.shape[0])
        chan_state["key"], sub = jax.random.split(chan_state["key"])
        return awgn(sub, x, sigma)

    deadline = time.time() + args.seconds
    sent = received = 0
    seq = 0
    while time.time() < deadline:
        # ---- ingress: TUN packets or idle/test packets
        payloads, types = [], []
        for _ in range(4):
            pkt = tun_in.read_packet(10) if tun_in is not None else None
            if pkt is not None and credit.acquire(0.1):
                payloads.append(np.frombuffer(pkt, np.uint8))
                types.append(int(C.PacketType.USER_DATA))
            elif args.stream or tun_in is None:
                payloads.append(
                    (np.arange(args.idle_size) + seq).astype(np.uint8)
                    % np.uint8(255)
                )
                types.append(
                    int(C.PacketType.IDLE)
                    if tun_in is not None
                    else int(C.PacketType.USER_DATA)
                )
                seq += 1
        if not payloads:
            continue
        sent += len(payloads)
        sig = (
            tx.send_stream(payloads, types)
            if args.stream
            else tx.send_burst(payloads, types)
        )
        # ---- channel
        x = through_channel(sig)
        throttle.wait(x.shape[0])
        # ---- RX
        from gr4_packet_modem_tpu.utils.cplx import to_host

        for pkt in rx.process(to_host(x)):
            received += 1
            credit.release()
            if tun_out is not None:
                tun_out.write_packet(pkt.data.tobytes())
        rep = probe.update(x.shape[0])
        if rep is not None:
            print(
                f"rate {rep.rate_now / 1e6:.2f} Msps (avg "
                f"{rep.rate_avg / 1e6:.2f}), sent {sent}, received {received}"
            )
    if args.stream:
        # flush the TX interpolator history through the receiver so the
        # final in-flight packet's tail samples are not lost; the tail goes
        # through the SAME channel (continuous CFO phase) as the main loop —
        # it belongs to the final packet's waveform
        tail = tx.flush_stream()
        if tail.size:
            from gr4_packet_modem_tpu.utils.cplx import to_host as _th

            tail = _th(through_channel(tail))
            for pkt in rx.process(tail):
                received += 1
                credit.release()
                if tun_out is not None:
                    tun_out.write_packet(pkt.data.tobytes())
    for pkt in rx.flush():
        received += 1
        if tun_out is not None:
            tun_out.write_packet(pkt.data.tobytes())
    print(f"done: sent {sent}, received {received}")


if __name__ == "__main__":
    main()
