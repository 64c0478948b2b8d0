#!/usr/bin/env python3
"""RX app for SDR hardware via SoapySDR (mirrors
apps/packet_receiver_soapy.cpp: rtlsdr @ 3.2 Msps -> PacketReceiver -> TUN).

Gated on the SoapySDR python bindings being installed; falls back with a
clear message otherwise (use packet_receiver_file.py with a FIFO as the
hardware bridge in environments without Soapy).

usage: packet_receiver_soapy.py [--driver rtlsdr] [--freq HZ] [--rate SPS]
       [--gain DB] [--tun NAME] [--netns NS] [--bins N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()  # PM_PLATFORM backend override + persistent compile cache

import numpy as np

from gr4_packet_modem_tpu.models.receiver import RxConfig
from gr4_packet_modem_tpu.runtime.streaming import StreamingReceiver


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--driver", default="rtlsdr")
    p.add_argument("--freq", type=float, default=435e6)
    p.add_argument("--rate", type=float, default=3.2e6)
    p.add_argument("--gain", type=float, default=30.0)
    p.add_argument("--tun", default="")
    p.add_argument("--netns", default="")
    p.add_argument("--bins", type=int, default=4)
    args = p.parse_args()

    try:
        import SoapySDR  # type: ignore
        from SoapySDR import SOAPY_SDR_CF32, SOAPY_SDR_RX  # type: ignore
    except ImportError:
        print(
            "SoapySDR python bindings not available in this environment; "
            "bridge hardware samples through a FIFO and use "
            "packet_receiver_file.py instead."
        )
        sys.exit(2)

    sdr = SoapySDR.Device({"driver": args.driver})
    sdr.setSampleRate(SOAPY_SDR_RX, 0, args.rate)
    sdr.setFrequency(SOAPY_SDR_RX, 0, args.freq)
    sdr.setGain(SOAPY_SDR_RX, 0, args.gain)
    st = sdr.setupStream(SOAPY_SDR_RX, SOAPY_SDR_CF32)
    sdr.activateStream(st)

    tun = None
    if args.tun:
        from gr4_packet_modem_tpu.io.tun import TunDevice

        tun = TunDevice(args.tun, args.netns)

    rx = StreamingReceiver(
        RxConfig(max_payload_len=1536, freq_bins=args.bins), block=1 << 17
    )
    buf = np.zeros(1 << 16, np.complex64)
    total = 0
    try:
        while True:
            sr = sdr.readStream(st, [buf], buf.size)
            if sr.ret <= 0:
                continue
            for pkt in rx.process(buf[: sr.ret]):
                total += 1
                if tun is not None:
                    tun.write_packet(pkt.data.tobytes())
                else:
                    print(f"packet {total}: len={pkt.data.size}")
    finally:
        sdr.deactivateStream(st)
        sdr.closeStream(st)


if __name__ == "__main__":
    main()
