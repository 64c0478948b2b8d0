#!/usr/bin/env python3
"""TX benchmark app: transmitter -> throttle -> rate probe.

Mirrors apps/packet_transmitter_pdu_throttle.cpp: continuous 1500-byte
packets modulated and throttled to the target sample rate with the achieved
rate printed periodically.

usage: packet_transmitter_pdu_throttle.py [stream|burst] [samp_rate]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()  # PM_PLATFORM backend override + persistent compile cache

import numpy as np

from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.runtime.flow import ProbeRate, Throttle
from gr4_packet_modem_tpu.runtime.streaming import StreamingTransmitter


def main():
    if sys.argv[1:2] in (["-h"], ["--help"]):
        print(__doc__)
        sys.exit(0)
    stream_mode = (sys.argv[1] if len(sys.argv) > 1 else "burst") == "stream"
    samp_rate = float(sys.argv[2]) if len(sys.argv) > 2 else 3.2e6

    tx = StreamingTransmitter(
        Transmitter(TxConfig(max_payload_len=1536, stream_mode=stream_mode))
    )
    throttle = Throttle(samp_rate)
    probe = ProbeRate()
    payloads = [(np.arange(1500) % 256).astype(np.uint8) for _ in range(8)]
    t_end = time.time() + 10.0
    while time.time() < t_end:
        sig = (
            tx.send_stream(payloads) if stream_mode else tx.send_burst(payloads)
        )
        throttle.wait(sig.size)
        rep = probe.update(sig.size)
        if rep is not None:
            print(
                f"rate_now = {rep.rate_now / 1e6:.3f} Msps, "
                f"rate_avg = {rep.rate_avg / 1e6:.3f} Msps"
            )


if __name__ == "__main__":
    main()
