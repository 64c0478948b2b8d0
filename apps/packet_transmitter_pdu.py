#!/usr/bin/env python3
"""TX-only app: modulate packets and write IQ samples to a file.

Mirrors apps/packet_transmitter_pdu.cpp: periodic fixed-size packets through
the PDU transmitter, samples written as raw complex64 (GR 'complex' format).

usage: packet_transmitter_pdu.py OUT_FILE [stream|burst] [packet_len] [count]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr4_packet_modem_tpu.utils.platform import setup as _pm_setup

_pm_setup()  # PM_PLATFORM backend override + persistent compile cache

import numpy as np

from gr4_packet_modem_tpu.io.file import FileSinkC64
from gr4_packet_modem_tpu.models.transmitter import Transmitter, TxConfig
from gr4_packet_modem_tpu.runtime.streaming import StreamingTransmitter


def main():
    # positional argv parsing mirrors the reference apps; still honor -h and
    # refuse option-looking output paths (a stray "--help" is not a file)
    if len(sys.argv) < 2 or sys.argv[1].startswith("-"):
        print(__doc__)
        sys.exit(0 if sys.argv[1:2] in (["-h"], ["--help"]) else 1)
    out_file = sys.argv[1]
    stream_mode = (sys.argv[2] if len(sys.argv) > 2 else "burst") == "stream"
    packet_len = int(sys.argv[3]) if len(sys.argv) > 3 else 1500
    count = int(sys.argv[4]) if len(sys.argv) > 4 else 100

    tx = StreamingTransmitter(
        Transmitter(
            TxConfig(
                max_payload_len=max(packet_len, 64), stream_mode=stream_mode
            )
        )
    )
    payloads = [
        (np.arange(packet_len) % 256).astype(np.uint8) for _ in range(count)
    ]
    with FileSinkC64(out_file) as sink:
        batch = 16
        for i in range(0, count, batch):
            chunk = payloads[i : i + batch]
            if stream_mode:
                sink.write(tx.send_stream(chunk))
            else:
                sink.write(tx.send_burst(chunk))
        if stream_mode:
            # a finite stream must flush the interpolator history or the
            # last packet's tail samples never leave the filter
            sink.write(tx.flush_stream())
    print(f"wrote {count} packets of {packet_len} bytes to {out_file}")


if __name__ == "__main__":
    main()
