#!/usr/bin/env python3
"""GR3.10 bridge: complex64 FIFO/file -> gain -> UHD USRP sink.

Transmits the sample stream produced by ``apps/packet_transmitter_sdr.py``
over a USRP. Equivalent of the reference's GRC flowgraph
``gr3/flowgraphs/file_source_uhd.grc`` (FIFO file source, multiply-const,
uhd_usrp_sink at 3.2 Msps / 434 MHz, QT gain entries) as a headless CLI
program. Requires GNU Radio 3.10 with gr-uhd on the host.
"""

import argparse
import signal
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--file", required=True, help="c64 FIFO or file to read")
    ap.add_argument("--samp-rate", type=float, default=3.2e6)
    ap.add_argument("--freq", type=float, default=434e6, help="RF centre frequency")
    ap.add_argument("--rf-gain", type=float, default=60.0, help="USRP TX gain (dB)")
    ap.add_argument("--scale", type=float, default=0.25,
                    help="digital amplitude applied before the DAC")
    ap.add_argument("--args", default="", help="UHD device args")
    opts = ap.parse_args()

    try:
        from gnuradio import blocks, gr, uhd
    except ImportError:
        sys.exit("GNU Radio 3.10 with gr-uhd is required for this bridge")

    class Flow(gr.top_block):
        def __init__(self):
            gr.top_block.__init__(self, "file_source_uhd")
            src = blocks.file_source(gr.sizeof_gr_complex, opts.file, False)
            scale = blocks.multiply_const_cc(opts.scale)
            usrp = uhd.usrp_sink(
                opts.args,
                uhd.stream_args(cpu_format="fc32", channels=[0]),
                "",
            )
            usrp.set_samp_rate(opts.samp_rate)
            usrp.set_center_freq(opts.freq, 0)
            usrp.set_gain(opts.rf_gain, 0)
            self.connect(src, scale, usrp)

    tb = Flow()

    def stop(*_):
        tb.stop()

    signal.signal(signal.SIGINT, stop)
    signal.signal(signal.SIGTERM, stop)
    tb.start()
    tb.wait()


if __name__ == "__main__":
    main()
