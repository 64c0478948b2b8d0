#!/usr/bin/env python3
"""GR3.10 bridge: complex64 FIFO/file -> rate probe (+ optional QT sinks).

Sanity-check monitor for a sample stream (e.g. the FIFO written by
``apps/packet_transmitter_sdr.py``). Equivalent of the reference GRC
flowgraph ``gr3/flowgraphs/file_source_gui.grc`` (file source -> probe_rate
-> message_debug, plus QT frequency/time sinks); the GUI is optional here so
the monitor also runs headless. Requires GNU Radio 3.10.
"""

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--file", required=True, help="c64 FIFO or file to read")
    ap.add_argument("--samp-rate", type=float, default=1e6)
    ap.add_argument("--gui", action="store_true",
                    help="open QT frequency/time sinks (needs gr-qtgui)")
    ap.add_argument("--interval", type=float, default=1.0,
                    help="rate print interval (s)")
    opts = ap.parse_args()

    try:
        from gnuradio import blocks, gr
    except ImportError:
        sys.exit("GNU Radio 3.10 is required for this bridge")

    tb = gr.top_block("file_source_gui")
    src = blocks.file_source(gr.sizeof_gr_complex, opts.file, False)
    probe = blocks.probe_rate(gr.sizeof_gr_complex, opts.interval * 1000.0, 0.15)
    debug = blocks.message_debug()
    tb.connect(src, probe)
    tb.msg_connect((probe, "rate"), (debug, "print"))

    if opts.gui:
        from gnuradio import qtgui
        import sip
        from PyQt5 import Qt

        app = Qt.QApplication([])
        fsink = qtgui.freq_sink_c(1024, 0, 0.0, opts.samp_rate, "spectrum", 1)
        tsink = qtgui.time_sink_c(1024, opts.samp_rate, "time", 1)
        tb.connect(src, fsink)
        tb.connect(src, tsink)
        for s in (fsink, tsink):
            sip.wrapinstance(s.qwidget(), Qt.QWidget).show()
        tb.start()
        app.exec_()
        tb.stop()
        tb.wait()
    else:
        tb.start()
        try:
            while True:
                time.sleep(1.0)
        except KeyboardInterrupt:
            pass
        tb.stop()
        tb.wait()


if __name__ == "__main__":
    main()
