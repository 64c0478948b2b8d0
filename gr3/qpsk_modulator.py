#!/usr/bin/env python3
"""GR3.10 bridge: random-byte QPSK modulator -> complex64 FIFO/file.

Produces a 4-samples/symbol QPSK stream a GR3 installation can feed into
this framework's receiver apps for cross-implementation checks. Equivalent
of the reference GRC flowgraph ``gr3/flowgraphs/qpsk_modulator.grc``
(random source -> constellation encoder -> interpolating FIR -> file sink).
Requires GNU Radio 3.10.
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--file", required=True, help="c64 FIFO or file to write")
    ap.add_argument("--sps", type=int, default=4, help="samples per symbol")
    ap.add_argument("--excess-bw", type=float, default=0.35,
                    help="RRC roll-off")
    opts = ap.parse_args()

    try:
        from gnuradio import analog, blocks, digital, filter as gr_filter, gr
        from gnuradio.filter import firdes
    except ImportError:
        sys.exit("GNU Radio 3.10 is required for this bridge")

    tb = gr.top_block("qpsk_modulator")
    const = digital.constellation_calcdist(
        [-1 - 1j, 1 - 1j, -1 + 1j, 1 + 1j], [0, 1, 2, 3], 4, 1,
        digital.constellation.AMPLITUDE_NORMALIZATION,
    ).base()
    src = analog.random_uniform_source_b(0, 4, 0)
    enc = digital.constellation_encoder_bc(const)
    taps = firdes.root_raised_cosine(
        opts.sps, opts.sps, 1.0, opts.excess_bw, 11 * opts.sps
    )
    interp = gr_filter.interp_fir_filter_ccf(opts.sps, taps)
    sink = blocks.file_sink(gr.sizeof_gr_complex, opts.file, False)
    sink.set_unbuffered(True)
    tb.connect(src, enc, interp, sink)
    tb.start()
    try:
        tb.wait()
    except KeyboardInterrupt:
        tb.stop()
        tb.wait()


if __name__ == "__main__":
    main()
