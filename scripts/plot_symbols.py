#!/usr/bin/env python3
"""Live constellation + MER monitor (equivalent of the reference's
scripts/plot_symbols.py): subscribes to the receiver's ZMQ symbol taps
(header on :5000, payload on :5001), plots the constellation and prints the
modulation error ratio.

usage: plot_symbols.py [tcp://localhost:5001]
"""

import sys

import numpy as np


def mer_db(symbols: np.ndarray) -> float:
    """MER for unit-power QPSK: signal power over error-vector power."""
    a = np.sqrt(2.0) / 2.0
    ideal = a * (np.sign(symbols.real) + 1j * np.sign(symbols.imag))
    err = symbols - ideal
    p_err = np.mean(np.abs(err) ** 2)
    return 10.0 * np.log10(1.0 / p_err) if p_err > 0 else np.inf


def main():
    endpoint = sys.argv[1] if len(sys.argv) > 1 else "tcp://localhost:5001"
    try:
        import zmq
    except ImportError:
        print("pyzmq required for live monitoring")
        sys.exit(2)
    try:
        import matplotlib

        matplotlib.use("TkAgg")
        import matplotlib.pyplot as plt

        have_plot = True
    except Exception:
        have_plot = False

    ctx = zmq.Context()
    sock = ctx.socket(zmq.SUB)
    sock.connect(endpoint)
    sock.setsockopt(zmq.SUBSCRIBE, b"")

    if have_plot:
        plt.ion()
        fig, ax = plt.subplots()
        scat = ax.scatter([], [], s=2)
        ax.set_xlim(-1.5, 1.5)
        ax.set_ylim(-1.5, 1.5)
        ax.set_title("payload symbols")

    while True:
        msg = sock.recv()
        syms = np.frombuffer(msg, np.complex64)
        print(f"{syms.size} symbols, MER = {mer_db(syms):.2f} dB")
        if have_plot:
            scat.set_offsets(np.c_[syms.real, syms.imag])
            fig.canvas.draw_idle()
            plt.pause(0.01)


if __name__ == "__main__":
    main()
