"""Smoke-run the fast examples (each asserts its own behavior).

Mirrors the role of the reference's examples/ build in CI — every example is
a compiled-and-run artifact, not documentation-only code. Only the quick
CPU-friendly ones run here; the slow full-chain demos (loopback, per_sweep,
streaming_blocks) are covered by the equivalent tests.
"""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAST_EXAMPLES = [
    "crc.py",
    "header_roundtrip.py",
    "messages.py",
    "minimal_flowgraph.py",
    "packet_ingress.py",
    "packet_to_stream.py",
    "stream_pdu_domains.py",
    "pfb_arb_resampler.py",
    "qpsk_modulator.py",
    "receiver_bank_serving.py",
    "sharded_bank.py",  # needs the 8-device flag the conftest already set
    "sharded_serving.py",
    "syncword_detection.py",
]


@pytest.mark.parametrize("name", FAST_EXAMPLES)
def test_example_runs(name):
    env = dict(os.environ, PM_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "examples", name)],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert out.returncode == 0, f"{name} failed:\n{out.stdout}\n{out.stderr}"
