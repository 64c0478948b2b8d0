"""Unit tests for the kernel capability-probe mechanics (ops/pallas_probe).

The cold-machine failure modes these lock down (round 4): a probe reached
while tracing a production jit must decline WITHOUT caching (its jitted
calls would stage into the outer trace and 'fail' on tracers, poisoning
the /tmp verdict for the whole machine), and tracer-class probe failures
must never be written to the cache even if the trace guard misses them.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gr4_packet_modem_tpu.ops import pallas_probe


@pytest.fixture
def fake_tpu(monkeypatch, tmp_path):
    """Pretend the backend is TPU and isolate the /tmp verdict cache."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    real_open = open

    def patched_open(path, *a, **k):
        p = str(path)
        if p.startswith("/tmp/pm_probe_"):
            path = tmp_path / p.rsplit("/", 1)[1]
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", patched_open)
    pallas_probe._MEMO.clear()
    yield tmp_path
    pallas_probe._MEMO.clear()


def test_tracing_active_detects_jit_trace():
    """The primary trace guard rides the private jax._src.core
    trace_state_clean API; if a JAX upgrade moves it, the guard silently
    degrades to the string-match exception heuristic — fail loudly here
    instead (advisor round 4)."""
    assert pallas_probe._tracing_active() is False

    seen = []

    @jax.jit
    def traced(x):
        seen.append(pallas_probe._tracing_active())
        return x

    traced(jnp.float32(0.0))
    assert seen == [True]


def test_probe_runs_eagerly_and_caches(fake_tpu):
    calls = []

    def probe():
        calls.append(1)
        return True

    assert pallas_probe.probe_verdict("tstk", "v1", probe) is True
    assert pallas_probe.probe_verdict("tstk", "v1", probe) is True
    assert len(calls) == 1  # memoized
    assert (fake_tpu / "pm_probe_tstk_v1").read_text() == "1"


def test_probe_declines_under_trace_without_caching(fake_tpu):
    calls = []

    def probe():
        calls.append(1)
        return True

    @jax.jit
    def traced(x):
        ok = pallas_probe.probe_verdict("tstk", "v2", probe)
        return x * (2.0 if ok else 3.0)

    out = float(traced(jnp.float32(1.0)))
    assert out == 3.0  # declined under the trace
    assert calls == []  # probe never ran
    assert not (fake_tpu / "pm_probe_tstk_v2").exists()  # nothing cached
    # a later EAGER call still probes and caches properly
    assert pallas_probe.probe_verdict("tstk", "v2", probe) is True
    assert calls == [1]
    assert (fake_tpu / "pm_probe_tstk_v2").read_text() == "1"


def test_tracer_failure_not_cached(fake_tpu):
    def probe():
        # simulate the guard missing a trace: the probe sees a tracer
        @jax.jit
        def inner(v):
            return bool(np.asarray(v))  # TracerBoolConversionError

        return inner(jnp.float32(1.0))

    assert pallas_probe.probe_verdict("tstk", "v3", probe) is False
    assert not (fake_tpu / "pm_probe_tstk_v3").exists()


def test_genuine_failure_cached_as_zero(fake_tpu):
    def probe():
        raise RuntimeError("Mosaic rejected the kernel")

    assert pallas_probe.probe_verdict("tstk", "v4", probe) is False
    assert (fake_tpu / "pm_probe_tstk_v4").read_text() == "0"


def test_env_override(fake_tpu, monkeypatch):
    monkeypatch.setenv("PM_PALLAS_TSTK", "0")
    assert pallas_probe.probe_verdict(
        "tstk", "v5", lambda: True
    ) is False
    monkeypatch.setenv("PM_PALLAS_TSTK", "1")
    assert pallas_probe.probe_verdict(
        "tstk", "v5", lambda: (_ for _ in ()).throw(RuntimeError)
    ) is True
