"""Production-shape capability probes for auto-enabled Pallas TPU kernels.

Every Pallas kernel that the receiver auto-enables on TPU must pass a
try-compile-AND-VALIDATE probe at production-representative shapes before the
fast path is trusted (round-3 lesson: a kernel shipped with interpret-only
tests failed Mosaic lowering at HEAD and broke the official bench; round-2
lesson: probes at non-production shapes lie about DMA alignment; advisor
round-3: a probe that only checks "no exception" would trust a toolchain
that silently clamps/misaligns the DMA — probes must feed distinguishable
data and compare the result against a host reference).

Shared mechanics:

- verdicts are memoized in-process and cached per machine in
  ``/tmp/pm_probe_<name>_<tag>`` where ``tag`` hashes the probed module's
  source, so editing a kernel automatically invalidates its cached verdict;
- ``PM_PALLAS_<NAME>=1/0`` force-overrides a verdict (e.g. to benchmark the
  XLA fallback path on a machine whose kernel probe passes);
- off-TPU the verdict is always False — callers run ``interpret=True`` for
  tests instead.
"""

from __future__ import annotations

import hashlib
import inspect
import os

__all__ = ["source_tag", "probe_verdict"]

_MEMO: dict[tuple[str, str], bool] = {}


def _tracing_active() -> bool:
    """True when called under an active JAX trace (jit/vmap/scan tracing)."""
    try:
        from jax._src import core as _core

        return not _core.trace_state_clean()
    except Exception:
        return False


def source_tag(*modules) -> str:
    """Stable short hash of the given modules' source text (cache-busting
    version tag: editing any probed kernel invalidates its /tmp verdict)."""
    h = hashlib.sha1()
    for m in modules:
        try:
            h.update(inspect.getsource(m).encode())
        except (OSError, TypeError):
            h.update(repr(m).encode())
    return h.hexdigest()[:10]


def probe_verdict(name: str, tag: str, fn) -> bool:
    """Cached verdict for probe ``fn`` (called at most once per machine per
    kernel-source version; must return truthy only if the kernel compiled,
    ran, and produced output matching its reference)."""
    env = os.environ.get(f"PM_PALLAS_{name.upper()}")
    if env is not None:
        return env == "1"
    import jax

    # the /tmp cache is a TPU-capability record: an off-TPU process must
    # neither consult nor write it (a CPU run would cache verdict 0 and
    # silently disable the kernel for every later TPU process)
    if jax.default_backend() != "tpu":
        return False
    key = (name, tag)
    if key in _MEMO:
        return _MEMO[key]
    cache = f"/tmp/pm_probe_{name}_{tag}"
    verdict: bool | None = None
    try:
        with open(cache) as f:
            verdict = f.read().strip() == "1"
    except OSError:
        pass
    if verdict is None:
        # a probe may be reached while TRACING a production program (the
        # first jit of a receiver step on a fresh machine, before any /tmp
        # verdict exists): inside a trace the probe's jitted calls are
        # staged into the outer program and its host-side result checks see
        # tracers, so every probe "fails" and caches verdict 0, silently
        # disabling all kernels (this broke the round-4 bench on a cold
        # machine; ensure_compile_time_eval is no escape — it leaks into
        # the probe kernel's own pallas trace, where program_id has no eval
        # rule). Constructors pre-warm their kernels' probes eagerly
        # (Receiver/SyncwordAcquirer/HeaderLdpcDecoder __init__); if a
        # bare-ops caller still gets here under a trace, decline the fast
        # path for THIS trace without caching, so a later eager call can
        # still probe properly.
        if _tracing_active():
            import sys as _sys

            print(
                f"[pm_probe] {name}: probe requested while tracing — "
                "fast path disabled for this program; construct the "
                "Receiver (or call the *_enabled() hook) eagerly first",
                file=_sys.stderr,
                flush=True,
            )
            return False
        try:
            verdict = bool(fn())
        except Exception as e:
            if os.environ.get("PM_PROBE_DEBUG"):
                import traceback

                print(f"[pm_probe {name}] FAILED:", flush=True)
                traceback.print_exc()
            # a tracer-related failure means the probe ran under a trace
            # the guard above failed to detect (e.g. the private
            # trace_state_clean API moved): that is not a capability
            # verdict — decline for this call WITHOUT caching, so a later
            # eager call can still probe properly
            if "Tracer" in type(e).__name__ or "Tracer" in str(e):
                return False
            verdict = False
        try:
            with open(cache, "w") as f:
                f.write("1" if verdict else "0")
        except OSError:
            pass
    _MEMO[key] = verdict
    return verdict
