"""Measured host<->device link classification.

Two production defaults depend on whether the accelerator link is a
normal direct attachment (PCIe: sub-millisecond round trips) or a slow
proxied link (a network relay in front of the chip: tens of ms round
trips, single-digit MB/s): the random-mode dedup engine
(runner._device_dedup_default) and the wire layout
(io.parallel_ingest._maybe_transpose).  Earlier rounds keyed these off a
sandbox-specific env var; here the decision comes from a one-time
measured probe — 3 tiny (8-byte) host->device->host round trips, min
taken — cached for the process (VERDICT r4 weak #6).

The probe NEVER initializes a jax backend by itself: probing would
otherwise trigger a multi-minute pool claim from innocent contexts
(ingest-only benchmarks, CPU test runs).  Callers that already hold
devices get a measurement; everyone else gets None and should assume a
direct-attached (fast) link.
"""

from __future__ import annotations

import os
import time

_cached_ms: float | None = None
_probed = False

# A direct PCIe attachment round-trips small transfers in <1 ms; relay
# links measure ~40 ms on this sandbox.  5 ms splits the two regimes
# with an order of magnitude of margin each way.
SLOW_LINK_MS = 5.0


def _backend_initialized() -> bool:
    """True if jax already stood up a backend (cheap, no side effects)."""
    try:
        from jax._src import xla_bridge as xb

        return bool(xb._backends)
    except Exception:
        return False


def roundtrip_ms(allow_init: bool = False) -> float | None:
    """Measured device round-trip latency in ms (min of 3 8-byte pings),
    cached per process.  Returns None when no non-CPU backend is up and
    ``allow_init`` is False, and on CPU backends (no link to measure).

    NGS_LINK_RT_MS overrides the measurement (testing/ops)."""
    global _cached_ms, _probed
    env = os.environ.get("NGS_LINK_RT_MS")
    if env:
        return float(env)
    if _probed:
        return _cached_ms
    if not allow_init and not _backend_initialized():
        return None
    import jax

    try:
        dev = jax.devices()[0]
    except Exception:
        return None
    _probed = True
    if dev.platform == "cpu":
        _cached_ms = None
        return None
    import numpy as np

    best = float("inf")
    buf = np.zeros(8, np.uint8)
    np.asarray(jax.device_put(buf, dev))  # warm the transfer path
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.device_put(buf, dev))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    _cached_ms = best
    return _cached_ms


def is_slow_link(allow_init: bool = False) -> bool:
    """True when the measured round trip marks a proxied/relay link.
    Unmeasurable (CPU, or backend not up) counts as fast."""
    ms = roundtrip_ms(allow_init=allow_init)
    return ms is not None and ms > SLOW_LINK_MS
