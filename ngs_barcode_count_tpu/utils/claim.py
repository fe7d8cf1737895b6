"""TPU backend claim with bounded retry/backoff.

The axon pool claim can transiently fail with ``RuntimeError: Unable to
initialize backend 'axon': UNAVAILABLE`` (round 2's driver bench capture
was lost to exactly this — BENCH_r02.json rc=1).  jax caches the failure:
``jax._src.xla_bridge.backends()`` raises once and leaves partial state
in ``_backends``/``_backend_errors``, so a bare retry of ``jax.devices()``
can either re-raise or silently return only the CPU client.  Retrying
correctly means clearing those caches between attempts.

The claim itself is slow (2-15 minutes through the relay on first
contact), so the retry loop bounds *sleep* time, not attempt time — an
attempt that is merely slow is left to finish.
"""

from __future__ import annotations

import sys
import time


def _default_probe():
    """First real device contact: list devices AND run one op end-to-end
    (the pool claim happens on first execution, not on enumeration)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    devs = jax.devices()
    x = jax.device_put(np.arange(8, dtype=np.int32), devs[0])
    val = int(jnp.sum(x))
    if val != 28:
        raise RuntimeError(f"device probe computed {val} != 28")
    return devs


def _clear_jax_backends() -> None:
    """Reset jax's backend caches so the next backends() call re-runs
    platform initialization from scratch."""
    try:
        import jax._src.xla_bridge as xb

        xb._clear_backends()
    except Exception:
        pass
    try:
        import jax._src.xla_bridge as xb

        xb.get_backend.cache_clear()  # type: ignore[attr-defined]
    except Exception:
        pass


def claim_devices(
    max_attempts: int = 5,
    total_sleep_budget_s: float = 600.0,
    first_delay_s: float = 20.0,
    probe=None,
    sleep=time.sleep,
    verbose: bool = True,
):
    """Claim the default jax backend, retrying transient init failures.

    Returns ``jax.devices()`` once a probe op has executed.  Raises the
    last error after ``max_attempts`` failures or once the cumulative
    backoff sleep would exceed ``total_sleep_budget_s``.
    """
    if probe is None:
        probe = _default_probe
    delay = first_delay_s
    slept = 0.0
    last_err: Exception | None = None
    for attempt in range(1, max_attempts + 1):
        try:
            return probe()
        except Exception as e:  # noqa: BLE001 — backend init raises RuntimeError subclasses
            last_err = e
            _clear_jax_backends()
            if attempt >= max_attempts or slept + delay > total_sleep_budget_s:
                break
            if verbose:
                print(
                    f"[claim] attempt {attempt}/{max_attempts} failed "
                    f"({type(e).__name__}: {e}); retrying in {delay:.0f}s",
                    file=sys.stderr,
                )
            sleep(delay)
            slept += delay
            delay = min(delay * 1.7, 180.0)
    assert last_err is not None
    raise last_err


_PROBE_SNIPPET = (
    "import jax, numpy as np, jax.numpy as jnp; "
    "x = jax.device_put(np.arange(8, dtype=np.int32)); "
    "assert int(jnp.sum(x)) == 28; "
    "print('CLAIM_PROBE_OK', jax.devices()[0].platform)"
)


def claim_devices_guarded(
    max_attempts: int = 4,
    total_budget_s: float = 1500.0,
    probe_timeout_s: float = 480.0,
    first_delay_s: float = 30.0,
    verbose: bool = True,
):
    """Time-BOUNDED claim for deadline-sensitive callers (bench.py).

    A failing pool claim can HANG ~25 minutes inside backend init
    (observed 2026-08-18), and jax's backend lock makes an in-process
    attempt uncancellable — so the pool is first probed in a SUBPROCESS
    under a hard timeout.  Only after a probe succeeds does the
    in-process claim run (the pool is up, so it completes normally).
    Raises TimeoutError/RuntimeError when the budget is exhausted.
    """
    import subprocess

    start = time.monotonic()
    delay = first_delay_s
    last = "no attempts made"
    timeout_s = probe_timeout_s
    for attempt in range(1, max_attempts + 1):
        left = total_budget_s - (time.monotonic() - start)
        if left <= 5:
            break
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SNIPPET],
                capture_output=True, text=True,
                timeout=min(timeout_s, left),
            )
            if r.returncode == 0 and "CLAIM_PROBE_OK" in r.stdout:
                if verbose:
                    print(
                        f"[claim] subprocess probe ok "
                        f"({r.stdout.strip().split()[-1]}); claiming "
                        "in-process", file=sys.stderr,
                    )
                return claim_devices(
                    max_attempts=2,
                    total_sleep_budget_s=max(
                        total_budget_s - (time.monotonic() - start), 30
                    ),
                    verbose=verbose,
                )
            last = (r.stderr or r.stdout).strip().splitlines() or ["?"]
            last = last[-1][:300]
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {timeout_s:.0f}s"
            # pool-claim latency varies 1-15+ min day to day, and every
            # probe subprocess pays a FRESH claim: escalate the timeout
            # so a healthy-but-slow pool is not misread as down
            timeout_s = min(timeout_s * 2, 1200)
        if verbose:
            print(
                f"[claim] probe attempt {attempt}/{max_attempts} failed "
                f"({last})", file=sys.stderr,
            )
        left = total_budget_s - (time.monotonic() - start)
        if attempt < max_attempts and left > delay:
            time.sleep(delay)
            delay = min(delay * 1.7, 180.0)
    raise TimeoutError(
        f"TPU claim failed within {total_budget_s:.0f}s budget: {last}"
    )


def force_cpu() -> None:
    """Fail over to the CPU platform after a hard TPU-claim failure.

    The axon sitecustomize pins ``jax_platforms`` to ``axon,cpu`` before
    user code runs, so flipping the config (NOT the env var — that is
    read once at import) and clearing the backend caches is the only
    route to a working CPU client in the same process.
    """
    import jax

    _clear_jax_backends()
    jax.config.update("jax_platforms", "cpu")
