"""utils/claim.py — retry/backoff around the TPU backend claim.

Round 2's driver bench capture was lost to a transient
"Unable to initialize backend 'axon': UNAVAILABLE" (BENCH_r02.json
rc=1); bench.py and __graft_entry__.py now claim through
claim_devices().  These tests drive the loop with an injected probe —
no real backend contact.
"""

import pytest

from ngs_barcode_count_tpu.utils.claim import claim_devices


class FlakyProbe:
    def __init__(self, fail_times: int):
        self.fail_times = fail_times
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE"
            )
        return ["dev0"]


def test_retry_succeeds_after_transient_failures():
    probe = FlakyProbe(fail_times=2)
    sleeps = []
    devs = claim_devices(
        max_attempts=5,
        first_delay_s=1.0,
        probe=probe,
        sleep=sleeps.append,
        verbose=False,
    )
    assert devs == ["dev0"]
    assert probe.calls == 3
    # exponential backoff: 1.0, then 1.7
    assert sleeps == [1.0, pytest.approx(1.7)]


def test_raises_last_error_after_max_attempts():
    probe = FlakyProbe(fail_times=100)
    sleeps = []
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        claim_devices(
            max_attempts=3,
            first_delay_s=1.0,
            probe=probe,
            sleep=sleeps.append,
            verbose=False,
        )
    assert probe.calls == 3
    assert len(sleeps) == 2  # no sleep after the final attempt


def test_sleep_budget_caps_retries():
    probe = FlakyProbe(fail_times=100)
    sleeps = []
    with pytest.raises(RuntimeError):
        claim_devices(
            max_attempts=10,
            first_delay_s=50.0,
            total_sleep_budget_s=60.0,  # 50 ok, 50+85 > 60 -> stop
            probe=probe,
            sleep=sleeps.append,
            verbose=False,
        )
    assert sleeps == [50.0]
    assert probe.calls == 2


def test_immediate_success_no_sleep():
    sleeps = []
    devs = claim_devices(
        probe=lambda: ["d"], sleep=sleeps.append, verbose=False
    )
    assert devs == ["d"]
    assert sleeps == []


def test_guarded_claim_probe_ok(monkeypatch):
    """Subprocess probe succeeds -> the in-process claim runs."""
    import subprocess

    from ngs_barcode_count_tpu.utils import claim as cm

    class R:
        returncode = 0
        stdout = "CLAIM_PROBE_OK axon\n"
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
    monkeypatch.setattr(cm, "claim_devices", lambda **k: ["tpu0"])
    assert cm.claim_devices_guarded(verbose=False) == ["tpu0"]


def test_guarded_claim_times_out_within_budget(monkeypatch):
    """A pool whose claims HANG must not hang the caller: every probe
    times out in the subprocess and the guarded claim raises inside its
    budget instead of blocking ~25 min per attempt."""
    import subprocess

    from ngs_barcode_count_tpu.utils import claim as cm

    calls = {"n": 0}

    def fake_run(*a, timeout=None, **k):
        calls["n"] += 1
        raise subprocess.TimeoutExpired(cmd="probe", timeout=timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(cm.time, "sleep", lambda s: None)
    with pytest.raises(TimeoutError, match="within .*budget"):
        cm.claim_devices_guarded(
            max_attempts=3, total_budget_s=100.0, probe_timeout_s=1.0,
            verbose=False,
        )
    assert calls["n"] == 3


def test_guarded_claim_probe_error_retries(monkeypatch):
    """Probe fails fast with UNAVAILABLE -> retries, then raises."""
    import subprocess

    from ngs_barcode_count_tpu.utils import claim as cm

    class R:
        returncode = 1
        stdout = ""
        stderr = "RuntimeError: Unable to initialize backend 'axon'"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: R())
    monkeypatch.setattr(cm.time, "sleep", lambda s: None)
    with pytest.raises(TimeoutError, match="axon"):
        cm.claim_devices_guarded(
            max_attempts=2, total_budget_s=100.0, verbose=False
        )


def test_guarded_claim_probe_timeout_escalates(monkeypatch):
    """Probe timeouts escalate (x2 per timed-out attempt, capped): a
    healthy-but-slow pool (8-15 min claims) must not be misread as down
    by a fixed short probe window."""
    import subprocess

    from ngs_barcode_count_tpu.utils import claim as cm

    seen = []

    def fake_run(*a, timeout=None, **k):
        seen.append(timeout)
        raise subprocess.TimeoutExpired(cmd="probe", timeout=timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(cm.time, "sleep", lambda s: None)
    with pytest.raises(TimeoutError):
        cm.claim_devices_guarded(
            max_attempts=4, total_budget_s=10_000, probe_timeout_s=100,
            first_delay_s=0.0, verbose=False,
        )
    assert seen == [100, 200, 400, 800]
