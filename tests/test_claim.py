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
