#!/usr/bin/env python
"""Saturated-dedup soak (VERDICT r4 next-step #2c): push >=100M distinct
synthetic (sample, combo, random) triples through the host overflow path
— the exact code a saturated device table degrades into
(runner._harvest_overflow -> counting.OverflowDedup) — and assert

- exact counts: matched == distinct, duplicates == re-fed rows, and the
  per-flat new-triple counts equal the analytic ground truth;
- bounded RSS: the native C++ store holds 100M 128-bit keys in ~4.3 GB
  (vs tens of GB + interpreter-speed for the former Python set/loop);
- streaming throughput well above any realistic overflow rate.

Writes SOAK_DEDUP.json.  NGS_SOAK_TRIPLES overrides the volume.
"""

import json
import os
import resource
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ngs_barcode_count_tpu import stats  # noqa: E402
from ngs_barcode_count_tpu.stats import SequenceErrors  # noqa: E402
from ngs_barcode_count_tpu.counting import OverflowDedup  # noqa: E402


class _Slot:
    length = 8  # 6^8 = 1,679,616 random ids


class _Scheme:
    random_slot = _Slot()


class _Plan:
    scheme = _Scheme()


class _Acc:
    """The minimal surface _harvest_overflow touches."""

    from ngs_barcode_count_tpu.runner import CountAccumulator as _CA

    _harvest_overflow = _CA._harvest_overflow

    def __init__(self):
        self.plan = _Plan()
        self.seq_errors = SequenceErrors()
        self._overflow = OverflowDedup()


def main():
    n_distinct = int(os.environ.get("NGS_SOAK_TRIPLES", 100_000_000))
    dup_every = 10  # re-feed ~10% of rows as duplicates
    n_flats = 64
    chunk = 1_000_000

    acc = _Acc()
    native = acc._overflow._native is not None
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # GB

    t0 = time.perf_counter()
    fed = 0
    n_dup_fed = 0
    prev_tail = None
    while fed < n_distinct:
        n = min(chunk, n_distinct - fed)
        i = np.arange(fed, fed + n, dtype=np.int64)
        flats = (i % n_flats).astype(np.int32)
        ridx = (i // n_flats).astype(np.int32)
        rows = np.stack([flats, ridx], axis=1)
        if prev_tail is not None:
            dups = prev_tail[:: dup_every]
            rows = np.concatenate([rows, dups], axis=0)
            n_dup_fed += len(dups)
        prev_tail = rows[:n]
        acc._harvest_overflow(rows, np.array([len(rows)], np.int32))
        fed += n
    elapsed = time.perf_counter() - t0

    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # GB
    c = acc.seq_errors
    matched = int(c.counters[stats.MATCHED])
    dups = int(c.counters[stats.DUPLICATES])

    # analytic ground truth: every i in [0, n_distinct) is one distinct
    # triple; flats cycle mod n_flats
    exp_per_flat = np.bincount(
        np.arange(n_distinct, dtype=np.int64) % n_flats,
        minlength=n_flats,
    )
    got_per_flat = np.zeros(n_flats, np.int64)
    for f, v in acc._overflow.counts.items():
        got_per_flat[f] = v

    ok = (
        matched == n_distinct
        and dups == n_dup_fed
        and acc._overflow.size == n_distinct
        and np.array_equal(exp_per_flat, got_per_flat)
    )
    rec = {
        "metric": "overflow_dedup_soak",
        "ok": bool(ok),
        "native_store": native,
        "n_distinct": n_distinct,
        "n_dup_fed": n_dup_fed,
        "matched": matched,
        "duplicates": dups,
        "elapsed_s": round(elapsed, 1),
        "triples_per_s": round((n_distinct + n_dup_fed) / elapsed, 0),
        "rss_before_gb": round(rss0, 2),
        "rss_after_gb": round(rss1, 2),
        # 100M 128-bit keys at <=0.7 load = 2^28 slots * 16B = 4.3 GB;
        # generous bound that still rules out any per-key Python object
        "rss_bound_gb": 10.0,
        "rss_ok": bool(rss1 < 10.0),
    }
    print(json.dumps(rec))
    with open(os.path.join(ROOT, "SOAK_DEDUP.json"), "w") as f:
        json.dump(rec, f, indent=1)
    sys.exit(0 if ok and rec["rss_ok"] else 1)


if __name__ == "__main__":
    main()
