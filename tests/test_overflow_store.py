"""OverflowDedup: the vectorized host store behind saturated-table
random mode (VERDICT r4 weak #1 — formerly a Python set + per-row loop).
The 100M-triple soak lives in scripts/soak_dedup.py; these cover exact
semantics at CI scale for both the native C++ store and the NumPy
fallback."""

import numpy as np
import pytest

from ngs_barcode_count_tpu.counting import OverflowDedup


def _mk(native: bool) -> OverflowDedup:
    d = OverflowDedup()
    if native and d._native is None:
        pytest.skip("native codec not built")
    if not native:
        if d._native is not None:
            lib, h = d._native
            lib.dedup_free(h)
        d._native = None
    return d


@pytest.mark.parametrize("native", [True, False])
def test_observe_exact_counts(native):
    d = _mk(native)
    flats = np.array([3, 3, 5, 3, 5], np.int32)
    keys = np.array([10, 10, 11, 12, 11], np.uint64)
    n_new, n_dup = d.observe(flats, keys)
    assert (n_new, n_dup) == (3, 2)  # 10, 11, 12 new; repeats dup
    assert d.counts == {3: 2, 5: 1}
    # second batch: all previously seen
    n_new, n_dup = d.observe(flats, keys)
    assert (n_new, n_dup) == (0, 5)
    assert d.counts == {3: 2, 5: 1}
    assert d.size == 3


@pytest.mark.parametrize("native", [True, False])
def test_observe_zero_key_and_bulk(native):
    rng = np.random.default_rng(7)
    d = _mk(native)
    # key 0 is a legal triple id (flat 0, random 0)
    n_new, n_dup = d.observe(
        np.zeros(2, np.int32), np.zeros(2, np.uint64)
    )
    assert (n_new, n_dup) == (1, 1)
    # bulk distinct + repeats across batches
    keys = rng.permutation(np.arange(1, 50_001, dtype=np.uint64))
    flats = (keys % 7).astype(np.int32)
    for s in range(0, len(keys), 8192):
        d.observe(flats[s : s + 8192], keys[s : s + 8192])
    assert d.size == 50_001  # + the zero key
    n_new, n_dup = d.observe(flats[:100], keys[:100])
    assert (n_new, n_dup) == (0, 100)
    exp = np.bincount((np.arange(1, 50_001) % 7), minlength=7)
    exp[0] += 1  # the zero key counted under flat 0
    got = np.zeros(7, np.int64)
    for f, v in d.counts.items():
        got[f] = v
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("native", [True, False])
def test_export_import_roundtrip(native):
    d = _mk(native)
    keys = np.array([5, 9, 0, 1 << 60], np.uint64)
    flats = np.array([1, 2, 1, 3], np.int32)
    d.observe(flats, keys)
    exported = d.export_keys()
    assert sorted(exported.tolist()) == sorted(keys.tolist())

    d2 = _mk(native)
    d2.import_state(exported, dict(d.counts))
    assert d2.size == 4
    assert d2.counts == d.counts
    n_new, n_dup = d2.observe(flats, keys)
    assert (n_new, n_dup) == (0, 4)


def test_soak_harness_small():
    """scripts/soak_dedup.py at CI volume: exact counters + per-flat
    ground truth through the real _harvest_overflow path."""
    import subprocess
    import sys
    import os
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, NGS_SOAK_TRIPLES="2000000")
    out = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "soak_dedup.py")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["rss_ok"]
    assert rec["matched"] == 2_000_000
