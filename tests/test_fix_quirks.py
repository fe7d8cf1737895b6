"""--fix-quirks mode: corrected semantics (inclusive final repair
window, all quality segments checked, post-repair quality alignment),
device path vs fix-mode oracle."""

import numpy as np
import pytest

from ngs_barcode_count_tpu import stats
from ngs_barcode_count_tpu.conversions import BarcodeConversions, BarcodeSet
from ngs_barcode_count_tpu.errors import MaxSeqErrors
from ngs_barcode_count_tpu.ops import decode as dec
from ngs_barcode_count_tpu.oracle import Oracle
from ngs_barcode_count_tpu.scheme import parse_scheme_text
from ngs_barcode_count_tpu.utils import simulate

from tests.test_decode_vs_oracle import (
    SAMPLES, BC1, BC2, BC3, encode_batch, gen_reads,
)
from tests.conftest import EXAMPLE_SCHEME


def build_plan_fix(scheme, min_quality=0.0, fix_quirks=True):
    conv = BarcodeConversions()
    if scheme.sample_barcode:
        conv.samples_barcode_hash = {s: f"S{i}" for i, s in enumerate(SAMPLES)}
        conv.sample_set = BarcodeSet.from_pairs(
            [(s, f"S{i}") for i, s in enumerate(SAMPLES)], 10
        )
    sets = [BC1, BC2, BC3][: scheme.barcode_num]
    conv.counted_barcodes_hash = [
        {b: f"B{i}_{j}" for j, b in enumerate(s)} for i, s in enumerate(sets)
    ]
    conv.counted_sets = [
        BarcodeSet.from_pairs(
            [(b, f"B{i}_{j}") for j, b in enumerate(s)],
            scheme.barcode_lengths[i],
        )
        for i, s in enumerate(sets)
    ]
    me = MaxSeqErrors.create(
        None, scheme.sample_length, None, scheme.barcode_lengths, None,
        scheme.constant_region_length, min_quality,
    )
    plan = dec.make_plan(scheme, conv, me, fix_quirks=fix_quirks)
    oracle = Oracle(
        scheme, me, list(conv.samples_barcode_hash.keys()),
        [s.sequences for s in conv.counted_sets], min_quality,
        fix_quirks=fix_quirks,
    )
    return plan, oracle, conv


def _device_valid(plan, reads, quals):
    bases, quality, lengths, mask = encode_batch(reads, quals)
    out = dec.keyed_decode_step(plan, bases, quality, lengths, mask)
    return np.asarray(out["valid"]), np.asarray(out["counters"])


def test_final_window_repaired_only_in_fix_mode(rng):
    scheme = parse_scheme_text(EXAMPLE_SCHEME.replace("(8)\n", ""))
    plan_s, oracle_s, _ = build_plan_fix(scheme, fix_quirks=False)
    plan_f, oracle_f, _ = build_plan_fix(scheme, fix_quirks=True)
    # read = flank + scheme-with-2-errors, NO right flank: the only valid
    # alignment is the final window, which strict mode never tries
    read = simulate.make_read(
        rng, scheme, list(SAMPLES)[0], [BC1[0], BC2[0], BC3[0]],
        flank_left=5, flank_right=0, n_errors=2,
    )
    quals = ["I" * len(read)]
    assert oracle_s.decode(read, quals[0]).outcome == "constant_region"
    assert oracle_f.decode(read, quals[0]).outcome == "matched"
    vs, cs = _device_valid(plan_s, [read], quals)
    vf, cf = _device_valid(plan_f, [read], quals)
    assert not vs[0] and vf[0]


def test_trailing_region_quality_checked_in_fix_mode(rng):
    # scheme ends with a counted barcode: trailing region
    scheme = parse_scheme_text("ACGTACGTAGCT\n{6}\n")
    conv = BarcodeConversions()
    conv.counted_barcodes_hash = [{b: f"X{j}" for j, b in enumerate(BC1)}]
    conv.counted_sets = [
        BarcodeSet.from_pairs([(b, f"X{j}") for j, b in enumerate(BC1)], 6)
    ]
    me = MaxSeqErrors.create(None, None, None, [6], None,
                             scheme.constant_region_length, 30.0)
    plan_s = dec.make_plan(scheme, conv, me, fix_quirks=False)
    plan_f = dec.make_plan(scheme, conv, me, fix_quirks=True)
    read = "ACGTACGTAGCT" + BC1[0]
    # quality: high over constants, terrible over the trailing barcode
    qual = "I" * 12 + "!" * 6
    vs, cs = _device_valid(plan_s, [read], [qual])
    vf, cf = _device_valid(plan_f, [read], [qual])
    assert vs[0]  # strict: trailing region never checked -> passes
    assert not vf[0] and cf[stats.LOW_QUALITY] == 1


def test_fix_mode_device_oracle_parity(rng):
    scheme = parse_scheme_text(EXAMPLE_SCHEME)
    plan, oracle, conv = build_plan_fix(scheme, min_quality=30.0)
    reads = gen_reads(rng, scheme, 256, err_range=(0, 12))
    quals = []
    for r in reads:
        q = rng.integers(24, 41, len(r)) + 33
        quals.append("".join(chr(int(x)) for x in q))
    valid, counters = _device_valid(plan, reads, quals)
    n = {k: 0 for k in ("matched", "constant_region", "sample_barcode",
                        "barcode", "low_quality")}
    for i, (r, q) in enumerate(zip(reads, quals)):
        o = oracle.decode(r, q)
        n[o.outcome] += 1
        assert bool(valid[i]) == (o.outcome == "matched"), (i, o.outcome)
    assert counters[stats.CONSTANT_REGION] == n["constant_region"]
    assert counters[stats.LOW_QUALITY] == n["low_quality"]
    assert counters[stats.SAMPLE_BARCODE] == n["sample_barcode"]
    assert counters[stats.BARCODE] == n["barcode"]
