"""Scheme-fuzz parity: randomized schemes (slot counts/lengths/order,
constants, explicit-N runs, optional sample/random regions) x randomized
reads (errors, Ns, flanks, short reads) — the tensor decode must
classify and key every read exactly like the string oracle.

This is breadth the fixed-scheme suites can't give: every run draws 8
fresh schemes; failures print the scheme text for replay.
"""

import numpy as np
import pytest

from ngs_barcode_count_tpu.conversions import BarcodeConversions, BarcodeSet
from ngs_barcode_count_tpu.errors import MaxSeqErrors
from ngs_barcode_count_tpu.ops import decode as dec
from ngs_barcode_count_tpu.oracle import Oracle
from ngs_barcode_count_tpu.scheme import parse_scheme_text
from ngs_barcode_count_tpu.utils import simulate

from tests.test_decode_vs_oracle import encode_batch


def _random_scheme_text(rng) -> str:
    """A random but valid scheme: constants interleaved with 1-3 counted
    slots, optional sample/random regions, occasional explicit-N runs."""
    parts = []

    def const(lo=4, hi=10):
        s = simulate.random_seq(rng, int(rng.integers(lo, hi)))
        if rng.random() < 0.3:  # splice an explicit-N wildcard run in
            k = int(rng.integers(1, 3))
            pos = int(rng.integers(0, len(s)))
            s = s[:pos] + "N" * k + s[pos:]
        return s

    if rng.random() < 0.6:
        parts += [f"[{int(rng.integers(6, 11))}]", const()]
    else:
        parts.append(const())
    n_counted = int(rng.integers(1, 4))
    for _ in range(n_counted):
        parts += [f"{{{int(rng.integers(4, 9))}}}", const(3, 7)]
    if rng.random() < 0.4:
        parts += [f"({int(rng.integers(4, 9))})", const(3, 6)]
    return "\n".join(parts) + "\n"


def _tables(rng, scheme):
    conv = BarcodeConversions()
    samples = []
    if scheme.sample_slot is not None:
        got = set()
        while len(got) < 3:
            got.add(simulate.random_seq(rng, scheme.sample_slot.length))
        samples = sorted(got)
        conv.samples_barcode_hash = {s: f"S{i}" for i, s in enumerate(samples)}
        conv.sample_set = BarcodeSet.from_pairs(
            [(s, f"S{i}") for i, s in enumerate(samples)],
            scheme.sample_slot.length,
        )
    sets = []
    for i, slot in enumerate(scheme.barcode_slots):
        got = set()
        while len(got) < int(rng.integers(3, 7)):
            got.add(simulate.random_seq(rng, slot.length))
        sets.append(sorted(got))
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
    return conv, samples, sets


def _reads(rng, scheme, samples, sets, n):
    reads, quals = [], []
    for _ in range(n):
        sample = samples[rng.integers(0, len(samples))] if samples else None
        counted = [s[rng.integers(0, len(s))] for s in sets]
        r = simulate.make_read(
            rng, scheme, sample, counted,
            flank_left=int(rng.integers(0, 7)),
            flank_right=int(rng.integers(0, 7)),
            n_errors=int(rng.integers(0, 7)),
        )
        # salt with Ns / truncations
        if rng.random() < 0.3:
            r = list(r)
            for _ in range(int(rng.integers(1, 4))):
                r[int(rng.integers(0, len(r)))] = "N"
            r = "".join(r)
        if rng.random() < 0.05:
            r = r[: max(int(rng.integers(1, len(r))), 1)]
        reads.append(r)
        q = rng.integers(20, 41, len(r)) + 33
        quals.append("".join(chr(int(x)) for x in q))
    return reads, quals


@pytest.mark.parametrize("seed", range(8))
def test_fuzzed_scheme_parity(seed):
    rng = np.random.default_rng(1000 + seed)
    text = _random_scheme_text(rng)
    scheme = parse_scheme_text(text)
    conv, samples, sets = _tables(rng, scheme)
    min_quality = 30.0 if rng.random() < 0.5 else 0.0
    me = MaxSeqErrors.create(
        None, scheme.sample_length, None, scheme.barcode_lengths, None,
        scheme.constant_region_length, min_quality,
    )
    plan = dec.make_plan(scheme, conv, me)
    oracle = Oracle(
        scheme, me, list(conv.samples_barcode_hash.keys()),
        [s.sequences for s in conv.counted_sets], min_quality,
    )
    reads, quals = _reads(rng, scheme, samples, sets, 192)
    bases, quality, lengths, mask = encode_batch(reads, quals)
    out = dec.keyed_decode_step(plan, bases, quality, lengths, mask)
    valid = np.asarray(out["valid"])
    combo = np.asarray(out["combo_flat"]) if "combo_flat" in out else None
    sample_idx = np.asarray(out["sample_idx"])
    for i, (r, q) in enumerate(zip(reads, quals)):
        o = oracle.decode(r, q)
        assert bool(valid[i]) == (o.outcome == "matched"), (
            seed, i, o.outcome, text
        )
        if valid[i] and combo is not None:
            idxs = []
            flat = int(combo[i])
            for nr in reversed(plan.combo_radix):
                idxs.append(flat % nr)
                flat //= nr
            got = tuple(
                conv.counted_sets[j].sequences[k]
                for j, k in enumerate(reversed(idxs))
            )
            assert got == o.counted_barcodes, (seed, i, text)
            if scheme.sample_slot is not None:
                assert (
                    conv.sample_set.sequences[int(sample_idx[i])]
                    == o.sample_barcode
                ), (seed, i, text)


@pytest.mark.parametrize("seed", range(4))
def test_fuzzed_scheme_e2e_pipeline(tmp_path, seed):
    """Same fuzzed schemes driven through the PRODUCTION pipeline: files
    on disk -> native codec wire format -> whatever mode the runner
    selects (dense / bytemap / device hash-set / keyed) -> counters must
    equal the oracle's tallies."""
    from ngs_barcode_count_tpu.io import native
    from ngs_barcode_count_tpu.runner import (
        CountAccumulator, RunConfig, decode_file, setup,
    )
    from ngs_barcode_count_tpu import stats as S
    from tests.test_end_to_end import oracle_counts

    if not native.available():
        pytest.skip("native codec not built")
    rng = np.random.default_rng(2000 + seed)
    text = _random_scheme_text(rng)
    scheme = parse_scheme_text(text)
    conv, samples, sets = _tables(rng, scheme)

    fmt = tmp_path / "scheme.txt"
    fmt.write_text(text)
    paths = {}
    if samples:
        sf = tmp_path / "samples.csv"
        sf.write_text(
            "Barcode,ID\n" + "".join(f"{b},S{i}\n"
                                     for i, b in enumerate(samples))
        )
        paths["samples"] = str(sf)
    cf = tmp_path / "bc.csv"
    cf.write_text(
        "Barcode,ID,Num\n" + "".join(
            f"{b},B{i}_{j},{i + 1}\n"
            for i, s in enumerate(sets) for j, b in enumerate(s)
        )
    )
    reads, quals = _reads(rng, scheme, samples, sets, 300)
    fq = tmp_path / "r.fastq"
    simulate.write_fastq(str(fq), reads, quals)

    min_quality = 30.0 if rng.random() < 0.5 else 0.0
    cfg = RunConfig(
        fastq=str(fq), format=str(fmt),
        sample_barcodes_option=paths.get("samples"),
        counted_barcodes_option=str(cf),
        output_dir=str(tmp_path), prefix="fz", batch_size=128,
        progress=False, min_average_quality_score=min_quality,
    )
    scheme2, conv2, me, plan, _ = setup(cfg)
    acc = CountAccumulator(plan, conv2)
    n = decode_file(cfg, plan, scheme2, acc)
    acc.finalize()
    assert n == len(reads)

    exp, tallies = oracle_counts(cfg, reads, quals)
    c = acc.seq_errors.counters
    assert c[S.MATCHED] == tallies["matched"], (seed, text)
    assert c[S.CONSTANT_REGION] == tallies["constant_region"], (seed, text)
    assert c[S.SAMPLE_BARCODE] == tallies["sample_barcode"], (seed, text)
    assert c[S.BARCODE] == tallies["barcode"], (seed, text)
    assert c[S.LOW_QUALITY] == tallies["low_quality"], (seed, text)
    assert c[S.DUPLICATES] == tallies["duplicates"], (seed, text)
    assert acc.results_view().per_sample == exp, (seed, text)
