"""The five BASELINE.json benchmark configs as end-to-end goldens, each
checked for exact oracle parity (SURVEY.md section 4d)."""

import numpy as np
import pytest

import jax

from ngs_barcode_count_tpu.runner import run, setup
from ngs_barcode_count_tpu.utils import simulate

from tests.test_end_to_end import (
    BC1, BC2, BC3, SAMPLES,
    SCHEME_RANDOM_TEXT, SCHEME_TEXT,
    _mk_config, assert_counts_equal, gen_fastq, oracle_counts, write_inputs,
)


def test_config1_exact_match_raw_dna(tmp_path, rng):
    """Exact-match counting by raw DNA barcode, no conversion files."""
    fmt = tmp_path / "scheme.txt"
    fmt.write_text("AGCTACGAATCG\n{6}\nTGGAACTAGATTAGA\n")
    paths = {"format": str(fmt)}
    cfg0 = _mk_config(tmp_path, "x.fastq", paths)
    scheme, *_ = setup(cfg0)
    reads, quals = [], []
    for _ in range(400):
        bc = ["CAGAGA", "TGATTG", "AAGGCC"][rng.integers(0, 3)]
        r = simulate.make_read(rng, scheme, None, [bc],
                               flank_left=int(rng.integers(0, 6)),
                               flank_right=int(rng.integers(0, 6)))
        reads.append(r)
        quals.append("I" * len(r))
    fq = tmp_path / "c1.fastq"
    simulate.write_fastq(str(fq), reads, quals)
    cfg = _mk_config(tmp_path, str(fq), paths)
    result = run(cfg)
    exp, tallies = oracle_counts(cfg, reads, quals)
    assert_counts_equal(result, exp, tallies)
    # counts key by raw DNA under the "barcode" sample
    assert set(result.results.per_sample) == {"barcode"}
    assert all(
        set(k.split(",")[0]) <= set("ACGT")
        for k in result.results.per_sample["barcode"]
    )


def test_config2_sample_and_counted_with_correction(tmp_path, rng):
    """Sample + counted conversion files with Hamming error correction."""
    paths = write_inputs(tmp_path)
    cfg0 = _mk_config(tmp_path, "x.fastq", paths)
    scheme, *_ = setup(cfg0)
    fq, reads, quals = gen_fastq(tmp_path, scheme, 500, rng,
                                 err_range=(0, 6))
    cfg = _mk_config(tmp_path, fq, paths)
    result = run(cfg)
    exp, tallies = oracle_counts(cfg, reads, quals)
    assert tallies["matched"] > 0
    assert_counts_equal(result, exp, tallies)


def test_config3_quality_and_constant_tolerance(tmp_path, rng):
    """min-quality filtering + 20% constant-region tolerance."""
    paths = write_inputs(tmp_path)
    cfg0 = _mk_config(tmp_path, "x.fastq", paths)
    scheme, *_ = setup(cfg0)
    fq, reads, quals = gen_fastq(tmp_path, scheme, 500, rng,
                                 quality_range=(22, 41), err_range=(0, 10))
    cfg = _mk_config(tmp_path, fq, paths, min_average_quality_score=30.0)
    result = run(cfg)
    exp, tallies = oracle_counts(cfg, reads, quals)
    assert tallies["low_quality"] > 0
    assert tallies["constant_region"] > 0
    assert_counts_equal(result, exp, tallies)


def test_config4_random_dedup_multisample(tmp_path, rng):
    """Random-barcode PCR-duplicate collapse on multi-sample fastq."""
    paths = write_inputs(tmp_path, scheme_text=SCHEME_RANDOM_TEXT)
    cfg0 = _mk_config(tmp_path, "x.fastq", paths)
    scheme, *_ = setup(cfg0)
    reads, quals = [], []
    randoms = ["ACGTACGT", "TTTTCCCC"]
    for _ in range(400):
        sample = list(SAMPLES)[rng.integers(0, 2)]
        counted = [s[rng.integers(0, 3)] for s in [BC1, BC2, BC3]]
        r = simulate.make_read(rng, scheme, sample, counted,
                               random_barcode=randoms[rng.integers(0, 2)],
                               flank_left=2, flank_right=3)
        reads.append(r)
        quals.append("I" * len(r))
    fq = tmp_path / "c4.fastq"
    simulate.write_fastq(str(fq), reads, quals)
    cfg = _mk_config(tmp_path, str(fq), paths)
    result = run(cfg)
    exp, tallies = oracle_counts(cfg, reads, quals)
    assert tallies["duplicates"] > 0
    assert_counts_equal(result, exp, tallies)


def test_config5_del_enrich_sharded(tmp_path, rng):
    """3-barcode DEL + --enrich + merged output, sharded over the
    8-device mesh (the multi-host configuration, intra-host here)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    paths = write_inputs(tmp_path)
    cfg0 = _mk_config(tmp_path, "x.fastq", paths)
    scheme, *_ = setup(cfg0)
    fq, reads, quals = gen_fastq(tmp_path, scheme, 640, rng,
                                 err_range=(0, 8))
    cfg = _mk_config(tmp_path, fq, paths, n_devices=8, merge_output=True,
                     enrich=True)
    result = run(cfg)
    exp, tallies = oracle_counts(cfg, reads, quals)
    assert_counts_equal(result, exp, tallies)
    assert (tmp_path / "test_counts.all.csv").exists()
    assert (tmp_path / "test_counts.all.Single.csv").exists()
    assert (tmp_path / "test_counts.all.Double.csv").exists()
    # single-marginal totals: each sample's singles sum = 3 x its matched
    import csv

    for name, sb in [("Sample_name_1", None)]:
        rows = list(csv.reader(
            (tmp_path / f"test_{name}_counts.Single.csv").open()
        ))[1:]
        total_single = sum(int(r[-1]) for r in rows)
        sdna = [k for k, v in SAMPLES.items() if v == name][0]
        matched_sample = sum(exp[sdna].values())
        assert total_single == 3 * matched_sample
