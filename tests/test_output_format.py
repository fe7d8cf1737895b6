"""Writer format goldens: stats file layout (output.rs:511-574), header
rules (output.rs:184-196), merged demotion, enrichment marginals."""

import datetime as dt
import os

import numpy as np
import pytest

from ngs_barcode_count_tpu.enrich import double_keys, single_keys
from ngs_barcode_count_tpu.errors import MaxSeqErrors
from ngs_barcode_count_tpu.output import (
    ResultsView,
    WriteFiles,
    WriterConfig,
    convert_code,
    elapsed_display,
    millisecond_decimal,
)
from ngs_barcode_count_tpu.scheme import parse_scheme_text
from ngs_barcode_count_tpu.stats import SequenceErrors


def _writer(tmp_path, scheme, per_sample, samples_hash=None, counted=None,
            **cfg):
    config = WriterConfig(
        fastq="/data/reads.fastq",
        format="/data/scheme.txt",
        sample_barcodes_option=None,
        counted_barcodes_option=None,
        output_dir=str(tmp_path),
        prefix="G",
        merge_output=cfg.get("merge_output", False),
        enrich=cfg.get("enrich", False),
    )
    return WriteFiles(
        ResultsView(per_sample), scheme, counted or [], samples_hash or {},
        config,
    )


def test_single_barcode_header(tmp_path):
    scheme = parse_scheme_text("ACGT\n{4}\nTTAA\n")
    w = _writer(tmp_path, scheme, {"barcode": {"AAAA": 3}})
    w.write_counts_files()
    text = (tmp_path / "G_barcode_counts.csv").read_text()
    assert text == "Barcode,Count\nAAAA,3\n"


def test_merge_demoted_single_sample(tmp_path, capsys):
    scheme = parse_scheme_text("ACGT\n{4}\nTTAA\n")
    w = _writer(tmp_path, scheme, {"barcode": {"AAAA": 3}}, merge_output=True)
    w.write_counts_files()
    captured = capsys.readouterr()
    assert "Merged file cannot be created" in captured.err
    assert not (tmp_path / "G_counts.all.csv").exists()


def test_enrich_marginal_keys():
    assert single_keys("A,B,C") == ["A,,", ",B,", ",,C"]
    assert double_keys("A,B,C") == ["A,B,", "A,,C", ",B,C"]
    assert single_keys("X,Y") == ["X,", ",Y"]
    assert double_keys("X,Y") == ["X,Y"]


def test_convert_code_roundtrip():
    maps = [{"AAAA": "id1"}, {"CCCC": "id2"}]
    assert convert_code("AAAA,CCCC", maps) == "id1,id2"
    with pytest.raises(KeyError):
        convert_code("GGGG,CCCC", maps)


def test_millisecond_decimal():
    assert millisecond_decimal(dt.timedelta(seconds=1, milliseconds=42)) == "042"
    assert millisecond_decimal(dt.timedelta(milliseconds=7)) == "007"
    assert millisecond_decimal(dt.timedelta(seconds=2, milliseconds=311)) == "311"


def test_stats_file_golden(tmp_path):
    scheme = parse_scheme_text("[4]\nACGT\n{4}\nTTAA\n")
    me = MaxSeqErrors.create(None, 4, None, [4], None, 8, 0.0)
    errs = SequenceErrors()
    errs.correct_match(1234567)
    errs.constant_region_error(89)
    w = _writer(
        tmp_path, scheme,
        {"AAAA": {"CCCC": 5}},
        samples_hash={"AAAA": "S1"},
        counted=[{"CCCC": "B1"}],
    )
    w.write_counts_files()
    start = dt.datetime(2026, 8, 17, 10, 0, 0)
    now = dt.datetime(2026, 8, 17, 11, 2, 3, 456000)
    w.write_stats_file(start, me, errs, 2_000_000, scheme, now=now)
    text = (tmp_path / "G_barcode_stats.txt").read_text()
    assert text == (
        "-TIME INFORMATION-\n"
        "Start: 2026-08-17 10:00:00\n"
        "Finish: 2026-08-17 11:02:03\n"
        "Total time: 1 hours, 2 minutes, 3.456 seconds\n\n"
        "-INPUT FILES-\n"
        "Fastq: /data/reads.fastq\n"
        "Format: /data/scheme.txt\n"
        "Samples: None\n"
        "Barcodes: None\n\n"
        "-FORMAT-\n"
        "NNNNACGTNNNNTTAA\n"
        "SSSSCCCCBBBBCCCC\n"
        "S: Sample barcode\n"
        "C: Constant region\n"
        "B: Counted barcode\n\n"
        "-BARCODE INFO-\n"
        "Constant region size: 8\n"
        "Maximum mismatches allowed per sequence: 1\n"
        "--------------------------------------------------------------\n"
        "Sample barcode size: 4\n"
        "Maximum mismatches allowed per sequence: 0\n"
        "--------------------------------------------------------------\n"
        "Barcode size: 4\n"
        "Maximum mismatches allowed per barcode sequence: 0\n"
        "--------------------------------------------------------------\n"
        "Minimum allowed average read quality score per barcode: 0\n\n"
        "-RESULTS-\n"
        "Total sequences:             2,000,000\n"
        "Correctly matched sequences: 1,234,567\n"
        "Constant region mismatches:  89\n"
        "Sample barcode mismatches:   0\n"
        "Counted barcode mismatches:  0\n"
        "Duplicates:                  0\n"
        "Low quality barcodes:        0\n\n"
        "-OUTPUT FILES-\n"
        "File & barcodes counted: G_S1_counts.csv\t1\n"
        "\n" + "-" * 98 + "\n\n\n"
    )


def test_dense_enrichment_fast_path_equals_row_walk(tmp_path, rng):
    """The tensor-marginal enrichment (dense fast path) must produce the
    exact single/double hashmaps of the per-row accumulation."""
    import copy

    from ngs_barcode_count_tpu.runner import (
        CountAccumulator, decode_file, setup,
    )
    from tests.test_end_to_end import gen_fastq, write_inputs, _mk_config

    paths = write_inputs(tmp_path)
    cfg0 = _mk_config(tmp_path, "x.fastq", paths)
    scheme, *_ = setup(cfg0)
    fq, reads, quals = gen_fastq(tmp_path, scheme, 600, rng)
    cfg = _mk_config(tmp_path, fq, paths)
    cfg.enrich = True
    scheme, conv, me, plan, _ = setup(cfg)
    acc = CountAccumulator(plan, conv)
    decode_file(cfg, plan, scheme, acc)
    acc.finalize()
    results = acc.results_view()
    assert results.dense_arr is not None

    wc = WriterConfig(
        fastq=cfg.fastq, format=cfg.format,
        sample_barcodes_option=cfg.sample_barcodes_option,
        counted_barcodes_option=cfg.counted_barcodes_option,
        output_dir=str(tmp_path / "fast"), prefix="t",
        merge_output=False, enrich=True,
    )
    (tmp_path / "fast").mkdir()
    (tmp_path / "slow").mkdir()
    w_fast = WriteFiles(
        results, scheme, conv.counted_barcodes_hash,
        conv.samples_barcode_hash, wc,
    )
    w_fast.write_counts_files()
    assert w_fast._enrich_precomputed

    slow_results = copy.copy(results)
    slow_results.dense_arr = None
    wc2 = copy.copy(wc)
    wc2.output_dir = str(tmp_path / "slow")
    w_slow = WriteFiles(
        slow_results, scheme, conv.counted_barcodes_hash,
        conv.samples_barcode_hash, wc2,
    )
    w_slow.write_counts_files()
    assert not w_slow._enrich_precomputed

    assert w_fast.enriched.single_hashmap == w_slow.enriched.single_hashmap
    assert w_fast.enriched.double_hashmap == w_slow.enriched.double_hashmap
    for f in sorted(os.listdir(tmp_path / "fast")):
        a = open(tmp_path / "fast" / f).read()
        b = open(tmp_path / "slow" / f).read()
        assert a == b, f


def test_dense_writer_fast_path_byte_identical(tmp_path, rng):
    """The vectorized dense Full-pass writer (tensor -> CSV, lazy
    results_view) must produce byte-identical files to the per-row dict
    walk, across per-sample, merged, and enriched outputs, and must
    report the same output_counts / merged_count bookkeeping."""
    import copy

    from ngs_barcode_count_tpu.runner import (
        CountAccumulator, decode_file, setup,
    )
    from tests.test_end_to_end import gen_fastq, write_inputs, _mk_config

    paths = write_inputs(tmp_path)
    cfg0 = _mk_config(tmp_path, "x.fastq", paths)
    scheme, *_ = setup(cfg0)
    fq, reads, quals = gen_fastq(tmp_path, scheme, 800, rng)
    cfg = _mk_config(tmp_path, fq, paths)
    cfg.enrich = True
    cfg.merge_output = True
    scheme, conv, me, plan, _ = setup(cfg)
    acc = CountAccumulator(plan, conv)
    decode_file(cfg, plan, scheme, acc)
    acc.finalize()

    lazy = acc.results_view(lazy_dense=True)
    assert lazy.dense_arr is not None
    assert all(not d for d in lazy.per_sample.values())
    eager = acc.results_view()
    assert any(d for d in eager.per_sample.values())
    eager_dicts_only = copy.copy(eager)
    eager_dicts_only.dense_arr = None
    eager_dicts_only.dense_sample_keys = None

    (tmp_path / "fast").mkdir()
    (tmp_path / "slow").mkdir()
    wc = WriterConfig(
        fastq=cfg.fastq, format=cfg.format,
        sample_barcodes_option=cfg.sample_barcodes_option,
        counted_barcodes_option=cfg.counted_barcodes_option,
        output_dir=str(tmp_path / "fast"), prefix="t",
        merge_output=True, enrich=True,
    )
    w_fast = WriteFiles(
        lazy, scheme, conv.counted_barcodes_hash,
        conv.samples_barcode_hash, wc,
    )
    w_fast.write_counts_files()
    wc2 = copy.copy(wc)
    wc2.output_dir = str(tmp_path / "slow")
    w_slow = WriteFiles(
        eager_dicts_only, scheme, conv.counted_barcodes_hash,
        conv.samples_barcode_hash, wc2,
    )
    # dicts-only view: the dict walk must drive enrichment too
    w_slow.write_counts_files()

    fast_files = sorted(os.listdir(tmp_path / "fast"))
    slow_files = sorted(os.listdir(tmp_path / "slow"))
    assert fast_files == slow_files and len(fast_files) >= 7
    for f in fast_files:
        a = open(tmp_path / "fast" / f).read()
        b = open(tmp_path / "slow" / f).read()
        assert a == b, f
    assert w_fast.output_files == w_slow.output_files
    assert w_fast.output_counts == w_slow.output_counts


def test_dense_writer_chunk_boundaries(tmp_path):
    """The dense writer assembles rows in 50k chunks (the reference's
    progress cadence); a synthetic ~120k-nonzero tensor crosses two
    chunk boundaries and must still match the dict walk byte for byte."""
    import numpy as np

    from ngs_barcode_count_tpu.scheme import parse_scheme_text

    scheme = parse_scheme_text("[4]\nACGT\n{3}\nAC\n{3}\nGT\n{3}\nTAGA\n")
    rng = np.random.default_rng(5)
    n_per = 52
    seqs = []
    for j in range(3):
        s = set()
        while len(s) < n_per:
            s.add("".join("ACGT"[i] for i in rng.integers(0, 4, 3)))
        seqs.append(sorted(s, key=lambda x: rng.random()))  # unsorted order
    counted_hash = [
        {b: f"B{j}_{i}" for i, b in enumerate(seqs[j])} for j in range(3)
    ]
    samples_hash = {"AAAA": "S1", "CCCC": "S2"}
    arr = rng.integers(0, 3, (2, n_per, n_per, n_per)).astype(np.int64)
    # ~2/3 of 140k combos nonzero per sample -> >50k rows per file
    per_sample = {}
    for s, key in enumerate(["AAAA", "CCCC"]):
        d = {}
        nz = np.argwhere(arr[s])
        for i0, i1, i2 in nz:
            code = f"{seqs[0][i0]},{seqs[1][i1]},{seqs[2][i2]}"
            d[code] = int(arr[s, i0, i1, i2])
        per_sample[key] = d
    dense = ResultsView(
        {k: {} for k in per_sample}, dense_arr=arr,
        dense_sample_keys=["AAAA", "CCCC"],
    )
    dicts = ResultsView(per_sample)

    outs = {}
    for tag, view in (("fast", dense), ("slow", dicts)):
        d = tmp_path / tag
        d.mkdir()
        wc = WriterConfig(
            fastq="x.fastq", format="s.txt",
            sample_barcodes_option="sb.csv",
            counted_barcodes_option="cb.csv",
            output_dir=str(d), prefix="t", merge_output=True, enrich=False,
        )
        w = WriteFiles(view, scheme, counted_hash, samples_hash, wc)
        w.write_counts_files()
        outs[tag] = (d, w.output_counts)
    fast_d, fast_counts = outs["fast"]
    slow_d, slow_counts = outs["slow"]
    assert fast_counts == slow_counts
    assert fast_counts[1] > 50_000  # chunk boundary actually crossed
    for f in sorted(os.listdir(fast_d)):
        assert open(fast_d / f).read() == open(slow_d / f).read(), f


def test_dense_writer_duplicate_ids_and_mixed_lengths(tmp_path):
    """Conversion files may map different DNA barcodes to the SAME ID
    (the reference writes both rows; merged-file dedup keys on the RAW
    DNA code, output.rs:292) and per-position barcode lengths differ.
    The dense fast path must reproduce the dict walk byte for byte."""
    import numpy as np

    from ngs_barcode_count_tpu.scheme import parse_scheme_text

    scheme = parse_scheme_text("[4]\nACGT\n{2}\nAC\n{4}\nGT\n{3}\nTAGA\n")
    seqs = [
        ["AA", "CA", "GT", "TC"],
        ["AAAA", "CCCC", "GGGG", "TTTT", "ACGT"],
        ["AAA", "CCC", "GGG"],
    ]
    counted_hash = [
        # duplicate IDs: AA and CA both convert to "dup"
        {"AA": "dup", "CA": "dup", "GT": "g", "TC": "t"},
        {s: f"B2_{i}" for i, s in enumerate(seqs[1])},
        {"AAA": "x", "CCC": "x", "GGG": "y"},  # more duplicates
    ]
    samples_hash = {"AAAA": "S1", "CCCC": "S2", "GGGG": "S3"}
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 4, (3, 4, 5, 3)).astype(np.int64)
    arr[arr == 3] = 1_000_000_007  # exercise wide count formatting
    per_sample = {}
    for s, key in enumerate(["AAAA", "CCCC", "GGGG"]):
        d = {}
        for i0 in range(4):
            for i1 in range(5):
                for i2 in range(3):
                    if arr[s, i0, i1, i2]:
                        code = f"{seqs[0][i0]},{seqs[1][i1]},{seqs[2][i2]}"
                        d[code] = int(arr[s, i0, i1, i2])
        per_sample[key] = d
    dense = ResultsView(
        {k: {} for k in per_sample}, dense_arr=arr,
        dense_sample_keys=list(per_sample),
    )
    dicts = ResultsView(per_sample)
    outs = {}
    for tag, view in (("fast", dense), ("slow", dicts)):
        d = tmp_path / tag
        d.mkdir()
        wc = WriterConfig(
            fastq="x.fastq", format="s.txt",
            sample_barcodes_option="sb.csv",
            counted_barcodes_option="cb.csv",
            output_dir=str(d), prefix="t", merge_output=True, enrich=False,
        )
        w = WriteFiles(view, scheme, counted_hash, samples_hash, wc)
        w.write_counts_files()
        outs[tag] = d
    for f in sorted(os.listdir(outs["fast"])):
        a = open(outs["fast"] / f).read()
        b = open(outs["slow"] / f).read()
        assert a == b, f
    # duplicate-ID rows really exist: "dup,..." appears more than once
    body = open(outs["fast"] / "t_S1_counts.csv").read()
    assert body.count("dup,") > 1
