"""Multi-host sharding logic: record-aligned byte ranges partition a
FASTQ exactly; the multi-device runner path equals single-device."""

import numpy as np
import pytest

import jax

from ngs_barcode_count_tpu import dna
from ngs_barcode_count_tpu.io import native
from ngs_barcode_count_tpu.parallel import distributed as dist
from ngs_barcode_count_tpu.runner import RunConfig, run, setup
from ngs_barcode_count_tpu.utils import simulate

from tests.test_end_to_end import (
    SCHEME_TEXT,
    gen_fastq,
    oracle_counts,
    write_inputs,
    _mk_config,
    assert_counts_equal,
)


@pytest.mark.skipif(not native.available(), reason="native codec not built")
def test_byte_ranges_partition_exactly(tmp_path, rng):
    reads = [simulate.random_seq(rng, int(rng.integers(30, 80)))
             for _ in range(1001)]
    p = tmp_path / "x.fastq"
    simulate.write_fastq(str(p), reads)

    n_hosts = 3
    ranges = [dist.host_byte_range(str(p), h, n_hosts) for h in range(n_hosts)]
    # ranges tile the file with no gaps/overlap
    assert ranges[0][0] == 0
    for a, b in zip(ranges, ranges[1:]):
        assert a[1] == b[0]
    collected = []
    for start, end in ranges:
        for c in dist.read_fastq_range(str(p), start, end):
            for i in range(c.count):
                collected.append(dna.decode(c.bases[i, : c.lengths[i]]))
    assert collected == reads


@pytest.mark.skipif(not native.available(), reason="native codec not built")
def test_range_alignment_tricky_quality(tmp_path):
    """Quality lines starting with '@' must not fool the aligner."""
    reads = ["ACGTACGTAC"] * 50
    quals = ["@" + "I" * 9] * 50  # quality line starts with '@'
    p = tmp_path / "x.fastq"
    simulate.write_fastq(str(p), reads, quals)
    size = p.stat().st_size
    for offset in range(0, size, 7):
        aligned = dist.align_to_record(str(p), offset)
        if aligned >= size:
            continue
        # every aligned offset must be a true record start: reading from
        # it yields reads identical to ACGTACGTAC
        chunks = list(dist.read_fastq_range(str(p), aligned, size))
        got = [
            dna.decode(c.bases[i, : c.lengths[i]])
            for c in chunks
            for i in range(c.count)
        ]
        assert all(g == "ACGTACGTAC" for g in got), offset


def test_multi_device_runner_equals_single(tmp_path, rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    # dense mode (no random barcode)
    scheme_text = SCHEME_TEXT
    paths = write_inputs(tmp_path, scheme_text=scheme_text)
    cfg0 = _mk_config(tmp_path, "x.fastq", paths)
    scheme, *_ = setup(cfg0)
    fq, reads, quals = gen_fastq(tmp_path, scheme, 600, rng)

    cfg1 = _mk_config(tmp_path, fq, paths)
    r1 = run(cfg1)
    cfg8 = _mk_config(tmp_path, fq, paths, n_devices=8)
    cfg8.prefix = "test8"
    r8 = run(cfg8)
    assert r1.results.per_sample == r8.results.per_sample
    np.testing.assert_array_equal(
        r1.seq_errors.counters, r8.seq_errors.counters
    )
    exp, tallies = oracle_counts(cfg1, reads, quals)
    assert_counts_equal(r8, exp, tallies)


def test_multi_device_keyed_equals_single(tmp_path, rng):
    """Random-barcode (keyed) runs shard via jit auto-SPMD: 8-device
    results equal single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from tests.test_end_to_end import SCHEME_RANDOM_TEXT, gen_fastq

    paths = write_inputs(tmp_path, scheme_text=SCHEME_RANDOM_TEXT)
    cfg0 = _mk_config(tmp_path, "x.fastq", paths)
    scheme, *_ = setup(cfg0)
    fq, reads, quals = gen_fastq(tmp_path, scheme, 512, rng)

    from ngs_barcode_count_tpu.runner import CountAccumulator, decode_file

    cfg = _mk_config(tmp_path, fq, paths)
    cfg.batch_size = 128
    scheme, conv, me, plan, _ = setup(cfg)

    acc1 = CountAccumulator(plan, conv, n_devices=1, allow_bitmap=False)
    decode_file(cfg, plan, scheme, acc1)
    acc1.finalize()

    acc8 = CountAccumulator(plan, conv, n_devices=8, allow_bitmap=False)
    decode_file(cfg, plan, scheme, acc8, n_devices=8)
    acc8.finalize()

    np.testing.assert_array_equal(
        acc1.seq_errors.counters, acc8.seq_errors.counters
    )
    assert acc1.results_view().per_sample == acc8.results_view().per_sample


@pytest.mark.skipif(not native.available(), reason="native codec not built")
def test_sub_byte_range_nested_partition(tmp_path, rng):
    """Thread sub-ranges carved inside a host range tile it exactly, and
    the packed byte_range reader over those sub-ranges recovers every
    record of the host's share once."""
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )

    reads = [simulate.random_seq(rng, int(rng.integers(30, 80)))
             for _ in range(903)]
    p = str(tmp_path / "x.fastq")
    simulate.write_fastq(p, reads)

    host_ranges = [dist.host_byte_range(p, h, 2) for h in range(2)]
    total = 0
    for start, end in host_ranges:
        subs = [dist.sub_byte_range(p, start, end, t, 3) for t in range(3)]
        assert subs[0][0] == start and subs[-1][1] == end
        for a, b in zip(subs, subs[1:]):
            assert a[1] == b[0]
        n_range = 0
        for pb in read_fastq_packed_parallel(
            p, batch_reads=64, byte_range=(start, end), n_threads=2
        ):
            n_range += pb.n_reads
        total += n_range
    assert total == len(reads)
