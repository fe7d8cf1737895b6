"""Failure detection (SURVEY.md section 5): errors inside producer
threads must surface in the consumer; bad inputs fail with the
reference's messages; partial/garbage files do not hang."""

import numpy as np
import pytest

from ngs_barcode_count_tpu.io import native
from ngs_barcode_count_tpu.io.fastq import FastqFormatError
from ngs_barcode_count_tpu.io.parallel_ingest import (
    read_fastq_packed_parallel,
)
from ngs_barcode_count_tpu.runner import RunConfig, run
from ngs_barcode_count_tpu.utils import simulate

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec not built"
)


def test_producer_format_error_propagates(tmp_path):
    p = tmp_path / "bad.fastq"
    p.write_text("ACGTACGTACGTACGT\nACGT\n+\nIIII\n")
    with pytest.raises(FastqFormatError, match="first line"):
        list(read_fastq_packed_parallel(str(p), batch_reads=16))


def test_missing_file_propagates(tmp_path):
    with pytest.raises(FileNotFoundError):
        list(
            read_fastq_packed_parallel(
                str(tmp_path / "nope.fastq"), batch_reads=16
            )
        )


def test_empty_fastq(tmp_path, rng):
    p = tmp_path / "empty.fastq"
    p.write_text("")
    chunks = list(read_fastq_packed_parallel(str(p), batch_reads=16))
    assert chunks == []


def test_garbage_gzip_does_not_hang(tmp_path):
    p = tmp_path / "x.fastq.gz"
    p.write_bytes(b"\x1f\x8b" + b"\x00" * 100)  # bogus gzip body
    chunks = list(read_fastq_packed_parallel(str(p), batch_reads=16))
    assert sum(c.n_reads for c in chunks) == 0


def test_truncated_gzip_yields_partial(tmp_path, rng):
    """A truncated member decodes what it can, like the reference's
    stop-at-zero-read behavior (input.rs:67-82)."""
    import gzip

    reads = [simulate.random_seq(rng, 40) for _ in range(200)]
    text = "".join(f"@r\n{r}\n+\n{'I' * len(r)}\n" for r in reads)
    blob = gzip.compress(text.encode())
    p = tmp_path / "t.fastq.gz"
    p.write_bytes(blob[: len(blob) // 2])
    chunks = list(read_fastq_packed_parallel(str(p), batch_reads=64))
    n = sum(c.n_reads for c in chunks)
    assert 0 < n < 200


def test_run_errors_cleanly_on_bad_scheme(tmp_path):
    fmt = tmp_path / "s.txt"
    fmt.write_text("ACGT\n")  # no counted barcode
    fq = tmp_path / "x.fastq"
    fq.write_text("@r\nACGT\n+\nIIII\n")
    with pytest.raises(ValueError, match="at least one counted barcode"):
        run(RunConfig(fastq=str(fq), format=str(fmt),
                      output_dir=str(tmp_path), progress=False))


def test_profile_dir_and_trace_logging(tmp_path, rng, capsys):
    """--profile-dir writes a jax.profiler trace; NGS_TRACE=1 emits
    per-batch structured logs (the observability layer the reference
    lacks, SURVEY.md section 5).

    capsys (sys-level), not capfd: jax.profiler.start_trace re-redirects
    fd 2 mid-test, so fd-level capture loses writes emitted inside the
    trace window."""
    import json as _json
    import os

    from ngs_barcode_count_tpu.runner import RunConfig, run
    from tests.test_end_to_end import gen_fastq, write_inputs, _mk_config
    from ngs_barcode_count_tpu.utils.tracing import Throughput

    paths = write_inputs(tmp_path)
    cfg0 = _mk_config(tmp_path, "x.fastq", paths)
    from ngs_barcode_count_tpu.runner import setup

    scheme, *_ = setup(cfg0)
    fq, reads, quals = gen_fastq(tmp_path, scheme, 300, rng)
    cfg = _mk_config(tmp_path, fq, paths)
    cfg.batch_size = 128
    cfg.profile_dir = str(tmp_path / "trace")

    os.environ["NGS_TRACE"] = "1"
    try:
        result = run(cfg)
    finally:
        del os.environ["NGS_TRACE"]
    assert result.total_reads == 300
    # profiler wrote something under the trace dir
    found = []
    for root, _, files in os.walk(cfg.profile_dir):
        found += files
    assert found, "no profiler trace files written"
    # structured batch logs on stderr, parseable json with the fields
    err = capsys.readouterr().err
    recs = [
        _json.loads(ln) for ln in err.splitlines()
        if ln.startswith('{"event": "batch"')
    ]
    assert recs and recs[-1]["total_reads"] == 300
    assert recs[-1]["reads_per_s"] > 0
