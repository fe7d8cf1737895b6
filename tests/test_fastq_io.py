"""FASTQ ingest tests (reference input.rs behaviors)."""

import numpy as np
import pytest

from ngs_barcode_count_tpu import dna
from ngs_barcode_count_tpu.io import batcher, fastq
from ngs_barcode_count_tpu.utils import simulate


def _collect(path, **kw):
    chunks = list(fastq.read_fastq(path, **kw))
    n = sum(c.count for c in chunks)
    return chunks, n


def test_roundtrip_plain(tmp_path, rng):
    reads = [simulate.random_seq(rng, int(rng.integers(30, 80))) for _ in range(57)]
    p = tmp_path / "x.fastq"
    simulate.write_fastq(str(p), reads)
    chunks, n = _collect(str(p))
    assert n == len(reads)
    flat = []
    for c in chunks:
        for i in range(c.count):
            flat.append(dna.decode(c.bases[i, : c.lengths[i]]))
    assert flat == reads


def test_roundtrip_gzip(tmp_path, rng):
    reads = [simulate.random_seq(rng, 50) for _ in range(23)]
    p = tmp_path / "x.fastq.gz"
    simulate.write_fastq(str(p), reads, gzip_out=True)
    chunks, n = _collect(str(p))
    assert n == len(reads)


def test_multi_member_gzip(tmp_path, rng):
    """flate2 MultiGzDecoder semantics: concatenated gzip members all
    decode (input.rs:63-83)."""
    import gzip

    reads1 = [simulate.random_seq(rng, 40) for _ in range(5)]
    reads2 = [simulate.random_seq(rng, 40) for _ in range(7)]
    blob = b""
    for rs in (reads1, reads2):
        text = "".join(f"@r\n{r}\n+\n{'I' * len(r)}\n" for r in rs)
        blob += gzip.compress(text.encode())
    p = tmp_path / "m.fastq.gz"
    p.write_bytes(blob)
    chunks, n = _collect(str(p))
    assert n == 12


def test_chunk_boundary_split(tmp_path, rng):
    """Records split across read-chunk boundaries must reassemble."""
    reads = [simulate.random_seq(rng, 61) for _ in range(101)]
    p = tmp_path / "x.fastq"
    simulate.write_fastq(str(p), reads)
    chunks, n = _collect(str(p), chunk_bytes=97)  # absurdly small chunks
    assert n == len(reads)
    flat = []
    for c in chunks:
        for i in range(c.count):
            flat.append(dna.decode(c.bases[i, : c.lengths[i]]))
    assert flat == reads


def test_extension_rejected(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("@r\nACGT\n+\nIIII\n")
    with pytest.raises(fastq.FastqFormatError, match="only works with"):
        list(fastq.read_fastq(str(p)))


def test_bad_format_detected(tmp_path):
    p = tmp_path / "x.fastq"
    p.write_text("ACGTACGTACGT\nACGT\n+\nIIII\n")
    with pytest.raises(fastq.FastqFormatError, match="first line"):
        list(fastq.read_fastq(str(p)))


def test_quality_phred(tmp_path):
    p = tmp_path / "x.fastq"
    p.write_text("@r\nACGT\n+\n!I5#\n")
    chunks, n = _collect(str(p))
    q = chunks[0].quals[0, :4]
    assert list(q) == [0, ord("I") - 33, ord("5") - 33, 2]


def test_truncated_final_record_dropped(tmp_path):
    p = tmp_path / "x.fastq"
    p.write_text("@r\nACGT\n+\nIIII\n@r2\nACGT\n+\n")  # missing qual line
    chunks, n = _collect(str(p))
    assert n == 1


def test_batcher_fixed_shapes(tmp_path, rng):
    reads = [simulate.random_seq(rng, int(rng.integers(30, 90))) for _ in range(70)]
    p = tmp_path / "x.fastq"
    simulate.write_fastq(str(p), reads)
    bs = list(
        batcher.batches(fastq.read_fastq(str(p)), batch_size=32, min_width=64)
    )
    assert len(bs) == 3
    assert all(b.bases.shape[0] == 32 for b in bs)
    widths = {b.bases.shape[1] for b in bs}
    assert len(widths) == 1  # stable width across batches here
    assert bs[0].n_reads == 32 and bs[2].n_reads == 6
    assert bs[2].read_mask.sum() == 6
    total = sum(b.n_reads for b in bs)
    assert total == 70
    # padding rows are PAD
    assert (bs[2].bases[10] == dna.PAD).all()
