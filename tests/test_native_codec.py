"""Native C++ FASTQ codec vs the NumPy reference encoder: identical
output on every path (plain, gzip, multi-member, CRLF, truncated tail,
width regrowth)."""

import gzip

import numpy as np
import pytest

from ngs_barcode_count_tpu import dna
from ngs_barcode_count_tpu.io import fastq as F
from ngs_barcode_count_tpu.io import native
from ngs_barcode_count_tpu.utils import simulate

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec not built"
)


def _cat(chunks, width):
    bs, qs, ls = [], [], []
    for c in chunks:
        b = c.bases
        q = c.quals
        if b.shape[1] < width:
            b = np.pad(b, ((0, 0), (0, width - b.shape[1])),
                       constant_values=dna.PAD)
            q = np.pad(q, ((0, 0), (0, width - q.shape[1])))
        bs.append(b[:, :width])
        qs.append(q[:, :width])
        ls.append(c.lengths)
    return (
        np.concatenate(bs),
        np.concatenate(qs),
        np.concatenate(ls),
    )


def assert_same(path, min_width=0):
    n_chunks = list(native.read_fastq_native(path, min_width=min_width))
    p_chunks = list(F.read_fastq(path, min_width=min_width))
    width = max(
        max((c.bases.shape[1] for c in n_chunks), default=32),
        max((c.bases.shape[1] for c in p_chunks), default=32),
    )
    nb, nq, nl = _cat(n_chunks, width)
    pb, pq, pl = _cat(p_chunks, width)
    np.testing.assert_array_equal(nl, pl)
    np.testing.assert_array_equal(nb, pb)
    np.testing.assert_array_equal(nq, pq)


def test_plain(tmp_path, rng):
    reads = [simulate.random_seq(rng, int(rng.integers(20, 90)))
             for _ in range(333)]
    p = tmp_path / "x.fastq"
    simulate.write_fastq(str(p), reads)
    assert_same(str(p))


def test_gzip_multimember(tmp_path, rng):
    blob = b""
    for _ in range(3):
        reads = [simulate.random_seq(rng, 44) for _ in range(50)]
        text = "".join(f"@r\n{r}\n+\n{'E' * len(r)}\n" for r in reads)
        blob += gzip.compress(text.encode())
    p = tmp_path / "m.fastq.gz"
    p.write_bytes(blob)
    assert_same(str(p))


def test_crlf(tmp_path):
    p = tmp_path / "x.fastq"
    p.write_bytes(b"@r\r\nACGTNacgtn\r\n+\r\nIIIIIIIIII\r\n")
    assert_same(str(p))


def test_truncated_tail_dropped(tmp_path):
    p = tmp_path / "x.fastq"
    p.write_text("@r\nACGT\n+\nIIII\n@r2\nACGT\n+\n")
    chunks = list(native.read_fastq_native(str(p)))
    assert sum(c.count for c in chunks) == 1


def test_width_regrowth(tmp_path, rng):
    """A read longer than the pre-scan width must come through intact."""
    short = [simulate.random_seq(rng, 40) for _ in range(10)]
    long_read = simulate.random_seq(rng, 300)
    reads = short + [long_read] + short
    p = tmp_path / "x.fastq"
    simulate.write_fastq(str(p), reads)
    # defeat the pre-scan by limiting it to the head: pre-scan covers 4MB,
    # so emulate with a tiny batch and check the long read's integrity
    chunks = list(native.read_fastq_native(str(p), batch_reads=4))
    got = []
    for c in chunks:
        for i in range(c.count):
            got.append(dna.decode(c.bases[i, : c.lengths[i]]))
    assert got == reads


def test_format_check(tmp_path):
    p = tmp_path / "x.fastq"
    p.write_text("ACGTACGTACGT\nACGT\n+\nIIII\n")
    with pytest.raises(F.FastqFormatError, match="first line"):
        list(native.read_fastq_native(str(p)))


def test_extension_check(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("@r\nACGT\n+\nIIII\n")
    with pytest.raises(F.FastqFormatError, match="only works with"):
        list(native.read_fastq_native(str(p)))


def test_phred_values(tmp_path):
    p = tmp_path / "x.fastq"
    p.write_text("@r\nACGT\n+\n!I5#\n")
    c = list(native.read_fastq_native(str(p)))[0]
    assert list(c.quals[0, :4]) == [0, ord("I") - 33, ord("5") - 33, 2]


def test_packed_simd_vs_python_adversarial(tmp_path, rng):
    """Differential pin of the SIMD packed encoder (fastq_codec.cpp
    pack_seq/count_exceptions, AVX2+pext fast path) against a
    pure-Python restatement, on adversarial sequences: lengths spanning
    the 32-byte vector boundary, lowercase bases, N runs, punctuation,
    and high (>=0x80) bytes.  Exceptions must come out in position
    order with the packed lanes zeroed."""
    alphabet = list("ACGT") * 8 + list("Nacgtn.@~") + ["\x80", "\xfe"]
    seqs = []
    for ln in [0, 1, 3, 4, 31, 32, 33, 63, 64, 65, 96, 100]:
        for _ in range(4):
            seqs.append(
                "".join(alphabet[i] for i in rng.integers(0, len(alphabet), ln))
            )
    seqs.append("A" * 31 + "N")        # exception on the vector tail
    seqs.append("N" * 64)              # all-exception read
    path = tmp_path / "adv.fastq"
    # quality strings sweep the clamp edges of the vectorized Phred
    # conversion: below 33 (-> 0), the normal range, and >126 (-> 93)
    qual_alphabet = [chr(c) for c in [1, 32, 33, 34, 74, 125, 126, 200, 255]]
    quals = []
    with open(path, "w", encoding="latin-1") as f:
        for i, s in enumerate(seqs):
            q = "".join(
                qual_alphabet[(i + j) % len(qual_alphabet)]
                for j in range(len(s))
            )
            quals.append(q)
            f.write(f"@r{i}\n{s}\n+\n{q}\n")

    batches = list(
        native.read_fastq_native_packed(
            str(path), batch_reads=16, check_format=False, with_quals=True
        )
    )
    got = 0
    for pb in batches:
        width = pb.width
        exc_pairs = [
            (int(i), int(v))
            for i, v in zip(pb.exc_idx, pb.exc_val)
            if i >= 0
        ]
        # reconstruct expected wire content row by row
        exp_exc = []
        for r in range(pb.n_reads):
            s = seqs[got + r]
            assert pb.lengths[r] == len(s)
            row = np.zeros(width // 4, np.uint8)
            for j, ch in enumerate(s):
                code = {"A": 0, "C": 1, "G": 2, "T": 3}.get(ch, 0)
                row[j >> 2] |= code << ((j & 3) * 2)
                if ch not in "ACGT":
                    exp_exc.append(
                        (r * width + j, int(dna.ASCII_TO_CODE[ord(ch)]))
                    )
            np.testing.assert_array_equal(pb.packed[r], row, err_msg=s)
            exp_q = np.array(
                [min(max(ord(c) - 33, 0), 93) for c in quals[got + r]],
                np.int8,
            )
            np.testing.assert_array_equal(pb.quals[r, : len(s)], exp_q)
        assert exc_pairs == exp_exc
        got += pb.n_reads
    assert got == len(seqs)
