"""Vectorized synthetic FASTQ generation (NumPy, ~10M reads/min) for
benchmarks: builds the whole record byte matrix at once instead of
per-read Python strings (utils/simulate.py is the small-scale,
ground-truth-controlled variant used by tests)."""

from __future__ import annotations

import numpy as np

from ngs_barcode_count_tpu.scheme import KIND_WILD, SequenceScheme

_BASE_ASCII = np.frombuffer(b"ACGT", dtype=np.uint8)


def generate_reads(
    rng: np.random.Generator,
    scheme: SequenceScheme,
    n_reads: int,
    sample_seqs: list[str],
    counted_seqs: list[list[str]],
    flank_left: int = 4,
    flank_right: int = 6,
    sub_error_rate: float = 0.005,
    qual_range: tuple[int, int] = (30, 41),
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (seq_ascii [n, L] uint8, qual_ascii [n, L] uint8)."""
    F = scheme.length
    L = flank_left + F + flank_right
    seq = _BASE_ASCII[rng.integers(0, 4, (n_reads, L))]

    core = np.empty((n_reads, F), dtype=np.uint8)
    # constants + wildcards
    fmt = np.frombuffer(
        scheme.format_string.encode(), dtype=np.uint8
    ).copy()
    core[:] = fmt[None, :]
    wild_pos = np.flatnonzero(scheme.kind == KIND_WILD)
    if len(wild_pos):
        core[:, wild_pos] = _BASE_ASCII[
            rng.integers(0, 4, (n_reads, len(wild_pos)))
        ]
    # sample slot
    if scheme.sample_slot is not None:
        s = scheme.sample_slot
        tab = np.stack(
            [np.frombuffer(x.encode(), dtype=np.uint8) for x in sample_seqs]
        )
        pick = rng.integers(0, len(sample_seqs), n_reads)
        core[:, s.offset : s.offset + s.length] = tab[pick]
    # counted slots
    for i, slot in enumerate(scheme.barcode_slots):
        tab = np.stack(
            [np.frombuffer(x.encode(), dtype=np.uint8) for x in counted_seqs[i]]
        )
        pick = rng.integers(0, len(tab), n_reads)
        core[:, slot.offset : slot.offset + slot.length] = tab[pick]
    # random slot
    if scheme.random_slot is not None:
        s = scheme.random_slot
        core[:, s.offset : s.offset + s.length] = _BASE_ASCII[
            rng.integers(0, 4, (n_reads, s.length))
        ]
    seq[:, flank_left : flank_left + F] = core

    # substitution errors anywhere
    if sub_error_rate > 0:
        errs = rng.random((n_reads, L)) < sub_error_rate
        repl = _BASE_ASCII[rng.integers(0, 4, (n_reads, L))]
        seq = np.where(errs, repl, seq)

    qual = rng.integers(*qual_range, (n_reads, L)).astype(np.uint8) + 33
    return seq, qual


def write_fastq_bytes(
    path: str, seq: np.ndarray, qual: np.ndarray, append: bool = False
) -> None:
    """Assemble '@r\\nSEQ\\n+\\nQUAL\\n' records as one byte matrix."""
    n, L = seq.shape
    rec = 3 + (L + 1) + 2 + (L + 1)
    buf = np.empty((n, rec), dtype=np.uint8)
    buf[:, 0] = ord("@")
    buf[:, 1] = ord("r")
    buf[:, 2] = ord("\n")
    buf[:, 3 : 3 + L] = seq
    buf[:, 3 + L] = ord("\n")
    buf[:, 4 + L] = ord("+")
    buf[:, 5 + L] = ord("\n")
    buf[:, 6 + L : 6 + 2 * L] = qual
    buf[:, 6 + 2 * L] = ord("\n")
    with open(path, "ab" if append else "wb") as f:
        f.write(buf.tobytes())
