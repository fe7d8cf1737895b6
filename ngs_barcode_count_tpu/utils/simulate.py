"""Synthetic FASTQ generation for tests and benchmarks.

The reference repo has no test fixtures beyond three example files
(SURVEY.md section 4); this generator produces FASTQs with known ground
truth from a compiled scheme: reads with configurable flanking bases,
substitution errors, N bases, and quality profiles.
"""

from __future__ import annotations

import numpy as np

from ngs_barcode_count_tpu.scheme import (
    KIND_BARCODE,
    KIND_CONST,
    KIND_RANDOM,
    KIND_SAMPLE,
    KIND_WILD,
    SequenceScheme,
)

_BASES = "ACGT"


def random_seq(rng: np.random.Generator, n: int) -> str:
    return "".join(_BASES[i] for i in rng.integers(0, 4, n))


def make_read(
    rng: np.random.Generator,
    scheme: SequenceScheme,
    sample: str | None,
    counted: list[str],
    random_barcode: str | None = None,
    flank_left: int = 0,
    flank_right: int = 0,
    n_errors: int = 0,
    error_positions: list[int] | None = None,
) -> str:
    """Build a read embedding the scheme at offset ``flank_left`` with the
    given barcodes, then apply substitution errors at constant positions
    (or the given absolute positions)."""
    bc_iter = iter(counted)
    parts: list[str] = []
    p = 0
    while p < scheme.length:
        k = scheme.kind[p]
        j = p
        while j < scheme.length and scheme.kind[j] == k:
            j += 1
        if k == KIND_CONST:
            parts.append(scheme.format_string[p:j])
        elif k == KIND_WILD:
            parts.append(random_seq(rng, j - p))
        elif k == KIND_SAMPLE:
            assert sample is not None and len(sample) == j - p
            parts.append(sample)
        elif k == KIND_RANDOM:
            rb = random_barcode or random_seq(rng, j - p)
            assert len(rb) == j - p
            parts.append(rb)
        elif k == KIND_BARCODE:
            for slot in scheme.barcode_slots:
                if slot.offset == p:
                    bc = next(bc_iter)
                    assert len(bc) == slot.length
                    parts.append(bc)
                    j = p + slot.length
                    break
        p = j
    core = "".join(parts)
    read = random_seq(rng, flank_left) + core + random_seq(rng, flank_right)

    if error_positions is None and n_errors:
        const_pos = [
            flank_left + i
            for i in range(scheme.length)
            if scheme.kind[i] == KIND_CONST
        ]
        error_positions = list(
            rng.choice(const_pos, size=min(n_errors, len(const_pos)), replace=False)
        )
    for pos in error_positions or []:
        old = read[pos]
        new = _BASES[(_BASES.index(old) + 1) % 4] if old in _BASES else "A"
        read = read[:pos] + new + read[pos + 1 :]
    return read


def write_fastq(
    path: str,
    reads: list[str],
    qualities: list[str] | None = None,
    gzip_out: bool = False,
) -> None:
    text = []
    for i, r in enumerate(reads):
        q = qualities[i] if qualities else "I" * len(r)
        text.append(f"@read{i}\n{r}\n+\n{q}\n")
    blob = "".join(text).encode()
    if gzip_out:
        import gzip

        with gzip.open(path, "wb") as f:
            f.write(blob)
    else:
        with open(path, "wb") as f:
            f.write(blob)
