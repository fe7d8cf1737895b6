"""Generate FASTQ fixtures for the C codec sanitizer harness.

Usage: python -m ngs_barcode_count_tpu.io._native.make_fixtures OUTDIR
"""

import gzip
import os
import sys

import numpy as np


def main(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(7)
    bases = "ACGTN"
    recs = []
    for i in range(5000):
        n = int(rng.integers(20, 150))
        seq = "".join(bases[int(b)] for b in rng.integers(0, 5, n))
        qual = "".join(chr(int(q)) for q in rng.integers(33, 74, n))
        recs.append(f"@read{i} extra meta\n{seq}\n+\n{qual}\n")
    blob = "".join(recs).encode()
    with open(os.path.join(outdir, "plain.fastq"), "wb") as f:
        f.write(blob)
    # multi-member gzip
    half = len(recs) // 2
    gz = gzip.compress("".join(recs[:half]).encode()) + gzip.compress(
        "".join(recs[half:]).encode()
    )
    with open(os.path.join(outdir, "multi.fastq.gz"), "wb") as f:
        f.write(gz)
    # pathological: CRLF + truncated tail + huge read
    odd = (
        "@r1\r\nACGT\r\n+\r\nIIII\r\n"
        + "@r2\n" + "A" * 5000 + "\n+\n" + "I" * 5000 + "\n"
        + "@r3\nACGT\n+\n"
    )
    with open(os.path.join(outdir, "odd.fastq"), "wb") as f:
        f.write(odd.encode())
    print(f"fixtures written to {outdir}")


if __name__ == "__main__":
    main(sys.argv[1])
