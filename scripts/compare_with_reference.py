#!/usr/bin/env python
"""Count-parity comparison against the original Rust ``barcode-count``.

SURVEY.md §4(b): when the reference binary is available, this drives both
tools over the same inputs and asserts (row set, counts) equality for
every output CSV — the canonical definition of parity (the reference's
row order is hashmap iteration and is not reproducible).

Usage:
  python scripts/compare_with_reference.py \
      --reference-bin /path/to/barcode-count \
      -f reads.fastq -q scheme.txt [-s samples.csv] [-c barcodes.csv] \
      [--merge-output] [--enrich] [--min-quality N] [--max-errors-* N]

Exit 0 on full parity; 1 with a per-file diff summary otherwise.
"""

from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys
import tempfile


def load_counts(path: str) -> dict[tuple[str, ...], str]:
    with open(path) as f:
        rows = list(csv.reader(f))
    return {tuple(r[:-1]): r[-1] for r in rows[1:]}


def compare_dir(ours: str, theirs: str) -> list[str]:
    problems = []
    our_files = {
        f.split("_", 1)[1]: f for f in os.listdir(ours) if f.endswith(".csv")
    }
    their_files = {
        f.split("_", 1)[1]: f
        for f in os.listdir(theirs)
        if f.endswith(".csv")
    }
    for suffix in sorted(set(our_files) | set(their_files)):
        if suffix not in our_files:
            problems.append(f"missing in ours: *_{suffix}")
            continue
        if suffix not in their_files:
            problems.append(f"missing in reference output: *_{suffix}")
            continue
        a = load_counts(os.path.join(ours, our_files[suffix]))
        b = load_counts(os.path.join(theirs, their_files[suffix]))
        if a == b:
            print(f"  OK  *_{suffix}: {len(a)} rows identical")
            continue
        only_a = set(a) - set(b)
        only_b = set(b) - set(a)
        diff = {k for k in set(a) & set(b) if a[k] != b[k]}
        problems.append(
            f"*_{suffix}: {len(only_a)} rows only ours, "
            f"{len(only_b)} only reference, {len(diff)} count mismatches"
        )
        for k in list(diff)[:5]:
            problems.append(f"    {','.join(k)}: ours={a[k]} ref={b[k]}")
    return problems


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reference-bin", required=True)
    p.add_argument("-f", "--fastq", required=True)
    p.add_argument("-q", "--sequence-format", dest="format", required=True)
    p.add_argument("-s", "--sample-barcodes")
    p.add_argument("-c", "--counted-barcodes")
    p.add_argument("-m", "--merge-output", action="store_true")
    p.add_argument("-e", "--enrich", action="store_true")
    p.add_argument("--min-quality", default=None)
    p.add_argument("--max-errors-counted-barcode", default=None)
    p.add_argument("--max-errors-sample", default=None)
    p.add_argument("--max-errors-constant", default=None)
    args = p.parse_args()

    common = ["-f", args.fastq, "-q", args.format]
    for flag, val in (
        ("-s", args.sample_barcodes),
        ("-c", args.counted_barcodes),
        ("--min-quality", args.min_quality),
        ("--max-errors-counted-barcode", args.max_errors_counted_barcode),
        ("--max-errors-sample", args.max_errors_sample),
        ("--max-errors-constant", args.max_errors_constant),
    ):
        if val:
            common += [flag, val]
    if args.merge_output:
        common.append("-m")
    if args.enrich:
        common.append("-e")

    with tempfile.TemporaryDirectory() as ours, \
            tempfile.TemporaryDirectory() as theirs:
        print("== running ngs-barcode-count-tpu ==")
        subprocess.run(
            [sys.executable, "-m", "ngs_barcode_count_tpu", *common,
             "-o", ours, "-p", "X", "--no-progress"],
            check=True,
        )
        print("== running reference barcode-count ==")
        subprocess.run(
            [args.reference_bin, *common, "-o", theirs, "-p", "X"],
            check=True,
        )
        print("== comparing ==")
        problems = compare_dir(ours, theirs)
    if problems:
        print("PARITY FAILURES:")
        for line in problems:
            print(" ", line)
        return 1
    print("FULL PARITY")
    return 0


if __name__ == "__main__":
    sys.exit(main())
