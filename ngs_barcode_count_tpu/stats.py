"""Run statistics counters (reference ``SequenceErrors``, info.rs:16-139).

The reference keeps six atomic counters bumped once per read; here each
decoded batch produces a ``[6]`` int64 vector on device (summed masks) that
is added into this host-side accumulator, and across a mesh the vector is
psum-merged before the host add (parallel/mesh.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# Order of the device-side counter vector.
CONSTANT_REGION = 0
SAMPLE_BARCODE = 1
BARCODE = 2
MATCHED = 3
DUPLICATES = 4
LOW_QUALITY = 5
NUM_COUNTERS = 6


def _fmt(n: int) -> str:
    return f"{n:,}"


@dataclass
class SequenceErrors:
    counters: np.ndarray = field(
        default_factory=lambda: np.zeros(NUM_COUNTERS, dtype=np.int64)
    )

    def add_vector(self, vec) -> None:
        """Merge a device counter vector (shape [NUM_COUNTERS])."""
        self.counters += np.asarray(vec, dtype=np.int64)

    def constant_region_error(self, n: int = 1) -> None:
        self.counters[CONSTANT_REGION] += n

    def sample_barcode_error(self, n: int = 1) -> None:
        self.counters[SAMPLE_BARCODE] += n

    def barcode_error(self, n: int = 1) -> None:
        self.counters[BARCODE] += n

    def correct_match(self, n: int = 1) -> None:
        self.counters[MATCHED] += n

    def duplicated(self, n: int = 1) -> None:
        self.counters[DUPLICATES] += n

    def low_quality_barcode(self, n: int = 1) -> None:
        self.counters[LOW_QUALITY] += n

    @property
    def matched(self) -> int:
        return int(self.counters[MATCHED])

    def display(self) -> str:
        """Identical layout to the reference's Display (info.rs:141-172)."""
        c = self.counters
        return (
            f"Correctly matched sequences: {_fmt(int(c[MATCHED]))}\n"
            f"Constant region mismatches:  {_fmt(int(c[CONSTANT_REGION]))}\n"
            f"Sample barcode mismatches:   {_fmt(int(c[SAMPLE_BARCODE]))}\n"
            f"Counted barcode mismatches:  {_fmt(int(c[BARCODE]))}\n"
            f"Duplicates:                  {_fmt(int(c[DUPLICATES]))}\n"
            f"Low quality barcodes:        {_fmt(int(c[LOW_QUALITY]))}"
        )
