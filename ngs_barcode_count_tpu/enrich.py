"""DEL single/double synthon enrichment (reference ``ResultsEnrichment``,
info.rs:811-905).

Marginal counts over the combo space: for an n-barcode combo, ``single``
emits n keys with one barcode kept in place and the others blank
("A,,"), ``double`` all C(n,2) in-place pairs ("A,B,", "A,,C", ...).
Counts are accumulated during the Full write pass with the full combo's
count as weight, exactly like the reference (output.rs:346-353).
"""

from __future__ import annotations

from dataclasses import dataclass, field


def single_keys(barcode_string: str) -> list[str]:
    parts = barcode_string.split(",")
    n = len(parts)
    out = []
    for index in range(n):
        cols = ["" for _ in range(n)]
        cols[index] = parts[index]
        out.append(",".join(cols))
    return out


def double_keys(barcode_string: str) -> list[str]:
    parts = barcode_string.split(",")
    n = len(parts)
    out = []
    for first in range(n - 1):
        for add in range(1, n - first):
            cols = ["" for _ in range(n)]
            cols[first] = parts[first]
            cols[first + add] = parts[first + add]
            out.append(",".join(cols))
    return out


@dataclass
class ResultsEnrichment:
    single_hashmap: dict[str, dict[str, int]] = field(default_factory=dict)
    double_hashmap: dict[str, dict[str, int]] = field(default_factory=dict)

    def add_sample_barcodes(self, sample_barcodes: list[str]) -> None:
        for sb in sample_barcodes:
            self.single_hashmap.setdefault(sb, {})
            self.double_hashmap.setdefault(sb, {})

    def add_single(self, sample_id: str, barcode_string: str, count: int) -> None:
        h = self.single_hashmap.get(sample_id)
        if h is None:
            return  # reference silently drops via its empty-hash clone
        for k in single_keys(barcode_string):
            h[k] = h.get(k, 0) + count

    def add_double(self, sample_id: str, barcode_string: str, count: int) -> None:
        h = self.double_hashmap.get(sample_id)
        if h is None:
            return
        for k in double_keys(barcode_string):
            h[k] = h.get(k, 0) + count
