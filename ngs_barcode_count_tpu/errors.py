"""Per-region error budgets (reference ``MaxSeqErrors``, info.rs:461-659).

CLI override or the reference's 20% default computed with integer division
(``len / 5`` — info.rs:509,521,530). These are plain scalars passed into
the decode kernels as static arguments.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class MaxSeqErrors:
    constant_region: int
    constant_region_size: int
    sample_barcode: int
    sample_size: int
    barcode: tuple[int, ...]
    barcode_sizes: tuple[int, ...]
    min_quality: float

    @classmethod
    def create(
        cls,
        sample_errors_option: int | None,
        sample_barcode_size_option: int | None,
        barcode_errors_option: int | None,
        barcode_sizes: list[int],
        constant_errors_option: int | None,
        constant_region_size: int,
        min_quality: float,
    ) -> "MaxSeqErrors":
        if sample_barcode_size_option is not None:
            sample_size = sample_barcode_size_option
            max_sample = (
                sample_errors_option
                if sample_errors_option is not None
                else sample_size // 5
            )
        else:
            sample_size = 0
            max_sample = 0
        max_barcode = tuple(
            barcode_errors_option if barcode_errors_option is not None else s // 5
            for s in barcode_sizes
        )
        max_constant = (
            constant_errors_option
            if constant_errors_option is not None
            else constant_region_size // 5
        )
        return cls(
            constant_region=max_constant,
            constant_region_size=constant_region_size,
            sample_barcode=max_sample,
            sample_size=sample_size,
            barcode=max_barcode,
            barcode_sizes=tuple(barcode_sizes),
            min_quality=min_quality,
        )

    def display(self) -> str:
        """The "-BARCODE INFO-" block, matching the reference's Display
        impl byte for byte (info.rs:618-659)."""
        if len(self.barcode_sizes) > 1:
            barcode_size_info = f"Barcode sizes: {list(self.barcode_sizes)}"
            barcode_error_info = (
                "Maximum mismatches allowed per barcode sequence: "
                f"{list(self.barcode)}"
            )
        else:
            barcode_size_info = f"Barcode size: {self.barcode_sizes[0]}"
            barcode_error_info = (
                "Maximum mismatches allowed per barcode sequence: "
                f"{self.barcode[0]}"
            )
        min_q = self.min_quality
        min_q_str = str(int(min_q)) if float(min_q).is_integer() else str(min_q)
        return (
            "-BARCODE INFO-\n"
            f"Constant region size: {self.constant_region_size}\n"
            f"Maximum mismatches allowed per sequence: {self.constant_region}\n"
            "--------------------------------------------------------------\n"
            f"Sample barcode size: {self.sample_size}\n"
            f"Maximum mismatches allowed per sequence: {self.sample_barcode}\n"
            "--------------------------------------------------------------\n"
            f"{barcode_size_info}\n"
            f"{barcode_error_info}\n"
            "--------------------------------------------------------------\n"
            "Minimum allowed average read quality score per barcode: "
            f"{min_q_str}\n"
        )
