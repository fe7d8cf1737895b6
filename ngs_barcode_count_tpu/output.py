"""Output writers: per-sample count CSVs, merged CSV, enrichment CSVs, and
the appending stats report (reference output.rs:33-611).

Content parity with the reference is row-set + counts: the reference's
row order comes from hashmap iteration, so rows here are written in
sorted-by-code order (canonical and deterministic), with every other
formatting rule — file names (output.rs:144,160,446-449,467), headers
(output.rs:184-196), merged-column sample-ID sort (output.rs:91-97),
merged-row dedup (output.rs:290-337), DNA->ID conversion (output.rs:591-599),
stats layout (output.rs:511-574) — matched exactly, including the
reference's output_counts insertion quirks that misalign the stats file's
name/count pairs (output.rs:171,478-481).
"""

from __future__ import annotations

import datetime as _dt
import os
import sys
from dataclasses import dataclass

from ngs_barcode_count_tpu.enrich import ResultsEnrichment
from ngs_barcode_count_tpu.errors import MaxSeqErrors
from ngs_barcode_count_tpu.scheme import SequenceScheme
from ngs_barcode_count_tpu.stats import SequenceErrors


def _fmt(n: int) -> str:
    return f"{n:,}"


def convert_code(code: str, barcodes_hashmap: list[dict[str, str]]) -> str:
    """DNA combo -> ID combo (output.rs:591-599; raises on unknown code)."""
    return ",".join(
        barcodes_hashmap[i][bc] for i, bc in enumerate(code.split(","))
    )


def millisecond_decimal(elapsed: _dt.timedelta) -> str:
    ms = int(elapsed.total_seconds() * 1000) - int(elapsed.total_seconds()) * 1000
    return f"{ms:03d}"


def elapsed_display(elapsed: _dt.timedelta) -> str:
    total_s = int(elapsed.total_seconds())
    return (
        f"{total_s // 3600} hours, {(total_s // 60) % 60} minutes, "
        f"{total_s % 60}.{millisecond_decimal(elapsed)} seconds"
    )


@dataclass
class ResultsView:
    """Canonical host form of the final counts, produced by the runner
    from the dense device tensor or the keyed host dicts.

    per_sample maps sample key (DNA barcode, raw DNA, or "barcode") to
    {comma-joined DNA combo: count}; in random mode counts are already
    collapsed set-cardinalities.

    When the counts came from the dense device tensor, ``dense_arr``
    carries it as [n_samples, r1, ..., rn] with ``dense_sample_keys``
    naming each row: enrichment marginals then reduce over tensor axes
    (info.rs:811-905 rebuilt as axis sums) instead of walking per-row
    host dicts.
    """

    per_sample: dict[str, dict[str, int]]
    dense_arr: "object | None" = None  # np.ndarray, avoids hard np import
    dense_sample_keys: list[str] | None = None


@dataclass
class WriterConfig:
    fastq: str
    format: str
    sample_barcodes_option: str | None
    counted_barcodes_option: str | None
    output_dir: str
    prefix: str
    merge_output: bool
    enrich: bool


_FULL, _SINGLE, _DOUBLE = "Full", "Single", "Double"


class WriteFiles:
    """Mirrors the reference's WriteFiles driver (output.rs:48-485)."""

    def __init__(
        self,
        results: ResultsView,
        scheme: SequenceScheme,
        counted_barcodes_hash: list[dict[str, str]],
        samples_barcode_hash: dict[str, str],
        config: WriterConfig,
    ):
        self.results = results
        self.scheme = scheme
        self.counted_barcodes_hash = counted_barcodes_hash
        self.samples_barcode_hash = samples_barcode_hash
        self.config = config
        self.enriched = ResultsEnrichment()
        self.compounds_written: set[str] = set()
        self.output_files: list[str] = []
        self.output_counts: list[int] = []
        self.merged_count = 0
        self.merge_text: list[str] = []

    # -- helpers -----------------------------------------------------------

    def _sample_name(self, sample_barcode: str) -> str:
        if self.samples_barcode_hash:
            return self.samples_barcode_hash.get(sample_barcode, "barcode")
        return sample_barcode

    def _sorted_samples(self, keys: list[str]) -> list[str]:
        if self.samples_barcode_hash:
            return sorted(
                keys,
                key=lambda b: self.samples_barcode_hash.get(b, "barcode"),
            )
        return sorted(keys)

    def _create_header(self) -> str:
        if self.scheme.barcode_num > 1:
            return ",".join(
                f"Barcode_{i + 1}" for i in range(self.scheme.barcode_num)
            )
        return "Barcode"

    def _counts_for(self, enrichment: str, sample_barcode: str) -> dict[str, int]:
        if enrichment == _SINGLE:
            return self.enriched.single_hashmap.get(sample_barcode, {})
        if enrichment == _DOUBLE:
            return self.enriched.double_hashmap.get(sample_barcode, {})
        return self.results.per_sample.get(sample_barcode, {})

    # -- main entry --------------------------------------------------------

    def write_counts_files(self) -> None:
        sample_barcodes = list(self.results.per_sample.keys())
        self._enrich_precomputed = False
        if self.config.enrich:
            self.enriched.add_sample_barcodes(sample_barcodes)
            if self.results.dense_arr is not None:
                self._precompute_enrichment_dense()
                self._enrich_precomputed = True
        sample_barcodes = self._sorted_samples(sample_barcodes)

        merge_output = self.config.merge_output
        if merge_output and len(sample_barcodes) == 1:
            print(
                "Merged file cannot be created without multiple sample barcodes",
                file=sys.stderr,
            )
            print()
            merge_output = False
            self.config.merge_output = False

        header = self._create_header()
        if merge_output:
            merged_header = header + "".join(
                f",{self._sample_name(sb)}" for sb in sample_barcodes
            )
            self.merge_text = [merged_header + "\n"]

        for sample_barcode in sample_barcodes:
            name = self._sample_name(sample_barcode)
            file_name = f"{self.config.prefix}_{name}_counts.csv"
            print(file_name)
            self.output_files.append(file_name)
            path = os.path.join(self.config.output_dir, file_name)
            count = self._write_sample_file(
                path, header, sample_barcode, sample_barcodes, _FULL
            )
            self.output_counts.append(count)

        if merge_output:
            merged_file_name = f"{self.config.prefix}_counts.all.csv"
            print(merged_file_name)
            print(f"Barcodes counted: {_fmt(self.merged_count)}")
            self.output_files.append(merged_file_name)
            with open(
                os.path.join(self.config.output_dir, merged_file_name), "w"
            ) as f:
                f.write("".join(self.merge_text))
            self.merge_text = []
            # reference quirk: merged count inserted at index 0
            # (output.rs:171), misaligning the stats name/count zip.
            self.output_counts.insert(0, self.merged_count)
            self.merged_count = 0

        if self.config.enrich:
            self._write_enriched_files(_SINGLE)
            if self.scheme.barcode_num > 2:
                self._write_enriched_files(_DOUBLE)

    def _write_sample_file(
        self,
        path: str,
        header: str,
        sample_barcode: str,
        sample_barcodes: list[str],
        enrichment: str,
    ) -> int:
        if enrichment == _FULL and self._dense_writable():
            return self._write_sample_file_dense(
                path, header, sample_barcode, sample_barcodes
            )
        counts = self._counts_for(enrichment, sample_barcode)
        rows: list[str] = [header + ",Count\n"]
        merge = bool(self.merge_text)  # merged header present iff merging
        n = 0
        for code in sorted(counts.keys()):
            count = counts[code]
            n += 1
            # reference progress cadence: a counter line every 50,000
            # written rows (output.rs:275-281)
            if n % 50_000 == 0:
                print(f"Barcodes counted: {_fmt(n)}\r", end="", flush=True)
            if enrichment == _FULL and self.counted_barcodes_hash:
                written = convert_code(code, self.counted_barcodes_hash)
            else:
                written = code
            if merge and code not in self.compounds_written:
                self.compounds_written.add(code)
                self.merged_count += 1
                row = [written]
                for sb in sample_barcodes:
                    row.append(str(self._counts_for(enrichment, sb).get(code, 0)))
                self.merge_text.append(",".join(row) + "\n")
            rows.append(f"{written},{count}\n")
            if (
                enrichment == _FULL
                and self.config.enrich
                and not self._enrich_precomputed
            ):
                self.enriched.add_single(sample_barcode, written, count)
                if self.scheme.barcode_num > 2:
                    self.enriched.add_double(sample_barcode, written, count)
        with open(path, "w") as f:
            f.write("".join(rows))
        return n

    # -- dense fast path -----------------------------------------------------
    #
    # When the counts live in the dense device tensor, the Full-pass CSVs
    # are assembled from the tensor with vectorized numpy string ops
    # instead of walking per-sample dicts (runner.results_view skips
    # materializing those dicts via lazy_dense).  Byte-identical output:
    # the DNA-sorted row order falls out of per-position string argsorts
    # (fields are fixed-width, so whole-string lexicographic order equals
    # position-major rank order), the 50k progress cadence is preserved
    # by 50k-row chunks, and merged-row dedup uses a combo-index mask
    # (equivalent to the reference's compounds_written set for the Full
    # pass: Full codes have every field non-blank, so they can never
    # collide with Single/Double keys in the shared set, output.rs:292).
    # ~4x the dict walk on a 96^3-combo DEL run.

    def _dense_writable(self) -> bool:
        return (
            self.results.dense_arr is not None
            and self.results.dense_sample_keys is not None
            and bool(self.counted_barcodes_hash)
        )

    def _dense_write_ctx(self):
        if getattr(self, "_dense_ctx", None) is not None:
            return self._dense_ctx
        import numpy as np

        arr = np.asarray(self.results.dense_arr)
        n_samples = arr.shape[0]
        flat = arr.reshape(n_samples, -1)
        n = self.scheme.barcode_num
        radix = arr.shape[1:]
        # DNA-sorted combo order: cartesian product of per-position
        # string-sorted candidate orders, position 0 most significant
        # (matches sorted(per_sample[s].keys()) on the comma-joined codes)
        sorted_flat = np.zeros((), np.int64)
        for j in range(n):
            seqs = self._dense_seqs(j, radix[j])
            perm = np.argsort(np.array(seqs))
            sorted_flat = sorted_flat[..., None] * radix[j] + perm
        sorted_flat = sorted_flat.ravel()
        # written (converted) string table in flat-combo order; exact
        # convert_code semantics (KeyError on unknown is impossible here:
        # dense candidates come from the conversion file itself)
        written = np.zeros((), dtype="U1")
        for j in range(n):
            seqs = self._dense_seqs(j, radix[j])
            ids = np.array([self.counted_barcodes_hash[j][s] for s in seqs])
            if j:
                written = np.char.add(
                    np.char.add(written[..., None], ","), ids
                )
            else:
                written = ids
        written = written.ravel()
        self._dense_ctx = {
            "flat": flat,
            "key_to_row": {
                k: i for i, k in enumerate(self.results.dense_sample_keys)
            },
            "sorted_flat": sorted_flat,
            "written": written,
            "merged_mask": np.zeros(flat.shape[1], bool),
        }
        return self._dense_ctx

    def _write_sample_file_dense(
        self,
        path: str,
        header: str,
        sample_barcode: str,
        sample_barcodes: list[str],
    ) -> int:
        import numpy as np

        ctx = self._dense_write_ctx()
        row = ctx["key_to_row"].get(sample_barcode)
        sorted_flat = ctx["sorted_flat"]
        if row is None:
            vals = np.zeros(0, np.int64)
            ids = np.zeros(0, np.int64)
        else:
            vals = ctx["flat"][row][sorted_flat]
            keep = np.flatnonzero(vals)
            ids = sorted_flat[keep]
            vals = vals[keep]
        written = ctx["written"]
        merge = bool(self.merge_text)
        chunks = [header + ",Count\n"]
        CH = 50_000
        for start in range(0, len(ids), CH):
            ch = ids[start : start + CH]
            body = np.char.add(
                np.char.add(np.char.add(written[ch], ","),
                            vals[start : start + CH].astype("U12")),
                "\n",
            )
            chunks.append("".join(body.tolist()))
            if len(ch) == CH:
                print(
                    f"Barcodes counted: {_fmt(start + CH)}\r",
                    end="", flush=True,
                )
        if merge and len(ids):
            mask = ctx["merged_mask"]
            new = ids[~mask[ids]]
            mask[new] = True
            self.merged_count += len(new)
            rows = written[new]
            for sb in sample_barcodes:
                r = ctx["key_to_row"].get(sb)
                col = (
                    ctx["flat"][r][new]
                    if r is not None
                    else np.zeros(len(new), np.int64)
                )
                rows = np.char.add(
                    np.char.add(rows, ","), col.astype("U12")
                )
            self.merge_text.extend(np.char.add(rows, "\n").tolist())
        with open(path, "w") as f:
            f.write("".join(chunks))
        return int(len(ids))

    def _precompute_enrichment_dense(self) -> None:
        """Enrichment marginals as tensor axis-reductions: single[j] =
        sum over every axis but (sample, j); double[(j,k)] likewise.
        Identical totals to the per-row accumulation (each is the sum of
        full counts sharing the kept barcode IDs — ID collisions merge
        through the += just like repeated dict keys)."""
        import numpy as np

        arr = np.asarray(self.results.dense_arr)
        keys = self.results.dense_sample_keys
        n = self.scheme.barcode_num
        axes = tuple(range(1, n + 1))
        # per-position converted ID tables (dense mode always has the
        # counted file, so conversion mirrors the Full pass's written
        # strings)
        id_tables = []
        for j in range(n):
            h = (
                self.counted_barcodes_hash[j]
                if self.counted_barcodes_hash
                else {}
            )
            size = arr.shape[1 + j]
            # index -> ID string, via the same insertion-ordered sequences
            # used by runner.results_view
            seqs = self._dense_seqs(j, size)
            id_tables.append([h.get(s, s) for s in seqs])
        for s, sb in enumerate(keys):
            single = self.enriched.single_hashmap.get(sb)
            double = self.enriched.double_hashmap.get(sb)
            if single is None:
                continue
            for j in range(n):
                keep = tuple(a for a in axes if a != 1 + j)
                marg = arr[s : s + 1].sum(axis=keep)[0]
                nz = np.flatnonzero(marg)
                for idx in nz:
                    cols = [""] * n
                    cols[j] = id_tables[j][int(idx)]
                    k = ",".join(cols)
                    single[k] = single.get(k, 0) + int(marg[idx])
            if n > 2 and double is not None:
                for j in range(n - 1):
                    for k2 in range(j + 1, n):
                        keep = tuple(
                            a for a in axes if a != 1 + j and a != 1 + k2
                        )
                        marg = arr[s : s + 1].sum(axis=keep)[0]
                        nzr, nzc = np.nonzero(marg)
                        for r, c in zip(nzr, nzc):
                            cols = [""] * n
                            cols[j] = id_tables[j][int(r)]
                            cols[k2] = id_tables[k2][int(c)]
                            kk = ",".join(cols)
                            double[kk] = double.get(kk, 0) + int(marg[r, c])

    def _dense_seqs(self, j: int, size: int) -> list[str]:
        """Position j's candidate DNA strings in index order (the same
        order runner.results_view uses to name combos)."""
        h = self.counted_barcodes_hash[j] if self.counted_barcodes_hash else {}
        seqs = list(h.keys())
        if len(seqs) != size:
            raise ValueError(
                f"counted set {j} size {len(seqs)} != tensor axis {size}"
            )
        return seqs

    def _write_enriched_files(self, enrichment: str) -> None:
        source = (
            self.enriched.single_hashmap
            if enrichment == _SINGLE
            else self.enriched.double_hashmap
        )
        sample_barcodes = self._sorted_samples(list(source.keys()))
        header = self._create_header()
        if self.config.merge_output:
            merged_header = header + "".join(
                f",{self._sample_name(sb)}" for sb in sample_barcodes
            )
            self.merge_text = [merged_header + "\n"]

        for sample_barcode in sample_barcodes:
            name = self._sample_name(sample_barcode)
            file_name = (
                f"{self.config.prefix}_{name}_counts.{enrichment}.csv"
            )
            print(file_name)
            self.output_files.append(file_name)
            path = os.path.join(self.config.output_dir, file_name)
            count = self._write_sample_file(
                path, header, sample_barcode, sample_barcodes, enrichment
            )
            self.output_counts.append(count)

        if self.config.merge_output:
            merged_file_name = (
                f"{self.config.prefix}_counts.all.{enrichment}.csv"
            )
            print(merged_file_name)
            self.output_files.append(merged_file_name)
            with open(
                os.path.join(self.config.output_dir, merged_file_name), "w"
            ) as f:
                f.write("".join(self.merge_text))
            print(f"Barcodes counted: {_fmt(self.merged_count)}")
            self.merge_text = []
            # reference quirk: inserted before this pass's sample counts
            # (output.rs:478-481).
            self.output_counts.insert(
                len(self.output_counts) - len(sample_barcodes), self.merged_count
            )
            self.merged_count = 0

    # -- stats report ------------------------------------------------------

    def write_stats_file(
        self,
        start_time: _dt.datetime,
        max_errors: MaxSeqErrors,
        seq_errors: SequenceErrors,
        total_reads: int,
        scheme: SequenceScheme,
        now: _dt.datetime | None = None,
    ) -> None:
        """Append the run report (output.rs:488-576), byte-compatible."""
        path = os.path.join(
            self.config.output_dir, f"{self.config.prefix}_barcode_stats.txt"
        )
        now = now or _dt.datetime.now()
        elapsed = now - start_time
        parts = [
            "-TIME INFORMATION-\n"
            f"Start: {start_time.strftime('%Y-%m-%d %H:%M:%S')}\n"
            f"Finish: {now.strftime('%Y-%m-%d %H:%M:%S')}\n"
            f"Total time: {elapsed_display(elapsed)}\n\n",
            "-INPUT FILES-\n"
            f"Fastq: {self.config.fastq}\n"
            f"Format: {self.config.format}\n"
            f"Samples: {self.config.sample_barcodes_option or 'None'}\n"
            f"Barcodes: {self.config.counted_barcodes_option or 'None'}\n\n",
            f"{scheme.display()}\n\n",
            f"{max_errors.display()}\n",
            "-RESULTS-\n"
            f"Total sequences:             {_fmt(total_reads)}\n"
            f"{seq_errors.display()}\n\n",
            "-OUTPUT FILES-\n",
        ]
        for file_name, count in zip(self.output_files, self.output_counts):
            parts.append(
                f"File & barcodes counted: {file_name}\t{_fmt(count)}\n"
            )
        parts.append("\n")
        if self.config.fastq.endswith("gz") and total_reads < 1_000_000:
            warning = (
                "WARNING: The program may have stopped early with the gzipped "
                "file.  Unzip the fastq.gz and rerun the algorithm on the "
                "unzipped fastq file if the number of reads is expected to be "
                "above 1,000,000 "
            )
            print(f"\n{warning}\n")
            parts.append(f"\n{warning}\n")
        parts.append("-" * 98 + "\n\n\n")
        with open(path, "a") as f:
            f.write("".join(parts))
