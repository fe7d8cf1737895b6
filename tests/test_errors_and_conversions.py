"""MaxSeqErrors budget math (reference doc-tests info.rs:545-612) and
conversion-file loading (info.rs:364-433)."""

import numpy as np
import pytest

from ngs_barcode_count_tpu.conversions import BarcodeConversions
from ngs_barcode_count_tpu.errors import MaxSeqErrors


def test_default_20pct_budgets():
    # Mirrors the reference's doc-test: size 30 constant -> 6, sample 10 -> 2,
    # barcodes 8 -> 1 (info.rs:559,583,607).
    m = MaxSeqErrors.create(None, 10, None, [8, 8, 8], None, 30, 0.0)
    assert m.constant_region == 6
    assert m.sample_barcode == 2
    assert m.barcode == (1, 1, 1)


def test_override_budgets():
    m = MaxSeqErrors.create(3, 10, 2, [8, 8, 8], 3, 30, 0.0)
    assert m.constant_region == 3
    assert m.sample_barcode == 3
    assert m.barcode == (2, 2, 2)


def test_no_sample_barcode():
    m = MaxSeqErrors.create(None, None, None, [6], None, 20, 0.0)
    assert m.sample_size == 0 and m.sample_barcode == 0


def test_display_block():
    m = MaxSeqErrors.create(None, 10, None, [8, 8, 8], None, 30, 0.0)
    d = m.display()
    assert "-BARCODE INFO-" in d
    assert "Constant region size: 30" in d
    assert "Barcode sizes: [8, 8, 8]" in d
    assert "Minimum allowed average read quality score per barcode: 0\n" in d


def test_sample_file_loading(tmp_path):
    p = tmp_path / "samples.csv"
    p.write_text("Barcode,Sample_ID\nAGCATAC,Sample_name_1\nAACTTAC,Sample_name_2\n")
    conv = BarcodeConversions()
    conv.load_sample_file(str(p), 7)
    assert conv.samples_barcode_hash == {
        "AGCATAC": "Sample_name_1",
        "AACTTAC": "Sample_name_2",
    }
    assert conv.sample_set.count == 2
    assert conv.sample_set.onehot.shape == (2, 28)


def test_counted_file_loading(tmp_path):
    p = tmp_path / "bc.csv"
    p.write_text(
        "Barcode,Barcode_ID,Barcode_Number\n"
        "CAGAGAC,Barcode_name_1,1\nTGATTGC,Barcode_name_2,1\n"
        "ATGAAAT,Barcode_name_3,2\nGCGCCAT,Barcode_name_4,2\n"
    )
    conv = BarcodeConversions()
    conv.load_counted_file(str(p), 2, [7, 7])
    assert conv.counted_barcodes_hash[0]["CAGAGAC"] == "Barcode_name_1"
    assert conv.counted_sets[1].sequences == ["ATGAAAT", "GCGCCAT"]


def test_counted_file_missing_position(tmp_path):
    p = tmp_path / "bc.csv"
    p.write_text("Barcode,ID,Num\nCAGAGAC,x,1\n")
    conv = BarcodeConversions()
    with pytest.raises(ValueError, match="missing barcode numers"):
        conv.load_counted_file(str(p), 3, [7, 7, 7])


def test_counted_file_bad_integer(tmp_path):
    p = tmp_path / "bc.csv"
    p.write_text("Barcode,ID,Num\nCAGAGAC,x,one\n")
    conv = BarcodeConversions()
    with pytest.raises(ValueError, match="other than an integer"):
        conv.load_counted_file(str(p), 1, [7])


def test_conversion_barcode_wrong_length_raises(tmp_path):
    """A conversion-file barcode whose length differs from the scheme slot
    is a malformed file: silently padding/truncating it would make it
    permanently unmatchable, so loading must fail loudly."""
    p = tmp_path / "bc.csv"
    p.write_text("Barcode,ID,Num\nCAGA,x,1\n")
    conv = BarcodeConversions()
    with pytest.raises(ValueError, match="4nt but the scheme slot is 7nt"):
        conv.load_counted_file(str(p), 1, [7])
