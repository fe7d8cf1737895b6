"""Scheme compiler tests (reference grammar: info.rs:215-310)."""

import numpy as np
import pytest

from ngs_barcode_count_tpu import dna
from ngs_barcode_count_tpu.scheme import (
    KIND_BARCODE,
    KIND_CONST,
    KIND_RANDOM,
    KIND_SAMPLE,
    KIND_WILD,
    parse_scheme_text,
)


def test_example_scheme_fields(example_scheme):
    s = example_scheme
    # [10] sample + 12C + 6B + 4C + 6B + 4C + 6B + 7C + (8) random + 4C
    assert s.length == 10 + 12 + 6 + 4 + 6 + 4 + 6 + 7 + 8 + 4
    assert s.barcode_num == 3
    assert s.barcode_lengths == [6, 6, 6]
    assert s.sample_barcode and s.sample_length == 10
    assert s.random_barcode and s.random_slot.length == 8
    assert s.constant_region_length == 12 + 4 + 4 + 7 + 4
    assert s.format_string == (
        "N" * 10
        + "AGCTACGAATCG"
        + "N" * 6
        + "TGGA"
        + "N" * 6
        + "TGGA"
        + "N" * 6
        + "ACTAGAT"
        + "N" * 8
        + "TAGA"
    )
    assert s.regions_string == (
        "S" * 10
        + "C" * 12
        + "B" * 6
        + "C" * 4
        + "B" * 6
        + "C" * 4
        + "B" * 6
        + "C" * 7
        + "R" * 8
        + "C" * 4
    )


def test_slots(example_scheme):
    s = example_scheme
    assert s.sample_slot.offset == 0 and s.sample_slot.length == 10
    assert [sl.offset for sl in s.barcode_slots] == [22, 32, 42]
    assert s.random_slot.offset == 55


def test_fmt_codes_and_kind(example_scheme):
    s = example_scheme
    assert s.fmt_codes[0] == dna.N  # sample position
    assert s.kind[0] == KIND_SAMPLE
    assert s.fmt_codes[10] == dna.A  # 'A' of AGCTACGAATCG
    assert s.kind[10] == KIND_CONST
    assert s.kind[22] == KIND_BARCODE
    assert s.kind[55] == KIND_RANDOM


def test_explicit_n_wildcard():
    s = parse_scheme_text("ACNNGT\n{4}\n")
    assert s.length == 10
    assert list(s.kind[:6]) == [
        KIND_CONST,
        KIND_CONST,
        KIND_WILD,
        KIND_WILD,
        KIND_CONST,
        KIND_CONST,
    ]
    # regions_string excludes explicit N runs (reference info.rs:287-295)
    assert s.regions_string == "CCCC" + "BBBB"
    assert s.constant_region_length == 4


def test_comment_lines_removed():
    s1 = parse_scheme_text("# a comment\nACGT\n{4}\n")
    s2 = parse_scheme_text("ACGT\n{4}\n")
    assert s1.format_string == s2.format_string


def test_lowercase_constants_uppercased():
    s = parse_scheme_text("acgt\n{4}\n")
    assert s.format_string == "ACGT" + "NNNN"


def test_requires_counted_barcode():
    with pytest.raises(ValueError):
        parse_scheme_text("ACGT\n")


def test_multiple_sample_rejected():
    with pytest.raises(ValueError):
        parse_scheme_text("[8]\nACGT\n[8]\n{4}\n")


def test_display_block(example_scheme):
    d = example_scheme.display()
    assert d.startswith("-FORMAT-\n")
    assert "S: Sample barcode" in d
    assert "B: Counted barcode" in d
    assert "C: Constant region" in d
    assert "R: Random barcode" in d
