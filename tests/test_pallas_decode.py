"""Fused Pallas decode kernel vs the XLA path: identical flat indices,
status classification, and counters on randomized reads (interpret mode
on CPU; the same suite runs compiled on TPU via NGS_TEST_TPU=1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ngs_barcode_count_tpu import stats
from ngs_barcode_count_tpu.ops import decode as dec
from ngs_barcode_count_tpu.ops import pallas_decode as pdec

from tests.test_decode_vs_oracle import (
    build_plan,
    encode_batch,
    gen_reads,
)


def _strip_random(example_scheme):
    from ngs_barcode_count_tpu.scheme import parse_scheme_text
    from tests.conftest import EXAMPLE_SCHEME

    return parse_scheme_text(EXAMPLE_SCHEME.replace("(8)\n", ""))


@pytest.fixture(scope="module")
def dense_setup(request):
    scheme = _strip_random(None)
    plan, oracle, conv = build_plan(scheme)
    assert plan.dense_counts
    return scheme, plan, oracle, conv


def _run_both(plan, reads, quals, TB=8):
    bases, quality, lengths, mask = encode_batch(reads, quals)
    B, L = bases.shape
    pad = -(-B // TB) * TB - B
    if pad:
        bases = np.concatenate(
            [bases, np.full((pad, L), 6, np.int8)]
        )
        quality = np.concatenate([quality, np.zeros((pad, L), np.int8)])
        lengths = np.concatenate([lengths, np.zeros(pad, np.int32)])
        mask = np.concatenate([mask, np.zeros(pad, bool)])
    n_reads = np.array([B], np.int32)

    fn = pdec.build_pallas_decode(plan, L, TB=TB, interpret=True)
    flat_p, status_p = fn(bases, lengths, n_reads)

    out = dec.keyed_decode_step(plan, bases, quality, lengths, mask)
    valid_x = np.asarray(out["valid"])
    flat_x = np.asarray(out["sample_idx"]) * plan.n_combos + np.asarray(
        out["combo_flat"]
    )
    return (
        np.asarray(flat_p),
        np.asarray(status_p),
        valid_x,
        flat_x,
        np.asarray(out["counters"]),
        B,
    )


def test_pallas_matches_xla_random_reads(dense_setup, rng):
    scheme, plan, oracle, conv = dense_setup
    reads = gen_reads(rng, scheme, 96, err_range=(0, 12))
    quals = ["I" * len(r) for r in reads]
    flat_p, status_p, valid_x, flat_x, counters_x, B = _run_both(
        plan, reads, quals
    )
    valid_p = status_p[:B] == pdec.ST_VALID
    np.testing.assert_array_equal(valid_p, valid_x[:B])
    np.testing.assert_array_equal(
        flat_p[:B][valid_p], flat_x[:B][valid_p]
    )
    assert (status_p[:B] == pdec.ST_CONST).sum() == counters_x[
        stats.CONSTANT_REGION
    ]
    assert (status_p[:B] == pdec.ST_SAMPLE).sum() == counters_x[
        stats.SAMPLE_BARCODE
    ]
    assert (status_p[:B] == pdec.ST_BARCODE).sum() == counters_x[
        stats.BARCODE
    ]


def test_pallas_matches_oracle(dense_setup, rng):
    scheme, plan, oracle, conv = dense_setup
    reads = gen_reads(rng, scheme, 64, err_range=(0, 10))
    # add N noise
    noisy = []
    for r in reads:
        r = list(r)
        for _ in range(int(rng.integers(0, 3))):
            r[int(rng.integers(0, len(r)))] = "N"
        noisy.append("".join(r))
    quals = ["I" * len(r) for r in noisy]
    flat_p, status_p, valid_x, flat_x, counters_x, B = _run_both(
        plan, noisy, quals
    )
    for i, (r, q) in enumerate(zip(noisy, quals)):
        o = oracle.decode(r, q)
        assert (status_p[i] == pdec.ST_VALID) == (o.outcome == "matched"), (
            i, r, o.outcome, status_p[i]
        )


def test_pallas_count_step(dense_setup, rng):
    scheme, plan, oracle, conv = dense_setup
    reads = gen_reads(rng, scheme, 64, err_range=(0, 8))
    quals = ["I" * len(r) for r in reads]
    bases, quality, lengths, mask = encode_batch(reads, quals)
    B, L = bases.shape
    n_reads = np.array([B], np.int32)
    fn = pdec.build_pallas_decode(plan, L, TB=8, interpret=True)
    counts = jnp.zeros(plan.n_samples * plan.n_combos, jnp.int32)
    counters = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    counts, counters = pdec.pallas_dense_count_step(
        plan, fn, counts, counters, bases, lengths, n_reads
    )
    c2, ctr2 = dec.dense_count_step(
        plan,
        jnp.zeros(plan.n_samples * plan.n_combos, jnp.int32),
        jnp.zeros(stats.NUM_COUNTERS, jnp.int32),
        bases, quality, lengths, mask,
    )
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(counters), np.asarray(ctr2))


def test_pallas_quality_gate(rng):
    """Kernel quality path (fused segment means) == XLA path, strict
    quirk semantics included."""
    import jax.numpy as jnp
    from ngs_barcode_count_tpu.conversions import BarcodeConversions

    scheme = _strip_random(None)
    from tests.test_decode_vs_oracle import build_plan

    plan_q, oracle_q, conv_q = build_plan(scheme, min_quality=30.0)
    reads = gen_reads(rng, scheme, 64, err_range=(0, 8))
    quals = []
    for r in reads:
        q = rng.integers(22, 41, len(r)) + 33
        quals.append("".join(chr(int(x)) for x in q))
    bases, quality, lengths, mask = encode_batch(reads, quals)
    B, L = bases.shape
    n_reads = np.array([B], np.int32)
    fn = pdec.build_pallas_decode(plan_q, L, TB=8, interpret=True)
    flat_p, status_p = fn(bases, lengths, n_reads, quality)
    out = dec.keyed_decode_step(plan_q, bases, quality, lengths, mask)
    lowq_p = np.asarray(status_p) == pdec.ST_LOWQ
    valid_p = np.asarray(status_p) == pdec.ST_VALID
    np.testing.assert_array_equal(valid_p, np.asarray(out["valid"]))
    assert lowq_p.sum() == np.asarray(out["counters"])[stats.LOW_QUALITY]
    assert lowq_p.sum() > 0
    # oracle agreement
    for i, (r, q) in enumerate(zip(reads, quals)):
        o = oracle_q.decode(r, q)
        assert (o.outcome == "low_quality") == bool(lowq_p[i]), (i, o.outcome)


def test_pallas_keyed_wire_parity(rng):
    """Keyed-mode kernel emits the exact wire matrix the XLA path does
    (random-barcode scheme with conversion files -> fused layout, and
    raw-DNA scheme -> slot-word layout)."""
    from ngs_barcode_count_tpu.scheme import parse_scheme_text
    from tests.conftest import EXAMPLE_SCHEME
    from tests.test_decode_vs_oracle import build_plan

    # case 1: random scheme + files (fused col0 + random words)
    scheme_r = parse_scheme_text(EXAMPLE_SCHEME)
    plan_r, oracle_r, conv_r = build_plan(scheme_r)
    reads = gen_reads(rng, scheme_r, 64, err_range=(0, 8))
    quals = ["I" * len(r) for r in reads]
    bases, quality, lengths, mask = encode_batch(reads, quals)
    B, L = bases.shape
    n_reads = np.array([B], np.int32)

    kfn = pdec.build_pallas_decode_keyed(plan_r, L, TB=8, interpret=True)
    wire_p, status_p = kfn(bases, lengths, n_reads)
    from ngs_barcode_count_tpu.ops.decode import (
        _keyed_packed_outputs,
        keyed_wire_layout,
    )

    out_x = dec.keyed_decode_step(plan_r, bases, quality, lengths, mask)
    compact = jax.jit(
        lambda: _keyed_packed_outputs(plan_r, out_x)
    )()
    wire_x = np.asarray(compact["wire"])
    wire_p = np.asarray(wire_p)
    valid = np.asarray(out_x["valid"])
    # valid rows must agree entirely; invalid rows only on the valid bit
    layout = keyed_wire_layout(plan_r)
    _, _, s_bits, c_bits = layout["fused"]
    np.testing.assert_array_equal(
        wire_p[valid], wire_x[valid]
    )
    np.testing.assert_array_equal(
        wire_p[:, 0] >> (s_bits + c_bits), valid.astype(np.int32)
    )

    # case 2: raw-DNA scheme (no files): slot words
    scheme_s = parse_scheme_text("ACGTACGT\n{6}\nTTGGCCAA\n")
    plan_s, oracle_s, conv_s = build_plan(scheme_s, with_files=False)
    reads2 = gen_reads(rng, scheme_s, 32, err_range=(0, 2))
    quals2 = ["I" * len(r) for r in reads2]
    b2, q2, l2, m2 = encode_batch(reads2, quals2)
    n2 = np.array([len(reads2)], np.int32)
    kfn2 = pdec.build_pallas_decode_keyed(
        plan_s, b2.shape[1], TB=8, interpret=True
    )
    wire2_p, status2 = kfn2(b2, l2, n2)
    out2 = dec.keyed_decode_step(plan_s, b2, q2, l2, m2)
    compact2 = jax.jit(lambda: _keyed_packed_outputs(plan_s, out2))()
    wire2_x = np.asarray(compact2["wire"])
    valid2 = np.asarray(out2["valid"])
    np.testing.assert_array_equal(
        np.asarray(wire2_p)[valid2], wire2_x[valid2]
    )


def test_pallas_per_slot_fallback_parity(dense_setup, rng, monkeypatch):
    """Schemes whose fused matcher matrix would not fit VMEM fall back
    to per-slot matmuls; that formulation must stay bit-identical."""
    scheme, plan, oracle, conv = dense_setup
    monkeypatch.setattr(pdec, "_FUSED_MATCH_VMEM", 0)
    reads = gen_reads(rng, scheme, 64, err_range=(0, 10))
    quals = ["I" * len(r) for r in reads]
    flat_p, status_p, valid_x, flat_x, counters_x, B = _run_both(
        plan, reads, quals
    )
    valid_p = status_p[:B] == pdec.ST_VALID
    np.testing.assert_array_equal(valid_p, valid_x[:B])
    np.testing.assert_array_equal(flat_p[:B][valid_p], flat_x[:B][valid_p])


def test_pallas_front_key_overflow_fallback(dense_setup, rng, monkeypatch):
    """Exotic formats whose packed repair key would overflow int32 use
    the 4-reduction selection; semantics must not change."""
    scheme, plan, oracle, conv = dense_setup
    monkeypatch.setattr(
        pdec, "_front_key_bound", lambda *a: 1 << 40
    )
    reads = gen_reads(rng, scheme, 64, err_range=(0, 12))
    quals = ["I" * len(r) for r in reads]
    flat_p, status_p, valid_x, flat_x, counters_x, B = _run_both(
        plan, reads, quals
    )
    valid_p = status_p[:B] == pdec.ST_VALID
    np.testing.assert_array_equal(valid_p, valid_x[:B])
    np.testing.assert_array_equal(flat_p[:B][valid_p], flat_x[:B][valid_p])


@pytest.mark.parametrize(
    "split,i8,packed",
    [
        ("1", "0", "0"),  # split-matmul one-hot
        ("0", "1", "0"),  # int8 MXU operands
        ("0", "0", "1"),  # packed single-column scan
        ("1", "0", "1"),  # split + packed scan
        ("1", "1", "0"),  # split + int8
    ],
)
def test_kernel_formulation_variants_bit_identical(
    dense_setup, rng, monkeypatch, split, i8, packed
):
    """Every NGS_KERNEL_* formulation (perf experiments A/B'd on real
    hardware by scripts/r3_perf_session.py) must compute bit-identical
    decode results in interpret mode; Mosaic lowering differences are
    covered separately by scripts/tpu_check.py on the chip."""
    monkeypatch.setenv("NGS_KERNEL_SPLIT_MM", split)
    monkeypatch.setenv("NGS_KERNEL_I8MM", i8)
    monkeypatch.setenv("NGS_KERNEL_PACKED_SCAN", packed)
    scheme, plan, oracle, conv = dense_setup
    reads = gen_reads(rng, scheme, 96, err_range=(0, 12))
    noisy = []
    for r in reads:
        r = list(r)
        for _ in range(int(rng.integers(0, 3))):
            r[int(rng.integers(0, len(r)))] = "N"
        noisy.append("".join(r))
    quals = ["I" * len(r) for r in noisy]
    flat_p, status_p, valid_x, flat_x, counters_x, B = _run_both(
        plan, noisy, quals
    )
    valid_p = status_p[:B] == pdec.ST_VALID
    np.testing.assert_array_equal(valid_p, valid_x[:B])
    np.testing.assert_array_equal(flat_p[:B][valid_p], flat_x[:B][valid_p])
    assert (status_p[:B] == pdec.ST_CONST).sum() == counters_x[
        stats.CONSTANT_REGION
    ]


def test_packed_scan_matrix_bounds(dense_setup):
    """_build_scan picks the packed layout only when the packed sum fits
    f32-exact integers, and I8MM disables it (weights exceed int8)."""
    scheme, plan, oracle, conv = dense_setup
    L = scheme.length + 10
    O = 11
    O_pad = 128
    import os

    os.environ["NGS_KERNEL_PACKED_SCAN"] = "1"
    os.environ.pop("NGS_KERNEL_I8MM", None)
    try:
        W, packed = pdec._build_scan(plan, L, O, O_pad)
        assert packed is not None
        assert W.shape == (5 * L, O_pad)
        b_n, b_w = packed
        # every entry is zero or a single power of two
        vals = np.unique(W)
        for v in vals:
            assert v == 0.0 or (int(v) & (int(v) - 1)) == 0, v
        os.environ["NGS_KERNEL_I8MM"] = "1"
        W2, packed2 = pdec._build_scan(plan, L, O, O_pad)
        assert packed2 is None
        assert W2.shape == (5 * L, 3 * O_pad)
    finally:
        os.environ.pop("NGS_KERNEL_PACKED_SCAN", None)
        os.environ.pop("NGS_KERNEL_I8MM", None)


def test_keyed_variant_wire_parity(rng, monkeypatch):
    """The packed-scan formulation must leave the keyed kernel's wire
    matrix bit-identical too (random-barcode scheme, fused layout)."""
    monkeypatch.setenv("NGS_KERNEL_PACKED_SCAN", "1")
    from ngs_barcode_count_tpu.scheme import parse_scheme_text
    from tests.conftest import EXAMPLE_SCHEME
    from tests.test_decode_vs_oracle import build_plan

    scheme_r = parse_scheme_text(EXAMPLE_SCHEME)
    plan_r, oracle_r, conv_r = build_plan(scheme_r)
    reads = gen_reads(rng, scheme_r, 64, err_range=(0, 8))
    quals = ["I" * len(r) for r in reads]
    bases, quality, lengths, mask = encode_batch(reads, quals)
    B, L = bases.shape
    n_reads = np.array([B], np.int32)
    kfn = pdec.build_pallas_decode_keyed(plan_r, L, TB=8, interpret=True)
    wire_p, status_p = kfn(bases, lengths, n_reads)
    from ngs_barcode_count_tpu.ops.decode import _keyed_packed_outputs

    out_x = dec.keyed_decode_step(plan_r, bases, quality, lengths, mask)
    compact = jax.jit(lambda: _keyed_packed_outputs(plan_r, out_x))()
    valid = np.asarray(out_x["valid"])
    np.testing.assert_array_equal(
        np.asarray(wire_p)[valid], np.asarray(compact["wire"])[valid]
    )


def test_realign_matches_numpy(rng):
    """The log2 lane shifter is an exact gather: R[b,p]=src[b,shift+p]."""
    TB, L, F = 8, 40, 13
    O = L - F + 1
    src = rng.integers(0, 7, (TB, L)).astype(np.float32)
    shift = rng.integers(0, O, (TB, 1)).astype(np.int32)
    got = np.asarray(
        jax.jit(lambda s, sh: pdec._realign(s, sh, L, O, TB, F))(src, shift)
    )
    want = np.stack(
        [src[b, shift[b, 0] : shift[b, 0] + F] for b in range(TB)]
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_hashset_step_equals_xla(tmp_path, rng, monkeypatch):
    """The Pallas-front-end hash-set step must produce bit-identical
    table/counts/counters/overflow to the XLA front end (they share
    hashset_update; this pins the wire -> (valid, flat, ridx)
    reconstruction, incl. the base-6 digit rebuild from 3-bit words)."""
    from tests.test_end_to_end import (
        SCHEME_RANDOM_TEXT, write_inputs, _mk_config, SAMPLES, BC1, BC2, BC3,
    )
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.runner import setup
    from ngs_barcode_count_tpu.utils import simulate

    paths = write_inputs(tmp_path, scheme_text=SCHEME_RANDOM_TEXT)
    cfg = _mk_config(tmp_path, "r.fastq", paths)
    scheme, conv, me, plan, _ = setup(cfg)
    randoms = ["ACGTACGT", "TTGGCCAA", "AAAATTTT", "CGCGCGCG", "NNACGTAC"]
    reads, quals = [], []
    for _ in range(300):
        r = simulate.make_read(
            rng, scheme, list(SAMPLES)[rng.integers(0, 2)],
            [s[rng.integers(0, 3)] for s in (BC1, BC2, BC3)],
            random_barcode=randoms[rng.integers(0, len(randoms))],
            flank_left=int(rng.integers(0, 6)),
            flank_right=int(rng.integers(0, 6)),
            n_errors=int(rng.integers(0, 6)),
        )
        reads.append(r)
        quals.append("I" * len(r))
    fq = tmp_path / "r.fastq"
    simulate.write_fastq(str(fq), reads, quals)
    pb = next(iter(read_fastq_packed_parallel(
        str(fq), min_width=scheme.length, batch_reads=512,
    )))
    if getattr(pb, "transposed", False):
        pb.packed = np.ascontiguousarray(pb.packed.T)
        pb.transposed = False
    n = np.array([pb.n_reads], np.int32)
    cap = 64
    S = 128  # tiny: probe chains + overflow both fire

    def fresh():
        return (
            jnp.zeros(S, jnp.uint32),
            jnp.zeros(plan.n_samples * plan.n_combos, jnp.int32),
            jnp.zeros(stats.NUM_COUNTERS, jnp.int32),
        )

    t_x, c_x, ctr_x = fresh()
    t_x, c_x, ctr_x, over_x, n_over_x = dec.random_hashset_step_packed(
        plan, t_x, c_x, ctr_x, pb.packed, pb.lengths, pb.exc_idx,
        pb.exc_val, pb.width, cap, n,
    )
    pstep = pdec.build_pallas_hashset_step(
        plan, pb.width, cap, TB=8, interpret=True
    )
    t_p, c_p, ctr_p = fresh()
    t_p, c_p, ctr_p, over_p, n_over_p = pstep(
        t_p, c_p, ctr_p, pb.packed, pb.lengths, pb.exc_idx, pb.exc_val, n,
    )
    np.testing.assert_array_equal(np.asarray(t_x), np.asarray(t_p))
    np.testing.assert_array_equal(np.asarray(c_x), np.asarray(c_p))
    np.testing.assert_array_equal(np.asarray(ctr_x), np.asarray(ctr_p))
    np.testing.assert_array_equal(
        np.asarray(n_over_x), np.asarray(n_over_p)
    )
    k = int(np.asarray(n_over_x)[0])
    assert k > 0  # the tiny table must actually overflow
    np.testing.assert_array_equal(
        np.asarray(over_x)[:k], np.asarray(over_p)[:k]
    )
    assert int(np.asarray(ctr_x)[stats.DUPLICATES]) > 0


def test_packed_input_kernel_bit_identical(dense_setup, rng):
    """The deinterleaved packed-input kernel (in-kernel 2-bit expand +
    exception plane, round 4) must equal the unpacked kernel bit-for-bit
    — including reads with N/OTHER exceptions, flank offsets, and short
    reads."""
    from ngs_barcode_count_tpu.io import native as native_mod
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.ops.decode import unpack_bases
    from ngs_barcode_count_tpu.utils import simulate
    from tests.test_end_to_end import BC1, BC2, BC3, SAMPLES, write_inputs
    from tests.test_end_to_end import _mk_config
    import tempfile

    scheme, plan, oracle, conv = dense_setup
    reads, quals = [], []
    for i in range(300):
        r = simulate.make_read(
            rng, scheme, list(SAMPLES)[rng.integers(0, 2)],
            [s[rng.integers(0, 3)] for s in (BC1, BC2, BC3)],
            flank_left=int(rng.integers(0, 8)),
            flank_right=int(rng.integers(0, 8)),
            n_errors=int(rng.integers(0, 6)),
        )
        if i % 7 == 0:  # inject N exceptions
            p = int(rng.integers(0, len(r)))
            r = r[:p] + "N" + r[p + 1:]
        if i % 31 == 0:  # OTHER exception (lowercase survives the codec)
            p = int(rng.integers(0, len(r)))
            r = r[:p] + "a" + r[p + 1:]
        reads.append(r)
        quals.append("I" * len(r))
    with tempfile.TemporaryDirectory() as td:
        fq = td + "/x.fastq"
        simulate.write_fastq(fq, reads, quals)
        pb = next(iter(read_fastq_packed_parallel(
            fq, min_width=scheme.length, batch_reads=512,
        )))
    if getattr(pb, "transposed", False):
        pb.packed = np.ascontiguousarray(pb.packed.T)
        pb.transposed = False
    assert (np.asarray(pb.exc_idx) >= 0).sum() > 0
    n = np.array([pb.n_reads], np.int32)
    lengths = np.asarray(pb.lengths).astype(np.int32)

    f_unp = pdec.build_pallas_decode(
        plan, pb.width, TB=8, interpret=True
    )
    bases = unpack_bases(pb.packed, pb.exc_idx, pb.exc_val, pb.width)
    flat_u, st_u = f_unp(bases, lengths, n)

    f_pk = pdec.build_pallas_decode(
        plan, pb.width, TB=8, interpret=True, packed_input=True
    )
    epk = pdec.exc_plane(pb.exc_idx, pb.exc_val, 512, pb.width)
    flat_p, st_p = f_pk(pb.packed, epk, lengths, n)
    np.testing.assert_array_equal(np.asarray(st_u), np.asarray(st_p))
    np.testing.assert_array_equal(np.asarray(flat_u), np.asarray(flat_p))


def test_pallas_bitmap_step_equals_xla(tmp_path, rng):
    """The fused-kernel bytemap step (small-combo random mode) must be
    bit-identical to the XLA front end: bytemap and counters."""
    import tempfile

    from ngs_barcode_count_tpu.conversions import BarcodeConversions, BarcodeSet
    from ngs_barcode_count_tpu.errors import MaxSeqErrors
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.scheme import parse_scheme_text
    from ngs_barcode_count_tpu.utils import simulate

    scheme = parse_scheme_text("[4]\nACGT\n{5}\nTGCA\n(4)\nTAG\n")
    conv = BarcodeConversions()
    samples = ["AAAA", "CCCC"]
    conv.samples_barcode_hash = {s: f"S{i}" for i, s in enumerate(samples)}
    conv.sample_set = BarcodeSet.from_pairs(
        [(s, f"S{i}") for i, s in enumerate(samples)], 4
    )
    bcs = ["AAAAA", "CCCCC", "GGGGG"]
    conv.counted_barcodes_hash = [
        {b: f"B{j}" for j, b in enumerate(bcs)}
    ]
    conv.counted_sets = [
        BarcodeSet.from_pairs([(b, f"B{j}") for j, b in enumerate(bcs)], 5)
    ]
    me = MaxSeqErrors.create(None, 4, None, [5], None,
                             scheme.constant_region_length, 0.0)
    plan = dec.make_plan(scheme, conv, me)

    reads, quals = [], []
    for _ in range(300):
        r = simulate.make_read(
            rng, scheme, samples[rng.integers(0, 2)],
            [bcs[rng.integers(0, 3)]],
            flank_left=int(rng.integers(0, 5)),
            flank_right=int(rng.integers(0, 5)),
            n_errors=int(rng.integers(0, 4)),
        )
        reads.append(r)
        quals.append("I" * len(r))
    with tempfile.TemporaryDirectory() as td:
        fq = td + "/b.fastq"
        simulate.write_fastq(fq, reads, quals)
        pb = next(iter(read_fastq_packed_parallel(
            fq, min_width=scheme.length, batch_reads=512,
        )))
    if getattr(pb, "transposed", False):
        pb.packed = np.ascontiguousarray(pb.packed.T)
        pb.transposed = False
    n = np.array([pb.n_reads], np.int32)
    c6 = 6 ** scheme.random_slot.length
    n_bytes = plan.n_samples * plan.n_combos * c6

    bm_x = jnp.zeros(n_bytes, jnp.uint8)
    ctr_x = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    bm_x, ctr_x = dec.random_bitmap_step_packed(
        plan, bm_x, ctr_x, pb.packed, pb.lengths, pb.exc_idx, pb.exc_val,
        pb.width, n,
    )
    pstep = pdec.build_pallas_bitmap_step(
        plan, pb.width, TB=8, interpret=True
    )
    bm_p = jnp.zeros(n_bytes, jnp.uint8)
    ctr_p = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    bm_p, ctr_p = pstep(
        bm_p, ctr_p, pb.packed, pb.lengths, pb.exc_idx, pb.exc_val, n
    )
    np.testing.assert_array_equal(np.asarray(ctr_x), np.asarray(ctr_p))
    np.testing.assert_array_equal(np.asarray(bm_x), np.asarray(bm_p))
    assert int(np.asarray(bm_x).sum()) > 0
