#!/usr/bin/env python
"""Compiled-kernel gate: on the real TPU, every fused Pallas kernel must
produce bit-identical results to the XLA decode path on a large
synthetic workload (interpret-mode tests cannot catch Mosaic
miscompiles — two were found in round 1: argmin tie order and a
per-lane shift/OR chain).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_check.py
Writes TPU_CHECK.json at the repo root: per-config equality + a counts
hash, so kernel regressions cannot land silently.
"""

import hashlib
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_READS = int(os.environ.get("NGS_TPU_CHECK_READS", 2_000_000))
BATCH = 1 << 19


def _inputs(random_barcode: bool):
    from ngs_barcode_count_tpu.conversions import BarcodeConversions
    from ngs_barcode_count_tpu.errors import MaxSeqErrors
    from ngs_barcode_count_tpu.ops import decode as dec
    from ngs_barcode_count_tpu.scheme import parse_scheme_text
    from ngs_barcode_count_tpu.utils import simulate_fast

    scheme_text = (
        "[10]\nAGCTACGAATCG\n{6}\nTGGA\n{6}\nTGGA\n{6}\nACTAGAT\n"
        + ("(8)\n" if random_barcode else "")
        + "TAGA\n"
    )
    scheme = parse_scheme_text(scheme_text)
    rng = np.random.default_rng(7)
    samples = ["AGCATACGTT", "AACTTACCAT", "TTGGCATCAG", "CGATTACAGT"]
    sets = []
    for _ in range(3):
        seen = set()
        while len(seen) < 96:
            seen.add("".join("ACGT"[i] for i in rng.integers(0, 4, 6)))
        sets.append(sorted(seen))
    conv = BarcodeConversions()
    conv.samples_barcode_hash = {s: f"S{i}" for i, s in enumerate(samples)}
    from ngs_barcode_count_tpu.conversions import BarcodeSet

    conv.sample_set = BarcodeSet.from_pairs(
        [(s, f"S{i}") for i, s in enumerate(samples)], 10
    )
    conv.counted_barcodes_hash = [
        {b: f"B{i}_{j}" for j, b in enumerate(s)} for i, s in enumerate(sets)
    ]
    conv.counted_sets = [
        BarcodeSet.from_pairs([(b, f"B{i}_{j}") for j, b in enumerate(s)], 6)
        for i, s in enumerate(sets)
    ]
    return scheme, conv, samples, sets


def _gen_fastq(workdir, scheme, samples, sets, n_reads, tag):
    from ngs_barcode_count_tpu.utils import simulate_fast

    path = os.path.join(workdir, f"tpucheck_{tag}_{n_reads}.fastq")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(11)
    left = n_reads
    first = True
    while left > 0:
        n = min(1_000_000, left)
        seq, qual = simulate_fast.generate_reads(
            rng, scheme, n, samples, sets, sub_error_rate=0.02,
            qual_range=(22, 41),  # some segment means below 30: the
            # quality-gated config must actually reject reads
        )
        simulate_fast.write_fastq_bytes(path, seq, qual, append=not first)
        first = False
        left -= n
    return path




def _rowmajor(pb):
    """Direct PackedReads consumers: undo the col-major wire layout."""
    if getattr(pb, "transposed", False):
        import numpy as _np

        pb.packed = _np.ascontiguousarray(pb.packed.T)
        if getattr(pb, "quals_packed", None) is not None:
            pb.quals_packed = _np.ascontiguousarray(pb.quals_packed.T)
        pb.transposed = False
    return pb

def _check_dense(workdir, min_quality, results):
    import jax

    from ngs_barcode_count_tpu import stats
    from ngs_barcode_count_tpu.errors import MaxSeqErrors
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.ops import decode as dec
    from ngs_barcode_count_tpu.ops import pallas_decode as pdec

    scheme, conv, samples, sets = _inputs(random_barcode=False)
    me = MaxSeqErrors.create(
        None, 10, None, [6, 6, 6], None, scheme.constant_region_length,
        min_quality,
    )
    plan = dec.make_plan(scheme, conv, me)
    fq = _gen_fastq(workdir, scheme, samples, sets, N_READS, "dense2")
    print(f"[tpu_check] dense q={min_quality}: fastq ready", flush=True)

    import jax.numpy as jnp

    n_flat = plan.n_samples * plan.n_combos
    cx = jnp.zeros(n_flat, jnp.int32)
    ctrx = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    cp = jnp.zeros(n_flat, jnp.int32)
    ctrp = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    pstep = None
    total = 0
    for pb in read_fastq_packed_parallel(
        fq, min_width=scheme.length, batch_reads=BATCH,
        with_quals=min_quality > 0,
    ):
        pb = _rowmajor(pb)
        n = np.array([pb.n_reads], np.int32)
        if pstep is None:
            pstep = pdec.build_pallas_packed_step(plan, pb.width)
        if min_quality > 0:
            cx, ctrx = dec.dense_count_step_packed_q(
                plan, cx, ctrx, pb.packed, pb.lengths, pb.exc_idx,
                pb.exc_val, pb.quals, pb.width, n,
            )
            cp, ctrp = pstep(
                cp, ctrp, pb.packed, pb.lengths, pb.exc_idx, pb.exc_val,
                n, pb.quals,
            )
        else:
            cx, ctrx = dec.dense_count_step_packed(
                plan, cx, ctrx, pb.packed, pb.lengths, pb.exc_idx,
                pb.exc_val, pb.width, n,
            )
            cp, ctrp = pstep(
                cp, ctrp, pb.packed, pb.lengths, pb.exc_idx, pb.exc_val, n,
            )
        total += pb.n_reads
        print(f"[tpu_check] dense q={min_quality}: {total} reads", flush=True)
    # compare ON DEVICE; fetch scalars only (a full counts fetch costs
    # minutes at slow relay phases).  The pinned artifact is a weighted
    # checksum, stable across runs of the same inputs.
    import jax.numpy as jnp

    eq = bool(jnp.array_equal(cx, cp)) and bool(jnp.array_equal(ctrx, ctrp))
    iota = jnp.arange(cx.shape[0], dtype=jnp.uint32)
    csum = int(
        jnp.sum(cx.astype(jnp.uint32) * (iota * np.uint32(2654435761)))
    )
    ctrx = np.asarray(ctrx)
    tag = f"dense_q{int(min_quality)}"
    results[tag] = {
        "equal": eq,
        "n_reads": total,
        "counts_checksum": csum,
        "counters": ctrx.tolist(),
    }
    if not eq:
        cx, cp = np.asarray(cx), np.asarray(cp)
        d = np.flatnonzero(cx != cp)
        results[tag]["first_diffs"] = [
            [int(i), int(cx[i]), int(cp[i])] for i in d[:5]
        ]


def _check_keyed(workdir, results, min_quality: float = 0.0):
    import jax.numpy as jnp

    from ngs_barcode_count_tpu import stats
    from ngs_barcode_count_tpu.errors import MaxSeqErrors
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.ops import decode as dec
    from ngs_barcode_count_tpu.ops import pallas_decode as pdec

    scheme, conv, samples, sets = _inputs(random_barcode=True)
    me = MaxSeqErrors.create(
        None, 10, None, [6, 6, 6], None, scheme.constant_region_length,
        min_quality,
    )
    plan = dec.make_plan(scheme, conv, me)
    fq = _gen_fastq(workdir, scheme, samples, sets, N_READS, "random2")

    import jax.numpy as jnp

    pstep = None
    eq = True
    total = 0
    h = 0
    for pb in read_fastq_packed_parallel(
        fq, min_width=scheme.length, batch_reads=BATCH,
        with_quals=min_quality > 0,
    ):
        pb = _rowmajor(pb)
        n = np.array([pb.n_reads], np.int32)
        if pstep is None:
            pstep = pdec.build_pallas_keyed_packed_step(plan, pb.width)
        if min_quality > 0:
            ox = dec.keyed_decode_step_packed_q(
                plan, pb.packed, pb.lengths, pb.exc_idx, pb.exc_val,
                pb.quals, pb.width, n,
            )
            op = pstep(
                pb.packed, pb.lengths, pb.exc_idx, pb.exc_val, n, pb.quals
            )
        else:
            ox = dec.keyed_decode_step_packed(
                plan, pb.packed, pb.lengths, pb.exc_idx, pb.exc_val,
                pb.width, n,
            )
            op = pstep(pb.packed, pb.lengths, pb.exc_idx, pb.exc_val, n)
        beq = bool(jnp.array_equal(ox["wire"], op["wire"])) and bool(
            jnp.array_equal(ox["counters"], op["counters"])
        )
        if not beq:
            eq = False
            wx, wp = np.asarray(ox["wire"]), np.asarray(op["wire"])
            d = np.argwhere(wx != wp)
            results.setdefault("keyed_first_diffs", [
                [int(r), int(c), int(wx[r, c]), int(wp[r, c])]
                for r, c in d[:5]
            ])
        # ORDER-INSENSITIVE multiset checksum: the parallel range
        # readers emit reads in nondeterministic order, so the pin is a
        # mod-2^32 sum of per-row mixes over live rows only (padding
        # rows decode junk buffer tails)
        w32 = ox["wire"].astype(jnp.uint32)
        rows = jnp.arange(w32.shape[0], dtype=jnp.uint32)[:, None]
        live = rows < np.uint32(pb.n_reads)
        rowkey = jnp.zeros(w32.shape[0], jnp.uint32)
        for c in range(w32.shape[1]):
            rowkey = rowkey * np.uint32(2654435761) + w32[:, c]
        v = rowkey ^ (rowkey >> 15)
        v = v * np.uint32(0x2C1B3C6D)
        v = v ^ (v >> 12)
        h = (h + int(jnp.sum(jnp.where(live[:, 0], v, 0)))) & 0xFFFFFFFF
        total += pb.n_reads
        print(f"[tpu_check] keyed q={min_quality}: {total} reads", flush=True)
    tag = "keyed_random" if min_quality == 0 else (
        f"keyed_random_q{int(min_quality)}"
    )
    results[tag] = {
        "equal": eq,
        "n_reads": total,
        "wire_checksum": h,
    }


def _check_keyed_rawdna(workdir, results):
    """Raw-DNA keyed mode (no conversion files): the counted_words wire
    layout variant, compiled (CPU interpret tests cover it; this pins
    the Mosaic-compiled form)."""
    import jax.numpy as jnp

    from ngs_barcode_count_tpu.conversions import BarcodeConversions
    from ngs_barcode_count_tpu.errors import MaxSeqErrors
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.ops import decode as dec
    from ngs_barcode_count_tpu.ops import pallas_decode as pdec

    scheme, _, samples, sets = _inputs(random_barcode=False)
    me = MaxSeqErrors.create(
        None, 10, None, [6, 6, 6], None, scheme.constant_region_length, 0.0
    )
    conv = BarcodeConversions()  # no files: raw-DNA sample + counted
    plan = dec.make_plan(scheme, conv, me)
    fq = _gen_fastq(workdir, scheme, samples, sets, N_READS, "dense2")

    pstep = None
    eq = True
    total = 0
    h = 0
    for pb in read_fastq_packed_parallel(
        fq, min_width=scheme.length, batch_reads=BATCH,
    ):
        pb = _rowmajor(pb)
        n = np.array([pb.n_reads], np.int32)
        if pstep is None:
            pstep = pdec.build_pallas_keyed_packed_step(plan, pb.width)
        ox = dec.keyed_decode_step_packed(
            plan, pb.packed, pb.lengths, pb.exc_idx, pb.exc_val, pb.width, n
        )
        op = pstep(pb.packed, pb.lengths, pb.exc_idx, pb.exc_val, n)
        eq = eq and bool(jnp.array_equal(ox["wire"], op["wire"])) and bool(
            jnp.array_equal(ox["counters"], op["counters"])
        )
        # ORDER-INSENSITIVE multiset checksum: the parallel range
        # readers emit reads in nondeterministic order, so the pin is a
        # mod-2^32 sum of per-row mixes over live rows only (padding
        # rows decode junk buffer tails)
        w32 = ox["wire"].astype(jnp.uint32)
        rows = jnp.arange(w32.shape[0], dtype=jnp.uint32)[:, None]
        live = rows < np.uint32(pb.n_reads)
        rowkey = jnp.zeros(w32.shape[0], jnp.uint32)
        for c in range(w32.shape[1]):
            rowkey = rowkey * np.uint32(2654435761) + w32[:, c]
        v = rowkey ^ (rowkey >> 15)
        v = v * np.uint32(0x2C1B3C6D)
        v = v ^ (v >> 12)
        h = (h + int(jnp.sum(jnp.where(live[:, 0], v, 0)))) & 0xFFFFFFFF
        total += pb.n_reads
        print(f"[tpu_check] raw-dna keyed: {total} reads", flush=True)
    results["keyed_rawdna"] = {
        "equal": eq,
        "n_reads": total,
        "wire_checksum": h,
    }


def _check_keyed_megacombo(workdir, results):
    """Mega-DEL keyed wire (counted_idx columns: combo ids overflow
    int32 so the wire carries per-position candidate indices), compiled.
    Reuses the dense FASTQ against 1300-candidate-per-position tables."""
    import jax.numpy as jnp

    from ngs_barcode_count_tpu.conversions import (
        BarcodeConversions,
        BarcodeSet,
    )
    from ngs_barcode_count_tpu.errors import MaxSeqErrors
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.ops import decode as dec
    from ngs_barcode_count_tpu.ops import pallas_decode as pdec

    scheme, conv0, samples, sets = _inputs(random_barcode=False)
    rng = np.random.default_rng(23)
    big = []
    for pos in range(3):
        seen = set(sets[pos])  # include the true barcodes
        while len(seen) < 1300:
            seen.add("".join("ACGT"[i] for i in rng.integers(0, 4, 6)))
        big.append(sorted(seen))
    conv = BarcodeConversions()
    conv.samples_barcode_hash = conv0.samples_barcode_hash
    conv.sample_set = conv0.sample_set
    conv.counted_barcodes_hash = [
        {b: f"B{i}_{j}" for j, b in enumerate(s)} for i, s in enumerate(big)
    ]
    conv.counted_sets = [
        BarcodeSet.from_pairs([(b, f"B{i}_{j}") for j, b in enumerate(s)], 6)
        for i, s in enumerate(big)
    ]
    me = MaxSeqErrors.create(
        None, 10, None, [6, 6, 6], None, scheme.constant_region_length, 0.0
    )
    plan = dec.make_plan(scheme, conv, me)
    assert not plan.combo_fits_i32
    fq = _gen_fastq(workdir, scheme, samples, sets, N_READS, "dense2")

    pstep = None
    eq = True
    total = 0
    h = 0
    for pb in read_fastq_packed_parallel(
        fq, min_width=scheme.length, batch_reads=BATCH,
    ):
        pb = _rowmajor(pb)
        n = np.array([pb.n_reads], np.int32)
        if pstep is None:
            pstep = pdec.build_pallas_keyed_packed_step(plan, pb.width)
        ox = dec.keyed_decode_step_packed(
            plan, pb.packed, pb.lengths, pb.exc_idx, pb.exc_val, pb.width, n
        )
        op = pstep(pb.packed, pb.lengths, pb.exc_idx, pb.exc_val, n)
        eq = eq and bool(jnp.array_equal(ox["wire"], op["wire"])) and bool(
            jnp.array_equal(ox["counters"], op["counters"])
        )
        # ORDER-INSENSITIVE multiset checksum: the parallel range
        # readers emit reads in nondeterministic order, so the pin is a
        # mod-2^32 sum of per-row mixes over live rows only (padding
        # rows decode junk buffer tails)
        w32 = ox["wire"].astype(jnp.uint32)
        rows = jnp.arange(w32.shape[0], dtype=jnp.uint32)[:, None]
        live = rows < np.uint32(pb.n_reads)
        rowkey = jnp.zeros(w32.shape[0], jnp.uint32)
        for c in range(w32.shape[1]):
            rowkey = rowkey * np.uint32(2654435761) + w32[:, c]
        v = rowkey ^ (rowkey >> 15)
        v = v * np.uint32(0x2C1B3C6D)
        v = v ^ (v >> 12)
        h = (h + int(jnp.sum(jnp.where(live[:, 0], v, 0)))) & 0xFFFFFFFF
        total += pb.n_reads
        print(f"[tpu_check] mega-combo keyed: {total} reads", flush=True)
    results["keyed_megacombo"] = {
        "equal": eq,
        "n_reads": total,
        "wire_checksum": h,
    }


def _check_sharded_n1(workdir, results):
    """Mosaic-under-shard_map on the REAL chip (VERDICT r2 weak #4): a
    1-chip ('data',) mesh runs the ShardedDenseEngine and
    ShardedHashsetEngine packed steps — fused kernels INSIDE shard_map —
    and must equal the single-device paths bit for bit.  CPU-mesh tests
    cover the routing logic; only this catches shard_map x Mosaic
    interactions on hardware."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ngs_barcode_count_tpu import stats
    from ngs_barcode_count_tpu.errors import MaxSeqErrors
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.ops import decode as dec
    from ngs_barcode_count_tpu.parallel import mesh as pmesh
    from ngs_barcode_count_tpu.parallel.sharded_dedup import (
        ShardedHashsetEngine,
    )

    sh_reads = int(os.environ.get("NGS_TPU_CHECK_SHARDED_READS", 1 << 20))
    prev_kernel = os.environ.get("NGS_DECODE_KERNEL")
    os.environ["NGS_DECODE_KERNEL"] = "pallas"  # kernels even on relay
    try:
        # ---- dense engine, n_data=1 ----
        scheme, conv, samples, sets = _inputs(random_barcode=False)
        me = MaxSeqErrors.create(
            None, 10, None, [6, 6, 6], None,
            scheme.constant_region_length, 0.0,
        )
        plan = dec.make_plan(scheme, conv, me)
        fq = _gen_fastq(workdir, scheme, samples, sets, N_READS, "dense2")
        mesh1 = pmesh.make_mesh(1, 1, jax.devices()[:1])
        eng = pmesh.ShardedDenseEngine.build(plan, mesh1)
        sc, sctr = eng.initial_state()
        n_flat = plan.n_samples * plan.n_combos
        cx = jnp.zeros(n_flat, jnp.int32)
        ctrx = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
        estep = None
        total = 0
        for pb in read_fastq_packed_parallel(
            fq, min_width=scheme.length, batch_reads=BATCH,
        ):
            pb = _rowmajor(pb)
            n = np.array([pb.n_reads], np.int32)
            if estep is None:
                estep = eng.make_packed_step(pb.width, False)
            exc_i, exc_v = eng.split_exceptions(
                np.asarray(pb.exc_idx), np.asarray(pb.exc_val),
                pb.packed.shape[0], pb.width,
            )
            sc, sctr = estep(
                sc, sctr, pb.packed, np.asarray(pb.lengths), exc_i, exc_v, n
            )
            cx, ctrx = dec.dense_count_step_packed(
                plan, cx, ctrx, pb.packed, pb.lengths, pb.exc_idx,
                pb.exc_val, pb.width, n,
            )
            total += pb.n_reads
            print(f"[tpu_check] sharded_n1 dense: {total}", flush=True)
            if total >= sh_reads:
                break
        mc, mctr = eng.merge(sc, sctr)
        eq = bool(jnp.array_equal(mc, cx)) and bool(
            jnp.array_equal(mctr, ctrx)
        )
        results["sharded_n1_dense"] = {"equal": eq, "n_reads": total}

        # ---- hashset engine, n_data=1 ----
        scheme, conv, samples, sets = _inputs(random_barcode=True)
        me = MaxSeqErrors.create(
            None, 10, None, [6, 6, 6], None,
            scheme.constant_region_length, 0.0,
        )
        plan = dec.make_plan(scheme, conv, me)
        fq = _gen_fastq(workdir, scheme, samples, sets, N_READS, "random2")
        n_slots = 1 << 22
        mesh_r = Mesh(np.array(jax.devices()[:1]), ("data",))
        hse = ShardedHashsetEngine.build(plan, mesh_r, n_slots)
        table_s, counts_s, ctr_s = hse.initial_state()
        table_1 = jnp.zeros(n_slots, jnp.uint32)
        counts_1 = jnp.zeros(plan.n_samples * plan.n_combos, jnp.int32)
        ctr_1 = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
        hstep = None
        total = 0
        over_s_all, over_1_all = [], []
        for pb in read_fastq_packed_parallel(
            fq, min_width=scheme.length, batch_reads=BATCH,
        ):
            pb = _rowmajor(pb)
            n = np.array([pb.n_reads], np.int32)
            B = pb.packed.shape[0]
            if hstep is None:
                hstep = hse.make_packed_step(pb.width, False, B)
            exc_i, exc_v = hse.split_exceptions(
                np.asarray(pb.exc_idx), np.asarray(pb.exc_val), B, pb.width
            )
            table_s, counts_s, ctr_s, ov_s, no_s = hstep(
                table_s, counts_s, ctr_s, pb.packed,
                np.asarray(pb.lengths), exc_i, exc_v, n, None,
            )
            cap = max(B // 8, 1024)
            table_1, counts_1, ctr_1, ov_1, no_1 = (
                dec.random_hashset_step_packed(
                    plan, table_1, counts_1, ctr_1, pb.packed, pb.lengths,
                    pb.exc_idx, pb.exc_val, pb.width, cap, n,
                )
            )
            k_s = int(np.asarray(no_s).reshape(-1)[0])
            k_1 = int(np.asarray(no_1).reshape(-1)[0])
            over_s_all.append(np.asarray(ov_s).reshape(-1, 2)[:k_s])
            over_1_all.append(np.asarray(ov_1)[:k_1])
            total += pb.n_reads
            print(f"[tpu_check] sharded_n1 hashset: {total}", flush=True)
            if total >= sh_reads:
                break
        mc_s, mctr_s = hse.merge(counts_s, ctr_s)
        ov_s = np.concatenate(over_s_all) if over_s_all else np.zeros((0, 2))
        ov_1 = np.concatenate(over_1_all) if over_1_all else np.zeros((0, 2))
        ov_s = ov_s[np.lexsort(ov_s.T)] if len(ov_s) else ov_s
        ov_1 = ov_1[np.lexsort(ov_1.T)] if len(ov_1) else ov_1
        eq = (
            bool(jnp.array_equal(mc_s, counts_1))
            and bool(jnp.array_equal(mctr_s, ctr_1))
            and ov_s.shape == ov_1.shape
            and bool(np.array_equal(ov_s, ov_1))
        )
        results["sharded_n1_hashset"] = {
            "equal": eq,
            "n_reads": total,
            "n_overflow": int(len(ov_1)),
        }
    finally:
        if prev_kernel is None:
            os.environ.pop("NGS_DECODE_KERNEL", None)
        else:
            os.environ["NGS_DECODE_KERNEL"] = prev_kernel


def _check_q4(workdir, results):
    """In-kernel 4-bit quality decode == raw-quals kernel on BINNED
    quality (the config the 4-bit wire actually engages on; the plain
    q30 check's 19-distinct quality falls back to raw)."""
    import jax
    import jax.numpy as jnp

    from ngs_barcode_count_tpu import stats
    from ngs_barcode_count_tpu.errors import MaxSeqErrors
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.ops import decode as dec
    from ngs_barcode_count_tpu.ops import pallas_decode as pdec
    from ngs_barcode_count_tpu.utils import simulate_fast

    scheme, conv, samples, sets = _inputs(random_barcode=False)
    me = MaxSeqErrors.create(
        None, 10, None, [6, 6, 6], None,
        scheme.constant_region_length, 30.0,
    )
    plan = dec.make_plan(scheme, conv, me)
    path = os.path.join(workdir, f"tpucheck_q4_{N_READS}.fastq")
    if not os.path.exists(path):
        g = np.random.default_rng(19)
        levels = np.array([25, 37, 40], np.uint8)
        left, first = N_READS, True
        while left > 0:
            n = min(1_000_000, left)
            seq, qual = simulate_fast.generate_reads(
                g, scheme, n, samples, sets, sub_error_rate=0.02,
                qual_range=(22, 41),
            )
            q = qual - 33
            binned = np.where(
                q < 30, levels[0], np.where(q < 38, levels[1], levels[2])
            ).astype(np.uint8) + 33
            simulate_fast.write_fastq_bytes(path, seq, binned,
                                            append=not first)
            first = False
            left -= n
    n_flat = plan.n_samples * plan.n_combos
    c_q4 = jnp.zeros(n_flat, jnp.int32)
    ctr_q4 = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    c_raw = jnp.zeros(n_flat, jnp.int32)
    ctr_raw = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    sq4 = sraw = None
    total = 0
    for pb in read_fastq_packed_parallel(
        path, min_width=scheme.length, batch_reads=BATCH, with_quals=True,
    ):
        pb = _rowmajor(pb)
        if pb.quals_packed is None:
            results["dense_q4_binned"] = {
                "equal": False, "error": "4-bit wire did not engage",
            }
            return
        n = np.array([pb.n_reads], np.int32)
        lengths = np.asarray(pb.lengths)
        if sq4 is None:
            sq4 = pdec.build_pallas_packed_step(
                plan, pb.width, qual_bits=pb.qual_bits
            )
            sraw = pdec.build_pallas_packed_step(plan, pb.width)
        c_q4, ctr_q4 = sq4(
            c_q4, ctr_q4, pb.packed, lengths, pb.exc_idx, pb.exc_val, n,
            pb.quals_packed, pb.qual_codebook,
        )
        quals = dec.unpack_quals_wire(
            jax.device_put(pb.quals_packed),
            jax.device_put(pb.qual_codebook), pb.width, pb.qual_bits,
        )
        c_raw, ctr_raw = sraw(
            c_raw, ctr_raw, pb.packed, lengths, pb.exc_idx, pb.exc_val,
            n, quals,
        )
        total += pb.n_reads
        print(f"[tpu_check] q4 binned: {total}", flush=True)
    eq = bool(jnp.array_equal(c_q4, c_raw)) and bool(
        jnp.array_equal(ctr_q4, ctr_raw)
    )
    results["dense_q4_binned"] = {
        "equal": eq,
        "n_reads": total,
        "counters": np.asarray(ctr_q4).tolist(),
    }


def _check_host_gate(workdir, results):
    """Round-5 two-phase host quality gate (NGS_QUAL_WIRE=host) ==
    in-kernel q-wire gate on the SAME binned-quality fixture as
    dense_q4_binned: per-read gate wire down, host segment means,
    1-bit mask up, deferred counter/count fold."""
    import jax
    import jax.numpy as jnp

    from ngs_barcode_count_tpu import stats
    from ngs_barcode_count_tpu.errors import MaxSeqErrors
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.ops import decode as dec
    from ngs_barcode_count_tpu.ops import pallas_decode as pdec

    scheme, conv, samples, sets = _inputs(random_barcode=False)
    me = MaxSeqErrors.create(
        None, 10, None, [6, 6, 6], None,
        scheme.constant_region_length, 30.0,
    )
    plan = dec.make_plan(scheme, conv, me)
    path = os.path.join(workdir, f"tpucheck_q4_{N_READS}.fastq")
    if not os.path.exists(path):
        results["host_gate"] = {
            "equal": False, "error": "q4 fixture missing (run _check_q4)",
        }
        return
    n_flat = plan.n_samples * plan.n_combos
    c_hg = jnp.zeros(n_flat, jnp.int32)
    ctr_hg = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    c_k = jnp.zeros(n_flat, jnp.int32)
    ctr_k = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    sk = None
    total = 0
    for pb in read_fastq_packed_parallel(
        path, min_width=scheme.length, batch_reads=BATCH, with_quals=True,
    ):
        pb = _rowmajor(pb)
        n = np.array([pb.n_reads], np.int32)
        lengths = np.asarray(pb.lengths)
        if sk is None:
            sk = pdec.build_pallas_packed_step(
                plan, pb.width, qual_bits=pb.qual_bits
            )
        # in-kernel reference
        c_k, ctr_k = sk(
            c_k, ctr_k, pb.packed, lengths, pb.exc_idx, pb.exc_val, n,
            pb.quals_packed, pb.qual_codebook,
        )
        # two-phase host gate: reconstruct the raw Phred matrix the
        # ingest would have kept host-side under NGS_QUAL_WIRE=host
        quals = np.asarray(dec.unpack_quals_wire(
            jax.device_put(pb.quals_packed),
            jax.device_put(pb.qual_codebook), pb.width, pb.qual_bits,
        ))
        out = dec.dense_gate_probe_packed(
            plan, pb.packed, lengths, pb.exc_idx, pb.exc_val, pb.width, n,
        )
        wire = np.asarray(out["wire"])
        cls = wire[:, 1]
        applies = (cls >= 1) & (cls <= 3)
        lowq = dec.host_lowq_mask(
            plan, quals, wire[:, 0].astype(np.int64), applies
        )
        bits = np.packbits(lowq, bitorder="little")
        c_hg, ctr_hg = dec.dense_gate_apply(
            plan, c_hg, ctr_hg, out["flat"], out["cls"], bits
        )
        total += pb.n_reads
        print(f"[tpu_check] host gate: {total}", flush=True)
    eq = bool(jnp.array_equal(c_hg, c_k)) and bool(
        jnp.array_equal(ctr_hg, ctr_k)
    )
    results["host_gate"] = {
        "equal": eq,
        "n_reads": total,
        "counters": np.asarray(ctr_hg).tolist(),
    }


def _check_bitmap(workdir, results):
    """Fused-kernel bytemap step == XLA bytemap step on a small-combo
    random scheme (the CRISPR-UMI shape; round 4 moved this mode onto
    the keyed kernel)."""
    import jax.numpy as jnp

    from ngs_barcode_count_tpu import stats
    from ngs_barcode_count_tpu.conversions import (
        BarcodeConversions,
        BarcodeSet,
    )
    from ngs_barcode_count_tpu.errors import MaxSeqErrors
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.ops import decode as dec
    from ngs_barcode_count_tpu.ops import pallas_decode as pdec
    from ngs_barcode_count_tpu.scheme import parse_scheme_text
    from ngs_barcode_count_tpu.utils import simulate_fast

    scheme = parse_scheme_text(
        "[10]\nAGCTACGAATCG\n{6}\nTGGA\n{6}\nACTAGAT\n(6)\nTAGA\n"
    )
    rng = np.random.default_rng(13)
    samples = ["AGCATACGTT", "AACTTACCAT"]
    sets = []
    for _ in range(2):
        seen = set()
        while len(seen) < 24:
            seen.add("".join("ACGT"[i] for i in rng.integers(0, 4, 6)))
        sets.append(sorted(seen))
    conv = BarcodeConversions()
    conv.samples_barcode_hash = {s: f"S{i}" for i, s in enumerate(samples)}
    conv.sample_set = BarcodeSet.from_pairs(
        [(s, f"S{i}") for i, s in enumerate(samples)], 10
    )
    conv.counted_barcodes_hash = [
        {b: f"B{i}_{j}" for j, b in enumerate(st)}
        for i, st in enumerate(sets)
    ]
    conv.counted_sets = [
        BarcodeSet.from_pairs(
            [(b, f"B{i}_{j}") for j, b in enumerate(st)], 6
        )
        for i, st in enumerate(sets)
    ]
    me = MaxSeqErrors.create(
        None, 10, None, [6, 6], None, scheme.constant_region_length, 0.0
    )
    plan = dec.make_plan(scheme, conv, me)
    n_bytes = plan.n_samples * plan.n_combos * 6 ** 6
    path = os.path.join(workdir, f"tpucheck_bitmap_{N_READS}.fastq")
    if not os.path.exists(path):
        left, first = N_READS, True
        g = np.random.default_rng(17)
        while left > 0:
            n = min(1_000_000, left)
            seq, qual = simulate_fast.generate_reads(
                g, scheme, n, samples, sets, sub_error_rate=0.02
            )
            simulate_fast.write_fastq_bytes(path, seq, qual,
                                            append=not first)
            first = False
            left -= n
    bm_x = jnp.zeros(n_bytes, jnp.uint8)
    ctr_x = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    bm_p = jnp.zeros(n_bytes, jnp.uint8)
    ctr_p = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    pstep = None
    total = 0
    for pb in read_fastq_packed_parallel(
        path, min_width=scheme.length, batch_reads=BATCH,
    ):
        pb = _rowmajor(pb)
        n = np.array([pb.n_reads], np.int32)
        if pstep is None:
            pstep = pdec.build_pallas_bitmap_step(plan, pb.width)
        bm_x, ctr_x = dec.random_bitmap_step_packed(
            plan, bm_x, ctr_x, pb.packed, pb.lengths, pb.exc_idx,
            pb.exc_val, pb.width, n,
        )
        bm_p, ctr_p = pstep(
            bm_p, ctr_p, pb.packed, pb.lengths, pb.exc_idx, pb.exc_val, n
        )
        total += pb.n_reads
        print(f"[tpu_check] bitmap: {total}", flush=True)
    import jax

    eq = bool(jnp.array_equal(bm_x, bm_p)) and bool(
        jnp.array_equal(ctr_x, ctr_p)
    )
    results["bitmap_random"] = {
        "equal": eq,
        "n_reads": total,
        "distinct_triples": int(jnp.sum(bm_x.astype(jnp.int32))),
    }


def _bench_hashset_device(workdir, results):
    """Machine-captured device-resident random-mode throughput (VERDICT
    r2 next #3): one staged batch, K repeated fused hashset steps, reads
    per second from a real array fetch (block_until_ready lies through
    the relay)."""
    import jax
    import jax.numpy as jnp

    from ngs_barcode_count_tpu import stats
    from ngs_barcode_count_tpu.errors import MaxSeqErrors
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.ops import decode as dec
    from ngs_barcode_count_tpu.ops import pallas_decode as pdec

    scheme, conv, samples, sets = _inputs(random_barcode=True)
    me = MaxSeqErrors.create(
        None, 10, None, [6, 6, 6], None, scheme.constant_region_length, 0.0
    )
    plan = dec.make_plan(scheme, conv, me)
    fq = _gen_fastq(workdir, scheme, samples, sets, N_READS, "random2")
    pb = _rowmajor(next(iter(read_fastq_packed_parallel(
        fq, min_width=scheme.length, batch_reads=BATCH,
    ))))
    B = pb.packed.shape[0]
    cap = max(B // 8, 1024)
    d_packed = jax.device_put(pb.packed)
    d_lengths = jax.device_put(np.asarray(pb.lengths))
    d_exc_i = jax.device_put(pb.exc_idx)
    d_exc_v = jax.device_put(pb.exc_val)
    d_n = jax.device_put(np.array([pb.n_reads], np.int32))
    try:
        pstep = pdec.build_pallas_hashset_step(plan, pb.width, cap)
    except Exception:
        pstep = None

    def run_k(step, K=20):
        table = jnp.zeros(1 << 24, jnp.uint32)
        counts = jnp.zeros(plan.n_samples * plan.n_combos, jnp.int32)
        ctr = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
        table, counts, ctr, ov, no = step(table, counts, ctr)
        np.asarray(no)  # sync warmup
        table = jnp.zeros(1 << 24, jnp.uint32)
        counts = jnp.zeros(plan.n_samples * plan.n_combos, jnp.int32)
        ctr = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
        t0 = time.perf_counter()
        for _ in range(K):
            table, counts, ctr, ov, no = step(table, counts, ctr)
        np.asarray(ctr)
        return K * pb.n_reads / (time.perf_counter() - t0)

    def xla_step(table, counts, ctr):
        return dec.random_hashset_step_packed(
            plan, table, counts, ctr, d_packed, d_lengths, d_exc_i,
            d_exc_v, pb.width, cap, d_n,
        )

    entry = {"batch": B}
    if pstep is not None:
        entry["pallas_reads_per_s"] = round(run_k(
            lambda t, c, r: pstep(t, c, r, d_packed, d_lengths, d_exc_i,
                                  d_exc_v, d_n)
        ), 1)
    entry["xla_reads_per_s"] = round(run_k(xla_step), 1)
    results["random_hashset_device"] = entry


def main():
    import jax

    from ngs_barcode_count_tpu.utils.claim import claim_devices

    workdir = os.environ.get("NGS_BENCH_DIR", "/tmp/ngs_bench")
    os.makedirs(workdir, exist_ok=True)
    claim_devices()  # bounded retry: the pool claim fails transiently
    assert jax.devices()[0].platform != "cpu", "tpu_check needs a TPU"
    from ngs_barcode_count_tpu.runner import _enable_compile_cache

    _enable_compile_cache()
    results = {
        "platform": jax.devices()[0].platform,
        "n_reads_per_config": N_READS,
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    _check_dense(workdir, 0.0, results)
    _check_dense(workdir, 30.0, results)
    _check_keyed(workdir, results)
    _check_keyed(workdir, results, min_quality=30.0)
    _check_keyed_rawdna(workdir, results)
    _check_keyed_megacombo(workdir, results)
    _check_sharded_n1(workdir, results)
    _check_bitmap(workdir, results)
    _check_q4(workdir, results)
    _check_host_gate(workdir, results)
    _bench_hashset_device(workdir, results)
    ok = all(
        v.get("equal", True) for v in results.values() if isinstance(v, dict)
    )
    results["ok"] = ok
    with open(os.path.join(ROOT, "TPU_CHECK.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
