"""Ablation profile of the fused Pallas decode kernel on the real chip.

Times the device-resident packed dense step (the bench's
device_resident metric) against variants with individual kernel stages
stubbed out, so the VPU-bound claim in BENCH.md rests on a measurement
instead of op counting.  Each variant monkeypatches one module-level
stage helper before building a fresh kernel; results print as one table.

Run on TPU (background; first execution pays the pool claim):
    python scripts/profile_kernel.py
Env: NGS_PROF_BATCH (default 131072), NGS_PROF_REPS (default 20),
NGS_PROF_TILES ("256,512" to sweep tile heights).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as bench_mod


def analytic_vpu_census(plan, W: int) -> dict:
    """Per-read VPU elementwise-op counts per kernel stage (int32-lane
    ops), against which the measured ablation deltas state how much of
    the kernel's time is irreducible lane arithmetic vs Mosaic relayout
    and reduction serialization.  v5e VPU ~= 4 ALUs x (8, 128) lanes at
    ~1.5 GHz ~= 6.1e12 lane-ops/s (pallas guide; scaling-book numbers)."""
    import numpy as np

    scheme = plan.scheme
    F = scheme.length
    O = W - F + 1
    O_pad = -(-O // 128) * 128
    log2O = max((O - 1).bit_length(), 1)
    n_slots = (1 if scheme.sample_slot is not None else 0) + len(
        scheme.barcode_slots
    )
    nc_pads = []
    if scheme.sample_slot is not None and plan.sample_onehot is not None:
        nc_pads.append(-(-plan.sample_onehot.shape[0] // 128) * 128)
    for oh in plan.counted_onehots or ():
        nc_pads.append(-(-oh.shape[0] // 128) * 128)
    census = {
        # (p>>2k)&3, (e>>2k)&3, cmp, +3, where -> ~7 ops x W lanes
        "expand_deint": 7 * W,
        # 5 compares + 5 converts, twice (scan input + matcher input)
        "onehot_builds": 2 * 10 * W,
        # two packed keys (~8 ops each) + two min-reductions over O_pad
        "scan_key_reductions": (16 + 4) * O_pad,
        # log2(O) steps x (lane-shift copy + select) on W lanes
        "realign_shifter": log2O * 3 * W,
        # per slot: two key builds (~6 ops) + two reductions over nc_pad
        "matcher_key_reductions": sum((12 + 4) * p for p in nc_pads),
        "status_epilogue": 64,
    }
    census["total_ops"] = sum(census.values())
    census["analytic_ns_per_read"] = round(
        census["total_ops"] / 6.1e3, 2
    )  # 6.1e12 lane-ops/s -> ops/ns = 6100
    census["n_slots"] = n_slots
    return census


def _time_step(step, args, reps):
    import jax  # noqa: F401

    state, counters = args[0], args[1]
    out = step(state, counters, *args[2:])
    np.asarray(out[1])  # real sync; block_until_ready lies via the relay
    state, counters = out
    t0 = time.perf_counter()
    for _ in range(reps):
        state, counters = step(state, counters, *args[2:])
    np.asarray(counters)
    return time.perf_counter() - t0


def main():
    batch = int(os.environ.get("NGS_PROF_BATCH", 1 << 17))
    reps = int(os.environ.get("NGS_PROF_REPS", 20))
    tiles = [
        int(t)
        for t in os.environ.get("NGS_PROF_TILES", "256").split(",")
    ]
    workdir = os.environ.get("NGS_BENCH_DIR", "/tmp/ngs_bench")
    fastq, scheme_path, samples_path, barcodes_path = (
        bench_mod.prepare_inputs(workdir, 2_000_000)
    )

    from ngs_barcode_count_tpu.runner import (
        CountAccumulator,
        RunConfig,
        _enable_compile_cache,
        setup,
    )

    _enable_compile_cache()
    cfg = RunConfig(
        fastq=fastq, format=scheme_path,
        sample_barcodes_option=samples_path,
        counted_barcodes_option=barcodes_path,
        output_dir=workdir, prefix="prof", batch_size=batch, progress=False,
    )
    scheme, conv, max_errors, plan, _ = setup(cfg)

    import jax
    import jax.numpy as jnp

    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.ops import pallas_decode as pdec

    pb = bench_mod._rowmajor(next(iter(read_fastq_packed_parallel(
        fastq, min_width=scheme.length, batch_reads=batch,
    ))))
    d = [
        jax.device_put(pb.packed), jax.device_put(pb.lengths),
        jax.device_put(pb.exc_idx), jax.device_put(pb.exc_val),
        jax.device_put(np.array([pb.n_reads], np.int32)),
    ]

    F = scheme.length
    real_front = pdec._kernel_front_end
    real_match = pdec._kernel_match

    def front_no_realign(plan_, basesf, lengths, is_read, scan_w_ref, TB,
                         L, F_, O, O_pad, n_const, n_wild, max_const,
                         scan_packed=None, deint=False):
        const_ok, offset, has_exact, exact_off, o_idx, _ = real_front(
            plan_, basesf, lengths, is_read, scan_w_ref, TB, L, F_, O,
            O_pad, n_const, n_wild, max_const,
            scan_packed=scan_packed, deint=deint,
        )
        return const_ok, offset, has_exact, exact_off, o_idx, (
            basesf if deint else basesf[:, :F_]
        )

    def front_no_select(plan_, basesf, lengths, is_read, scan_w_ref, TB,
                        L, F_, O, O_pad, n_const, n_wild, max_const,
                        scan_packed=None, deint=False):
        # matmul + exact-offset only (no repair keys): isolates the
        # packed-key repair selection's cost against the current realign
        x1h = jnp.concatenate(
            [(basesf == c).astype(jnp.bfloat16) for c in range(5)], axis=1
        )
        scan = jnp.dot(
            x1h, scan_w_ref[...], preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        strict_o = scan[:, :O_pad]
        wild_o = scan[:, O_pad:2 * O_pad]
        o_idx = jax.lax.broadcasted_iota(jnp.int32, (TB, O_pad), 1)
        exact = (strict_o == n_const) & (wild_o == n_wild)
        exact_off = jnp.min(
            jnp.where(exact, o_idx, pdec._BIG), axis=1, keepdims=True
        ).astype(jnp.int32)
        has_exact = exact_off != pdec._BIG
        off = jnp.where(has_exact, exact_off, 0)
        R = (
            pdec._realign_deint(basesf, off, L, O, TB) if deint
            else pdec._realign(basesf, off, L, O, TB, F_)
        )
        return has_exact & is_read, off, has_exact, exact_off, o_idx, R

    def matchers_stub(R, W_all, metas, slot_mats, slot_w_refs, F_, TB):
        idx = jnp.zeros((TB, 1), jnp.int32)
        ok = jnp.ones((TB, 1), bool)
        return [(idx, ok) for _ in metas]

    real_build = pdec._build_matchers

    def build_legacy(slot_defs, F_):
        # force the pre-fusion per-slot matcher formulation
        W_all, metas, _ = real_build(slot_defs, F_)
        slot_mats = []
        for name, slot, onehot, n_mask, budget in slot_defs:
            Wm, nc, nc_pad = pdec._match_matrix(onehot, n_mask, slot.length)
            slot_mats.append((Wm, nc_pad))
        return None, metas, slot_mats

    # round-5 roofline ablations (VERDICT r4 next-step #6): peel the
    # kernel down stage by stage so each VPU item gets a measured
    # ns/read instead of an op-count estimate
    def expand_stub(p, e):
        # keeps shapes and the input reads, drops the 4x shift/mask/
        # where ladder and the exception fold
        p = p.astype(jnp.int32)
        del e
        return jnp.concatenate([p, p, p, p], axis=1)

    def front_stub(plan_, basesf, lengths, is_read, scan_w_ref, TB, L, F_,
                   O, O_pad, n_const, n_wild, max_const, scan_packed=None,
                   deint=False):
        # no one-hot build, no scan matmul, no key reductions, no
        # realign: offset 0 for everyone (results are garbage; timing
        # isolates the whole front end)
        zeros = jnp.zeros((TB, 1), jnp.int32)
        o_idx = jax.lax.broadcasted_iota(jnp.int32, (TB, O_pad), 1)
        return is_read, zeros, is_read, zeros, o_idx, basesf

    variants = [
        ("full", {}),
        ("no_expand", {"_expand_deint": expand_stub}),
        ("no_realign_loop", {"_kernel_front_end": front_no_realign}),
        ("no_repair_select", {"_kernel_front_end": front_no_select}),
        ("front_stub", {"_kernel_front_end": front_stub}),
        ("no_matchers", {"_run_matchers": matchers_stub}),
        ("front_and_match_stub", {"_kernel_front_end": front_stub,
                                  "_run_matchers": matchers_stub}),
        ("legacy_matchers", {"_build_matchers": build_legacy}),
    ]

    print(f"# batch={pb.n_reads} width={pb.width} F={F} reps={reps}",
          flush=True)
    import json as _json

    print("# analytic VPU census:",
          _json.dumps(analytic_vpu_census(plan, pb.width)), flush=True)
    results = {}
    for TB in tiles:
        for name, patches in variants:
            saved = {k: getattr(pdec, k) for k in patches}
            pdec.__dict__.update(patches)
            try:
                pdec._PACKED_STEP_CACHE.clear()
                step = pdec.build_pallas_packed_step(plan, pb.width, TB=TB)
                acc = CountAccumulator(plan, conv)
                el = _time_step(
                    step, [acc.dense_state, acc.dense_counters] + d, reps
                )
                rps = reps * pb.n_reads / el
                ns = 1e9 * el / (reps * pb.n_reads)
                results[(TB, name)] = (rps, ns)
                print(f"TB={TB:5d} {name:18s} {rps/1e6:7.2f} M reads/s  "
                      f"{ns:6.1f} ns/read", flush=True)
            except Exception as e:  # Mosaic build failures shouldn't kill
                print(f"TB={TB:5d} {name:18s} FAILED: {e}", flush=True)
            finally:
                pdec.__dict__.update(saved)
    pdec._PACKED_STEP_CACHE.clear()

    # scatter/tally epilogue: the bare kernel (no count scatter, no
    # status bincount) vs the full step
    try:
        decode_fn = pdec.build_pallas_decode(
            plan, pb.width, TB=tiles[0], packed_input=True
        )

        @jax.jit
        def bare(counts, counters, packed, lengths, exc_idx, exc_val, n):
            epk = pdec.exc_plane(exc_idx, exc_val, packed.shape[0],
                                 pb.width)
            flat, status = decode_fn(
                packed, epk, lengths.astype(jnp.int32),
                n.astype(jnp.int32),
            )
            return counts, counters + jnp.sum(flat) + jnp.sum(status)

        acc = CountAccumulator(plan, conv)
        el = _time_step(
            bare, [acc.dense_state, acc.dense_counters] + d, reps
        )
        ns = 1e9 * el / (reps * pb.n_reads)
        results[(tiles[0], "no_scatter")] = (reps * pb.n_reads / el, ns)
        print(f"TB={tiles[0]:5d} {'no_scatter':18s} "
              f"{reps * pb.n_reads / el / 1e6:7.2f} M reads/s  "
              f"{ns:6.1f} ns/read", flush=True)
    except Exception as e:
        print(f"no_scatter FAILED: {e}", flush=True)

    base = results.get((tiles[0], "full"))
    if base:
        for (TB, name), (rps, ns) in results.items():
            if name != "full":
                print(f"stage cost TB={TB} {name}: "
                      f"{base[1] - ns:+.1f} ns/read vs full")


if __name__ == "__main__":
    main()
