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
                         L, F_, O, O_pad, n_const, n_wild, max_const):
        const_ok, offset, has_exact, exact_off, o_idx, _ = real_front(
            plan_, basesf, lengths, is_read, scan_w_ref, TB, L, F_, O,
            O_pad, n_const, n_wild, max_const,
        )
        return const_ok, offset, has_exact, exact_off, o_idx, (
            basesf[:, :F_]
        )

    def front_no_select(plan_, basesf, lengths, is_read, scan_w_ref, TB,
                        L, F_, O, O_pad, n_const, n_wild, max_const):
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
        R = pdec._realign(basesf, off, L, O, TB, F_)
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

    variants = [
        ("full", {}),
        ("no_realign_loop", {"_kernel_front_end": front_no_realign}),
        ("no_repair_select", {"_kernel_front_end": front_no_select}),
        ("no_matchers", {"_run_matchers": matchers_stub}),
        ("legacy_matchers", {"_build_matchers": build_legacy}),
    ]

    print(f"# batch={pb.n_reads} width={pb.width} F={F} reps={reps}",
          flush=True)
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
    base = results.get((tiles[0], "full"))
    if base:
        for (TB, name), (rps, ns) in results.items():
            if name != "full":
                print(f"stage cost TB={TB} {name}: "
                      f"{base[1] - ns:+.1f} ns/read vs full")


if __name__ == "__main__":
    main()
