#!/usr/bin/env python
"""Benchmark: end-to-end decode throughput (reads/s) on a DEL workload.

Prints ONE JSON line:
  {"metric": "reads_per_second", "value": N, "unit": "reads/s",
   "vs_baseline": N / 294_000}

Baseline: the reference's published 418.77M reads in 23m43s compute on 8
CPU threads = ~294k reads/s (BASELINE.md, reference README.md:155-172).

The measured window is the steady-state pipeline — FASTQ bytes on disk
-> host encode -> device decode/count -> final count fetch — after one
untimed warmup batch (the TPU pool claim + first compile are one-time
session costs, amortized to nothing over a production 400M-read run).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_READS_PER_S = 294_000.0

SCHEME_TEXT = """\
[10]
AGCTACGAATCG
{6}
TGGA
{6}
TGGA
{6}
ACTAGAT
TAGA
"""

SAMPLES = ["AGCATACGTT", "AACTTACCAT", "TTGGCATCAG", "CGATTACAGT"]


def _barcode_sets(rng, n_per_pos=96, length=6, positions=3):
    sets = []
    for _ in range(positions):
        seen = set()
        while len(seen) < n_per_pos:
            seen.add("".join("ACGT"[i] for i in rng.integers(0, 4, length)))
        sets.append(sorted(seen))
    return sets


def prepare_inputs(workdir: str, n_reads: int):
    from ngs_barcode_count_tpu.scheme import parse_scheme_text
    from ngs_barcode_count_tpu.utils import simulate_fast

    os.makedirs(workdir, exist_ok=True)
    scheme_path = os.path.join(workdir, "scheme.txt")
    fastq_path = os.path.join(workdir, f"bench_{n_reads}.fastq")
    samples_path = os.path.join(workdir, "samples.csv")
    barcodes_path = os.path.join(workdir, "barcodes.csv")

    rng = np.random.default_rng(2024)
    scheme = parse_scheme_text(SCHEME_TEXT)
    sets = _barcode_sets(rng)

    with open(scheme_path, "w") as f:
        f.write(SCHEME_TEXT)
    with open(samples_path, "w") as f:
        f.write("Barcode,Sample_ID\n")
        for i, s in enumerate(SAMPLES):
            f.write(f"{s},Sample_{i + 1}\n")
    with open(barcodes_path, "w") as f:
        f.write("Barcode,Barcode_ID,Barcode_Number\n")
        for pos, bset in enumerate(sets, start=1):
            for j, b in enumerate(bset):
                f.write(f"{b},BC{pos}_{j},{pos}\n")

    if not os.path.exists(fastq_path):
        chunk = 1_000_000
        first = True
        left = n_reads
        while left > 0:
            n = min(chunk, left)
            seq, qual = simulate_fast.generate_reads(
                rng, scheme, n, SAMPLES, sets, sub_error_rate=0.01
            )
            simulate_fast.write_fastq_bytes(
                fastq_path, seq, qual, append=not first
            )
            first = False
            left -= n
    return fastq_path, scheme_path, samples_path, barcodes_path




def _rowmajor(pb):
    """Direct PackedReads consumers: undo the col-major wire layout."""
    if getattr(pb, "transposed", False):
        import numpy as _np

        pb.packed = _np.ascontiguousarray(pb.packed.T)
        if getattr(pb, "quals_packed", None) is not None:
            pb.quals_packed = _np.ascontiguousarray(pb.quals_packed.T)
        pb.transposed = False
    return pb

def main():
    workdir = os.environ.get("NGS_BENCH_DIR", "/tmp/ngs_bench")
    # default: the longest FASTQ already generated in the workdir (a 50M
    # sustained run when cached; 10M otherwise — generating 50M fresh
    # costs ~12 CPU-minutes, too slow for a default)
    default_reads = 10_000_000
    for n in (50_000_000, 20_000_000):
        if os.path.exists(os.path.join(workdir, f"bench_{n}.fastq")):
            default_reads = n
            break
    n_reads = int(os.environ.get("NGS_BENCH_READS", default_reads))

    # Claim the TPU up front with bounded retry/backoff: the axon pool
    # claim can transiently fail UNAVAILABLE (this lost the round-2
    # driver capture — BENCH_r02.json rc=1).  If it stays down, fail
    # over to a CPU measurement with the error recorded in detail, so
    # the driver always gets the one JSON line.
    from ngs_barcode_count_tpu.utils.claim import (
        claim_devices_guarded,
        force_cpu,
    )

    claim_error = None
    try:
        # time-BOUNDED: a down pool hangs ~25 min per in-process attempt
        # (uncancellable); the guarded claim probes in a subprocess under
        # a hard timeout so the driver always gets its JSON line
        claim_devices_guarded(
            max_attempts=int(os.environ.get("NGS_CLAIM_ATTEMPTS", 4)),
            total_budget_s=float(
                os.environ.get("NGS_CLAIM_BUDGET_S", 1500)
            ),
        )
    except Exception as e:
        claim_error = f"{type(e).__name__}: {e}"
        print(f"[bench] TPU claim failed, falling back to CPU: "
              f"{claim_error}", file=sys.stderr)
        force_cpu()
        # CPU fallback: a 50M-read run would take tens of minutes
        n_reads = min(
            n_reads, int(os.environ.get("NGS_BENCH_CPU_READS", 2_000_000))
        )
        # CPU-tuned pipeline: two count lanes (dual-stream) over 8k-read
        # batches let the XLA:CPU thread pool overlap two decode chains —
        # measured 2.9x vs the relay-tuned defaults (229k -> ~670k
        # reads/s on 4 cores); the wire sort is a wash on CPU.  The
        # 8-lane scan pad drops the 128-lane MXU padding FLOPs the CPU
        # has no use for (bit-exact; +4%).
        os.environ.setdefault("NGS_DUAL_STREAM", "4")
        os.environ.setdefault("NGS_SCAN_LANE", "8")
    if not claim_error:
        # 3 dispatch lanes overlap the relay's blocking h2d transfers
        # with dispatch overhead: +37% e2e measured same-phase (3.42M vs
        # 2.49M sustained, R4_SESSION.json N_dual_stream; bit-exact —
        # lanes are independent count tensors summed at flush)
        os.environ.setdefault("NGS_DUAL_STREAM", "3")
    # 128k reads/batch: per-batch wall time through the relay is
    # super-linear in transfer size, so small batches pipeline ~2.4x
    # better than the 1M-read batches used previously (measured A/B:
    # 2.5-2.8M reads/s at 128k vs 0.98-1.16M at 1M in the same relay
    # phases; direct-attached hardware is far less sensitive)
    batch_size = int(os.environ.get(
        "NGS_BENCH_BATCH", (1 << 13) if claim_error else (1 << 17)
    ))
    fastq, scheme_path, samples_path, barcodes_path = prepare_inputs(
        workdir, n_reads
    )

    from ngs_barcode_count_tpu.runner import (
        CountAccumulator,
        RunConfig,
        _enable_compile_cache,
        decode_file,
        setup,
    )

    _enable_compile_cache()
    cfg = RunConfig(
        fastq=fastq,
        format=scheme_path,
        sample_barcodes_option=samples_path,
        counted_barcodes_option=barcodes_path,
        output_dir=workdir,
        prefix="bench",
        batch_size=batch_size,
        progress=False,
    )
    scheme, conv, max_errors, plan, _ = setup(cfg)

    # Warmup: claim the TPU + compile the step, untimed.
    acc0 = CountAccumulator(plan, conv)
    decode_file(cfg, plan, scheme, acc0, limit_batches=1)
    acc0.finalize()

    # Link-phase probe: the relay's throughput swings 3-50 MB/s hour to
    # hour and bounds e2e on this sandbox; record it so vs_baseline is
    # interpretable (see BENCH.md "the link is the ceiling").
    import jax

    link_mbps = None
    link_ceiling_rps = None
    if jax.devices()[0].platform != "cpu":
        import jax.numpy as jnp

        probe = np.random.default_rng(0).integers(
            0, 255, 16 << 20, dtype=np.uint8
        )
        fsum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
        int(fsum(jax.device_put(probe)))  # warm
        t0 = time.perf_counter()
        int(fsum(jax.device_put(np.roll(probe, 1))))
        link_mbps = round(16 / (time.perf_counter() - t0), 1)

        # Transfer-only ceiling on the REAL wire payload in the SAME
        # relay phase: ship actual e2e batches (col-major packed wire +
        # lengths + exception buckets) through the jit-argument path
        # with a trivial reduction, no decode.  e2e / this ratio states
        # how much of the currently-available link the pipeline uses
        # (the relay's hour-scale phase swings make the absolute e2e
        # number meaningless without it; see BENCH.md).
        from ngs_barcode_count_tpu.io.parallel_ingest import (
            read_fastq_packed_parallel,
        )

        tsum = jax.jit(
            lambda p, l, ei, ev: jnp.sum(p, dtype=jnp.int32)
            + jnp.sum(l, dtype=jnp.int32) + jnp.sum(ei, dtype=jnp.int32)
        )
        n_probe = 0
        t0 = None
        acc_probe = None
        for k, pbw in enumerate(read_fastq_packed_parallel(
            fastq, min_width=scheme.length, batch_reads=batch_size,
        )):
            # dispatch asynchronously so transfers pipeline exactly like
            # the e2e loop's; sync only the final scalar
            r = tsum(pbw.packed, pbw.lengths, pbw.exc_idx, pbw.exc_val)
            if k == 0:
                int(r)  # warm the compile, then start the clock
                t0 = time.perf_counter()
            else:
                acc_probe = r
                n_probe += pbw.n_reads
            if k == 16:
                break
        if n_probe:
            int(acc_probe)
            link_ceiling_rps = round(n_probe / (time.perf_counter() - t0), 1)

    # Timed end-to-end passes.  The headline is the SUSTAINED number
    # (total reads / total time across both passes); the best pass is
    # reported in detail (the relay link varies ±20% run to run).
    times = []
    for _ in range(2):
        acc = CountAccumulator(plan, conv)
        t0 = time.perf_counter()
        total = decode_file(cfg, plan, scheme, acc)
        acc.finalize()
        times.append(time.perf_counter() - t0)
    elapsed = sum(times) / len(times)
    rps = total / elapsed
    best_rps = total / min(times)

    # Device-resident decode throughput: one batch staged on device, K
    # repeated steps — isolates the TPU decode+count path from the
    # host link (which on this sandbox rides a slow loopback relay).
    import jax
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )
    from ngs_barcode_count_tpu.ops import decode as dec

    pb = _rowmajor(next(iter(read_fastq_packed_parallel(
        fastq, min_width=scheme.length, batch_reads=batch_size,
    ))))
    d_packed = jax.device_put(pb.packed)
    d_lengths = jax.device_put(pb.lengths)
    d_exc_i = jax.device_put(pb.exc_idx)
    d_exc_v = jax.device_put(pb.exc_val)
    d_n = jax.device_put(np.array([pb.n_reads], np.int32))

    on_tpu = jax.devices()[0].platform != "cpu"
    # device-resident metric always measures the fused Pallas kernel on
    # TPU: it is the hardware-relevant decode ceiling (the e2e number
    # above uses the default path, which on relay-attached sandboxes is
    # the XLA kernel - see runner._pallas_step_for)
    pstep = None
    if on_tpu:
        try:
            from ngs_barcode_count_tpu.ops import pallas_decode as pdec

            pstep = pdec.build_pallas_packed_step(plan, pb.width)
        except Exception:
            pstep = None
    if pstep is not None:
        def dev_step(state, counters):
            return pstep(state, counters, d_packed, d_lengths, d_exc_i,
                         d_exc_v, d_n)
    else:
        def dev_step(state, counters):
            return dec.dense_count_step_packed(
                plan, state, counters, d_packed, d_lengths, d_exc_i,
                d_exc_v, pb.width, d_n,
            )

    def time_dev(step_fn, K=20):
        acc_w = CountAccumulator(plan, conv)
        state, counters = step_fn(acc_w.dense_state, acc_w.dense_counters)
        np.asarray(counters)  # real sync (block_until_ready lies on relay)
        acc_t = CountAccumulator(plan, conv)
        state, counters = acc_t.dense_state, acc_t.dense_counters
        t0 = time.perf_counter()
        for _ in range(K):
            state, counters = step_fn(state, counters)
        np.asarray(counters)
        return K * pb.n_reads / (time.perf_counter() - t0)

    dev_rps = time_dev(dev_step)

    # the XLA step (the e2e default on relay links) for comparison
    def xla_step(state, counters):
        return dec.dense_count_step_packed(
            plan, state, counters, d_packed, d_lengths, d_exc_i, d_exc_v,
            pb.width, d_n,
        )

    xla_dev_rps = time_dev(xla_step) if pstep is not None else dev_rps

    # ingest-only throughput (host side, no device work)
    t0 = time.perf_counter()
    n_ing = 0
    for pb2 in read_fastq_packed_parallel(
        fastq, min_width=scheme.length, batch_reads=batch_size,
    ):
        n_ing += pb2.n_reads
    ingest_rps = n_ing / (time.perf_counter() - t0)

    # Analytic kernel FLOPs per read, two ways: as-built (the padded
    # matmuls the MXU actually executes) and useful-only (unpadded
    # columns).  Both MFUs are low BY DESIGN: the round-4 hardware A/B
    # showed the kernel is VPU/relayout-bound, not MXU-bound — cutting
    # scan MXU FLOPs 3x (packed scan) or doubling MXU rate (int8
    # operands) both made it SLOWER (R4_SESSION.json, BENCH.md).
    from ngs_barcode_count_tpu.ops.pallas_decode import (
        kernel_flops_per_read,
        kernel_useful_flops_per_read,
    )

    flops_per_read = kernel_flops_per_read(plan, pb.width)
    useful_per_read = kernel_useful_flops_per_read(plan, pb.width)
    kernel_tflops = dev_rps * flops_per_read / 1e12
    # v5e MXU peak: 197 TFLOP/s bf16 (matmul operands here are exact
    # small integers carried in bf16 where gated, f32 otherwise)
    mfu_pct = 100.0 * kernel_tflops / 197.0
    mfu_useful_pct = 100.0 * dev_rps * useful_per_read / 1e12 / 197.0

    matched = acc.seq_errors.matched
    print(
        json.dumps(
            {
                "metric": "reads_per_second",
                "value": round(rps, 1),
                "unit": "reads/s",
                "vs_baseline": round(rps / BASELINE_READS_PER_S, 3),
                "detail": {
                    "platform": jax.devices()[0].platform,
                    "claim_error": claim_error,
                    "n_reads": total,
                    "elapsed_s": round(elapsed, 3),
                    "best_pass_reads_per_s": round(best_rps, 1),
                    "matched": matched,
                    "batch_size": batch_size,
                    "device_resident_reads_per_s": round(dev_rps, 1),
                    "device_resident_vs_baseline": round(
                        dev_rps / BASELINE_READS_PER_S, 2
                    ),
                    "xla_device_resident_reads_per_s": round(xla_dev_rps, 1),
                    "kernel_flops_per_read": flops_per_read,
                    "kernel_useful_flops_per_read": useful_per_read,
                    "kernel_tflops": round(kernel_tflops, 2),
                    "kernel_mfu_pct_of_bf16_peak": round(mfu_pct, 2),
                    "kernel_mfu_useful_pct": round(mfu_useful_pct, 2),
                    "kernel_bound_by": "structure+relayout (BENCH.md r5 roofline)",
                    "ingest_reads_per_s": round(ingest_rps, 1),
                    "link_probe_mbps_random_bytes": link_mbps,
                    "link_ceiling_reads_per_s": link_ceiling_rps,
                    "e2e_fraction_of_link_ceiling": (
                        round(rps / link_ceiling_rps, 3)
                        if link_ceiling_rps else None
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the driver must always get JSON
        import traceback

        traceback.print_exc()
        print(
            json.dumps(
                {
                    "metric": "reads_per_second",
                    "value": 0.0,
                    "unit": "reads/s",
                    "vs_baseline": 0.0,
                    "detail": {"error": f"{type(e).__name__}: {e}"},
                }
            )
        )
        sys.exit(0)
