"""Checkpoint / resume for long count runs (SURVEY.md section 5 lists
this as absent in the reference; here multi-hour 400M-read runs can
snapshot the count state and resume from the exact FASTQ byte offset).

A checkpoint is a .npz holding the dense count tensor, the counter
vector, the next unread FASTQ byte offset, and a config fingerprint that
guards against resuming with different inputs.  Keyed/random-mode state
(host dicts + dedup keys) is pickled alongside.  Plain FASTQ only (a
gzip stream has no seekable record offsets without an index).
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle

import numpy as np


def config_fingerprint(config) -> str:
    h = hashlib.sha256()
    for p in (
        config.format,
        config.sample_barcodes_option,
        config.counted_barcodes_option,
    ):
        if p and os.path.exists(p):
            with open(p, "rb") as f:
                h.update(f.read())
        h.update(b"|")
    h.update(
        json.dumps(
            [
                config.fastq,
                config.barcodes_errors_option,
                config.sample_errors_option,
                config.constant_errors_option,
                config.min_average_quality_score,
            ]
        ).encode()
    )
    return h.hexdigest()


def save(path: str, acc, byte_offset, total_reads: int,
         fingerprint: str, ranges=None) -> None:
    """Atomic snapshot (write tmp + rename).

    ``byte_offset`` is a single int (sequential-reader runs) or a
    per-range frontier vector matching ``ranges`` (parallel-ingest
    runs keep all T readers: each range resumes at its own offset)."""
    state = {
        "total_reads": np.int64(total_reads),
        "fingerprint": np.frombuffer(
            fingerprint.encode(), dtype=np.uint8
        ),
    }
    if ranges is not None:
        state["ranges"] = np.asarray(ranges, dtype=np.int64)
        state["range_offsets"] = np.asarray(byte_offset, dtype=np.int64)
        state["byte_offset"] = np.int64(-1)
    else:
        state["byte_offset"] = np.int64(byte_offset)
    if acc.dense_state is not None:
        counts, counters = acc.dense_state, acc.dense_counters
        engine = getattr(acc, "engine", None) or getattr(
            acc, "hashset_engine", None
        )
        if engine is not None:
            # sharded [n_data, ...] state: snapshot the CANONICAL merged
            # tensors (engine.merge is a non-destructive psum), so the
            # checkpoint is topology-independent — resume re-embeds it
            # into whatever mesh the new run uses (load below).
            counts, counters = engine.merge(counts, counters)
        state["counts"] = np.asarray(counts)
        state["counters"] = np.asarray(counters)
    if getattr(acc, "hashset", None) is not None:
        # single-device: [S] uint32; sharded engine: [n_data, S_local]
        # (global slot = rank * S_local + local, so the layout is tied
        # to the mesh size — load validates the shape).
        state["hash_table"] = np.asarray(acc.hashset)
        blob = {
            "overflow_seen": acc._overflow.export_keys(),
            "overflow_counts": acc._overflow.counts,
            "host_counters": acc.seq_errors.counters,
        }
        state["hashset_pickle"] = np.frombuffer(
            pickle.dumps(blob), dtype=np.uint8
        )
    if acc.keyed is not None:
        blob = {
            "counts": acc.keyed.counts,
            "host_counters": acc.seq_errors.counters,
            "dedup_keys": (
                acc.dedup.export_keys() if acc.dedup is not None else None
            ),
            # multi-host random (triple) mode: valid-read tally whose
            # cross-host sum feeds the flush-time duplicate count
            "triple_valid": getattr(acc, "triple_valid", 0),
        }
        state["keyed_pickle"] = np.frombuffer(
            pickle.dumps(blob), dtype=np.uint8
        )
    tmp = path + ".tmp.npz"
    # uncompressed: zlib on a multi-MB count tensor costs seconds of CPU
    # per snapshot (it competed with the ingest pool for cores and
    # stretched the snapshot stall); plain npz writes are ~instant
    np.savez(tmp, **state)
    os.replace(tmp, path)


def load(path: str, acc, fingerprint: str):
    """Restore accumulator state; returns (resume_point, total_reads)
    where resume_point is an int byte offset (sequential runs) or a
    (ranges, offsets) pair of int64 arrays (parallel-ingest runs).
    Raises if the fingerprint doesn't match the saved run."""
    with np.load(path, allow_pickle=False) as z:
        saved_fp = bytes(z["fingerprint"]).decode()
        if saved_fp != fingerprint:
            raise ValueError(
                "checkpoint was created with different inputs "
                "(scheme/conversion files or error budgets changed)"
            )
        if "range_offsets" in z:
            byte_offset = (z["ranges"].copy(), z["range_offsets"].copy())
        else:
            byte_offset = int(z["byte_offset"])
        total_reads = int(z["total_reads"])
        if "counts" in z:
            import jax.numpy as jnp

            engine = getattr(acc, "engine", None) or getattr(
                acc, "hashset_engine", None
            )
            if engine is not None:
                # canonical merged tensors -> sharded layout: embed into
                # data-rank 0 with zeros elsewhere (engine.merge sums
                # over the axis, so the restored global state is exact
                # for ANY mesh size)
                import jax
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(engine.mesh, P("data", None))
                c = np.zeros(
                    (engine.n_data,) + z["counts"].shape, z["counts"].dtype
                )
                c[0] = z["counts"]
                k = np.zeros(
                    (engine.n_data,) + z["counters"].shape,
                    z["counters"].dtype,
                )
                k[0] = z["counters"]
                acc.dense_state = jax.device_put(c, sh)
                acc.dense_counters = jax.device_put(k, sh)
            else:
                acc.dense_state = jnp.asarray(z["counts"])
                acc.dense_counters = jnp.asarray(z["counters"])
        if "hash_table" in z:
            import jax.numpy as jnp

            if getattr(acc, "hashset", None) is None:
                raise ValueError(
                    "checkpoint holds a device dedup table but this run "
                    "selected a different random mode (check "
                    "NGS_DEVICE_DEDUP / NGS_BITMAP_LIMIT_BYTES)"
                )
            if z["hash_table"].shape != tuple(acc.hashset.shape):
                raise ValueError(
                    "checkpointed dedup table shape "
                    f"{z['hash_table'].shape} does not match this run's "
                    f"{tuple(acc.hashset.shape)} (NGS_DEDUP_TABLE_SLOTS "
                    "or the device-mesh size changed)"
                )
            if getattr(acc, "hashset_engine", None) is not None:
                import jax
                from jax.sharding import NamedSharding, PartitionSpec as P

                acc.hashset = jax.device_put(
                    z["hash_table"],
                    NamedSharding(
                        acc.hashset_engine.mesh, P("data", None)
                    ),
                )
            else:
                acc.hashset = jnp.asarray(z["hash_table"])
            blob = pickle.loads(bytes(z["hashset_pickle"]))
            acc._overflow.import_state(
                np.asarray(blob["overflow_seen"], np.uint64),
                dict(blob["overflow_counts"]),
            )
            acc.seq_errors.counters = blob["host_counters"]
        if "keyed_pickle" in z:
            blob = pickle.loads(bytes(z["keyed_pickle"]))
            acc.keyed.counts = blob["counts"]
            acc.seq_errors.counters = blob["host_counters"]
            if acc.dedup is not None and blob["dedup_keys"] is not None:
                acc.dedup.import_keys(blob["dedup_keys"])
            if getattr(acc, "triple_mode", False):
                acc.triple_valid = int(blob.get("triple_valid", 0))
    return byte_offset, total_reads
