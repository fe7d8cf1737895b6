"""Multi-host run loop (C15): every host executes this same program
under ``jax.distributed``; the mesh spans all hosts' devices.

Per-host ingest: each host streams only its record-aligned byte range of
the FASTQ (distributed.host_byte_range) and feeds its local shard of the
global batch via ``jax.make_array_from_process_local_data``.  Steps run
in lockstep — a host whose range is exhausted contributes empty batches
until every host is done (liveness decided by a tiny process allgather
per round), then counts and counters psum-merge once at flush.

Single-host fallbacks make every function exercisable in tests; true
multi-process execution needs ``--num-hosts`` + ``--coordinator`` on a
real pod slice.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ngs_barcode_count_tpu.parallel import distributed as dist
from ngs_barcode_count_tpu.parallel import mesh as pmesh


def all_hosts_done(local_done: bool) -> bool:
    """True only when every process reports done."""
    if jax.process_count() == 1:
        return local_done
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.array([1 if local_done else 0], np.int32)
    )
    return bool(np.asarray(flags).min() == 1)


def run_multihost_dense(config, plan, scheme, n_model: int = 1):
    """Decode config.fastq across all hosts; returns (counts np,
    counters np, local_reads).

    The caller (runner.run) uses it when jax.process_count() > 1; counts
    come back fully merged and identical on every host.
    """
    n_total_devices = len(jax.devices())
    n_data = n_total_devices // n_model
    mesh = pmesh.make_mesh(n_data, n_model)
    engine = pmesh.ShardedDenseEngine.build(plan, mesh)
    counts, counters = engine.initial_state()
    step = engine.make_step()

    host_id = jax.process_index()
    n_hosts = jax.process_count()
    start, end = dist.host_byte_range(config.fastq, host_id, n_hosts)

    # per-host rows of the global batch: global B = batch_size, each host
    # owns batch_size / n_hosts rows
    if config.batch_size % n_hosts:
        raise ValueError("batch size must divide evenly across hosts")
    local_rows = config.batch_size // n_hosts

    from ngs_barcode_count_tpu.io import batcher as batcher_mod

    sh2 = NamedSharding(mesh, P("data", None))
    sh1 = NamedSharding(mesh, P("data"))

    def globalize(bases, quals, lengths, mask):
        gb = (config.batch_size, bases.shape[1])
        return (
            jax.make_array_from_process_local_data(sh2, bases, gb),
            jax.make_array_from_process_local_data(sh2, quals, gb),
            jax.make_array_from_process_local_data(
                sh1, lengths, (config.batch_size,)
            ),
            jax.make_array_from_process_local_data(
                sh1, mask, (config.batch_size,)
            ),
        )

    it = batcher_mod.batches(
        dist.read_fastq_range(
            config.fastq, start, end, min_width=scheme.length,
            batch_reads=local_rows,
        )
        if end > start
        else iter(()),
        batch_size=local_rows,
        min_width=scheme.length,
    )
    total_local = 0
    width = None
    done = False
    while True:
        batch = next(it, None)
        if batch is None:
            done = True
            w = width or -(-scheme.length // 32) * 32
            import numpy as _np

            bases = _np.full((local_rows, w), 6, _np.int8)
            quals = _np.zeros((local_rows, w), _np.int8)
            lengths = _np.zeros(local_rows, _np.int32)
            mask = _np.zeros(local_rows, bool)
        else:
            width = batch.bases.shape[1]
            bases, quals, lengths, mask = (
                batch.bases, batch.quals, batch.lengths, batch.read_mask,
            )
            total_local += batch.n_reads
        if all_hosts_done(done):
            break
        gb = globalize(bases, quals, lengths, mask)
        counts, counters = step(counts, counters, *gb)

    mc, mctr = engine.merge(counts, counters)
    return np.asarray(mc), np.asarray(mctr), total_local
