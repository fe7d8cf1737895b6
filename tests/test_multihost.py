"""Single-process exercise of the multi-host run loop: with
process_count()==1 the lockstep loop must equal the plain dense run."""

import numpy as np
import pytest

import jax

from ngs_barcode_count_tpu.parallel import multihost
from ngs_barcode_count_tpu.runner import CountAccumulator, decode_file, setup

from tests.test_end_to_end import gen_fastq, write_inputs, _mk_config


def test_all_hosts_done_single():
    assert multihost.all_hosts_done(True) is True
    assert multihost.all_hosts_done(False) is False


def test_multihost_loop_equals_plain(tmp_path, rng):
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple virtual devices")
    paths = write_inputs(tmp_path)
    cfg0 = _mk_config(tmp_path, "x.fastq", paths)
    scheme, *_ = setup(cfg0)
    fq, reads, quals = gen_fastq(tmp_path, scheme, 500, rng)
    cfg = _mk_config(tmp_path, fq, paths)
    cfg.batch_size = 128
    scheme, conv, me, plan, _ = setup(cfg)

    counts_mh, counters_mh, local_reads = multihost.run_multihost_dense(
        cfg, plan, scheme, n_model=1
    )
    assert local_reads == 500

    acc = CountAccumulator(plan, conv)
    decode_file(cfg, plan, scheme, acc)
    acc.finalize()
    np.testing.assert_array_equal(counts_mh, np.asarray(acc.dense_state))
    np.testing.assert_array_equal(
        counters_mh, np.asarray(acc.dense_counters)
    )
