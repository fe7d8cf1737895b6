"""Multi-chip sharding tests on the virtual 8-device CPU mesh:
data-parallel count merging and model-parallel tie-drop argmin must equal
the single-device dense path exactly (SURVEY.md section 4c)."""

import numpy as np
import pytest

import jax

from ngs_barcode_count_tpu import dna, stats
from ngs_barcode_count_tpu.conversions import BarcodeConversions, BarcodeSet
from ngs_barcode_count_tpu.errors import MaxSeqErrors
from ngs_barcode_count_tpu.ops import decode as dec
from ngs_barcode_count_tpu.parallel import mesh as pmesh
from ngs_barcode_count_tpu.utils import simulate

from tests.test_decode_vs_oracle import (
    SAMPLES,
    BC1,
    BC2,
    BC3,
    build_plan,
    encode_batch,
    gen_reads,
)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2), (2, 4)])
def test_sharded_dense_equals_single(example_scheme, rng, eight_devices,
                                     n_data, n_model):
    plan, oracle, conv = build_plan(example_scheme)
    # random barcode in example scheme -> dense_counts False; strip random
    # by rebuilding a plan on a random-free scheme for the dense engine.
    from ngs_barcode_count_tpu.scheme import parse_scheme_text
    from tests.conftest import EXAMPLE_SCHEME

    scheme = parse_scheme_text(EXAMPLE_SCHEME.replace("(8)\n", ""))
    plan, oracle, conv = None, None, None
    plan, oracle, conv = build_plan(scheme)
    assert plan.dense_counts

    reads = gen_reads(rng, scheme, 128, err_range=(0, 10))
    quals = ["I" * len(r) for r in reads]
    bases, quality, lengths, mask = encode_batch(reads, quals)

    # single-device reference counts
    counts0 = np.zeros(plan.n_samples * plan.n_combos, np.int32)
    import jax.numpy as jnp

    c, ctr = dec.dense_count_step(
        plan, jnp.asarray(counts0), jnp.zeros(stats.NUM_COUNTERS, jnp.int32),
        bases, quality, lengths, mask,
    )
    ref_counts, ref_counters = np.asarray(c), np.asarray(ctr)

    mesh = pmesh.make_mesh(n_data, n_model, eight_devices)
    eng = pmesh.ShardedDenseEngine.build(plan, mesh)
    counts, counters = eng.initial_state()
    step = eng.make_step()
    sb, sq, sl, sm = eng.shard_batch(bases, quality, lengths, mask)
    counts, counters = step(counts, counters, sb, sq, sl, sm)
    mc, mctr = eng.merge(counts, counters)
    np.testing.assert_array_equal(np.asarray(mc), ref_counts)
    np.testing.assert_array_equal(np.asarray(mctr), ref_counters)


def test_model_parallel_matcher_tie_drop(eight_devices):
    """Sharded argmin preserves unique-min and tie-drop across shards."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    cands = ["AAAAAA", "AAAATT", "CCCCCC", "GGGGGG", "TTTTTT", "ACACAC",
             "AGAGAG", "ATATAT"]
    bset = BarcodeSet.from_pairs([(c, str(i)) for i, c in enumerate(cands)], 6)
    n_model = 4
    per = 2
    oh = bset.onehot.reshape(n_model, per, -1)
    nm = bset.n_mask.reshape(n_model, per, -1)

    # reads: exact hit, 1-mismatch unique, tie between AAAAAA and AAAATT
    reads = ["CCCCCC", "CCCCCA", "AAAATA", "NNNNNN"]
    codes = np.stack([dna.encode(r) for r in reads])

    mesh = Mesh(np.array(eight_devices[:n_model]).reshape(1, n_model),
                ("data", "model"))

    def local(oh_s, nm_s, codes):
        return pmesh.match_barcodes_model_parallel(
            codes, oh_s[0], nm_s[0], len(cands), 1
        )

    f = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("model", None, None), P("model", None, None), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    idx, ok = f(oh, nm, codes)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok[0] and cands[idx[0]] == "CCCCCC"
    assert ok[1] and cands[idx[1]] == "CCCCCC"
    # "AAAATA": dist 1 to AAAAAA (pos 4 T) and 1 to AAAATT (pos 5 A) -> tie
    assert not ok[2]
    # all-N read: distance 0 to every candidate -> tie -> dropped
    assert not ok[3]


def test_model_parallel_with_n_candidates(eight_devices):
    """Sharded matcher with N-containing candidates: the -3 correction
    must survive the shard split."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    cands = ["AANAAA", "CCCCCC", "GGGGGG", "TTTTNT"]
    bset = BarcodeSet.from_pairs([(c, str(i)) for i, c in enumerate(cands)], 6)
    n_model = 2
    oh = bset.onehot.reshape(n_model, 2, -1)
    nm = bset.n_mask.reshape(n_model, 2, -1)
    reads = ["AACAAA",  # dist 0 to AANAAA (N wildcard)
             "TTTTTT",  # dist 0 to TTTTNT
             "NNNNNN"]  # dist 0 to everything -> tie -> dropped
    codes = np.stack([dna.encode(r) for r in reads])
    mesh = Mesh(np.array(eight_devices[:n_model]).reshape(1, n_model),
                ("data", "model"))

    def local(oh_s, nm_s, codes):
        return pmesh.match_barcodes_model_parallel(
            codes, oh_s[0], nm_s[0], len(cands), 1
        )

    f = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("model", None, None), P("model", None, None), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    idx, ok = f(oh, nm, codes)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok[0] and cands[idx[0]] == "AANAAA"
    assert ok[1] and cands[idx[1]] == "TTTTNT"
    assert not ok[2]


def test_sharded_fix_quirks_quality_parity(rng, eight_devices):
    """--fix-quirks + --min-quality on the sharded engine must equal the
    single-device fix-quirks path (round 1 silently kept the quirk
    quality offset in decode_batch_sharded)."""
    import jax.numpy as jnp
    from ngs_barcode_count_tpu.scheme import parse_scheme_text
    from tests.conftest import EXAMPLE_SCHEME
    from tests.test_fix_quirks import build_plan_fix

    scheme = parse_scheme_text(EXAMPLE_SCHEME.replace("(8)\n", ""))
    plan, _, _ = build_plan_fix(scheme, min_quality=30.0, fix_quirks=True)
    assert plan.dense_counts

    # Targeted read: forced repair (2 constant errors) behind a low-quality
    # left flank.  Quirk semantics read quality from offset 0 (flank ->
    # low quality); fix-quirks reads from the matched window (all 'I' ->
    # passes).  The old sharded bug would flip this read's outcome.
    flank = 8
    read = simulate.make_read(
        rng, scheme, SAMPLES[0], [BC1[0], BC2[0], BC3[0]],
        flank_left=flank, flank_right=0, n_errors=2,
    )
    qual_t = "!" * flank + "I" * (len(read) - flank)
    # plus a batch of noisy-quality reads for breadth
    reads = [read] + gen_reads(rng, scheme, 127, err_range=(0, 6))
    quals = [qual_t]
    for r in reads[1:]:
        q = rng.integers(20, 41, len(r)) + 33
        quals.append("".join(chr(int(x)) for x in q))
    bases, quality, lengths, mask = encode_batch(reads, quals)

    counts0 = jnp.zeros(plan.n_samples * plan.n_combos, jnp.int32)
    ctr0 = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    c, ctr = dec.dense_count_step(
        plan, counts0, ctr0, bases, quality, lengths, mask
    )
    ref_counts, ref_counters = np.asarray(c), np.asarray(ctr)
    # the targeted read must be matched under fix-quirks semantics
    out = dec.keyed_decode_step(plan, bases, quality, lengths, mask)
    assert bool(np.asarray(out["valid"])[0])

    mesh = pmesh.make_mesh(4, 2, eight_devices)
    eng = pmesh.ShardedDenseEngine.build(plan, mesh)
    counts, counters = eng.initial_state()
    step = eng.make_step()
    sb, sq, sl, sm = eng.shard_batch(bases, quality, lengths, mask)
    counts, counters = step(counts, counters, sb, sq, sl, sm)
    mc, mctr = eng.merge(counts, counters)
    np.testing.assert_array_equal(np.asarray(mc), ref_counts)
    np.testing.assert_array_equal(np.asarray(mctr), ref_counters)


def test_model_shards_cli_run_equals_single(tmp_path, rng, eight_devices):
    """--model-shards plumbed end to end: a run() with a large candidate
    set sharded over 2 model devices must produce identical counts to
    the unsharded single-device run."""
    from ngs_barcode_count_tpu.runner import RunConfig, run

    # 2000 unique 10-mers: large enough that replicating is the thing
    # model parallelism avoids
    cands = set()
    while len(cands) < 2000:
        cands.add(simulate.random_seq(rng, 10))
    cands = sorted(cands)
    fmt = tmp_path / "scheme.txt"
    fmt.write_text("ACGTACGTGGCA\n{10}\nTTACGGAT\n")
    cf = tmp_path / "bc.csv"
    cf.write_text(
        "Barcode,ID,Num\n"
        + "".join(f"{b},X{i},1\n" for i, b in enumerate(cands))
    )
    reads = []
    for _ in range(300):
        bc = cands[int(rng.integers(0, len(cands)))]
        reads.append(
            simulate.random_seq(rng, int(rng.integers(0, 6)))
            + "ACGTACGTGGCA" + bc + "TTACGGAT"
            + simulate.random_seq(rng, int(rng.integers(0, 6)))
        )
    fq = tmp_path / "reads.fastq"
    simulate.write_fastq(str(fq), reads)

    def cfg(n_dev, n_model, sub):
        (tmp_path / sub).mkdir(exist_ok=True)
        return RunConfig(
            fastq=str(fq), format=str(fmt),
            counted_barcodes_option=str(cf),
            output_dir=str(tmp_path / sub), prefix="ms",
            batch_size=128, progress=False,
            n_devices=n_dev, model_shards=n_model,
        )

    r1 = run(cfg(1, 1, "single"))
    r2 = run(cfg(4, 2, "sharded"))
    assert r1.total_reads == r2.total_reads == 300
    np.testing.assert_array_equal(
        r1.seq_errors.counters, r2.seq_errors.counters
    )
    assert r1.results.per_sample == r2.results.per_sample
