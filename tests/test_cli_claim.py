"""CLI accelerator-claim handling: a persistent backend-init failure
must exit cleanly with a clear message (not a traceback), and
NGS_CPU_FALLBACK=1 must fall over to a working CPU run."""

import numpy as np
import pytest

from ngs_barcode_count_tpu.utils import claim as claim_mod
from tests.test_end_to_end import _mk_config, gen_fastq, write_inputs


def _cli_args(cfg):
    args = [
        "-f", cfg.fastq, "-q", cfg.format,
        "-o", cfg.output_dir, "-p", "cliclaim",
    ]
    if cfg.sample_barcodes_option:
        args += ["-s", cfg.sample_barcodes_option]
    if cfg.counted_barcodes_option:
        args += ["-c", cfg.counted_barcodes_option]
    return args


@pytest.fixture()
def cli_inputs(tmp_path, rng):
    from ngs_barcode_count_tpu.runner import setup

    paths = write_inputs(tmp_path)
    cfg0 = _mk_config(tmp_path, "x.fastq", paths)
    scheme, *_ = setup(cfg0)
    fq, reads, quals = gen_fastq(tmp_path, scheme, 100, rng)
    return _mk_config(tmp_path, fq, paths)


def test_cli_claim_failure_is_clean_error(cli_inputs, monkeypatch, capsys):
    from ngs_barcode_count_tpu import cli

    def always_down(**kw):
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE"
        )

    monkeypatch.setattr(claim_mod, "claim_devices", always_down)
    monkeypatch.delenv("NGS_CPU_FALLBACK", raising=False)
    rc = cli.main(_cli_args(cli_inputs))
    assert rc == 1
    err = capsys.readouterr().err
    assert "accelerator unavailable after retries" in err
    assert "NGS_CPU_FALLBACK=1" in err


def test_cli_claim_failure_cpu_fallback_runs(cli_inputs, monkeypatch,
                                             capsys, tmp_path):
    from ngs_barcode_count_tpu import cli

    def always_down(**kw):
        raise RuntimeError("UNAVAILABLE")

    calls = {"force_cpu": 0}
    monkeypatch.setattr(claim_mod, "claim_devices", always_down)
    # tests already run on CPU: force_cpu would reset jax's platform
    # config mid-suite, so stub it and just assert it was invoked
    monkeypatch.setattr(
        claim_mod, "force_cpu",
        lambda: calls.__setitem__("force_cpu", calls["force_cpu"] + 1),
    )
    monkeypatch.setenv("NGS_CPU_FALLBACK", "1")
    rc = cli.main(_cli_args(cli_inputs))
    assert rc == 0
    assert calls["force_cpu"] == 1
    assert (tmp_path / "cliclaim_barcode_stats.txt").exists()
