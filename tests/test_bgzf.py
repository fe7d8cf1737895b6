"""BGZF member-parallel gzip ingest: exact read-set parity with the
plain-file reader, across thread-boundary record splits."""

import struct
import zlib

import numpy as np
import pytest

from ngs_barcode_count_tpu import dna
from ngs_barcode_count_tpu.io import bgzf, native
from ngs_barcode_count_tpu.ops.decode import unpack_bases
from ngs_barcode_count_tpu.utils import simulate

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec not built"
)


def write_bgzf(path: str, payload: bytes, block: int = 4096) -> None:
    """Minimal BGZF writer: gzip members with the BC/BSIZE extra field."""
    out = bytearray()
    for i in range(0, max(len(payload), 1), block):
        chunk = payload[i : i + block]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = 12 + 6 + len(cdata) + 8  # header+xtra+data+crc/isize
        header = (
            b"\x1f\x8b\x08\x04" + b"\x00" * 6
            + struct.pack("<H", 6)  # XLEN
            + b"BC" + struct.pack("<H", 2) + struct.pack("<H", bsize - 1)
        )
        out += header + cdata + struct.pack(
            "<II", zlib.crc32(chunk), len(chunk) % (1 << 32)
        )
    with open(path, "wb") as f:
        f.write(bytes(out))


def _decode_all(pbs):
    got = []
    import jax

    for pb in pbs:
        packed = (
            np.ascontiguousarray(pb.packed.T) if pb.transposed else pb.packed
        )
        bases = np.asarray(
            jax.jit(unpack_bases, static_argnums=3)(
                packed, pb.exc_idx, pb.exc_val, pb.width
            )
        )
        for i in range(pb.n_reads):
            got.append(dna.decode(bases[i, : pb.lengths[i]]))
    return got


def test_member_offsets_and_detection(tmp_path, rng):
    reads = [simulate.random_seq(rng, 60) for _ in range(500)]
    text = "".join(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n"
                   for i, r in enumerate(reads)).encode()
    p = tmp_path / "x.fastq.gz"
    write_bgzf(str(p), text, block=1000)
    offs = bgzf.member_offsets(str(p))
    assert offs is not None and len(offs) == -(-len(text) // 1000)
    assert bgzf.is_bgzf(str(p))
    # a plain gzip is not BGZF
    import gzip

    p2 = tmp_path / "y.fastq.gz"
    with gzip.open(str(p2), "wb") as f:
        f.write(text)
    assert not bgzf.is_bgzf(str(p2))


@pytest.mark.parametrize("n_threads", [1, 3, 4])
def test_bgzf_parallel_read_parity(tmp_path, rng, n_threads):
    reads = [
        simulate.random_seq(rng, int(rng.integers(40, 120)))
        for _ in range(3000)
    ]
    text = "".join(f"@read{i} x\n{r}\n+\n{'F' * len(r)}\n"
                   for i, r in enumerate(reads)).encode()
    p = tmp_path / "x.fastq.gz"
    write_bgzf(str(p), text, block=777)  # tiny blocks: many boundary splits
    got = _decode_all(
        bgzf.read_fastq_bgzf_parallel(
            str(p), batch_reads=256, n_threads=n_threads
        )
    )
    assert sorted(got) == sorted(reads)


def test_bgzf_through_parallel_ingest(tmp_path, rng, monkeypatch):
    """The ingest front door routes BGZF files to the parallel reader."""
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )

    reads = [simulate.random_seq(rng, 50) for _ in range(2000)]
    text = "".join(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n"
                   for i, r in enumerate(reads)).encode()
    p = tmp_path / "x.fastq.gz"
    write_bgzf(str(p), text, block=512)
    # force the bgzf branch despite the small file size
    import ngs_barcode_count_tpu.io.parallel_ingest as pi

    monkeypatch.setattr(
        "os.path.getsize", lambda _: 9 << 20
    ) if False else None
    got = _decode_all(
        bgzf.read_fastq_bgzf_parallel(str(p), batch_reads=128, n_threads=4)
    )
    assert sorted(got) == sorted(reads)


def test_bgzf_member_range_partition(tmp_path, rng):
    """Two member-range halves (the multi-host split) recover exactly
    the records of a whole-file read, once each."""
    from ngs_barcode_count_tpu.io.parallel_ingest import (
        read_fastq_packed_parallel,
    )

    reads = [simulate.random_seq(rng, int(rng.integers(30, 70)))
             for _ in range(801)]
    text = "".join(
        f"@r{i}\n{r}\n+\n{'I' * len(r)}\n" for i, r in enumerate(reads)
    ).encode()
    p = tmp_path / "x.fastq.gz"
    write_bgzf(str(p), text, block=700)
    import os
    size = os.path.getsize(p)

    whole = _decode_all(read_fastq_packed_parallel(str(p), batch_reads=64))
    halves = []
    for h in range(2):
        br = (size * h // 2, size * (h + 1) // 2)
        halves += _decode_all(read_fastq_packed_parallel(
            str(p), batch_reads=64, byte_range=br, n_threads=2,
        ))
    assert sorted(halves) == sorted(whole)
    assert sorted(whole) == sorted(reads)
