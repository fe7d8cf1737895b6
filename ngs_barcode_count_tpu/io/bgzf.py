"""BGZF-parallel gzip ingest.

Generic gzip is a single DEFLATE stream — decompression is inherently
serial (~1.1M reads/s here).  BGZF (the block-gzip used by htslib/bgzip,
and a valid multi-member gzip) stores the compressed size of every
<=64KB member in a BC extra subfield, so the member table can be walked
from headers alone and decompression parallelizes across threads.

Sharding rule matches parallel/distributed.py: a thread owns the records
whose first byte lands inside its own members' decompressed output; it
inflates slack members past its boundary to finish its last record, and
every thread but the first skips the leading partial record.  The parsed
records flow through the native codec's in-memory reader
(fastq_open_mem) with ``range_end`` enforcing ownership exactly.
"""

from __future__ import annotations

import ctypes
import queue
import struct
import threading
from typing import Iterator

import numpy as np

from ngs_barcode_count_tpu.io import native
from ngs_barcode_count_tpu.io.native import PackedReads

_SENTINEL = None
# enough slack to complete one FASTQ record spanning block boundaries
_SLACK_MEMBERS = 4


def member_table(
    path: str, limit: int | None = None
) -> tuple[list[int], list[int]] | None:
    """(byte offsets, uncompressed sizes) of every BGZF member, or None
    if the file is not BGZF.  ISIZE gives exact inflate output sizes."""
    offsets: list[int] = []
    isizes: list[int] = []
    with open(path, "rb") as f:
        size = f.seek(0, 2)
        pos = 0
        while pos < size:
            f.seek(pos)
            head = f.read(18)
            if len(head) < 18:
                break
            if head[0] != 0x1F or head[1] != 0x8B or head[2] != 8:
                return None
            flg = head[3]
            if not flg & 4:  # FEXTRA required for BGZF
                return None
            xlen = struct.unpack("<H", head[10:12])[0]
            extra = head[12:18] + f.read(max(0, xlen - 6))
            bsize = None
            i = 0
            while i + 4 <= len(extra):
                si1, si2, slen = extra[i], extra[i + 1], struct.unpack(
                    "<H", extra[i + 2 : i + 4]
                )[0]
                if si1 == 66 and si2 == 67 and slen == 2:
                    bsize = struct.unpack(
                        "<H", extra[i + 4 : i + 6]
                    )[0]
                    break
                i += 4 + slen
            if bsize is None:
                return None
            f.seek(pos + bsize + 1 - 4)
            isz = struct.unpack("<I", f.read(4))[0]
            offsets.append(pos)
            isizes.append(isz)
            pos += bsize + 1
            if limit is not None and len(offsets) >= limit:
                return offsets, isizes
        if pos != size:
            return None
    return offsets, isizes


def member_offsets(path: str, limit: int | None = None) -> list[int] | None:
    t = member_table(path, limit)
    return t[0] if t is not None else None


def is_bgzf(path: str) -> bool:
    return member_table(path, limit=8) is not None


def _inflate_span_c(lib, path: str, start: int, end: int,
                    out_size: int) -> np.ndarray:
    """Inflate members in file range [start, end) via the native codec
    (one GIL-free C call; Python zlib on 64KB members serializes on
    interpreter overhead)."""
    out = np.empty(out_size, dtype=np.uint8)
    n = lib.gz_inflate_span(
        path.encode(), start, end,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_size,
    )
    if n < 0:
        raise IOError(f"gz_inflate_span failed for {path} [{start},{end})")
    return out[:n]


def _first_record_start(data: bytes, limit: int = 1 << 20) -> int:
    """Offset of the first FASTQ record start in mid-stream bytes (the
    '@' + '+'-two-lines-later heuristic of parallel/distributed.py).

    Offset 0 itself is a candidate: a thread boundary can land exactly on
    a record start, and that record belongs to THIS thread (the previous
    thread stops before records starting at or past its range end)."""
    window = data[:limit]
    candidates = [0]
    nl = window.find(b"\n")
    if nl >= 0:
        base = nl + 1
    else:
        base = len(window)
    for start in candidates + [base]:
        lines = window[start:].split(b"\n")
        pos = 0
        for i in range(max(len(lines) - 3, 0)):
            ln = lines[i]
            if ln.startswith(b"@") and lines[i + 2].startswith(b"+"):
                seq = lines[i + 1]
                dna = sum(
                    seq.count(c) for c in (b"A", b"C", b"G", b"T", b"N")
                )
                if not (dna < len(seq) // 2):
                    return start + pos
            pos += len(ln) + 1
            if start == 0:
                break  # only test offset 0 itself on the first pass
    return len(data)


def read_fastq_bgzf_parallel(
    path: str,
    min_width: int = 0,
    batch_reads: int = 1 << 17,
    with_quals: bool = False,
    n_threads: int = 0,
    queue_depth: int = 4,
    member_range: tuple[int, int] | None = None,
) -> Iterator[PackedReads]:
    """Member-parallel BGZF FASTQ reader; yields PackedReads like
    read_fastq_native_packed (check the file with is_bgzf first).

    ``member_range`` restricts reading to members [sm, em) — the
    multi-host share; thread spans are carved inside it, and ownership
    of the record straddling the lower boundary follows the same rule
    as thread boundaries (the share containing its first byte)."""
    import os

    if n_threads <= 0:
        n_threads = min(4, os.cpu_count() or 1)
    table = member_table(path)
    if table is None:
        raise ValueError(f"{path} is not a BGZF file")
    offsets, isizes = table
    M = len(offsets)
    size = os.path.getsize(path)
    pre = [0]
    for s in isizes:
        pre.append(pre[-1] + s)
    lo, hi = member_range if member_range is not None else (0, M)
    if hi <= lo:
        return

    lib = native.get_lib()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    if not hasattr(lib, "_mem_configured"):
        lib.fastq_open_mem.restype = ctypes.c_void_p
        lib.fastq_open_mem.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64, ctypes.c_uint64,
        ]
        lib.gz_inflate_span.restype = ctypes.c_int64
        lib.gz_inflate_span.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ]
        lib._mem_configured = True

    def byte_end(midx: int) -> int:
        return offsets[midx] if midx < M else size

    # width pre-scan from the head of the decompressed stream
    head_m = min(_SLACK_MEMBERS, M)
    head = _inflate_span_c(lib, path, 0, byte_end(head_m), pre[head_m])
    width_guess = 0
    for i, line in enumerate(bytes(head).split(b"\n")[:400]):
        if i % 4 == 1:
            width_guess = max(width_guess, len(line))
    width = max(width_guess, min_width, 1)
    width = -(-width // 32) * 32

    # member-index spans per thread (inside this host's member range)
    span_m = hi - lo
    midx = [lo + span_m * t // n_threads for t in range(n_threads)] + [hi]
    spans = [
        (midx[t], midx[t + 1])
        for t in range(n_threads)
        if midx[t + 1] > midx[t]
    ]

    q: queue.Queue = queue.Queue(maxsize=queue_depth)
    errors: list[BaseException] = []
    stop = threading.Event()

    def produce(t: int, sm: int, em: int):
        try:
            slack_m = min(em + _SLACK_MEMBERS, M)
            out_size = pre[slack_m] - pre[sm]
            data = _inflate_span_c(
                lib, path, offsets[sm], byte_end(slack_m), out_size
            )
            proper = pre[em] - pre[sm]
            # only the span starting at the very first member of the
            # FILE owns its leading bytes unconditionally; every other
            # span (thread or host boundary) skips the partial record
            skip = 0 if sm == 0 else _first_record_start(bytes(data))
            data = data[skip:]
            range_end = max(proper - skip, 0)
            h = lib.fastq_open_mem(
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                len(data), range_end,
            )
            if not h:
                raise IOError("fastq_open_mem failed")
            try:
                from ngs_barcode_count_tpu.io.parallel_ingest import (
                    _maybe_transpose,
                )

                for pb in _drain_packed(lib, h, batch_reads, width,
                                        with_quals):
                    if stop.is_set():
                        return
                    q.put(_maybe_transpose(pb))
            finally:
                lib.fastq_close(h)
        except BaseException as e:
            errors.append(e)
        finally:
            q.put(_SENTINEL)

    threads = [
        threading.Thread(target=produce, args=(t, sm, em), daemon=True)
        for t, (sm, em) in enumerate(spans)
    ]
    for th in threads:
        th.start()
    live = len(threads)
    try:
        while live:
            item = q.get()
            if item is _SENTINEL:
                live -= 1
                continue
            yield item
        if errors:
            raise errors[0]
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


def _drain_packed(lib, h, batch_reads, width, with_quals):
    cap_exc = max(4096, batch_reads * width // 64)
    I8 = ctypes.POINTER(ctypes.c_int8)
    while True:
        packed = np.zeros((batch_reads, width // 4), dtype=np.uint8)
        lengths = np.zeros(batch_reads, dtype=np.int32)
        exc_idx = np.full(cap_exc, -1, dtype=np.int32)
        exc_val = np.zeros(cap_exc, dtype=np.int8)
        quals = (
            np.zeros((batch_reads, width), dtype=np.int8)
            if with_quals
            else None
        )
        nexc = ctypes.c_int64(0)
        n = lib.fastq_next_batch_packed(
            h, batch_reads, width,
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap_exc,
            exc_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            exc_val.ctypes.data_as(I8),
            ctypes.byref(nexc),
            quals.ctypes.data_as(I8) if with_quals else I8(),
        )
        if n == 0:
            return
        if n == -1:
            cap_exc = max(cap_exc * 2, -nexc.value)
            continue
        if n < -1:
            width = -(-(-n) // 32) * 32
            continue
        ne = nexc.value
        exc_idx[ne:] = -1
        bucket = 1024
        while bucket < ne:
            bucket *= 2
        bucket = min(bucket, cap_exc)
        ldtype = np.int16 if width <= 32767 else np.int32
        yield PackedReads(
            packed, lengths.astype(ldtype), exc_idx[:bucket],
            exc_val[:bucket], quals, int(n), width,
        )
