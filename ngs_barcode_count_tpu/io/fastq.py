"""FASTQ -> tensor ingest (reference input.rs:24-159, redesigned).

The reference's reader thread pushes 4-line strings through a mutex deque
with busy-wait backpressure; parser threads re-split them.  Here the
producer is a chunked, vectorized encoder: file bytes (gzip-decompressed
in streaming multi-member fashion, like flate2's MultiGzDecoder at
input.rs:63-83) are newline-indexed with NumPy, and the sequence/quality
lines become padded ``[n, L]`` int8 code/Phred arrays ready for device
transfer.  A native C++ encoder (io/native.py) replaces the NumPy inner
loop when built; this module is the always-available fallback and the
semantics reference.

Reference behaviors kept:
- extension check: only ``*.fastq`` and ``*.fastq.gz`` (input.rs:35-39);
- first-read format heuristic: line 1 must not look like DNA, line 2 must
  (parse.rs:377-427);
- truncated trailing record is dropped (the reference's 4-line
  accumulator simply never posts it);
- total-read counting for the stats file (input.rs:86).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ngs_barcode_count_tpu import dna


class FastqFormatError(ValueError):
    pass


def _is_sequence_line(line: bytes) -> bool:
    """parse.rs:414-427: at least half the characters are A/C/G/T/N."""
    if not line:
        return True  # empty: 0 < 0/2 is false => Sequence in the reference
    counts = sum(line.count(b) for b in (65, 67, 71, 84, 78))  # A C G T N
    return not (counts < len(line) // 2)


def _gzip_chunks(path: str, chunk_bytes: int) -> Iterator[bytes]:
    """Streaming multi-member gzip decode: keep starting new zlib members
    until the file is exhausted, tolerating a truncated final member with
    a warning (the reference stops at read 0 and warns, input.rs:67-82,
    output.rs:568-572)."""
    d = zlib.decompressobj(wbits=31)
    with open(path, "rb") as f:
        while True:
            raw = f.read(chunk_bytes)
            if not raw:
                break
            while raw:
                out = d.decompress(raw)
                if out:
                    yield out
                if d.eof:
                    raw = d.unused_data
                    d = zlib.decompressobj(wbits=31)
                else:
                    raw = b""
        tail = d.flush()
        if tail:
            yield tail


def _plain_chunks(path: str, chunk_bytes: int) -> Iterator[bytes]:
    with open(path, "rb") as f:
        while True:
            raw = f.read(chunk_bytes)
            if not raw:
                break
            yield raw


@dataclass
class EncodedReads:
    """A chunk of encoded reads (host NumPy, padded to this chunk's width)."""

    bases: np.ndarray  # [n, L] int8 codes (PAD beyond length)
    quals: np.ndarray  # [n, L] int8 Phred (ASCII - 33; 0 beyond length)
    lengths: np.ndarray  # [n] int32

    @property
    def count(self) -> int:
        return len(self.lengths)


# Phred lookup: ASCII - 33, clipped at 0 for control chars.
_PHRED = np.maximum(np.arange(256, dtype=np.int16) - 33, 0).astype(np.int8)


def encode_lines(
    buf: np.ndarray,
    seq_start: np.ndarray,
    seq_len: np.ndarray,
    qual_start: np.ndarray,
    min_width: int,
    pad_multiple: int = 32,
) -> EncodedReads:
    """Vectorized extraction of sequence/quality lines into padded arrays."""
    n = len(seq_start)
    if n == 0:
        w = max(min_width, pad_multiple)
        return EncodedReads(
            np.zeros((0, w), np.int8), np.zeros((0, w), np.int8), seq_len
        )
    lmax = max(int(seq_len.max()), min_width)
    width = -(-lmax // pad_multiple) * pad_multiple
    col = np.arange(width, dtype=np.int64)[None, :]
    mask = col < seq_len[:, None]
    sidx = np.minimum(seq_start[:, None] + col, len(buf) - 1)
    qidx = np.minimum(qual_start[:, None] + col, len(buf) - 1)
    bases = np.where(mask, dna.ASCII_TO_CODE[buf[sidx]], dna.PAD)
    quals = np.where(mask, _PHRED[buf[qidx]], 0)
    return EncodedReads(
        bases.astype(np.int8), quals.astype(np.int8), seq_len.astype(np.int32)
    )


def read_fastq(
    path: str,
    min_width: int = 0,
    chunk_bytes: int = 32 << 20,
    check_format: bool = True,
) -> Iterator[EncodedReads]:
    """Stream a FASTQ (.fastq or .fastq.gz) as EncodedReads chunks."""
    if path.endswith("fastq.gz"):
        source = _gzip_chunks(path, chunk_bytes)
    elif path.endswith("fastq"):
        source = _plain_chunks(path, chunk_bytes)
    else:
        raise FastqFormatError(
            "This program only works with *.fastq files and *.fastq.gz "
            "files.  The latter is still experimental"
        )

    leftover = b""
    line_phase = 0  # 0..3 position within the 4-line record
    first = check_format
    # per-record slots carried across chunk boundaries
    pending: list[bytes] = []

    for raw in source:
        data = leftover + raw
        arr = np.frombuffer(data, dtype=np.uint8)
        nl = np.flatnonzero(arr == 10)
        if len(nl) == 0:
            leftover = data
            continue
        last_complete = int(nl[-1]) + 1
        leftover = data[last_complete:]
        starts = np.concatenate(([0], nl[:-1] + 1)).astype(np.int64)
        ends = nl.astype(np.int64)
        # strip \r for CRLF files
        has_cr = ends > starts
        cr = np.zeros(len(ends), dtype=np.int64)
        if len(ends):
            prev = arr[np.maximum(ends - 1, 0)]
            cr = ((prev == 13) & has_cr).astype(np.int64)
        ends = ends - cr

        n_lines = len(starts)
        # Handle a record split across the chunk boundary via the pending
        # buffer: only full 4-line groups are vectorized; the ragged head
        # completes `pending` first.
        head = (4 - line_phase) % 4
        head = min(head, n_lines)
        out_chunks = []
        if head:
            for i in range(head):
                pending.append(bytes(data[starts[i] : ends[i]]))
            line_phase = (line_phase + head) % 4
            if line_phase == 0 and len(pending) == 4:
                out_chunks.append(_encode_single(pending, min_width, first))
                if first:
                    first = False
                pending = []
        body_starts = starts[head:]
        body_ends = ends[head:]
        n_body = len(body_starts)
        n_rec = n_body // 4
        if n_rec:
            # record lines are [desc, seq, plus, qual] = offsets 0,1,2,3
            seq_start = body_starts[1 : n_rec * 4 : 4]
            seq_end = body_ends[1 : n_rec * 4 : 4]
            qual_start = body_starts[3 : n_rec * 4 : 4]
            if first:
                d0s, d0e = body_starts[0], body_ends[0]
                _check_first(
                    bytes(data[d0s:d0e]), bytes(data[seq_start[0] : seq_end[0]])
                )
                first = False
            out_chunks.append(
                encode_lines(
                    arr,
                    seq_start,
                    (seq_end - seq_start),
                    qual_start,
                    min_width,
                )
            )
        # stash the ragged tail lines
        tail = n_body - n_rec * 4
        for i in range(n_body - tail, n_body):
            pending.append(bytes(data[body_starts[i] : body_ends[i]]))
        line_phase = (line_phase + tail) % 4

        for ch in out_chunks:
            if ch.count:
                yield ch

    # a final line without trailing newline still counts
    if leftover.strip():
        line = leftover.rstrip(b"\r\n")
        pending.append(line)
        line_phase = (line_phase + 1) % 4
        if line_phase == 0 and len(pending) == 4:
            ch = _encode_single(pending, min_width, first)
            if ch.count:
                yield ch
    # any other partial record is dropped, like the reference's
    # never-posted accumulator.


def _check_first(desc: bytes, seq: bytes) -> None:
    if _is_sequence_line(desc):
        raise FastqFormatError(
            "The first line within the FASTQ contains DNA sequences.  "
            "Check the FASTQ format"
        )
    if not _is_sequence_line(seq):
        raise FastqFormatError(
            "The second line within the FASTQ file is not a sequence. "
            "Check the FASTQ format"
        )


def _encode_single(
    lines: list[bytes], min_width: int, check_first: bool
) -> EncodedReads:
    if check_first:
        _check_first(lines[0], lines[1])
    seq, qual = lines[1], lines[3]
    buf = np.frombuffer(seq + qual, dtype=np.uint8)
    return encode_lines(
        buf,
        np.array([0], dtype=np.int64),
        np.array([len(seq)], dtype=np.int64),
        np.array([len(seq)], dtype=np.int64),
        min_width,
    )
