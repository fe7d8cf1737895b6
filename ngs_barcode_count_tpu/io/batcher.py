"""Assemble variable-size encoded chunks into fixed-shape device batches.

Static shapes are an XLA requirement: the decode step compiles once per
(B, L) bucket.  The batcher pads read length to a shared bucket width
(multiples of ``width_multiple``) and read count to the batch size,
emitting a ``read_mask`` so padding rows decode to nothing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ngs_barcode_count_tpu import dna
from ngs_barcode_count_tpu.io.fastq import EncodedReads


@dataclass
class ReadBatch:
    bases: np.ndarray  # [B, L] int8
    quals: np.ndarray  # [B, L] int8
    lengths: np.ndarray  # [B] int32
    read_mask: np.ndarray  # [B] bool
    n_reads: int


def _pad_width(a: np.ndarray, width: int, fill: int) -> np.ndarray:
    if a.shape[1] == width:
        return a
    if a.shape[1] > width:
        raise ValueError("chunk wider than target width")
    out = np.full((a.shape[0], width), fill, dtype=a.dtype)
    out[:, : a.shape[1]] = a
    return out


def batches(
    chunks: Iterator[EncodedReads],
    batch_size: int,
    min_width: int,
    width_multiple: int = 32,
) -> Iterator[ReadBatch]:
    """Group encoded chunks into [batch_size, width] batches.

    The width grows monotonically to the widest chunk seen (rounded up to
    ``width_multiple``); a width change mid-run re-pads the pending
    buffer, which at worst triggers one recompile per bucket.
    """
    width = max(min_width, width_multiple)
    width = -(-width // width_multiple) * width_multiple
    pend_b: list[np.ndarray] = []
    pend_q: list[np.ndarray] = []
    pend_l: list[np.ndarray] = []
    n_pend = 0

    def flush(final: bool) -> Iterator[ReadBatch]:
        nonlocal pend_b, pend_q, pend_l, n_pend
        while n_pend >= batch_size or (final and n_pend > 0):
            b = np.concatenate(pend_b) if len(pend_b) > 1 else pend_b[0]
            q = np.concatenate(pend_q) if len(pend_q) > 1 else pend_q[0]
            l = np.concatenate(pend_l) if len(pend_l) > 1 else pend_l[0]
            take = min(batch_size, len(l))
            rest_b, rest_q, rest_l = b[take:], q[take:], l[take:]
            bb, qq, ll = b[:take], q[:take], l[:take]
            if take < batch_size:
                padn = batch_size - take
                bb = np.concatenate(
                    [bb, np.full((padn, width), dna.PAD, np.int8)]
                )
                qq = np.concatenate([qq, np.zeros((padn, width), np.int8)])
                ll = np.concatenate([ll, np.zeros(padn, np.int32)])
            mask = np.zeros(batch_size, dtype=bool)
            mask[:take] = True
            yield ReadBatch(bb, qq, ll, mask, take)
            pend_b = [rest_b] if len(rest_l) else []
            pend_q = [rest_q] if len(rest_l) else []
            pend_l = [rest_l] if len(rest_l) else []
            n_pend = len(rest_l)

    for ch in chunks:
        cw = ch.bases.shape[1]
        if cw > width:
            new_width = -(-cw // width_multiple) * width_multiple
            pend_b = [_pad_width(x, new_width, dna.PAD) for x in pend_b]
            pend_q = [_pad_width(x, new_width, 0) for x in pend_q]
            width = new_width
        pend_b.append(_pad_width(ch.bases, width, dna.PAD))
        pend_q.append(_pad_width(ch.quals, width, 0))
        pend_l.append(ch.lengths)
        n_pend += ch.count
        yield from flush(final=False)
    yield from flush(final=True)
