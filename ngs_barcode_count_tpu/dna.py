"""DNA alphabet encoding shared across host and device code.

The device never sees strings: bases are int8 codes. Code 4 ('N') is a
wildcard on both sides of a comparison, matching the reference's
``fix_error`` semantics (parse.rs:569: a position only mismatches when the
characters differ AND neither is 'N'). Any other character (padding, rare
IUPAC letters) maps to OTHER, which never matches anything.
"""

from __future__ import annotations

import numpy as np

A, C, G, T, N = 0, 1, 2, 3, 4
OTHER = 5  # anything that is not A/C/G/T/N (never matches, not wildcard)
PAD = 6  # positions past the true read length

NUM_SYMBOLS = 7
BASES = "ACGTN"

# ASCII -> code lookup. Uppercase only: the reference compares read
# sequences as-is against uppercased constants and `[AGCT]` / fix_error
# candidate strings (parse.rs:92, 569), so a lowercase base in a read can
# never match anything there. Mapping lowercase to OTHER reproduces that
# exactly (OTHER never matches and is not a wildcard).
ASCII_TO_CODE = np.full(256, OTHER, dtype=np.int8)
for i, b in enumerate("ACGTN"):
    ASCII_TO_CODE[ord(b)] = i

CODE_TO_CHAR = np.array(list("ACGTN?."), dtype="U1")


def encode(seq: str) -> np.ndarray:
    """Encode a DNA string to int8 codes."""
    raw = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    return ASCII_TO_CODE[raw]


def decode(codes: np.ndarray) -> str:
    """Decode int8 codes back to a DNA string (PAD -> '.')."""
    return "".join(CODE_TO_CHAR[np.asarray(codes, dtype=np.int64)])


def onehot_match(codes: np.ndarray, num_cols: int = 4) -> np.ndarray:
    """One-hot over {A,C,G,T} with N as all-ones (wildcard row).

    With reads encoded this way and candidate barcodes one-hot (no N), the
    per-position dot product is 1 iff the position matches under the
    reference's N-wildcard rule, so a single matmul computes match counts.
    """
    codes = np.asarray(codes)
    out = np.zeros(codes.shape + (num_cols,), dtype=np.int8)
    for b in range(4):
        out[..., b] = codes == b
    out[codes == N] = 1
    return out


def pack_2bit(codes: np.ndarray, axis: int = -1) -> np.ndarray:
    """Pack ACGT codes (values 0..3) along ``axis`` into uint64 keys.

    Used for raw-DNA count keys when no conversion file is given. Any code
    >= 4 (N / other) makes the key unreliable for 2-bit packing, so callers
    that may see Ns must use :func:`pack_3bit`.
    """
    codes = np.asarray(codes, dtype=np.uint64)
    n = codes.shape[axis]
    if n > 32:
        raise ValueError(f"cannot 2-bit pack {n} bases into 64 bits")
    shifts = (2 * np.arange(n, dtype=np.uint64)).reshape(
        [-1 if i == (axis % codes.ndim) else 1 for i in range(codes.ndim)]
    )
    return np.bitwise_or.reduce(codes << shifts, axis=axis)


def pack_3bit(codes: np.ndarray, axis: int = -1) -> np.ndarray:
    """Pack codes 0..5 (ACGTN + other) along ``axis`` into uint64 keys."""
    codes = np.asarray(codes, dtype=np.uint64)
    n = codes.shape[axis]
    if n > 21:
        raise ValueError(f"cannot 3-bit pack {n} bases into 64 bits")
    shifts = (3 * np.arange(n, dtype=np.uint64)).reshape(
        [-1 if i == (axis % codes.ndim) else 1 for i in range(codes.ndim)]
    )
    return np.bitwise_or.reduce(codes << shifts, axis=axis)


def unpack_3bit(keys: np.ndarray, length: int) -> np.ndarray:
    """Inverse of :func:`pack_3bit` -> int8 codes of shape keys.shape + (length,)."""
    keys = np.asarray(keys, dtype=np.uint64)
    shifts = (3 * np.arange(length, dtype=np.uint64)).reshape(
        (1,) * keys.ndim + (-1,)
    )
    return ((keys[..., None] >> shifts) & np.uint64(7)).astype(np.int8)
