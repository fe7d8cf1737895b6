"""Fused Pallas decode kernel: the whole per-read hot path in one VMEM
pass.

The XLA path (ops/decode.py) materializes a ``[B, 5, L]`` float one-hot
in HBM for the offset-scan conv plus per-slot one-hots for the matcher —
~2KB of HBM traffic per read.  This kernel keeps a tile of reads
resident in VMEM end to end:

  bases tile [TB, L] ──(c-major one-hot: 5 vector compares)──► [TB, 5L]
    ──(ONE MXU matmul vs the precomputed scan matrix)──► per-offset
        strict-const / wild-ACGT / relaxed-const match counts
    ──(VPU leftmost-exact + repair argmin with tie-drop)──► offset
    ──(one-hot offset select: O-step FMA loop)──► realigned format region
    ──(per-slot MXU matmul vs candidate matrix, N fixup folded in)──►
        mismatch counts ──(unique-argmin, budget, tie-drop)──► combo

and writes two int32 vectors per read: flat count index and status.
Semantics are bit-identical to ops/decode.py (same oracle parity suite,
plus compiled-vs-XLA equality on multi-million-read real-TPU runs).

Kernels cover every decode configuration: dense counts (with or without
the fused in-kernel quality gate — raw Phred or the 4-bit codebook wire
decoded in-kernel), the keyed modes (raw-DNA slots and random barcodes)
via build_pallas_decode_keyed, which emits the wire matrix directly,
plus the fused hashset/bitmap/keyed wire steps.  Since round 4 the
DEFAULT everywhere is the deinterleaved packed-input variant (2-bit
unpack in-kernel; see the deint section below) and Pallas dispatch wins
even on relay links; ``NGS_DECODE_KERNEL=xla`` /
``NGS_KERNEL_PACKED_INPUT=0`` revert.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ngs_barcode_count_tpu import dna
from ngs_barcode_count_tpu.ops.decode import DecodePlan
from ngs_barcode_count_tpu.scheme import KIND_CONST, KIND_WILD

# status codes emitted per read
ST_VALID = 0
ST_CONST = 1
ST_SAMPLE = 2
ST_BARCODE = 3
ST_PADDING = 4
ST_LOWQ = 5

_BIG = np.int32(1 << 20)


def _split_mm() -> bool:
    """Kernel formulation toggle (perf experiment, bit-identical
    results): NGS_KERNEL_SPLIT_MM=1 replaces each one-hot-concat +
    single-matmul pair with per-base-class matmuls accumulated —
    no [TB, 5L] concat relayout, at the cost of 5 thinner MXU calls.
    Default off; scripts/r3_perf_session.py A/Bs it on hardware."""
    import os

    return os.environ.get("NGS_KERNEL_SPLIT_MM") == "1"


def _mm_dtype():
    """Matmul operand dtype for the one-hot products.  Default bf16
    (exact for 0/1/-3 operands under f32 accumulation).
    NGS_KERNEL_I8MM=1 switches to int8 operands with int32 accumulation
    (2x MXU rate) — pure integer arithmetic, also exact (A/B'd on
    hardware; split from the int8 FRONT END so Mosaic legalization
    failures can be isolated per stage)."""
    import os

    return (
        jnp.int8 if os.environ.get("NGS_KERNEL_I8MM") == "1"
        else jnp.bfloat16
    )


def _i8_native() -> bool:
    """NGS_KERNEL_I8FRONT=1: keep tile loads, compares, and the realign
    shifter on int8 lanes (4x the VPU density of the f32 front end);
    independent of the matmul operand dtype (_mm_dtype)."""
    import os

    return os.environ.get("NGS_KERNEL_I8FRONT") == "1"


def _packed_scan() -> bool:
    """NGS_KERNEL_PACKED_SCAN=1 packs the offset-scan's three per-offset
    counts (strict-const, wild-ACGT, read-N-at-const) into ONE column per
    offset with power-of-two weights, decoded by shifts — the scan matmul
    shrinks from [5L, 3*O_pad] to [5L, O_pad] (3x fewer MXU FLOPs and a
    3x smaller int32 scan intermediate).  Exact: every weight is a single
    power of two (bf16-representable) and the packed sum stays < 2^24
    (f32 accumulation is exact there; checked at build, classic fallback
    otherwise).  Incompatible with int8 operands (weights exceed int8),
    so I8MM wins when both are set."""
    import os

    return (
        os.environ.get("NGS_KERNEL_PACKED_SCAN") == "1"
        and os.environ.get("NGS_KERNEL_I8MM") != "1"
    )


def _variant_key():
    """Formulation fingerprint for the compiled-step caches."""
    return (
        _split_mm(), _mm_dtype() == jnp.int8, _packed_scan(),
        _i8_native(),
    )


def _onehot_dot(src, w_ref, L: int, n_cls: int = 5, is_n=None):
    """dot(one_hot(src), W) in the configured formulation: fused
    [TB, n_cls*L] build + one matmul (default) or n_cls separate
    [TB, L] x [L, C] matmuls summed (split_mm), with bf16 or int8
    operands (_mm_dtype).  ``is_n`` (BOOL read-N mask) ORs into base
    classes 0..3 and is class 4 itself, matching _kernel_match's
    encoding; None = plain equality one-hot (the scan matmul).  Every
    variant computes the same exact integer counts.  (The OR runs on
    bools before the cast: an int8 jnp.maximum formulation hit a
    Mosaic legalization failure on arith.maxsi — hardware A/B r4.)"""
    dt = _mm_dtype()
    acc_t = jnp.int32 if dt == jnp.int8 else jnp.float32
    if is_n is None:
        blocks = [(src == c).astype(dt) for c in range(n_cls)]
    else:
        blocks = [
            ((src == c) | is_n).astype(dt) for c in range(4)
        ]
        blocks.append(is_n.astype(dt))
    if not _split_mm():
        m_in = jnp.concatenate(blocks, axis=1)
        return jnp.dot(m_in, w_ref[...], preferred_element_type=acc_t)
    acc = None
    for c, blk in enumerate(blocks):
        part = jnp.dot(
            blk, w_ref[c * L : (c + 1) * L, :],
            preferred_element_type=acc_t,
        )
        acc = part if acc is None else acc + part
    return acc


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _scan_matrix(plan: DecodePlan, L: int, O: int, O_pad: int) -> np.ndarray:
    """[5L, 3*O_pad] f32 weight matrix.  Column layout (contiguous
    groups): [0, O_pad) strict-const matches per offset, [O_pad, 2*O_pad)
    wild-position ACGT hits, [2*O_pad, 3*O_pad) relaxed-const matches
    (read 'N' wildcard, parse.rs:569).  Input rows are c-major: c*L+l."""
    scheme = plan.scheme
    F = scheme.length
    W = np.zeros((5 * L, 3 * O_pad), dtype=np.float32)
    for o in range(O):
        for p in range(F):
            k = scheme.kind[p]
            l = o + p
            if l >= L:
                break
            if k == KIND_CONST:
                b = int(scheme.fmt_codes[p])
                W[b * L + l, o] += 1.0
                W[b * L + l, 2 * O_pad + o] += 1.0
                W[dna.N * L + l, 2 * O_pad + o] += 1.0
            elif k == KIND_WILD:
                for b in range(4):
                    W[b * L + l, O_pad + o] += 1.0
    return W


def _scan_matrix_packed(plan: DecodePlan, L: int, O: int, O_pad: int):
    """[5L, O_pad] f32 weight matrix packing the three scan counts into
    one column per offset: read-N-at-const hits (low ``b_n`` bits),
    wild-position ACGT hits (next ``b_w`` bits), strict-const matches
    (high bits).  Each entry is a single power of two.  Returns
    (W, b_n, b_w); relax = strict + nhits (a read 'N' matches a constant
    only via the wildcard rule, parse.rs:569)."""
    scheme = plan.scheme
    F = scheme.length
    n_const = int(np.sum(scheme.kind == KIND_CONST))
    n_wild = int(np.sum(scheme.kind == KIND_WILD))
    b_n = int(n_const).bit_length()
    b_w = int(n_wild).bit_length()
    w_strict = float(1 << (b_n + b_w))
    w_wild = float(1 << b_n)
    W = np.zeros((5 * L, O_pad), dtype=np.float32)
    for o in range(O):
        for p in range(F):
            k = scheme.kind[p]
            l = o + p
            if l >= L:
                break
            if k == KIND_CONST:
                b = int(scheme.fmt_codes[p])
                W[b * L + l, o] += w_strict
                W[dna.N * L + l, o] += 1.0
            elif k == KIND_WILD:
                for b in range(4):
                    W[b * L + l, o] += w_wild
    return W, b_n, b_w


def _scan_is_packed(plan: DecodePlan) -> bool:
    """Whether _build_scan will pick the packed single-column scan: the
    variant is enabled and its sum bound fits f32-exact integers.
    Cheap (no matrix construction) — flops accounting uses it too."""
    scheme = plan.scheme
    n_const = int(np.sum(scheme.kind == KIND_CONST))
    n_wild = int(np.sum(scheme.kind == KIND_WILD))
    b_n = int(n_const).bit_length()
    b_w = int(n_wild).bit_length()
    bound = (
        n_const * (1 << (b_n + b_w)) + n_wild * (1 << b_n) + n_const
    )
    return _packed_scan() and bound < (1 << 24)


def _build_scan(plan: DecodePlan, L: int, O: int, O_pad: int):
    """Pick the scan-matrix formulation: (W, (b_n, b_w)) when the packed
    variant applies (_scan_is_packed), else (W_classic, None)."""
    if _scan_is_packed(plan):
        W, b_n, b_w = _scan_matrix_packed(plan, L, O, O_pad)
        return W, (b_n, b_w)
    return _scan_matrix(plan, L, O, O_pad), None


def _match_matrix(onehot: np.ndarray, n_mask: np.ndarray, sl: int):
    """[5*sl, nc_pad] f32 candidate matrix.  Input rows (c-major):
    c*sl+i = "read position i is base c" (a read-N sets all four base
    rows); block 4*sl+i is the read-N indicator with weight -3 where the
    candidate is N, cancelling the 4x N-vs-N double count."""
    nc = onehot.shape[0]
    nc_pad = _round_up(max(nc, 1), 128)
    Wm = np.zeros((5 * sl, nc_pad), dtype=np.float32)
    oh = onehot.reshape(nc, sl, 4)
    for j in range(nc):
        for i in range(sl):
            for c in range(4):
                if oh[j, i, c]:
                    Wm[c * sl + i, j] = 1.0
            if n_mask[j, i]:
                Wm[4 * sl + i, j] = -3.0
    return Wm, nc, nc_pad


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


# ---------------------------------------------------------------------------
# Deinterleaved (packed-input) kernel machinery
#
# The XLA unpack prologue (2-bit expand + exception scatter + [B, W]
# int8 materialization) measured 29.2 ns/read on v5e — 1.4x the entire
# fused kernel (R4_SESSION.json H_unpack2).  Moving the expand INTO the
# kernel costs ~1-2 ns, but the natural interleave (l = 4q + k lanes
# from byte q's 4 fields) does not lower on Mosaic (vector reshape
# across lanes fails to legalize).  Solution: keep every per-position
# tensor in DEINTERLEAVED order d(l) = (l % 4) * (W/4) + l // 4 — the
# expand is then a plain lane-dim concat of the four shift planes — and
# permute the rows of every position-indexed matmul matrix (scan,
# matchers, word packers) at BUILD time to match.  The realign shifter
# is reformulated for the deint layout (_realign_deint); contaminated
# block-tail lanes always map to true positions >= W - offset >= F, a
# region nothing reads.  Exceptions (N/OTHER, rare) ship as a 2-bit
# sidecar plane built by ONE tiny XLA scatter (exc_plane) and fold into
# the expand with one select.
# ---------------------------------------------------------------------------


def _deint_index(l: int, W: int) -> int:
    """True position l -> deinterleaved column index."""
    return (l % 4) * (W // 4) + l // 4


def exc_plane(exc_idx, exc_val, B: int, width: int):
    """[cap] flat exception list -> [B, W/4] uint8 2-bit code plane
    (0 = none, 1 = N, 2 = OTHER), byte-aligned with the packed wire.
    Exception positions are unique, so scatter-add never collides."""
    live = exc_idx >= 0
    byte = jnp.where(live, exc_idx // 4, 0)
    sh = 2 * (exc_idx % 4)
    add = jnp.where(
        live, (exc_val.astype(jnp.int32) - 3) << sh, 0
    ).astype(jnp.uint8)
    ep = jnp.zeros(B * (width // 4), jnp.uint8).at[byte].add(add)
    return ep.reshape(B, width // 4)


def _expand_deint(p, e):
    """[TB, W/4] packed bytes + exception plane -> [TB, W] int32 base
    codes in deinterleaved order (block k holds positions l%4 == k)."""
    p = p.astype(jnp.int32)
    e = e.astype(jnp.int32)
    parts = []
    for k in range(4):
        b = (p >> (2 * k)) & 3
        ec = (e >> (2 * k)) & 3
        parts.append(jnp.where(ec > 0, ec + 3, b))
    return jnp.concatenate(parts, axis=1)


def _realign_deint(work, shift, W: int, O: int, TB: int):
    """R[b, d(p)] = work[b, d(p + shift[b])] for the deint layout: the
    log2 shifter where a shift of 4t true positions is a plain lane
    shift by t, and shifts of 1/2 are block rotations with a one-lane
    nudge.  Lanes whose source crosses a block boundary correspond to
    true positions >= W - shift >= F and are never read downstream."""
    Q = W // 4
    for kb in range((O - 1).bit_length()):
        s = 1 << kb
        if s >= 4:
            t = s // 4
            shifted = jnp.concatenate(
                [work[:, t:], jnp.zeros((TB, t), work.dtype)], axis=1
            )
        elif s == 1:
            # new[kQ+q] = old[(k+1)Q+q] for k<3; block3 <- block0 lanes+1
            b3 = jnp.concatenate(
                [work[:, 1:Q], jnp.zeros((TB, 1), work.dtype)], axis=1
            )
            shifted = jnp.concatenate([work[:, Q:], b3], axis=1)
        else:  # s == 2: blocks 2,3 <- blocks 0,1 lanes+1
            b01 = jnp.concatenate(
                [work[:, 1 : 2 * Q], jnp.zeros((TB, 1), work.dtype)],
                axis=1,
            )
            shifted = jnp.concatenate([work[:, 2 * Q :], b01], axis=1)
        bit = ((shift >> kb) & 1) == 1  # [TB, 1]
        work = jnp.where(bit, shifted, work)
    return work


def _permute_rows_deint(Wm: np.ndarray, L: int, n_cls: int) -> np.ndarray:
    """Row-permute a c-major [n_cls*L, C] matmul matrix so row c*L + l
    moves to c*L + d(l): the matrix the deint one-hot layout consumes."""
    out = np.zeros_like(Wm)
    for l in range(L):
        d = _deint_index(l, L)
        for c in range(n_cls):
            out[c * L + d, :] = Wm[c * L + l, :]
    return out


def _expand_rows_to_width(Wm: np.ndarray, F: int, W: int,
                          n_cls: int) -> np.ndarray:
    """Remap a c-major [n_cls*F, C] matrix over FORMAT positions onto
    the deint full-width row space [n_cls*W, C]: row c*F + p moves to
    c*W + d(p).  Rows for positions >= F stay zero (the realigned deint
    tensor's contaminated lanes then contribute nothing)."""
    C = Wm.shape[1]
    out = np.zeros((n_cls * W, C), Wm.dtype)
    for p in range(F):
        d = _deint_index(p, W)
        for c in range(n_cls):
            out[c * W + d, :] = Wm[c * F + p, :]
    return out


def _realign(src, shift, L, O, TB, F):
    """R[b, p] = src[b, shift[b] + p] for shift in [0, O) via a log2
    shifter: ceil(log2(O)) conditional lane shifts instead of an
    O-iteration select-FMA loop (measured ~30 ns/read at O=38)."""
    work = src
    for k in range((O - 1).bit_length()):
        s = 1 << k
        shifted = jnp.concatenate(
            [work[:, s:], jnp.zeros((TB, s), work.dtype)], axis=1
        )
        bit = ((shift >> k) & 1) == 1  # [TB, 1]
        work = jnp.where(bit, shifted, work)
    return work[:, :F]


def _match_matrix_all(slots, F: int):
    """One [5F, C_all] f32 candidate matrix covering every matcher slot
    in 128-aligned column blocks, so the kernel runs ONE matmul against
    the full realigned region instead of per-slot narrow-slice matmuls
    (the per-slot extraction/concat relayouts measured ~70 ns/read).
    Rows are c-major over ABSOLUTE format positions (c*F + p); block
    4F..5F is the read-N indicator with -3 where the candidate is N
    (same encoding as _match_matrix).  ``slots`` is a list of
    (name, slot, onehot, n_mask, budget); returns (W_all, metas) with
    metas = (name, slot, col_off, nc, nc_pad, budget)."""
    col_off = 0
    metas = []
    blocks = []
    for name, slot, onehot, n_mask, budget in slots:
        nc = onehot.shape[0]
        nc_pad = _round_up(max(nc, 1), 128)
        metas.append((name, slot, col_off, nc, nc_pad, budget))
        blocks.append((slot, onehot, n_mask, nc, nc_pad))
        col_off += nc_pad
    W = np.zeros((5 * F, col_off), dtype=np.float32)
    c0 = 0
    for slot, onehot, n_mask, nc, nc_pad in blocks:
        sl = slot.length
        oh = onehot.reshape(nc, sl, 4)
        for j in range(nc):
            for i in range(sl):
                p = slot.offset + i
                for c in range(4):
                    if oh[j, i, c]:
                        W[c * F + p, c0 + j] = 1.0
                if n_mask[j, i]:
                    W[4 * F + p, c0 + j] = -3.0
        c0 += nc_pad
    return W, metas


def _matcher_keys_fit(metas) -> bool:
    """The two-reduction argmin packs (mismatches, candidate column)
    into one int32 key per lane; checks every slot's bound."""
    return all(
        (slot.length + 1) * _next_pow2(nc_pad) < (1 << 30)
        for (_, slot, _, _, nc_pad, _) in metas
    )


def _kernel_match_all(R, w_all_ref, metas, F, TB):
    """Tie-drop Hamming argmin for ALL matcher slots: one one-hot build
    over the realigned region, one MXU matmul, then per slot two packed
    min-reductions on a 128-aligned column block (vs 3 reductions + an
    unaligned slice + concat per slot before).  Semantics identical to
    _kernel_match per slot (parse.rs:553-593).  Yields (idx, ok) in
    metas order."""
    is_n = R == dna.N
    matches = _onehot_dot(R, w_all_ref, F, is_n=is_n).astype(
        jnp.int32
    )  # [TB, C_all]
    out = []
    for name, slot, col_off, nc, nc_pad, budget in metas:
        sl = slot.length
        blk = matches[:, col_off : col_off + nc_pad]
        col = jax.lax.broadcasted_iota(jnp.int32, (TB, nc_pad), 1)
        ncp2 = _next_pow2(nc_pad)
        nc_bits = (ncp2 - 1).bit_length()
        nc_mask = ncp2 - 1
        big_key = jnp.int32(1 << 30)
        m = sl - blk
        keyA = jnp.where(col < nc, (m << nc_bits) | col, big_key)
        keyB = jnp.where(
            col < nc, (m << nc_bits) | (nc_mask - col), big_key
        )
        kA = jnp.min(keyA, axis=1, keepdims=True)
        kB = jnp.min(keyB, axis=1, keepdims=True)
        m_min = kA >> nc_bits
        idx = kA & nc_mask
        uniq = idx == (nc_mask - (kB & nc_mask))
        ok = (m_min <= budget) & uniq
        out.append((idx, ok))
    return out


_FUSED_MATCH_VMEM = 6 << 20  # bf16 W_all budget
_TILE_VMEM = 5 << 20  # budget for the biggest [TB, X] int32 intermediate


def _auto_tb(plan: DecodePlan, L: int, requested: int | None = None) -> int:
    """Shrink the tile height for wide intermediates: a mega-library
    matcher's [TB, nc_pad] match block (or a long read's [TB, 3*O_pad]
    scan block) must fit scoped VMEM — a 16k-candidate library at
    TB=256 is a 16.8MB block that fails Mosaic's 16MB stack limit at
    COMPILE time, after the build succeeded (hit by
    scripts/bench_library_scale.py).  Default tile: 128 for the deint
    packed-input kernel (hardware sweep r4: 29.9M vs 25.5M reads/s at
    TB=256 — smaller tiles fill the pipeline better once the expand is
    in-kernel), 256 otherwise."""
    import os

    if requested is None:
        requested = (
            128
            if os.environ.get("NGS_KERNEL_PACKED_INPUT", "1") == "1"
            else 256
        )
    F = plan.scheme.length
    O_pad = _round_up(L - F + 1, 128)
    cols = 3 * O_pad
    nc_pads = []
    if plan.scheme.sample_slot is not None and plan.sample_onehot is not None:
        nc_pads.append(_round_up(max(plan.sample_onehot.shape[0], 1), 128))
    if plan.counted_onehots is not None:
        for oh in plan.counted_onehots:
            nc_pads.append(_round_up(max(oh.shape[0], 1), 128))
    if nc_pads:
        # the fused matcher (if eligible) sees sum(nc_pads) columns
        c_all = sum(nc_pads)
        fused_ok = 2 * 5 * F * c_all <= _FUSED_MATCH_VMEM
        cols = max(cols, c_all if fused_ok else max(nc_pads))
    tb = requested
    while tb > 8 and tb * cols * 4 > _TILE_VMEM:
        tb //= 2
    return tb


def _build_matchers(slot_defs, F: int):
    """Choose the matcher formulation at build time.  Returns
    (W_all, metas, slot_mats): the fused [5F, C_all] matrix (or None
    when its packed keys would overflow int32 or the matrix would not
    fit VMEM) plus per-slot fallback matrices.  ``slot_defs`` is a list
    of (name, slot, onehot, n_mask, budget)."""
    if not slot_defs:
        return None, [], []
    W_all, metas = _match_matrix_all(slot_defs, F)
    if (
        not _matcher_keys_fit(metas)
        or 2 * W_all.size > _FUSED_MATCH_VMEM
    ):
        W_all = None
    slot_mats = []
    if W_all is None:
        for name, slot, onehot, n_mask, budget in slot_defs:
            Wm, nc, nc_pad = _match_matrix(onehot, n_mask, slot.length)
            slot_mats.append((Wm, nc_pad))
    return W_all, metas, slot_mats


def _run_matchers(R, W_all, metas, slot_mats, slot_w_refs, F, TB):
    """Run every matcher slot against the realigned region R, via the
    fused all-slot matmul when eligible, else per-slot.  Returns
    [(idx, ok)] in metas order."""
    if W_all is not None:
        return _kernel_match_all(R, slot_w_refs[0], metas, F, TB)
    out = []
    for (name, slot, _, nc, nc_pad, budget), w_ref in zip(
        metas, slot_w_refs
    ):
        r = R[:, slot.offset : slot.offset + slot.length]
        out.append(
            _kernel_match(r, w_ref, nc, nc_pad, slot.length, budget, TB)
        )
    return out


def kernel_flops_per_read(plan: DecodePlan, L: int) -> int:
    """Analytic MXU FLOPs/read of the fused dense kernel as built for
    width L: the scan matmul plus the matcher matmul(s), reflecting the
    fused-vs-per-slot choice _build_matchers makes and the deint
    packed-input layout's full-width matcher rows (bench.py reports
    MFU from this)."""
    import os

    scheme = plan.scheme
    F = scheme.length
    O = L - F + 1
    O_pad = _round_up(O, 128)
    scan_cols = O_pad if _scan_is_packed(plan) else 3 * O_pad
    flops = 2 * 5 * L * scan_cols
    slot_defs = []
    if scheme.sample_slot is not None and plan.sample_onehot is not None:
        slot_defs.append(
            ("sample", scheme.sample_slot, plan.sample_onehot,
             plan.sample_n_mask, 0)
        )
    if plan.counted_onehots is not None:
        for i, slot in enumerate(scheme.barcode_slots):
            slot_defs.append(
                (f"bc{i}", slot, plan.counted_onehots[i],
                 plan.counted_n_masks[i], 0)
            )
    W_all, metas, slot_mats = _build_matchers(slot_defs, F)
    deint = (
        os.environ.get("NGS_KERNEL_PACKED_INPUT", "1") == "1"
        and W_all is not None
    )
    if W_all is not None:
        flops += 2 * 5 * (L if deint else F) * W_all.shape[1]
    else:
        for (_, slot, _, _, nc_pad, _) in metas:
            flops += 2 * 5 * slot.length * nc_pad
    return flops


def kernel_useful_flops_per_read(plan: DecodePlan, L: int) -> int:
    """Analytic MXU FLOPs/read counting only USEFUL (unpadded) columns:
    the scan's 3*O (or O packed) real offsets instead of the 128-aligned
    O_pad, and the matchers' true candidate counts instead of nc_pad.
    kernel_flops_per_read counts the padded matmuls as built; the ratio
    of the two is pure lane padding.  bench.py reports MFU from BOTH —
    the honest utilization figure is the useful one (VERDICT r3 item 1:
    at this problem's shapes the kernel is VPU/relayout-bound, not
    MXU-bound; see BENCH.md round 4)."""
    scheme = plan.scheme
    F = scheme.length
    O = L - F + 1
    scan_cols = O if _scan_is_packed(plan) else 3 * O
    flops = 2 * 5 * L * scan_cols
    if scheme.sample_slot is not None and plan.sample_onehot is not None:
        flops += 2 * 5 * F * plan.sample_onehot.shape[0]
    if plan.counted_onehots is not None:
        for oh in plan.counted_onehots:
            flops += 2 * 5 * F * oh.shape[0]
    return flops


def _kernel_front_end(plan, basesf, lengths, is_read, scan_w_ref, TB, L, F,
                      O, O_pad, n_const, n_wild, max_const,
                      scan_packed=None, deint=False):
    """Shared per-tile front end of every decode kernel: the one-matmul
    offset scan, the leftmost-exact / unique-best-repair selection, and
    the realigned format region.  Returns (const_ok, offset, has_exact,
    exact_off, o_idx, R); all [TB, 1] except o_idx [TB, O_pad] and
    R [TB, F] f32.

    Cross-lane reductions dominate this stage's VPU time, so the repair
    selection packs (mismatches, offset, wild-hits) into one integer key
    per lane and recovers all four quantities (min mismatches, first and
    last best offset for the tie-drop, wild count at the chosen offset)
    from TWO min-reductions.  Coefficients are powers of two so the
    decode is shifts/masks; the packing fits int32 for any format with
    n_const * O_pad * next_pow2(n_wild+1) < 2^29 (checked at build by
    _front_key_bound)."""
    # bf16 operands, f32 accumulation: inputs are exactly representable
    # (0/1) so counts stay exact integers while the MXU runs at its
    # bf16 rate
    if scan_packed is not None:
        # packed-scan variant: one column per offset, counts recovered
        # by shifts/masks (_scan_matrix_packed layout)
        b_n, b_w = scan_packed
        packed = _onehot_dot(basesf, scan_w_ref, L).astype(
            jnp.int32
        )  # [TB, O_pad]
        strict_o = packed >> (b_n + b_w)
        wild_o = (packed >> b_n) & ((1 << b_w) - 1)
        relax_o = strict_o + (packed & ((1 << b_n) - 1))
    else:
        scan = _onehot_dot(basesf, scan_w_ref, L).astype(
            jnp.int32
        )  # [TB, 3*O_pad]
        strict_o = scan[:, :O_pad]
        wild_o = scan[:, O_pad : 2 * O_pad]
        relax_o = scan[:, 2 * O_pad : 3 * O_pad]
    o_idx = jax.lax.broadcasted_iota(jnp.int32, (TB, O_pad), 1)
    o_in_range = (o_idx + F <= lengths) & (o_idx < O)

    exact = (strict_o == n_const) & (wild_o == n_wild) & o_in_range
    # LEFTMOST exact offset (the regex is a search): explicit min —
    # Mosaic's argmax does not guarantee first-occurrence ties
    exact_off = jnp.min(
        jnp.where(exact, o_idx, _BIG), axis=1, keepdims=True
    ).astype(jnp.int32)
    has_exact = exact_off != _BIG

    # repair windows: offsets 0..len-F-1 EXCLUSIVE (parse.rs:295);
    # --fix-quirks includes the final alignment
    if plan.fix_quirks:
        rep_range = (o_idx + F <= lengths) & (o_idx < O)
    else:
        rep_range = (o_idx + F < lengths) & (o_idx < O)
    if _front_key_bound(n_const, O_pad, n_wild) < (1 << 30):
        cw_bits = (_next_pow2(n_wild + 1) - 1).bit_length()
        op_bits = (_next_pow2(O_pad) - 1).bit_length()
        op_mask = (1 << op_bits) - 1
        big_key = jnp.int32(1 << 30)
        mism = n_const - relax_o
        key1 = jnp.where(
            rep_range,
            ((mism << op_bits) | o_idx) << cw_bits | wild_o,
            big_key,
        )
        key2 = jnp.where(
            rep_range,
            ((mism << op_bits) | (op_mask - o_idx)) << cw_bits,
            big_key,
        )
        k1 = jnp.min(key1, axis=1, keepdims=True)
        k2 = jnp.min(key2, axis=1, keepdims=True)
        mism_min = k1 >> (op_bits + cw_bits)  # huge when no window
        o_first = (k1 >> cw_bits) & op_mask
        wild_at_rep = k1 & ((1 << cw_bits) - 1)
        o_last = op_mask - ((k2 >> cw_bits) & op_mask)
        repair_ok = (
            (mism_min <= max_const) & (o_first == o_last)
            & (wild_at_rep == n_wild)
        )
        # no in-range window: the selection loop in parse.rs:294-304
        # never ran, leaving offset 0 (matches the old argmin fallback)
        rep_off = jnp.where(k1 == big_key, 0, o_first)
    else:  # exotic formats whose key would overflow: 4 reductions
        mism = jnp.where(rep_range, n_const - relax_o, _BIG)
        mism_min = jnp.min(mism, axis=1, keepdims=True)
        rep_off = jnp.min(
            jnp.where(mism == mism_min, o_idx, _BIG), axis=1,
            keepdims=True,
        ).astype(jnp.int32)
        n_best = jnp.sum(
            ((mism == mism_min) & rep_range).astype(jnp.int32),
            axis=1, keepdims=True,
        )
        wild_at_rep = jnp.sum(
            jnp.where(o_idx == rep_off, wild_o, 0), axis=1, keepdims=True
        )
        repair_ok = (
            (mism_min <= max_const) & (n_best == 1)
            & (wild_at_rep == n_wild)
        )
        rep_off = jnp.where(mism_min == _BIG, 0, rep_off)
    len_ok = (lengths >= F) & is_read
    const_ok = len_ok & (has_exact | repair_ok)
    offset = jnp.where(has_exact, exact_off, rep_off)

    if deint:
        R = _realign_deint(basesf, offset, L, O, TB)  # full-W deint
    else:
        R = _realign(basesf, offset, L, O, TB, F)
    return const_ok, offset, has_exact, exact_off, o_idx, R


def _front_key_bound(n_const: int, O_pad: int, n_wild: int) -> int:
    """Max packed-key value in _kernel_front_end (must stay < 2^30)."""
    return (n_const + 1) * _next_pow2(O_pad) * _next_pow2(n_wild + 1)


def _deint_k_index(t: int, W: int, k: int) -> int:
    """True position t -> deinterleaved-k column (the layout the packed
    quality fields expand into without any reorder: field j of a byte =
    position 8//bits*q + j, landing in block j)."""
    return (t % k) * (W // k) + t // k


def _qual_window_matrix(plan: DecodePlan, W: int, O: int,
                        O_pad: int, k: int) -> np.ndarray:
    """[W, n_segs*O_pad] f32: one matmul turns deint-k quality values
    into every (segment, offset) windowed SUM — replacing the
    seg.length-step slice-add loop AND freeing the kernel from needing
    true-position quality order.  Column (si*O_pad + o) sums true
    positions seg.start+o .. seg.start+o+len-1 (the reference's
    regions_string-indexed window, quirks included); rows are deint-k
    positions (k = 8 / qual_bits).  Exact: quality values are small
    ints, window sums stay far below 2^24."""
    n_segs = len(plan.qual_segments)
    Wq = np.zeros((W, max(n_segs, 1) * O_pad), np.float32)
    for si, seg in enumerate(plan.qual_segments):
        for o in range(O):
            for r in range(seg.length):
                t = seg.start + o + r
                if t < W:
                    Wq[_deint_k_index(t, W, k), si * O_pad + o] = 1.0
    return Wq


def _kernel_quality_gate_q4(plan, q2, cb_ref, wq_ref, o_idx, O, O_pad,
                            offset, has_exact, exact_off, const_ok, TB,
                            n_codes: int = 16):
    """Quality gate on the PACKED quality WIRE: ``q2`` [TB, W] int32
    field codes in deint-k order (in-kernel expand of quals_packed),
    ``cb_ref`` the per-batch codebook (scalar-prefetched [16] int32).
    Decodes codes -> Phred via an n_codes-way select chain (16 for the
    4-bit wire, 4 for the 2-bit wire), then ONE matmul against the
    static window matrix gives every (segment, offset) sum.
    Bit-identical to _kernel_quality_gate on the reconstructed tensor:
    both compute exact integer sums in f32."""
    if plan.fix_quirks:
        qual_start = offset
    else:
        qual_start = jnp.where(has_exact, exact_off, 0)
    qf = jnp.zeros(q2.shape, jnp.float32)
    for k in range(n_codes):
        qf = jnp.where(q2 == k, cb_ref[k].astype(jnp.float32), qf)
    wsum_all = jnp.dot(
        qf.astype(jnp.bfloat16), wq_ref[...],
        preferred_element_type=jnp.float32,
    )  # [TB, n_segs*O_pad]; Phred <= 63 is bf16-exact
    sel2 = ((o_idx == qual_start) & (o_idx < O)).astype(jnp.float32)
    lowq = jnp.zeros((TB, 1), bool)
    for si, seg in enumerate(plan.qual_segments):
        ssum = jnp.sum(
            sel2 * wsum_all[:, si * O_pad : (si + 1) * O_pad],
            axis=1, keepdims=True,
        )
        lowq = lowq | (ssum / jnp.float32(seg.length) < plan.min_quality)
    return const_ok & lowq


def _kernel_quality_gate(plan, qualsf, o_idx, O, offset, has_exact,
                         exact_off, const_ok, TB):
    """Fused segment-mean quality check (reference parse.rs:331-375
    semantics incl. the repaired-read start=0 quirk; --fix-quirks reads
    from the matched window).  Returns lowq [TB, 1] bool."""
    if plan.fix_quirks:
        qual_start = offset
    else:
        qual_start = jnp.where(has_exact, exact_off, 0)
    sel2 = ((o_idx == qual_start) & (o_idx < O)).astype(jnp.float32)[:, :O]
    lowq = jnp.zeros((TB, 1), bool)
    for seg in plan.qual_segments:
        wsum = jnp.zeros((TB, O), jnp.float32)
        for r_ in range(seg.length):
            c0 = seg.start + r_
            wsum = wsum + qualsf[:, c0 : c0 + O]
        ssum = jnp.sum(sel2 * wsum, axis=1, keepdims=True)
        lowq = lowq | (ssum / jnp.float32(seg.length) < plan.min_quality)
    return const_ok & lowq


def _kernel_match(r, w_ref, nc, nc_pad, sl, budget, TB):
    """Tie-drop Hamming argmin of realigned slot codes against one
    candidate matrix (parse.rs:553-593).  Returns (idx, ok) [TB, 1]."""
    is_n = r == dna.N
    matches = _onehot_dot(r, w_ref, sl, is_n=is_n).astype(jnp.int32)
    cand_col = jax.lax.broadcasted_iota(jnp.int32, (TB, nc_pad), 1)
    m = jnp.where(cand_col < nc, sl - matches, _BIG)
    m_min = jnp.min(m, axis=1, keepdims=True)
    idx = jnp.min(
        jnp.where(m == m_min, cand_col, _BIG), axis=1, keepdims=True
    ).astype(jnp.int32)
    uniq = (
        jnp.sum((m == m_min).astype(jnp.int32), axis=1, keepdims=True) == 1
    )
    ok = (m_min <= budget) & uniq
    return idx, ok


def build_pallas_decode(plan: DecodePlan, L: int, TB: int = 256,
                        interpret: bool = False,
                        packed_input: bool = False,
                        qual_bits: int = 0):
    """Compile the fused kernel for width L.  Returns jitted
    fn(bases [B, L] int8, lengths [B] int32, n_reads [1] int32[, quals])
    -> (flat [B] int32, status [B] int32); B must be a multiple of TB.
    When the plan's quality gate is on, the returned fn takes a fourth
    ``quals [B, L] int8`` argument and the fused segment-mean check runs
    in-kernel.

    ``packed_input=True`` compiles the deinterleaved variant: fn takes
    (packed [B, L/4] uint8, exc_plane [B, L/4] uint8, lengths, n_reads
    [, quals]) and the 2-bit expand runs IN-KERNEL (the XLA unpack
    prologue measured 29 ns/read vs ~2 in-kernel — R4_SESSION.json).
    Bit-identical results; requires the fused all-slot matcher.

    ``qual_bits`` 4 or 2 (requires packed_input + a quality gate): the
    quality argument becomes the PACKED WIRE pair (quals_packed
    [B, L*bits/8] uint8, codebook [16] int32) and the field decode +
    segment-window sums run in-kernel (_kernel_quality_gate_q4) — no
    XLA quality-unpack prologue.  0 = raw [B, L] int8 quals."""
    scheme = plan.scheme
    F = scheme.length
    if L < F:
        raise ValueError("read width below format length")
    if not plan.dense_counts:
        raise ValueError("pallas path covers dense-count mode")
    with_quals = plan.min_quality > 0.0
    O = L - F + 1
    O_pad = _round_up(O, 128)
    n_const = int(np.sum(scheme.kind == KIND_CONST))
    n_wild = int(np.sum(scheme.kind == KIND_WILD))
    max_const = plan.max_errors.constant_region

    W_scan, scan_packed = _build_scan(plan, L, O, O_pad)

    slot_defs = []
    if scheme.sample_slot is not None:
        slot_defs.append(
            ("sample", scheme.sample_slot, plan.sample_onehot,
             plan.sample_n_mask, int(plan.max_errors.sample_barcode))
        )
    for i, slot in enumerate(scheme.barcode_slots):
        slot_defs.append(
            (f"bc{i}", slot, plan.counted_onehots[i],
             plan.counted_n_masks[i], int(plan.max_errors.barcode[i]))
        )
    W_all, metas, slot_mats = _build_matchers(slot_defs, F)
    if packed_input:
        if W_all is None:
            raise ValueError(
                "packed-input kernel requires the fused all-slot matcher"
            )
        if L % 4:
            raise ValueError("packed-input kernel requires width % 4 == 0")
        # deint layouts: permute the scan rows, remap the matcher rows
        # onto the full-width deint row space
        W_scan = _permute_rows_deint(W_scan, L, 5)
        W_all = _expand_rows_to_width(W_all, F, L, 5)
        if 2 * W_all.size > _FUSED_MATCH_VMEM * 2:
            raise ValueError("deint matcher matrix exceeds VMEM budget")
    if qual_bits and not (packed_input and with_quals):
        raise ValueError(
            "qual_bits requires packed_input and an active quality gate"
        )
    if qual_bits not in (0, 2, 4):
        raise ValueError("qual_bits must be 0 (raw), 2, or 4")
    qual_wire = bool(qual_bits)
    W_qual = (
        _qual_window_matrix(plan, L, O, O_pad, 8 // qual_bits)
        if qual_wire else None
    )
    match_L = L if packed_input else F
    radix = plan.combo_radix
    n_combos = int(np.prod(radix)) if radix else 1
    has_sample = scheme.sample_slot is not None

    def kernel(n_reads_ref, *prefix):
        if qual_wire:
            cb_ref, lengths_ref, *refs = prefix
        else:
            lengths_ref, *refs = prefix
        if packed_input:
            packed_ref, epk_ref = refs[0], refs[1]
            refs = refs[2:]
        else:
            bases_ref = refs[0]
            refs = refs[1:]
        if with_quals:
            quals_ref, scan_w_ref = refs[0], refs[1]
            refs = refs[2:]
        else:
            scan_w_ref = refs[0]
            refs = refs[1:]
        n_mats = 1 if W_all is not None else len(slot_mats)
        slot_w_refs = refs[:n_mats]
        refs = refs[n_mats:]
        if qual_wire:
            wq_ref = refs[0]
            refs = refs[1:]
        flat_ref, status_ref = refs

        tile = pl.program_id(0)
        if packed_input:
            # in-kernel 2-bit expand into the deint layout (int32 lanes:
            # int8 compares do not legalize on this target)
            basesf = _expand_deint(packed_ref[...], epk_ref[...])
        else:
            # int8-native variant keeps the whole front end (compares,
            # realign shifter) on int8 lanes — 4x the VPU density of f32
            basesf = (
                bases_ref[...] if _i8_native()
                else bases_ref[...].astype(jnp.float32)
            )  # [TB, L]
        lengths = lengths_ref[...]  # [TB, 1] int32
        row = tile * TB + jax.lax.broadcasted_iota(jnp.int32, (TB, 1), 0)
        is_read = row < n_reads_ref[0]  # [TB, 1]

        const_ok, offset, has_exact, exact_off, o_idx, R = (
            _kernel_front_end(
                plan, basesf, lengths, is_read, scan_w_ref, TB, L, F, O,
                O_pad, n_const, n_wild, max_const,
                scan_packed=scan_packed, deint=packed_input,
            )
        )

        status = jnp.where(
            is_read, jnp.where(const_ok, ST_VALID, ST_CONST), ST_PADDING
        )  # [TB, 1]
        ok_so_far = const_ok
        if with_quals:
            if qual_wire:
                qp = quals_ref[...].astype(jnp.int32)
                qmask = (1 << qual_bits) - 1
                q2 = jnp.concatenate(
                    [
                        (qp >> (qual_bits * j)) & qmask
                        for j in range(8 // qual_bits)
                    ],
                    axis=1,
                )
                lowq = _kernel_quality_gate_q4(
                    plan, q2, cb_ref, wq_ref, o_idx, O, O_pad, offset,
                    has_exact, exact_off, const_ok, TB,
                    n_codes=1 << qual_bits,
                )
            else:
                lowq = _kernel_quality_gate(
                    plan, quals_ref[...].astype(jnp.float32), o_idx, O,
                    offset, has_exact, exact_off, const_ok, TB,
                )
            status = jnp.where(lowq, ST_LOWQ, status)
            ok_so_far = const_ok & ~lowq
        combo = jnp.zeros((TB, 1), jnp.int32)
        sample_idx = jnp.zeros((TB, 1), jnp.int32)
        bc_pos = 0
        results = _run_matchers(
            R, W_all, metas, slot_mats, slot_w_refs, match_L, TB
        )
        for (name, slot, _, _, _, _), (idx, ok) in zip(metas, results):
            code = ST_SAMPLE if name == "sample" else ST_BARCODE
            status = jnp.where(ok_so_far & ~ok, code, status)
            ok_so_far = ok_so_far & ok
            if name == "sample":
                sample_idx = idx
            else:
                combo = combo * radix[bc_pos] + idx
                bc_pos += 1

        flat = sample_idx * n_combos + combo if has_sample else combo
        flat = jnp.where(ok_so_far, flat, 0)
        flat_ref[...] = flat
        status_ref[...] = status

    consts_np = [W_scan] + (
        [W_all] if W_all is not None else [Wm for Wm, _ in slot_mats]
    )

    def fn_unpacked(bases, lengths, n_reads, quals=None):
        return _call(bases, None, lengths, n_reads, quals, None)

    def fn_packed(packed, epk, lengths, n_reads, quals=None):
        return _call(packed, epk, lengths, n_reads, quals, None)

    def fn_packed_q4(packed, epk, lengths, n_reads, quals_packed,
                     codebook):
        return _call(packed, epk, lengths, n_reads, quals_packed,
                     codebook)

    def _call(data, epk, lengths, n_reads, quals, codebook):
        B = data.shape[0]
        if B % TB:
            raise ValueError(f"batch {B} not a multiple of tile {TB}")
        grid = (B // TB,)
        in_specs = [
            pl.BlockSpec((TB, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [n_reads.astype(jnp.int32)]
        if qual_wire:
            args.append(codebook.astype(jnp.int32))
        args.append(lengths.astype(jnp.int32)[:, None])
        if packed_input:
            in_specs += [
                pl.BlockSpec((TB, L // 4), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, L // 4), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            args += [data, epk]
        else:
            in_specs.append(
                pl.BlockSpec((TB, L), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(data)
        if with_quals:
            if quals is None:
                raise ValueError("quality gate on: quals required")
            qw = L * qual_bits // 8 if qual_wire else L
            in_specs.append(
                pl.BlockSpec((TB, qw), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(quals)
        in_specs += [
            pl.BlockSpec(w.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM)
            for w in consts_np
        ]
        args += [jnp.asarray(w, _mm_dtype()) for w in consts_np]
        if qual_wire:
            in_specs.append(
                pl.BlockSpec(W_qual.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(jnp.asarray(W_qual, jnp.bfloat16))
        flat, status = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2 if qual_wire else 1,
                grid=grid,
                in_specs=in_specs,
                out_specs=[
                    pl.BlockSpec((TB, 1), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TB, 1), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
            ],
            interpret=interpret,
        )(*args)
        return flat[:, 0], status[:, 0]

    if qual_wire:
        return jax.jit(fn_packed_q4)
    return jax.jit(fn_packed if packed_input else fn_unpacked)


_PACKED_STEP_CACHE: dict = {}


def build_pallas_packed_step(plan: DecodePlan, width: int,
                             TB: int | None = None,
                             qual_bits: int = 0):
    """Wire-format dense step with the fused kernel inside: one jit doing
    2-bit unpack + exception scatter -> Pallas decode -> count scatter.
    Drop-in replacement for ops.decode.dense_count_step_packed (measured
    ~5x its throughput device-resident on v5e).

    Cached per (plan, width, TB): Mosaic kernels compile synchronously
    (tens of seconds through a remote-compile service), so every consumer
    in a process must share one compiled instance.
    """
    import os

    if TB is None:
        TB = _auto_tb(plan, width)
    packed_input = os.environ.get("NGS_KERNEL_PACKED_INPUT", "1") == "1"
    with_quals = plan.min_quality > 0.0
    qual_wire = bool(qual_bits)
    if qual_wire and not (packed_input and with_quals):
        raise ValueError("qual-wire step needs packed_input + quality")
    key = (id(plan), width, TB, _variant_key(), packed_input, qual_bits)
    if key in _PACKED_STEP_CACHE:
        return _PACKED_STEP_CACHE[key]
    import functools

    from ngs_barcode_count_tpu import stats
    from ngs_barcode_count_tpu.ops.decode import unpack_bases

    if qual_wire:
        decode_fn = build_pallas_decode(
            plan, width, TB=TB, packed_input=True, qual_bits=qual_bits
        )  # ValueError propagates: caller falls back to the raw step
    elif packed_input:
        try:
            decode_fn = build_pallas_decode(
                plan, width, TB=TB, packed_input=True
            )
        except ValueError:
            packed_input = False  # per-slot matcher etc.: XLA unpack
    if not packed_input and not qual_wire:
        decode_fn = build_pallas_decode(plan, width, TB=TB)

    def _tally(counts, counters, flat, status):
        valid = status == ST_VALID
        counts = counts.at[jnp.where(valid, flat, 0)].add(
            valid.astype(counts.dtype)
        )
        add = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
        add = add.at[stats.MATCHED].set(jnp.sum(valid))
        add = add.at[stats.CONSTANT_REGION].set(jnp.sum(status == ST_CONST))
        add = add.at[stats.SAMPLE_BARCODE].set(jnp.sum(status == ST_SAMPLE))
        add = add.at[stats.BARCODE].set(jnp.sum(status == ST_BARCODE))
        add = add.at[stats.LOW_QUALITY].set(jnp.sum(status == ST_LOWQ))
        return counts, counters + add

    def _decode(packed, lengths, exc_idx, exc_val, n_reads, quals,
                codebook=None):
        if qual_wire:
            epk = exc_plane(exc_idx, exc_val, packed.shape[0], width)
            return decode_fn(
                packed, epk, lengths.astype(jnp.int32),
                n_reads.astype(jnp.int32), quals, codebook,
            )
        extra = () if quals is None else (quals,)
        if packed_input:
            epk = exc_plane(exc_idx, exc_val, packed.shape[0], width)
            return decode_fn(
                packed, epk, lengths.astype(jnp.int32),
                n_reads.astype(jnp.int32), *extra,
            )
        bases = unpack_bases(packed, exc_idx, exc_val, width)
        return decode_fn(
            bases, lengths.astype(jnp.int32), n_reads.astype(jnp.int32),
            *extra,
        )

    if qual_wire:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(counts, counters, packed, lengths, exc_idx, exc_val,
                 n_reads, quals_packed, codebook):
            flat, status = _decode(
                packed, lengths, exc_idx, exc_val, n_reads,
                quals_packed, codebook,
            )
            return _tally(counts, counters, flat, status)

    elif with_quals:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(counts, counters, packed, lengths, exc_idx, exc_val,
                 n_reads, quals):
            flat, status = _decode(
                packed, lengths, exc_idx, exc_val, n_reads, quals
            )
            return _tally(counts, counters, flat, status)

    else:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(counts, counters, packed, lengths, exc_idx, exc_val,
                 n_reads):
            flat, status = _decode(
                packed, lengths, exc_idx, exc_val, n_reads, None
            )
            return _tally(counts, counters, flat, status)

    _PACKED_STEP_CACHE[key] = step
    return step


def pallas_dense_count_step(plan: DecodePlan, decode_fn, counts, counters,
                            bases, lengths, n_reads):
    """Fold the kernel outputs into the carried count/counter state (the
    scatter-add and status bincount run as plain XLA around the kernel)."""
    from ngs_barcode_count_tpu import stats

    flat, status = decode_fn(bases, lengths, n_reads)
    valid = status == ST_VALID
    counts = counts.at[jnp.where(valid, flat, 0)].add(
        valid.astype(counts.dtype)
    )
    add = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
    add = add.at[stats.MATCHED].set(jnp.sum(valid))
    add = add.at[stats.CONSTANT_REGION].set(jnp.sum(status == ST_CONST))
    add = add.at[stats.SAMPLE_BARCODE].set(jnp.sum(status == ST_SAMPLE))
    add = add.at[stats.BARCODE].set(jnp.sum(status == ST_BARCODE))
    return counts, counters + add


# ---------------------------------------------------------------------------
# Keyed-mode kernel: same fused pipeline, emits the wire matrix
# ---------------------------------------------------------------------------


def build_pallas_decode_keyed(plan: DecodePlan, L: int, TB: int = 256,
                              interpret: bool = False,
                              packed_input: bool = False):
    """Fused kernel for keyed modes (raw-DNA slots and/or random
    barcode): outputs (wire [B, C] int32, status [B] int32) with the wire
    column layout of ops.decode.keyed_wire_layout, so the host-side
    consumer is identical to the XLA path's.  ``packed_input=True``: the
    deinterleaved in-kernel-unpack variant (see build_pallas_decode) —
    fn takes (packed, exc_plane, lengths, n_reads[, quals])."""
    from ngs_barcode_count_tpu.ops.decode import (
        _fused_bits,
        keyed_wire_layout,
    )

    scheme = plan.scheme
    F = scheme.length
    if L < F:
        raise ValueError("read width below format length")
    with_quals = plan.min_quality > 0.0
    O = L - F + 1
    O_pad = _round_up(O, 128)
    n_const = int(np.sum(scheme.kind == KIND_CONST))
    n_wild = int(np.sum(scheme.kind == KIND_WILD))
    max_const = plan.max_errors.constant_region
    W_scan, scan_packed = _build_scan(plan, L, O, O_pad)
    layout = keyed_wire_layout(plan)
    fused = _fused_bits(plan)
    n_wire = layout["total"]

    # matchers only for regions with candidate sets
    slot_defs = []
    if scheme.sample_slot is not None and plan.sample_onehot is not None:
        slot_defs.append(
            ("sample", scheme.sample_slot, plan.sample_onehot,
             plan.sample_n_mask, int(plan.max_errors.sample_barcode))
        )
    if plan.counted_onehots is not None:
        for i, slot in enumerate(scheme.barcode_slots):
            slot_defs.append(
                (f"bc{i}", slot, plan.counted_onehots[i],
                 plan.counted_n_masks[i], int(plan.max_errors.barcode[i]))
            )
    W_all, metas, slot_mats = _build_matchers(slot_defs, F)
    if packed_input:
        if slot_defs and W_all is None:
            raise ValueError(
                "packed-input kernel requires the fused all-slot matcher"
            )
        if L % 4:
            raise ValueError("packed-input kernel requires width % 4 == 0")
        W_scan = _permute_rows_deint(W_scan, L, 5)
        if W_all is not None:
            W_all = _expand_rows_to_width(W_all, F, L, 5)
    match_L = L if packed_input else F
    radix = (
        plan.combo_radix
        if plan.dense_counted and plan.combo_fits_i32
        else ()
    )

    # Word packing runs as ONE pair of f32 matmuls over the whole
    # realigned region (exact: each half-word is <= 5*8^4 < 2^24)
    # combined arithmetically — a per-lane shift/OR chain miscompiled
    # under Mosaic, silently dropping high-position bases (caught by a
    # 2M-read TPU diff).  Rows are absolute format positions, so every
    # raw slot's words come out of one [TB, F] x [F, n_words] product
    # instead of a narrow-slice matmul pair per slot.
    raw_slots = []  # (slot, first word column) for slots emitted as words
    if "sample_words" in layout:
        raw_slots.append(scheme.sample_slot)
    if "counted_words" in layout:
        raw_slots.extend(scheme.barcode_slots)
    if "random_words" in layout:
        raw_slots.append(scheme.random_slot)
    word_cols = []  # (col_off, n_words) per raw slot
    nw_total = 0
    for slot in raw_slots:
        n_words = -(-slot.length // 10)
        word_cols.append((nw_total, n_words))
        nw_total += n_words
    Wl_all = np.zeros((F, max(nw_total, 1)), np.float32)
    Wh_all = np.zeros((F, max(nw_total, 1)), np.float32)
    for slot, (c0, _) in zip(raw_slots, word_cols):
        for i in range(slot.length):
            w, r = divmod(i, 10)
            if r < 5:
                Wl_all[slot.offset + i, c0 + w] = float(8 ** r)
            else:
                Wh_all[slot.offset + i, c0 + w] = float(8 ** (r - 5))
    if packed_input and raw_slots:
        Wl_all = _expand_rows_to_width(Wl_all, F, L, 1)
        Wh_all = _expand_rows_to_width(Wh_all, F, L, 1)

    def _all_words(R, wl_ref, wh_ref):
        rb = R.astype(jnp.bfloat16)
        low = jnp.dot(rb, wl_ref[...], preferred_element_type=jnp.float32)
        high = jnp.dot(rb, wh_ref[...], preferred_element_type=jnp.float32)
        return low.astype(jnp.int32) + high.astype(jnp.int32) * 32768

    def kernel(n_reads_ref, lengths_ref, *refs):
        if packed_input:
            packed_ref, epk_ref = refs[0], refs[1]
            refs = refs[2:]
        else:
            bases_ref = refs[0]
            refs = refs[1:]
        if with_quals:
            quals_ref, scan_w_ref = refs[0], refs[1]
            refs = refs[2:]
        else:
            scan_w_ref = refs[0]
            refs = refs[1:]
        n_mats = 1 if W_all is not None else len(slot_mats)
        slot_w_refs = refs[:n_mats]
        refs = refs[n_mats:]
        n_word_refs = 2 if raw_slots else 0
        word_w_refs = refs[:n_word_refs]
        wire_ref, status_ref = refs[n_word_refs:]

        tile = pl.program_id(0)
        if packed_input:
            basesf = _expand_deint(packed_ref[...], epk_ref[...])
        else:
            basesf = (
                bases_ref[...] if _i8_native()
                else bases_ref[...].astype(jnp.float32)
            )
        lengths = lengths_ref[...]
        row = tile * TB + jax.lax.broadcasted_iota(jnp.int32, (TB, 1), 0)
        is_read = row < n_reads_ref[0]

        const_ok, offset, has_exact, exact_off, o_idx, R = (
            _kernel_front_end(
                plan, basesf, lengths, is_read, scan_w_ref, TB, L, F, O,
                O_pad, n_const, n_wild, max_const,
                scan_packed=scan_packed, deint=packed_input,
            )
        )

        status = jnp.where(
            is_read, jnp.where(const_ok, ST_VALID, ST_CONST), ST_PADDING
        )
        ok_so_far = const_ok
        if with_quals:
            lowq = _kernel_quality_gate(
                plan, quals_ref[...].astype(jnp.float32), o_idx, O, offset,
                has_exact, exact_off, const_ok, TB,
            )
            status = jnp.where(lowq, ST_LOWQ, status)
            ok_so_far = const_ok & ~lowq

        sample_idx = jnp.zeros((TB, 1), jnp.int32)
        combo = jnp.zeros((TB, 1), jnp.int32)
        counted_idx = []
        bc_pos = 0
        results = _run_matchers(
            R, W_all, metas, slot_mats, slot_w_refs, match_L, TB
        )
        for (name, slot, _, _, _, _), (idx, ok) in zip(metas, results):
            code = ST_SAMPLE if name == "sample" else ST_BARCODE
            status = jnp.where(ok_so_far & ~ok, code, status)
            ok_so_far = ok_so_far & ok
            if name == "sample":
                sample_idx = idx
            else:
                counted_idx.append(idx)
                if radix:
                    combo = combo * radix[bc_pos] + idx
                    bc_pos += 1

        valid = (status == ST_VALID) & ok_so_far
        status = jnp.where(
            (status == ST_VALID) & ~ok_so_far, ST_BARCODE, status
        )  # unreachable guard; matcher loop already set codes
        valid_i = valid.astype(jnp.int32)

        # ---- wire assembly (ops.decode.keyed_wire_layout) ----
        if raw_slots:
            words = _all_words(R, word_w_refs[0], word_w_refs[1])
        slot_col = {id(s): c for s, c in zip(raw_slots, word_cols)}

        def next_words(slot):
            c0, nw = slot_col[id(slot)]
            return words[:, c0 : c0 + nw]

        cols = []
        if fused is not None:
            s_bits, c_bits = fused
            cols.append(
                (valid_i << (s_bits + c_bits)) | (sample_idx << c_bits)
                | combo
            )
        else:
            cols.append(valid_i)
            if "sample_words" in layout:
                cols.append(next_words(scheme.sample_slot))
            elif "sample_idx" in layout:
                cols.append(sample_idx)
            if "combo_flat" in layout:
                cols.append(combo)
            elif "counted_idx" in layout:
                cols.extend(counted_idx)
            elif "counted_words" in layout:
                for slot in scheme.barcode_slots:
                    cols.append(next_words(slot))
        if "random_words" in layout:
            cols.append(next_words(scheme.random_slot))
        wire_ref[...] = jnp.concatenate(cols, axis=1)
        status_ref[...] = status

    consts_np = [W_scan] + (
        [W_all] if W_all is not None else [Wm for Wm, _ in slot_mats]
    )
    if raw_slots:
        consts_np += [Wl_all, Wh_all]

    def fn_unpacked(bases, lengths, n_reads, quals=None):
        return _call(bases, None, lengths, n_reads, quals)

    def fn_packed(packed, epk, lengths, n_reads, quals=None):
        return _call(packed, epk, lengths, n_reads, quals)

    def _call(data, epk, lengths, n_reads, quals):
        B = data.shape[0]
        if B % TB:
            raise ValueError(f"batch {B} not a multiple of tile {TB}")
        grid = (B // TB,)
        in_specs = [
            pl.BlockSpec((TB, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [
            n_reads.astype(jnp.int32),
            lengths.astype(jnp.int32)[:, None],
        ]
        if packed_input:
            in_specs += [
                pl.BlockSpec((TB, L // 4), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, L // 4), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            args += [data, epk]
        else:
            in_specs.append(
                pl.BlockSpec((TB, L), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(data)
        if with_quals:
            if quals is None:
                raise ValueError("quality gate on: quals required")
            in_specs.append(
                pl.BlockSpec((TB, L), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(quals)
        in_specs += [
            pl.BlockSpec(w.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM)
            for w in consts_np
        ]
        n_oh = len(consts_np) - (2 if raw_slots else 0)
        args += [
            jnp.asarray(w, _mm_dtype() if k < n_oh else jnp.bfloat16)
            for k, w in enumerate(consts_np)
        ]
        wire, status = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=[
                    pl.BlockSpec((TB, n_wire), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TB, 1), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, n_wire), jnp.int32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
            ],
            interpret=interpret,
        )(*args)
        return wire, status[:, 0]

    return jax.jit(fn_packed if packed_input else fn_unpacked)


def build_pallas_hashset_step(plan: DecodePlan, width: int, cap: int,
                              TB: int | None = None,
                              interpret: bool = False):
    """Random-mode device hash-set step with the fused kernel as the
    decode front end: unpack -> Pallas keyed decode -> wire ->
    (valid, flat, ridx) -> ops.decode.hashset_update, all in one jit.
    Drop-in for ops.decode.random_hashset_step_packed[_q] (the XLA front
    end measured 374 ns/read vs the kernel's 56; the dedup tail is
    shared, so table/counts/counters/overflow stay bit-identical)."""
    import os

    if TB is None:
        TB = _auto_tb(plan, width)
    from ngs_barcode_count_tpu.ops.decode import _dedup_variant

    dedup_variant = _dedup_variant()
    packed_input = os.environ.get("NGS_KERNEL_PACKED_INPUT", "1") == "1"
    key = ("hashset", id(plan), width, cap, TB, _variant_key(),
           dedup_variant, packed_input)
    if key in _PACKED_STEP_CACHE:
        return _PACKED_STEP_CACHE[key]
    import functools

    from ngs_barcode_count_tpu import stats
    from ngs_barcode_count_tpu.ops.decode import (
        hashset_update,
        unpack_bases,
        wire_hashset_inputs,
    )

    if packed_input:
        try:
            decode_fn = build_pallas_decode_keyed(
                plan, width, TB=TB, interpret=interpret,
                packed_input=True,
            )
        except ValueError:
            packed_input = False
    if not packed_input:
        decode_fn = build_pallas_decode_keyed(
            plan, width, TB=TB, interpret=interpret
        )
    with_quals = plan.min_quality > 0.0

    def _counters_add(status):
        add = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
        add = add.at[stats.CONSTANT_REGION].set(jnp.sum(status == ST_CONST))
        add = add.at[stats.SAMPLE_BARCODE].set(jnp.sum(status == ST_SAMPLE))
        add = add.at[stats.BARCODE].set(jnp.sum(status == ST_BARCODE))
        add = add.at[stats.LOW_QUALITY].set(jnp.sum(status == ST_LOWQ))
        return add

    def _core(table, counts, counters, packed, lengths, exc_idx, exc_val,
              n_reads, quals):
        if packed_input:
            epk = exc_plane(exc_idx, exc_val, packed.shape[0], width)
            args = (packed, epk, lengths.astype(jnp.int32),
                    n_reads.astype(jnp.int32))
        else:
            bases = unpack_bases(packed, exc_idx, exc_val, width)
            args = (bases, lengths.astype(jnp.int32),
                    n_reads.astype(jnp.int32))
        wire, status = (
            decode_fn(*args, quals) if with_quals else decode_fn(*args)
        )
        valid, flat, ridx = wire_hashset_inputs(plan, wire)
        return hashset_update(
            plan, table, counts, counters, _counters_add(status),
            valid, flat, ridx, cap, dedup_variant,
        )

    if with_quals:

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(table, counts, counters, packed, lengths, exc_idx,
                 exc_val, n_reads, quals):
            return _core(table, counts, counters, packed, lengths,
                         exc_idx, exc_val, n_reads, quals)

    else:

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(table, counts, counters, packed, lengths, exc_idx,
                 exc_val, n_reads):
            return _core(table, counts, counters, packed, lengths,
                         exc_idx, exc_val, n_reads, None)

    _PACKED_STEP_CACHE[key] = step
    return step


def build_pallas_bitmap_step(plan: DecodePlan, width: int,
                             TB: int | None = None,
                             interpret: bool = False):
    """Random-mode exact-bytemap step with the fused kernel as the
    decode front end (small combo spaces; drop-in for
    ops.decode.random_bitmap_step_packed[_q]).  The keyed kernel emits
    the wire, (valid, flat, ridx) reconstructs, and the bytemap
    scatter-max + counter tally run as XLA around it — bit-identical
    state to the XLA front end (same tail)."""
    import os

    if TB is None:
        TB = _auto_tb(plan, width)
    key = ("bitmap", id(plan), width, TB, _variant_key())
    if key in _PACKED_STEP_CACHE:
        return _PACKED_STEP_CACHE[key]
    import functools

    from ngs_barcode_count_tpu import stats
    from ngs_barcode_count_tpu.ops.decode import (
        unpack_bases,
        wire_hashset_inputs,
    )

    packed_input = os.environ.get("NGS_KERNEL_PACKED_INPUT", "1") == "1"
    if packed_input:
        try:
            decode_fn = build_pallas_decode_keyed(
                plan, width, TB=TB, interpret=interpret,
                packed_input=True,
            )
        except ValueError:
            packed_input = False
    if not packed_input:
        decode_fn = build_pallas_decode_keyed(
            plan, width, TB=TB, interpret=interpret
        )
    with_quals = plan.min_quality > 0.0
    c6 = 6 ** plan.scheme.random_slot.length

    def _core(bytemap, counters, packed, lengths, exc_idx, exc_val,
              n_reads, quals):
        extra = () if quals is None else (quals,)
        if packed_input:
            epk = exc_plane(exc_idx, exc_val, packed.shape[0], width)
            wire, status = decode_fn(
                packed, epk, lengths.astype(jnp.int32),
                n_reads.astype(jnp.int32), *extra,
            )
        else:
            bases = unpack_bases(packed, exc_idx, exc_val, width)
            wire, status = decode_fn(
                bases, lengths.astype(jnp.int32),
                n_reads.astype(jnp.int32), *extra,
            )
        valid, flat, ridx = wire_hashset_inputs(plan, wire)
        byte_idx = jnp.where(valid, flat * c6 + ridx, 0)
        bytemap = bytemap.at[byte_idx].max(valid.astype(bytemap.dtype))
        add = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
        # MATCHED accumulates VALID reads; flush popcounts the bytemap
        # (runner.finalize), exactly like random_bitmap_step
        add = add.at[stats.MATCHED].set(jnp.sum(valid))
        add = add.at[stats.CONSTANT_REGION].set(jnp.sum(status == ST_CONST))
        add = add.at[stats.SAMPLE_BARCODE].set(jnp.sum(status == ST_SAMPLE))
        add = add.at[stats.BARCODE].set(jnp.sum(status == ST_BARCODE))
        add = add.at[stats.LOW_QUALITY].set(jnp.sum(status == ST_LOWQ))
        return bytemap, counters + add

    if with_quals:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(bytemap, counters, packed, lengths, exc_idx, exc_val,
                 n_reads, quals):
            return _core(bytemap, counters, packed, lengths, exc_idx,
                         exc_val, n_reads, quals)

    else:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(bytemap, counters, packed, lengths, exc_idx, exc_val,
                 n_reads):
            return _core(bytemap, counters, packed, lengths, exc_idx,
                         exc_val, n_reads, None)

    _PACKED_STEP_CACHE[key] = step
    return step


def build_pallas_keyed_packed_step(plan: DecodePlan, width: int,
                                   TB: int | None = None):
    """Wire-format keyed step with the fused kernel inside (cached like
    build_pallas_packed_step).  Returns {"wire", "counters"} matching
    ops.decode.keyed_decode_step_packed's contract."""
    import os

    if TB is None:
        TB = _auto_tb(plan, width)
    packed_input = os.environ.get("NGS_KERNEL_PACKED_INPUT", "1") == "1"
    key = ("keyed", id(plan), width, TB, _variant_key(), packed_input)
    if key in _PACKED_STEP_CACHE:
        return _PACKED_STEP_CACHE[key]
    from ngs_barcode_count_tpu import stats
    from ngs_barcode_count_tpu.ops.decode import unpack_bases

    if packed_input:
        try:
            decode_fn = build_pallas_decode_keyed(
                plan, width, TB=TB, packed_input=True
            )
        except ValueError:
            packed_input = False
    if not packed_input:
        decode_fn = build_pallas_decode_keyed(plan, width, TB=TB)
    with_quals = plan.min_quality > 0.0

    def _counters(status):
        add = jnp.zeros(stats.NUM_COUNTERS, jnp.int32)
        add = add.at[stats.CONSTANT_REGION].set(jnp.sum(status == ST_CONST))
        add = add.at[stats.SAMPLE_BARCODE].set(jnp.sum(status == ST_SAMPLE))
        add = add.at[stats.BARCODE].set(jnp.sum(status == ST_BARCODE))
        add = add.at[stats.LOW_QUALITY].set(jnp.sum(status == ST_LOWQ))
        return add

    def _decode(packed, lengths, exc_idx, exc_val, n_reads, quals):
        extra = () if quals is None else (quals,)
        if packed_input:
            epk = exc_plane(exc_idx, exc_val, packed.shape[0], width)
            return decode_fn(
                packed, epk, lengths.astype(jnp.int32),
                n_reads.astype(jnp.int32), *extra,
            )
        bases = unpack_bases(packed, exc_idx, exc_val, width)
        return decode_fn(
            bases, lengths.astype(jnp.int32), n_reads.astype(jnp.int32),
            *extra,
        )

    if with_quals:

        @jax.jit
        def step(packed, lengths, exc_idx, exc_val, n_reads, quals):
            wire, status = _decode(
                packed, lengths, exc_idx, exc_val, n_reads, quals
            )
            return {"wire": wire, "counters": _counters(status)}

    else:

        @jax.jit
        def step(packed, lengths, exc_idx, exc_val, n_reads):
            wire, status = _decode(
                packed, lengths, exc_idx, exc_val, n_reads, None
            )
            return {"wire": wire, "counters": _counters(status)}

    _PACKED_STEP_CACHE[key] = step
    return step
