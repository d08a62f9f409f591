"""Pallas TPU kernel for the END_TO_END ungapped diagonal rescore
(ops/device_rescore.rescore_pairs, mode 3; reference:
DistanceCalculator.h:115-220).

Each grid step processes one (query, target, diagonal) hit:
 - the two sequence ROWS are streamed into VMEM by BlockSpec index maps
   reading scalar-prefetched row ids (the Pallas gather-rows pattern),
   so the kernel never issues random HBM gathers (the per-hit [H, W]
   random gather is the dominant cost of the XLA formulation)
 - the overlap windows are clamped dynamic-start slices re-aligned with
   a dynamic lane roll (pltpu.roll) — gather-free window extraction
 - the substitution lookup is a one-hot contraction on the MXU
   (q_onehot @ sub, masked by t_onehot), exact in int32/f32 and free of
   vector-table gathers the VPU lacks
 - the '*'-skip first/last trim and identity counts are masked
   reductions, bit-identical to the XLA formulation
 - reverse-strand hits (nucleotide, has_rev=True) read the query row
   FLIPPED with an adjusted roll (index qlen-1-(qoff+j) ==
   flip(row)[lmax-qlen+qoff+j]), score through the PRE-COMPLEMENTED
   substitution matrix (sub[comp[q], t] == sub_comp[q, t]), and derive
   canonical chars from the numeric codes via a one-hot contraction with
   code2char[comp] — exactly rescorediagonal.cpp:173-179

Used by ops/backend.rescore_diagonal_jax on the device-resident product
path; outputs are asserted equal to the XLA path in tests/test_pallas.py
on both CPU (interpret mode) and the TPU.
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

STAR = 42  # ord('*')


def _roll_left(vec, d, width, interpret):
    """vec[(k + d) % width] at position k — dynamic left rotation."""
    if interpret or pltpu is None:
        idx = (jax.lax.broadcasted_iota(jnp.int32, vec.shape, 1) + d) % width
        return jnp.take_along_axis(vec, idx, axis=1)
    return pltpu.roll(vec, -d, 1)


def _map_codes(x, table):
    """x (int32 array of codes < len(table)) mapped through a STATIC
    python tuple — a select chain with immediate constants, no memory
    traffic (alpha is 5 for nucleotides)."""
    out = jnp.full_like(x, jnp.int32(table[-1]))
    for a in range(len(table) - 2, -1, -1):
        out = jnp.where(x == a, jnp.int32(table[a]), out)
    return out


def _score_and_canon(qc_j, qch_j, tc_j, rev, sub_ref, subc_ref, c2cc_ref,
                     width, alpha, has_rev, fast):
    """Per-hit (substitution score row, effective query char row).

    fast=(match, mism, comp_t, c2cc_t) collapses the one-hot matmul
    machinery for uniform match/mismatch matrices (the nucleotide matrix
    is exactly q==t and q<X ? 2 : -3, NucleotideMatrix via
    constants/data/nucleotide): the complement and canonical-char maps
    become static select chains and the score a single compare — no
    one-hots, no MXU contraction, no per-hit matrix blend.  The generic
    path is bit-equivalent (small-int f32 matmuls are exact)."""
    if fast is not None:
        match, mism, comp_t, c2cc_t = fast
        if has_rev:
            qc_c = _map_codes(qc_j, comp_t)
            qch_c = _map_codes(qc_j, c2cc_t)
            rv_on = rev > 0
            qc_eff = jnp.where(rv_on, qc_c, qc_j)
            qch = jnp.where(rv_on, qch_c, qch_j)
        else:
            qc_eff, qch = qc_j, qch_j
        s = jnp.where((qc_eff == tc_j) & (qc_eff != alpha - 1),
                      jnp.int32(match), jnp.int32(mism))
        return s.reshape(1, width), qch
    a = jax.lax.broadcasted_iota(jnp.int32, (width, alpha), 1)
    q1h = (qc_j.reshape(width, 1) == a).astype(jnp.float32)
    t1h = (tc_j.reshape(width, 1) == a).astype(jnp.float32)
    if has_rev:
        rf = rev.astype(jnp.float32)
        sub_sel = (rf * subc_ref[...].astype(jnp.float32)
                   + (1.0 - rf) * sub_ref[...].astype(jnp.float32))
        qch_canon = jax.lax.dot_general(
            q1h, c2cc_ref[...].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(1, width) \
            .astype(jnp.int32)
        qch = rev * qch_canon + (1 - rev) * qch_j
    else:
        sub_sel = sub_ref[...].astype(jnp.float32)
        qch = qch_j
    sm = jax.lax.dot_general(
        q1h, sub_sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = (sm * t1h).sum(axis=1, dtype=jnp.float32).astype(jnp.int32) \
        .reshape(1, width)
    return s, qch


def _kernel(*refs, width, alpha, interpret, has_rev, fast):
    # pallas traces the kernel lazily (outside the caller's context), so
    # the 32-bit promotion guard must live here
    with jax.enable_x64(False):
        _kernel_body(*refs, width=width, alpha=alpha, interpret=interpret,
                     has_rev=has_rev, fast=fast)


def _kernel_body(qrow_ref, trow_ref, dq_ref, dt_ref, ov_ref, rev_ref,
                 qcodes_ref, tcodes_ref, qchars_ref, tchars_ref,
                 sub_ref, subc_ref, c2cc_ref, out_ref, *, width, alpha,
                 interpret, has_rev, fast):
    i = pl.program_id(0)
    dq = dq_ref[i]          # effective roll: qoff fwd, lmax-qlen+qoff rev
    dt = dt_ref[i]
    ov = ov_ref[i]
    rev = rev_ref[i] if has_rev else 0

    # dynamic lane-offset slices must be 128-aligned on TPU; load the
    # full row and bring the window to lane 0 with a dynamic roll instead
    # (wrapped lanes land at positions >= ov and are masked away).
    # Reverse-strand hits need NO in-kernel flip: lax.rev has no Mosaic
    # lowering, so the caller stacks [rows; flipped rows] in HBM and the
    # BlockSpec index map streams row (qrow + rev*N) — the right variant
    # arrives already flipped.
    qc_row = qcodes_ref[0].astype(jnp.int32)
    qch_row = qchars_ref[0].astype(jnp.int32)
    qc = _roll_left(qc_row, dq, width, interpret)
    qch_raw = _roll_left(qch_row, dq, width, interpret)
    tc = _roll_left(tcodes_ref[0].astype(jnp.int32), dt, width, interpret)
    tch = _roll_left(tchars_ref[0].astype(jnp.int32), dt, width, interpret)

    # s[j] = sub[qc'[j], tc[j]] with qc' = comp[qc] on reverse hits: the
    # complement is folded into the matrix choice (or a static select
    # chain on the uniform-matrix fast path)
    s, qch = _score_and_canon(qc, qch_raw, tc, rev, sub_ref, subc_ref,
                              c2cc_ref, width, alpha, has_rev, fast)

    j = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    star_here = ((qch == STAR) | (tch == STAR)).astype(jnp.int32)
    # scalar bool reductions lower poorly in Mosaic; use int32 maxima
    has_star0 = jnp.where(j == 0, star_here, jnp.zeros_like(star_here)).max() > 0
    first0 = jnp.where(has_star0 & (ov > 0), jnp.int32(1), jnp.int32(0))
    last_idx = jnp.maximum(ov - 1, 0)
    star_last = jnp.where(j == last_idx, star_here, jnp.zeros_like(star_here)).max() > 0
    last = last_idx - jnp.where((last_idx > 0) & star_last, jnp.int32(1), jnp.int32(0))
    # degenerate hits (ov <= 0) emit first/last = -1/-1 exactly like the
    # XLA path / the host e2e_diagonal, so downstream records agree
    first0 = jnp.where(ov > 0, first0, jnp.int32(-1))
    last = jnp.where(ov > 0, last, jnp.int32(-1))

    in_range = (j < ov) & (j >= first0) & (j <= last)
    # integer sums promote to int64 under the global x64 flag (which
    # Mosaic cannot lower); f32 sums stay f32 and are exact here
    score_f = jnp.where(in_range, s, jnp.zeros_like(s)) \
        .astype(jnp.float32).sum(dtype=jnp.float32)
    score = jnp.maximum(score_f.astype(jnp.int32), jnp.int32(0))
    fold = jnp.int32(~0x20 & 0xFF)
    idents = ((((qch & fold) == (tch & fold)) & in_range)
              .astype(jnp.float32).sum(dtype=jnp.float32)
              .astype(jnp.int32))
    out_ref[...] = jnp.stack(
        [score, first0.astype(jnp.int32), last.astype(jnp.int32),
         idents]).reshape(1, 1, 4)


def _kernel_blocked(*refs, width, alpha, block, interpret, has_rev, fast):
    with jax.enable_x64(False):
        _kernel_blocked_body(*refs, width=width, alpha=alpha, block=block,
                             interpret=interpret, has_rev=has_rev,
                             fast=fast)


def _kernel_blocked_body(qrow_ref, trow_ref, dq_ref, dt_ref, ov_ref,
                         rev_ref, *rest, width, alpha, block, interpret,
                         has_rev, fast):
    """BLOCK hits per grid step: the per-hit grid's ~2us fixed step cost
    (DMA issues + grid bookkeeping + (1, W) vector ops that use one
    sublane of eight) dominated the rescore at scale (183k hits = 0.35s
    device time at scale 64), so hits ride in blocks — `block` comb rows
    per side stream per step via per-hit BlockSpecs, the compute is
    vectorized over (block, W) and the one-hot substitution contraction
    becomes a single (block*W, alpha) MXU matmul. Codes and chars ride
    PACKED as one i32 (code<<8 | char) per residue, halving per-hit DMA
    issues."""
    qrefs = rest[:block]
    trefs = rest[block:2 * block]
    sub_ref, subc_ref, c2cc_ref, out_ref = rest[2 * block:]
    base = pl.program_id(0) * block

    # per-hit: roll + one-hot substitution matmul ((1, W) -> (W, 1) is
    # the one reshape Mosaic lowers; (B, W) -> (B*W, 1) is not), then
    # every mask/trim/reduction runs BATCHED on (B, W)
    s_rows = []
    qch_rows = []
    tch_rows = []
    for jj in range(block):
        qcomb_j = _roll_left(qrefs[jj][0].astype(jnp.int32),
                             dq_ref[base + jj], width, interpret)
        tcomb_j = _roll_left(trefs[jj][0].astype(jnp.int32),
                             dt_ref[base + jj], width, interpret)
        qc_j = qcomb_j >> 8
        qch_j = qcomb_j & 0xFF
        tc_j = tcomb_j >> 8
        tch_j = tcomb_j & 0xFF
        rv = rev_ref[base + jj] if has_rev else 0
        s_j, qch_j = _score_and_canon(qc_j, qch_j, tc_j, rv, sub_ref,
                                      subc_ref, c2cc_ref, width, alpha,
                                      has_rev, fast)
        s_rows.append(s_j)
        qch_rows.append(qch_j)
        tch_rows.append(tch_j)
    s = jnp.concatenate(s_rows, axis=0)          # (B, W)
    qch = jnp.concatenate(qch_rows, axis=0)
    tch = jnp.concatenate(tch_rows, axis=0)
    ov = jnp.concatenate(
        [ov_ref[base + jj].reshape(1, 1) for jj in range(block)], axis=0)
    _reduce_windows(s, qch, tch, ov, out_ref, width=width, block=block)


def _kernel_gathered(*refs, width, alpha, block, interpret, has_rev, fast):
    with jax.enable_x64(False):
        _kernel_gathered_body(*refs, width=width, alpha=alpha, block=block,
                              interpret=interpret, has_rev=has_rev,
                              fast=fast)


def _kernel_gathered_body(dq_ref, dt_ref, ov_ref, rev_ref, qrows_ref,
                          trows_ref, sub_ref, subc_ref, c2cc_ref, out_ref,
                          *, width, alpha, block, interpret, has_rev,
                          fast):
    """Gathered-rows variant: the caller row-gathers the packed comb rows
    in XLA (contiguous row gather — fast, unlike the per-element window
    gather of the XLA scan), so each grid step streams ONE contiguous
    (block, W) block per side instead of `block` scattered per-hit row
    DMAs — the measured floor of the streamed kernels was the per-hit
    DMA issue rate (~0.6us per issue on v5e), not compute."""
    base = pl.program_id(0) * block
    s_rows = []
    qch_rows = []
    tch_rows = []
    for jj in range(block):
        qcomb_j = _roll_left(qrows_ref[0, jj:jj + 1, :].astype(jnp.int32),
                             dq_ref[base + jj], width, interpret)
        tcomb_j = _roll_left(trows_ref[0, jj:jj + 1, :].astype(jnp.int32),
                             dt_ref[base + jj], width, interpret)
        qc_j = qcomb_j >> 8
        qch_j = qcomb_j & 0xFF
        tc_j = tcomb_j >> 8
        tch_j = tcomb_j & 0xFF
        rv = rev_ref[base + jj] if has_rev else 0
        s_j, qch_j = _score_and_canon(qc_j, qch_j, tc_j, rv, sub_ref,
                                      subc_ref, c2cc_ref, width, alpha,
                                      has_rev, fast)
        s_rows.append(s_j)
        qch_rows.append(qch_j)
        tch_rows.append(tch_j)
    s = jnp.concatenate(s_rows, axis=0)
    qch = jnp.concatenate(qch_rows, axis=0)
    tch = jnp.concatenate(tch_rows, axis=0)
    ov = jnp.concatenate(
        [ov_ref[base + jj].reshape(1, 1) for jj in range(block)], axis=0)
    _reduce_windows(s, qch, tch, ov, out_ref, width=width, block=block)


def _reduce_windows(s, qch, tch, ov, out_ref, *, width, block):
    """Batched (block, W) END_TO_END window reductions shared by the
    blocked kernels: '*'-trim, score clip, identity count."""
    j = jax.lax.broadcasted_iota(jnp.int32, (block, width), 1)
    star_here = ((qch == STAR) | (tch == STAR)).astype(jnp.int32)
    star0 = jnp.where(j == 0, star_here, jnp.zeros_like(star_here)) \
        .max(axis=1, keepdims=True)
    first0 = jnp.where((star0 > 0) & (ov > 0), jnp.int32(1), jnp.int32(0))
    last_idx = jnp.maximum(ov - 1, 0)
    star_last = jnp.where(j == last_idx, star_here,
                          jnp.zeros_like(star_here)) \
        .max(axis=1, keepdims=True)
    last = last_idx - jnp.where((last_idx > 0) & (star_last > 0),
                                jnp.int32(1), jnp.int32(0))
    first0 = jnp.where(ov > 0, first0, jnp.int32(-1))
    last = jnp.where(ov > 0, last, jnp.int32(-1))

    in_range = (j < ov) & (j >= first0) & (j <= last)
    score_f = jnp.where(in_range, s, jnp.zeros_like(s)) \
        .astype(jnp.float32).sum(axis=1, dtype=jnp.float32)
    score = jnp.maximum(score_f.astype(jnp.int32), jnp.int32(0)) \
        .reshape(block, 1)
    fold = jnp.int32(~0x20 & 0xFF)
    idents = ((((qch & fold) == (tch & fold)) & in_range)
              .astype(jnp.float32).sum(axis=1, dtype=jnp.float32)
              .astype(jnp.int32)).reshape(block, 1)
    out_ref[...] = jnp.concatenate(
        [score, first0, last, idents], axis=1).reshape(1, block, 4)


# hits per grid step of the blocked kernels (PLASS_PALLAS_BLOCK=0 falls
# back to the per-hit kernel; any other integer overrides the block
# size). PLASS_PALLAS_GATHER=0 disables the XLA row pre-gather variant
# (scalar-prefetch streamed rows instead).
_BLOCK = 8


def _block_size():
    v = os.environ.get("PLASS_PALLAS_BLOCK")
    if v is None:
        return _BLOCK
    return int(v)


def _gather_rows():
    return os.environ.get("PLASS_PALLAS_GATHER", "1") == "1"


# scalar-prefetch operands live in SMEM (~1 MB); 6 i32 arrays cap the
# per-call hit count
_CHUNK = 32768


def rescore_pairs_pallas(codes, chars, lengths, qrow, trow, diag,
                         sub, alpha, width, interpret=False,
                         qrev=None, comp_perm=None, code2char=None,
                         fast=None):
    """(score, first, last, ov, dist, idents) for END_TO_END hits.

    codes/chars: uint8[N, L]; qrow/trow/diag: int32[H]; sub:
    int32[alpha, alpha]. width must equal codes.shape[1] (full rows).
    qrev/comp_perm/code2char enable the nucleotide reverse-strand path.
    Hits beyond the SMEM budget are processed in chunks."""
    h = qrow.shape[0]
    has_rev = qrev is not None
    if qrev is None:
        qrev = jnp.zeros(h, dtype=jnp.int32)
    if h <= _CHUNK:
        return _rescore_chunk(codes, chars, lengths, qrow, trow, diag,
                              qrev, sub, comp_perm, code2char, alpha,
                              width, interpret, has_rev, fast)
    outs = []
    for lo in range(0, h, _CHUNK):
        hi = min(lo + _CHUNK, h)
        outs.append(_rescore_chunk(codes, chars, lengths, qrow[lo:hi],
                                   trow[lo:hi], diag[lo:hi], qrev[lo:hi],
                                   sub, comp_perm, code2char, alpha,
                                   width, interpret, has_rev, fast))
    return tuple(jnp.concatenate([o[k] for o in outs]) for k in range(6))


@functools.partial(jax.jit,
                   static_argnames=("width", "alpha", "interpret",
                                    "has_rev", "fast"))
def _rescore_chunk(codes, chars, lengths, qrow, trow, diag, qrev,
                   sub, comp_perm, code2char, alpha, width,
                   interpret=False, has_rev=False, fast=None):
    # the package enables x64 globally, but Mosaic has no 64-bit types;
    # trace the whole kernel under 32-bit promotion semantics
    with jax.enable_x64(False):
        return _rescore_pairs_pallas(codes, chars, lengths, qrow, trow,
                                     diag, qrev, sub, comp_perm, code2char,
                                     alpha, width, interpret, has_rev,
                                     fast)


def _rescore_pairs_pallas(codes, chars, lengths, qrow, trow, diag, qrev,
                          sub, comp_perm, code2char, alpha, width,
                          interpret, has_rev, fast=None):
    h = qrow.shape[0]
    lengths = lengths.astype(jnp.int32)
    diag = diag.astype(jnp.int32)
    qlen = lengths[qrow]
    tlen = lengths[trow]
    dist = jnp.abs(diag)
    pos_ok = jnp.where(diag >= 0, dist < qlen, dist < tlen)
    ov = jnp.where(diag >= 0,
                   jnp.minimum(tlen, qlen - dist),
                   jnp.minimum(tlen - dist, qlen))
    ov = jnp.where(pos_ok, ov, 0).astype(jnp.int32)
    lmax = codes.shape[1]
    qoff = jnp.where(diag >= 0, dist, 0).astype(jnp.int32)
    toff = jnp.where(diag >= 0, 0, dist).astype(jnp.int32)
    if width != lmax:
        raise ValueError("pallas rescore operates on full rows: pass "
                         "width == codes.shape[1]")
    if width & (width - 1):
        # pltpu.roll with a DYNAMIC shift silently produces wrong lanes
        # for non-power-of-two widths (chip-diagnosed at 384: every
        # rolled window read garbage while 512 was exact) — callers must
        # pad rows to a power of two (backend._pallas_rows does)
        raise ValueError(f"pallas rescore width must be a power of two "
                         f"(dynamic pltpu.roll constraint), got {width}")
    rev = qrev.astype(jnp.int32)
    if has_rev:
        # reverse window read: row[qlen-1-(qoff+j)] == flip(row)[dq_eff+j]
        dq = jnp.where(rev > 0, lmax - qlen + qoff, qoff).astype(jnp.int32)
        sub_comp = sub[comp_perm.astype(jnp.int32), :]
        c2c_comp = code2char[comp_perm.astype(jnp.int32)] \
            .astype(jnp.int32).reshape(alpha, 1)
    else:
        dq = qoff
        sub_comp = sub
        c2c_comp = jnp.zeros((alpha, 1), dtype=jnp.int32)
    dt = toff

    nsp = 6
    n_rows = codes.shape[0]
    block = _block_size()

    if block > 1:
        # BLOCKED kernel: `block` hits per grid step, packed comb rows
        comb = ((codes.astype(jnp.int32) << 8) |
                chars.astype(jnp.int32))
        if has_rev:
            qcomb = jnp.concatenate([comb, jnp.flip(comb, axis=1)], axis=0)
            qrow = qrow.astype(jnp.int32) + rev * n_rows
        else:
            qcomb = comb
        hp = ((h + block - 1) // block) * block
        pad = hp - h

        def p(x):
            return jnp.pad(x.astype(jnp.int32), (0, pad)) if pad else \
                x.astype(jnp.int32)

        grid = (hp // block,)

        if _gather_rows():
            # XLA row pre-gather: contiguous (1, B, W) blocks stream per
            # step — no per-hit scattered DMAs (their issue rate was the
            # measured floor of the streamed variants)
            qrows = jnp.take(qcomb, p(qrow), axis=0) \
                .reshape(hp // block, block, lmax)
            trows = jnp.take(comb, p(trow), axis=0) \
                .reshape(hp // block, block, lmax)

            def bmap(i, *rest):
                return (i, 0, 0)

            def zmap2(i, *rest):
                return (0, 0)

            out = pl.pallas_call(
                functools.partial(_kernel_gathered, width=width,
                                  alpha=alpha, block=block,
                                  interpret=interpret, has_rev=has_rev,
                                  fast=fast),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=4,
                    grid=grid,
                    in_specs=[pl.BlockSpec((1, block, lmax), bmap),
                              pl.BlockSpec((1, block, lmax), bmap),
                              pl.BlockSpec((alpha, alpha), zmap2),
                              pl.BlockSpec((alpha, alpha), zmap2),
                              pl.BlockSpec((alpha, 1), zmap2)],
                    out_specs=pl.BlockSpec((1, block, 4), bmap)),
                out_shape=jax.ShapeDtypeStruct((hp // block, block, 4),
                                               jnp.int32),
                interpret=interpret,
            )(p(dq), p(dt), p(ov), p(rev), qrows, trows,
              sub, sub_comp, c2c_comp)
            out = out.reshape(hp, 4)[:h]
            return (out[:, 0], out[:, 1], out[:, 2], ov,
                    dist.astype(jnp.int32), out[:, 3])

        def mkmap(which, jj):
            if which == 0:
                return lambda i, qr, tr, *rest: (qr[i * block + jj], 0, 0)
            return lambda i, qr, tr, *rest: (tr[i * block + jj], 0, 0)

        def zmap(i, *rest):
            return (0, 0)

        def omap(i, *rest):
            return (i, 0, 0)

        in_specs = ([pl.BlockSpec((1, 1, lmax), mkmap(0, jj))
                     for jj in range(block)] +
                    [pl.BlockSpec((1, 1, lmax), mkmap(1, jj))
                     for jj in range(block)] +
                    [pl.BlockSpec((alpha, alpha), zmap),
                     pl.BlockSpec((alpha, alpha), zmap),
                     pl.BlockSpec((alpha, 1), zmap)])
        qcomb3 = qcomb.reshape(-1, 1, lmax)
        tcomb3 = comb.reshape(-1, 1, lmax)
        out = pl.pallas_call(
            functools.partial(_kernel_blocked, width=width, alpha=alpha,
                              block=block, interpret=interpret,
                              has_rev=has_rev, fast=fast),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=nsp,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, block, 4), omap)),
            out_shape=jax.ShapeDtypeStruct((hp // block, block, 4),
                                           jnp.int32),
            interpret=interpret,
        )(p(qrow), p(trow), p(dq), p(dt), p(ov), p(rev),
          *([qcomb3] * block), *([tcomb3] * block),
          sub, sub_comp, c2c_comp)
        out = out.reshape(hp, 4)[:h]
        return (out[:, 0], out[:, 1], out[:, 2], ov,
                dist.astype(jnp.int32), out[:, 3])

    grid = (h,)

    # rows ride as [N, 1, L] so the per-row block (1, 1, L) satisfies the
    # TPU tiling rule (trailing block dims equal the array dims).
    # has_rev: the query arrays are [rows; flipped rows] stacked (lax.rev
    # has no Mosaic lowering, so the flip happens in XLA outside the
    # kernel) and the index map streams the flipped copy for rev hits.
    if has_rev:
        qcodes = jnp.concatenate([codes, jnp.flip(codes, axis=1)], axis=0)
        qchars = jnp.concatenate([chars, jnp.flip(chars, axis=1)], axis=0)
        # effective row id computed in XLA: rev hits stream the flipped
        # copy; the index map itself stays a plain prefetch read
        qrow = qrow.astype(jnp.int32) + rev * n_rows
    else:
        qcodes = codes
        qchars = chars

    def qmap(i, qr, tr, *rest):
        return (qr[i], 0, 0)

    def tmap(i, qr, tr, *rest):
        return (tr[i], 0, 0)

    def zmap(i, *rest):
        return (0, 0)

    def omap(i, *rest):
        return (i, 0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, width=width, alpha=alpha,
                          interpret=interpret, has_rev=has_rev, fast=fast),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            grid=grid,
            in_specs=[pl.BlockSpec((1, 1, lmax), qmap),
                      pl.BlockSpec((1, 1, lmax), tmap),
                      pl.BlockSpec((1, 1, lmax), qmap),
                      pl.BlockSpec((1, 1, lmax), tmap),
                      pl.BlockSpec((alpha, alpha), zmap),
                      pl.BlockSpec((alpha, alpha), zmap),
                      pl.BlockSpec((alpha, 1), zmap)],
            out_specs=pl.BlockSpec((1, 1, 4), omap)),
        out_shape=jax.ShapeDtypeStruct((h, 1, 4), jnp.int32),
        interpret=interpret,
    )(qrow.astype(jnp.int32), trow.astype(jnp.int32),
      dq, dt, ov, rev,
      qcodes.reshape(-1, 1, lmax), codes.reshape(-1, 1, lmax),
      qchars.reshape(-1, 1, lmax), chars.reshape(-1, 1, lmax),
      sub, sub_comp, c2c_comp)
    out = out.reshape(h, 4)
    return (out[:, 0], out[:, 1], out[:, 2], ov,
            dist.astype(jnp.int32), out[:, 3])


def pallas_enabled():
    """Opt-in gate for the HOST-upload path (PLASS_PALLAS=1)."""
    return os.environ.get("PLASS_PALLAS", "0") == "1"


# Product-path default on accelerators, decided by an on-chip benchmark
# (bench.py protein iteration at SCALE=4, PLASS_PALLAS=1 vs 0 on the same
# 24.5k-ORF workload, v5e via axon, 2026-08-21): the full-row per-hit
# Pallas grid beat the XLA width-bucketed scan 0.0321 s vs 0.0594 s of
# device rescore time (iteration 0.137 s vs 0.162 s), so it is the
# default wherever it applies (END_TO_END, device-resident hits).
# PLASS_PALLAS=0/1 always overrides.
_PRODUCT_DEFAULT = True


def pallas_on_product():
    """Should the device-resident product path use the Pallas kernel?"""
    env = os.environ.get("PLASS_PALLAS")
    if env is not None:
        return env == "1"
    return (_PRODUCT_DEFAULT and pltpu is not None
            and jax.default_backend() != "cpu")