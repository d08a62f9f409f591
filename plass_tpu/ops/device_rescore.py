"""Device ungapped diagonal rescoring (reference: DistanceCalculator.h:115-220,
rescorediagonal.cpp:45-334).

Batched over (query, target, diagonal) hits: gathers the two rows, slides
the target window onto the query diagonal, scores through the substitution
LUT, applies the END_TO_END star-skip, and reduces score + identity counts.
Integer-only on device; E-values/filters stay on the host (float64 exactness
+ tiny arrays). XLA fuses the gather -> LUT -> reduce chain so the per-pair
score matrix never materializes.

Supported modes: END_TO_END(3) — the plass/penguin extension mode — and
HAMMING(0) (linclust pre-cluster rescoring). Other modes run on the host.

Reverse-strand hits (nucleotide): the query is read back-to-front through a
complement permutation, reproducing rescorediagonal.cpp:173-179 where the
reverse-complemented query string is built from numeric codes (so its chars
are canonical ACGT even if the original had IUPAC letters).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

STAR = np.uint8(ord("*"))


@functools.partial(jax.jit,
                   static_argnames=("mode", "alpha", "width", "has_rev"))
def rescore_pairs(codes, chars, lengths, qrow, trow, diag, qrev, sub_flat,
                  comp_perm, code2char, alpha, mode=3, width=None,
                  has_rev=True):
    """Score hits along their diagonals.

    codes:  uint8[N, L] substitution-alphabet codes ('*' scores as X)
    chars:  uint8[N, L] uppercased ASCII (identity + star detection)
    qrow/trow: int32[H]; diag: int32[H]; qrev: bool[H] reverse-strand flag
    sub_flat: int32[alpha*alpha]; comp_perm: int32[alpha] complement;
    code2char: uint8[alpha] numeric code -> canonical char.

    Returns (score, first, last, ov, dist, idents) int32[H] relative to the
    overlap window (DistanceCalculator::ungappedAlignmentByDiagonal).

    width: static column extent of the overlap scan — every pair in this
    call must have ov <= width (the host glue buckets pairs by overlap so
    short-read hits don't pay the longest-contig row width).

    has_rev=False (static) drops the reverse-strand machinery entirely —
    the protein path never reverses, and random gathers (comp_perm[qc],
    code2char[qc]) are the dominant device cost. Codes and chars are
    fetched through ONE packed u16 gather per side for the same reason.
    """
    n, lmax = codes.shape
    if width is None:
        width = lmax
    h = qrow.shape[0]
    qlen = lengths[qrow]
    tlen = lengths[trow]
    dist = jnp.abs(diag)
    pos_ok = jnp.where(diag >= 0, dist < qlen, dist < tlen)
    ov = jnp.where(diag >= 0,
                   jnp.minimum(tlen, qlen - dist),
                   jnp.minimum(tlen - dist, qlen))
    ov = jnp.where(pos_ok, ov, 0)
    qoff = jnp.where(diag >= 0, dist, 0)
    toff = jnp.where(diag >= 0, 0, dist)

    j = jnp.arange(width, dtype=jnp.int32)[None, :]
    qpos = qoff[:, None] + j
    if has_rev:
        qidx = jnp.where(qrev[:, None], qlen[:, None] - 1 - qpos, qpos)
    else:
        qidx = qpos
    qidx = jnp.clip(qidx, 0, lmax - 1)
    tidx = jnp.clip(toff[:, None] + j, 0, lmax - 1)

    comb = (codes.astype(jnp.uint16) << jnp.uint16(8)) | chars
    qcomb = comb[qrow[:, None], qidx]
    tcomb = comb[trow[:, None], tidx]
    qc = (qcomb >> jnp.uint16(8)).astype(jnp.int32)
    tc = (tcomb >> jnp.uint16(8)).astype(jnp.int32)
    qch = (qcomb & jnp.uint16(0xFF)).astype(jnp.uint8)
    tch = (tcomb & jnp.uint16(0xFF)).astype(jnp.uint8)
    if has_rev:
        qc = jnp.where(qrev[:, None], comp_perm[qc], qc)
        # reverse hits read canonical chars derived from the numeric codes
        qch = jnp.where(qrev[:, None], code2char[qc], qch)
    fold = np.uint8(~0x20 & 0xFF)
    qch_u = qch & fold
    tch_u = tch & fold

    in_ov = j < ov[:, None]
    s = sub_flat[qc * alpha + tc]

    if mode == 3:  # END_TO_END with star-skip (raw-char '*' test)
        first = ((qch[:, 0] == STAR) | (tch[:, 0] == STAR)).astype(jnp.int32)
        last_idx = jnp.maximum(ov - 1, 0)
        rows = jnp.arange(h)
        cl = jnp.clip(last_idx, 0, lmax - 1)
        strip_last = (last_idx > 0) & ((qch[rows, cl] == STAR) | (tch[rows, cl] == STAR))
        last = last_idx - strip_last.astype(jnp.int32)
        in_range = in_ov & (j >= first[:, None]) & (j <= last[:, None])
        score = jnp.maximum((s * in_range).sum(axis=1), 0)
        idents = ((qch_u == tch_u) & in_range).sum(axis=1)
        return (score.astype(jnp.int32), first, last, ov, dist,
                idents.astype(jnp.int32))
    if mode == 0:  # HAMMING: score = number of identical raw chars
        idents = ((qch == tch) & in_ov).sum(axis=1).astype(jnp.int32)
        z = jnp.zeros(h, dtype=jnp.int32)
        return idents, z - 1, z - 1, ov, dist, idents
    raise ValueError(f"unsupported device rescore mode {mode}")
