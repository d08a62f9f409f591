"""Batched gapped Smith-Waterman SCORE_ONLY kernel (device).

The reference's align stage scores every (query, target) candidate with
striped SIMD SW (StripedSmithWaterman.cpp:71-231) before filtering most
of them away on E-value. This kernel computes the EXACT same local
affine-gap maxima for thousands of pairs in one dispatch — an
anti-diagonal-free column scan where the intra-column F dependency is
closed into a prefix max (valid whenever gap-open >= gap-extend, true for
both 11/1 protein and 5/2 nucleotide defaults):

    F(i,j) = max_{k<i} (H(k,j) - gapo - (i-1-k) * gape)
           = prefmax_{k<i}(H(k,j) + k*gape) - (i-1)*gape - gapo

Composition-bias correction is per-position additive
(StripedSmithWaterman createQueryProfile adds bias[i] to every row), so
the kernel takes a per-query bias vector instead of full profiles.

Positions/backtraces stay host-side (native ssw) for the few survivors —
their lane-order tie-breaks are part of byte parity; the score itself is
tie-free and exact, so E-value rejection via this kernel is
bit-equivalent to rejecting after a full ssw call.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.int32(-(1 << 30))


@functools.partial(jax.jit, static_argnames=("alpha", "gapo", "gape"))
def sw_score_batch(qcodes, bias, qlens, tcodes, tlens, qrow, trow,
                   sub_flat, alpha, gapo, gape):
    """Max local SW score per pair.

    qcodes u8[NQ, LQ], bias i32[NQ, LQ] (comp-bias per query position),
    qlens i32[NQ]; tcodes u8[NT, LT], tlens i32[NT]; qrow/trow i32[B]
    select the pair rows; sub_flat i32[alpha*alpha]. Returns i32[B]."""
    q = qcodes[qrow].astype(jnp.int32)          # [B, LQ]
    b = bias[qrow]                              # [B, LQ]
    ql = qlens[qrow]                            # [B]
    tl = tlens[trow]                            # [B]
    t = tcodes[trow].astype(jnp.int32)          # [B, LT]
    B, LQ = q.shape
    LT = t.shape[1]
    ii = jnp.arange(LQ, dtype=jnp.int32)
    imask = ii[None, :] < ql[:, None]           # [B, LQ]
    igape = ii * jnp.int32(gape)

    def step(carry, xs):
        H, E, best = carry
        tj, j = xs                              # tj i32[B]
        s = sub_flat[q * alpha + tj[:, None]] + b
        E2 = jnp.maximum(H - jnp.int32(gapo), E - jnp.int32(gape))
        Hdiag = jnp.pad(H[:, :-1], ((0, 0), (1, 0)))
        H0 = jnp.maximum(jnp.maximum(Hdiag + s, E2), 0)
        H0 = jnp.where(imask, H0, 0)
        # lazy F: prefix max of H0(k)+k*gape over k<i
        key = H0 + igape[None, :]
        pm = jax.lax.associative_scan(jnp.maximum, key, axis=1)
        pm = jnp.pad(pm[:, :-1], ((0, 0), (1, 0)), constant_values=NEG)
        F = pm - (ii[None, :] - 1) * jnp.int32(gape) - jnp.int32(gapo)
        H1 = jnp.where(imask, jnp.maximum(H0, F), 0)
        ok = (j < tl)[:, None]
        Hn = jnp.where(ok, H1, H)
        En = jnp.where(ok, E2, E)
        best = jnp.maximum(best, jnp.where(ok, Hn, 0).max(axis=1))
        return (Hn, En, best), None

    H0 = jnp.zeros((B, LQ), dtype=jnp.int32)
    E0 = jnp.full((B, LQ), NEG, dtype=jnp.int32)
    best0 = jnp.zeros(B, dtype=jnp.int32)
    (_, _, best), _ = jax.lax.scan(
        step, (H0, E0, best0),
        (t.T, jnp.arange(LT, dtype=jnp.int32)))
    return best


def batch_pair_scores(db, tdb, pairs, aligner_bias_fn, gap_open, gap_extend,
                      bucket=4096):
    """Host glue: score all (qkey, tkey) pairs on device.

    aligner_bias_fn(qid) -> (qnum uint8[L], bias int32[L]) replicating the
    exact integer profile row the native ssw builds (sub[a][q_i]+bias[i]).
    Returns {(qkey, tkey): score}."""
    from .. import constants
    from ..data import seqdb as seqdb_mod
    from .backend import db_to_device, _bucket

    is_nucl = db.dbtype == seqdb_mod.NUCLEOTIDES
    mat = constants.nucleotide() if is_nucl else constants.blosum62()
    alpha = mat.alphabet_size
    sub_flat = jnp.asarray(mat.sub.astype(np.int32).reshape(-1))

    # unique queries -> padded codes+bias
    qkeys = sorted({q for q, _ in pairs})
    qidx = {k: i for i, k in enumerate(qkeys)}
    rows = []
    for k in qkeys:
        rows.append(aligner_bias_fn(db.key_to_id(k)))
    lq = _bucket(max((len(r[0]) for r in rows), default=1), 128)
    nq = _bucket(len(qkeys), 64)
    qc = np.full((nq, lq), alpha - 1, dtype=np.uint8)
    qb = np.zeros((nq, lq), dtype=np.int32)
    qlen = np.zeros(nq, dtype=np.int32)
    for i, (qn, bias) in enumerate(rows):
        qc[i, :len(qn)] = qn
        qb[i, :len(qn)] = bias
        qlen[i] = len(qn)

    tcodes, tlens, _tk = db_to_device(tdb, "score")
    tlut = tdb.id_lookup_array()
    B = len(pairs)
    bq = np.zeros(_bucket(B, bucket), dtype=np.int32)
    bt = np.zeros(_bucket(B, bucket), dtype=np.int32)
    for i, (q, t) in enumerate(pairs):
        bq[i] = qidx[q]
        bt[i] = int(tlut[t])
    scores = np.asarray(sw_score_batch(
        jnp.asarray(qc), jnp.asarray(qb), jnp.asarray(qlen), tcodes, tlens,
        jnp.asarray(bq), jnp.asarray(bt), sub_flat, alpha,
        int(gap_open), int(gap_extend)))
    return {pair: int(scores[i]) for i, pair in enumerate(pairs)}
