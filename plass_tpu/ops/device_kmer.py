"""Device (JAX/XLA) k-mer matcher — the hot path of every assembly iteration.

Same semantics as ops/kmermatch.py (reference: linclust/kmermatcher.cpp) but
expressed as fixed-shape array programs: batched selection via lexicographic
sorts, grouping via segmented scans, pair emission via masked writes. All
stages jit cleanly; the global table sort is the dominant cost and maps to
XLA's on-device sort. Multi-chip sharding splits the table by 16-bit hash
range (parallel/mesh.py), mirroring the reference's split files + merge
(kmermatcher.cpp:594-779).

Entries use uint64 k-mer values (bit 63 = forward-strand marker for
nucleotides) — TPU emulates 64-bit lanes; the selection hash is the exact
XXH64 of the packed k-mer so device and host pick identical k-mer sets.
"""
import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .hashes import xxh64_u64_jnp

BIT63 = np.uint64(1) << np.uint64(63)
U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
INVALID_HASH = np.int32(1 << 20)


@dataclass(frozen=True)
class KmerParams:
    k: int
    alphabet_size: int
    kmers_per_sequence: int
    kmers_per_sequence_scale: float
    is_nucl: bool
    ignore_multi_kmer: bool = True
    include_only_extendable: bool = True
    cov_thr: float = 0.0
    ksel: int = 64  # static per-row selection capacity

    @classmethod
    def protein_default(cls, **kw):
        base = dict(k=14, alphabet_size=13, kmers_per_sequence=60,
                    kmers_per_sequence_scale=0.0, is_nucl=False)
        base.update(kw)
        return cls(**base)


def ksel_capacity(kps, scale, lmax):
    """Static per-sequence selection capacity covering kc for every length."""
    return int(kps - 1 + scale * lmax) + 1


# ---------------------------------------------------------------------------
# Stage A: per-sequence k-mer extraction + smallest-hash selection
# ---------------------------------------------------------------------------

def _extract_kmers(seqs, lengths, k, alphabet_size, is_nucl):
    """seqs: uint8[N, L] numeric codes (X = alpha-1). Returns
    (kmer u64[N, P], store_pos i32[N, P], valid bool[N, P]) with P = L-k+1."""
    n, lmax = seqs.shape
    p = lmax - k + 1
    x_code = alphabet_size - 1
    contains_x = jnp.zeros((n, p), dtype=bool)
    kidx = jnp.zeros((n, p), dtype=jnp.uint64)
    if is_nucl:
        for i in range(k):
            w = jax.lax.dynamic_slice_in_dim(seqs, i, p, axis=1)
            contains_x = contains_x | (w == x_code)
            kidx = (kidx << jnp.uint64(2)) | w.astype(jnp.uint64)
    else:
        pw = 1
        for i in range(k):
            w = jax.lax.dynamic_slice_in_dim(seqs, i, p, axis=1)
            contains_x = contains_x | (w == x_code)
            kidx = kidx + w.astype(jnp.uint64) * jnp.uint64(pw)
            pw *= (alphabet_size - 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, p), 1)
    in_range = pos < (lengths[:, None] - k + 1)
    valid = in_range & ~contains_x

    if is_nucl:
        rev = _revcomp_packed_jnp(kidx, k)
        not_palin = rev != kidx
        valid = valid & not_palin
        pick_rev = rev < kidx
        canon = jnp.where(pick_rev, rev, kidx)
        store_pos = jnp.where(pick_rev, lengths[:, None] - pos - k, pos)
        store_kmer = jnp.where(pick_rev, canon & ~jnp.uint64(BIT63),
                               canon | jnp.uint64(BIT63))
        return store_kmer, store_pos.astype(jnp.int32), canon, valid
    return kidx, pos.astype(jnp.int32), kidx, valid


def _revcomp_packed_jnp(kmer, k):
    out = jnp.zeros_like(kmer)
    v = kmer
    for _ in range(k):
        out = (out << jnp.uint64(2)) | ((v ^ jnp.uint64(2)) & jnp.uint64(3))
        v = v >> jnp.uint64(2)
    return out


def _seq_hash(seqs, lengths):
    """Util::hash h = h*31 + x, whole-sequence (kmermatcher.cpp:135-137)."""
    n, lmax = seqs.shape

    def body(j, h):
        active = j < lengths
        return jnp.where(active, h * jnp.uint64(31) + seqs[:, j].astype(jnp.uint64), h)

    return jax.lax.fori_loop(0, lmax, body, jnp.zeros(n, dtype=jnp.uint64))


def select_kmers(seqs, lengths, params: KmerParams, hash_shift):
    """Per-sequence smallest-hash selection (kmermatcher.cpp:221-347).

    Returns (sel_kmer u64[N,KSEL], sel_pos i32[N,KSEL], sel_valid bool,
    seq_hash u64[N], sel_hash16 i32[N,KSEL]).
    """
    n, lmax = seqs.shape
    ksel = params.ksel
    store_kmer, store_pos, canon, valid = _extract_kmers(
        seqs, lengths, params.k, params.alphabet_size, params.is_nucl)
    p = store_kmer.shape[1]

    h16 = (xxh64_u64_jnp(canon, hash_shift) & jnp.uint64(0xFFFF)).astype(jnp.int32)
    h16 = jnp.where(valid, h16, INVALID_HASH)

    kc = jnp.minimum(
        (params.kmers_per_sequence - 1
         + params.kmers_per_sequence_scale * lengths).astype(jnp.int32),
        valid.sum(axis=1).astype(jnp.int32))

    # threshold = (kc-th smallest pre-dedup hash) + 1; tooMuch = |{h<=h_kc}|-kc
    h_sorted = jnp.sort(h16, axis=1)
    h_kc = jnp.take_along_axis(
        h_sorted, jnp.maximum(kc - 1, 0)[:, None], axis=1)[:, 0]
    h_kc = jnp.where(kc > 0, h_kc, -1)
    cum_le = (h16 <= h_kc[:, None]).sum(axis=1).astype(jnp.int32)
    too_much = cum_le - kc

    # duplicate k-mers within a sequence (ignore-multi-kmer): strand bit masked
    masked = (store_kmer | jnp.uint64(BIT63)) if params.is_nucl else store_kmer
    masked_for_dup = jnp.where(valid, masked, jnp.full_like(masked, U64MAX))
    if params.ignore_multi_kmer:
        mk_sorted, perm = jax.lax.sort(
            (masked_for_dup, jax.lax.broadcasted_iota(jnp.int32, (n, p), 1)),
            dimension=1, num_keys=1)
        dup_s = jnp.zeros((n, p), dtype=bool)
        eq_prev = jnp.concatenate(
            [jnp.zeros((n, 1), bool), mk_sorted[:, 1:] == mk_sorted[:, :-1]], axis=1)
        eq_next = jnp.concatenate(
            [mk_sorted[:, 1:] == mk_sorted[:, :-1], jnp.zeros((n, 1), bool)], axis=1)
        dup_s = eq_prev | eq_next
        # scatter back to original positions
        dup = jnp.zeros((n, p), dtype=bool)
        dup = dup.at[jax.lax.broadcasted_iota(jnp.int32, (n, p), 0), perm].set(dup_s)
    else:
        dup = jnp.zeros((n, p), dtype=bool)

    eligible = valid & ~dup
    # selection order: (hash, masked kmer, pos)
    big_if_inel = jnp.where(eligible, h16, INVALID_HASH)
    s_h, s_m, s_pos, s_idx = jax.lax.sort(
        (big_if_inel, masked_for_dup, store_pos,
         jax.lax.broadcasted_iota(jnp.int32, (n, p), 1)),
        dimension=1, num_keys=3)
    s_elig = s_h < INVALID_HASH
    nonb = s_elig & (s_h < h_kc[:, None])
    bnd = s_elig & (s_h == h_kc[:, None])
    r_all = jnp.cumsum((nonb | bnd).astype(jnp.int32), axis=1)
    r_bnd = jnp.cumsum(bnd.astype(jnp.int32), axis=1)
    sel = (nonb | (bnd & ((too_much[:, None] == 0) | (r_bnd <= too_much[:, None])))) \
        & (r_all <= kc[:, None])

    # compact to KSEL slots keeping selection order
    order_key = jnp.where(sel, jnp.arange(p, dtype=jnp.int32)[None, :], INVALID_HASH)
    c_key, c_idx = jax.lax.sort(
        (order_key, s_idx), dimension=1, num_keys=1)
    take = min(ksel, p)
    c_key = c_key[:, :take]
    c_idx = c_idx[:, :take]
    sel_valid = c_key < INVALID_HASH
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, take), 0)
    sel_kmer = store_kmer[rows, c_idx]
    sel_pos = store_pos[rows, c_idx]
    sel_h16 = h16[rows, c_idx]
    if take < ksel:
        pad = ksel - take
        sel_kmer = jnp.pad(sel_kmer, ((0, 0), (0, pad)))
        sel_pos = jnp.pad(sel_pos, ((0, 0), (0, pad)))
        sel_h16 = jnp.pad(sel_h16, ((0, 0), (0, pad)), constant_values=INVALID_HASH)
        sel_valid = jnp.pad(sel_valid, ((0, 0), (0, pad)))

    seq_hash = xxh64_u64_jnp(_seq_hash(seqs, lengths), hash_shift)
    return sel_kmer, sel_pos, sel_valid, seq_hash, sel_h16


# ---------------------------------------------------------------------------
# Stage B: global table -> (rep, target, diagonal) pairs -> best-diagonal hits
# ---------------------------------------------------------------------------

def _segmented_cummax(key, seg_start):
    """Running max of `key` within segments delimited by seg_start (bool)."""
    def op(a, b):
        a_flag, a_val = a
        b_flag, b_val = b
        val = jnp.where(b_flag, b_val, jnp.maximum(a_val, b_val))
        return (a_flag | b_flag, val)
    _, out = jax.lax.associative_scan(op, (seg_start, key))
    return out


def build_pairs(sel_kmer, sel_pos, sel_valid, seq_hash, keys, lengths,
                params: KmerParams):
    """Global sort + group assignment + pair emission
    (kmermatcher.cpp:406-558). All arrays flattened to T = N*KSEL + N entries.

    Returns (rep u32[T], tgt u32[T], diag i32[T], tlen i32[T], rev bool[T],
    valid bool[T]) sorted by (rep, tgt, diag).
    """
    n, ksel = sel_kmer.shape
    ids = jnp.broadcast_to(keys[:, None], (n, ksel))
    lens = jnp.broadcast_to(lengths[:, None].astype(jnp.int32), (n, ksel))

    kmer = jnp.concatenate([sel_kmer.reshape(-1), seq_hash])
    sid = jnp.concatenate([ids.reshape(-1), keys]).astype(jnp.uint32)
    pos = jnp.concatenate([sel_pos.reshape(-1),
                           jnp.zeros(n, dtype=jnp.int32)])
    slen = jnp.concatenate([lens.reshape(-1), lengths.astype(jnp.int32)])
    valid = jnp.concatenate([sel_valid.reshape(-1), jnp.ones(n, dtype=bool)])

    masked = (kmer | jnp.uint64(BIT63)) if params.is_nucl else kmer
    masked = jnp.where(valid, masked, jnp.full_like(masked, U64MAX))

    # sort by (kmer, len desc, id, pos); invalid entries sink to the end
    neg_len = -slen
    m_s, nl_s, sid_s, pos_s, kmer_s, valid_s = jax.lax.sort(
        (masked, neg_len, sid, pos, kmer, valid), dimension=0, num_keys=4)
    slen_s = -nl_s

    new_group = jnp.concatenate([jnp.array([True]), m_s[1:] != m_s[:-1]])
    t = m_s.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    rep_row = _segmented_cummax(jnp.where(new_group, idx, -1), new_group)
    rep_id = sid_s[rep_row]
    rep_pos = pos_s[rep_row]
    rep_len = slen_s[rep_row]

    # group sizes: index of last element of the group - rep_row + 1
    # last element: next group start - 1 via reverse cummax trick
    group_id = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    # singleton check: element i is in a singleton group iff neither neighbor
    # shares its group
    same_prev = jnp.concatenate([jnp.array([False]), group_id[1:] == group_id[:-1]])
    same_next = jnp.concatenate([group_id[:-1] == group_id[1:], jnp.array([False])])
    non_singleton = same_prev | same_next

    if params.is_nucl:
        rep_fwd = (kmer_s[rep_row] & jnp.uint64(BIT63)) != 0
        tgt_fwd = (kmer_s & jnp.uint64(BIT63)) != 0
        rev = rep_fwd != tgt_fwd
        q_pos = jnp.where(tgt_fwd, rep_pos, rep_len - 1 - rep_pos)
        t_pos = jnp.where(tgt_fwd, pos_s, slen_s - 1 - pos_s)
        diagonal = (q_pos - t_pos).astype(jnp.int32)
    else:
        rev = jnp.zeros(t, dtype=bool)
        diagonal = (rep_pos - pos_s).astype(jnp.int32)

    can_extend = (diagonal < 0) | (diagonal > (rep_len - slen_s))
    keep = valid_s & non_singleton
    if params.include_only_extendable:
        keep = keep & can_extend
    elif params.cov_thr > 0.0:
        big = jnp.maximum(rep_len, slen_s).astype(jnp.float32)
        small = jnp.minimum(rep_len, slen_s).astype(jnp.float32)
        keep = keep & (small / big >= params.cov_thr)

    # sort pairs by (rep, tgt, diag); dropped entries sink
    rep_key = jnp.where(keep, rep_id, jnp.uint32(0xFFFFFFFF))
    rk, tk, dk, rv, kp = jax.lax.sort(
        (rep_key, sid_s, diagonal, rev, keep), dimension=0, num_keys=3)
    return rk, tk, dk, rv, kp


def best_diagonal_hits(rep, tgt, diag, rev, valid):
    """Per (rep, target) run: most frequent diagonal (ties -> larger), score =
    run length, sign = rev of the winning entry (kmermatcher.cpp:870-913).

    Returns (rep, tgt, score i32 signed, diag i32, hit_valid bool) — one hit
    marked at each (rep,tgt) segment end; self pairs excluded.
    """
    t = rep.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    seg_start = jnp.concatenate([jnp.array([True]),
                                 (rep[1:] != rep[:-1]) | (tgt[1:] != tgt[:-1])])
    run_start = seg_start | jnp.concatenate([jnp.array([True]),
                                             diag[1:] != diag[:-1]])
    run_first = _segmented_cummax(jnp.where(run_start, idx, -1), run_start)
    run_count = idx - run_first + 1
    seg_first = _segmented_cummax(jnp.where(seg_start, idx, -1), seg_start)

    # winner per segment: lex-max of (count, diag, rev) packed into int64
    packed = (run_count.astype(jnp.int64) << 34) \
        | ((diag.astype(jnp.int64) + (1 << 31)) << 1) \
        | rev.astype(jnp.int64)
    best = _segmented_cummax(packed, seg_start)

    seg_end = jnp.concatenate([seg_start[1:], jnp.array([True])])
    top_score = idx - seg_first + 1
    best_diag = ((best >> 1) & ((1 << 32) - 1)).astype(jnp.int64) - (1 << 31)
    best_rev = (best & 1).astype(bool)
    score = jnp.where(best_rev, -top_score, top_score)
    hit_valid = seg_end & valid & (rep != tgt)
    return rep, tgt, score.astype(jnp.int32), best_diag.astype(jnp.int32), hit_valid


@functools.partial(jax.jit, static_argnames=("params", "hit_capacity"))
def kmermatch_device(seqs, lengths, keys, hash_shift, params: KmerParams,
                     hit_capacity):
    """Full device k-mer matcher: padded numeric batch -> compacted hits.

    Returns (rep u32[H], tgt u32[H], score i32[H], diag i32[H], n_hits i32).
    """
    sk, sp, sv, sh, _ = select_kmers(seqs, lengths, params, hash_shift)
    rep, tgt, diag, rev, valid = build_pairs(sk, sp, sv, sh, keys, lengths, params)
    hr, ht, hs, hd, hv = best_diagonal_hits(rep, tgt, diag, rev, valid)
    # compact: stable sort by ~valid keeps (rep, tgt) order among the valid
    order = jnp.where(hv, jnp.arange(hr.shape[0], dtype=jnp.int32),
                      jnp.int32(2**31 - 1))
    _, cr, ct, cs, cd, cv = jax.lax.sort(
        (order, hr, ht, hs, hd, hv), dimension=0, num_keys=1)
    h = hit_capacity
    return cr[:h], ct[:h], cs[:h], cd[:h], cv[:h].sum().astype(jnp.int32)
