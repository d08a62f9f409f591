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
    # every sequence length fits the packed rep-carry word (protein
    # < 2^16, nucleotide < 2^15 — the fwd bit rides along): the
    # representative first-carry scan then runs with 3 operands instead
    # of 4 (callers set this from the DB's max length)
    narrow_rows: bool = False

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

    # float32 arithmetic exactly as the reference (kmermatcher.cpp:223)
    kc_f = jnp.float32(params.kmers_per_sequence - 1) + \
        (jnp.float32(params.kmers_per_sequence_scale)
         * lengths.astype(jnp.float32))
    kc = jnp.minimum(kc_f.astype(jnp.int32),
                     valid.sum(axis=1).astype(jnp.int32))

    # threshold = (kc-th smallest pre-dedup hash) + 1; tooMuch = |{h<=h_kc}|-kc
    h_sorted = jax.lax.sort((h16,), dimension=1, is_stable=False)[0]
    h_kc = jnp.take_along_axis(
        h_sorted, jnp.maximum(kc - 1, 0)[:, None], axis=1)[:, 0]
    h_kc = jnp.where(kc > 0, h_kc, -1)
    cum_le = (h16 <= h_kc[:, None]).sum(axis=1).astype(jnp.int32)
    too_much = cum_le - kc

    # sort into selection order (hash, masked kmer, pos); u64 keys split into
    # native u32 hi/lo (TPU emulates 64-bit compares). The iota payload keeps
    # the original tie-break; the fwd bit rides in its low bit so store_kmer
    # is reconstructable after the compaction sort without any gathers
    # (random gathers are the dominant cost on TPU — ~13ms per 1.5M elems —
    # so every stage carries values through its sorts/scans instead).
    masked = (store_kmer | jnp.uint64(BIT63)) if params.is_nucl else store_kmer
    masked_for_dup = jnp.where(valid, masked, jnp.full_like(masked, U64MAX))
    mk_hi = (masked_for_dup >> jnp.uint64(32)).astype(jnp.uint32)
    mk_lo = masked_for_dup.astype(jnp.uint32)
    big_if_inval = jnp.where(valid, h16, INVALID_HASH)
    fwd = (store_kmer >> jnp.uint64(63)).astype(jnp.int32) if params.is_nucl \
        else jnp.zeros((n, p), dtype=jnp.int32)
    pk = (jax.lax.broadcasted_iota(jnp.int32, (n, p), 1) << 1) | fwd
    # is_stable=False on every sort whose key chain is already a total
    # order (or whose ties are all-invalid garbage): XLA's stable TPU
    # sort appends an s32 iota operand and runs a costlier network —
    # measured 193 ms -> 164 ms on the 24M-entry table sort and 156 ms
    # -> 141 ms on this [393K, 363] row sort. (h16, kmer, pos) is total
    # per row (pos is unique per position), so the result is identical.
    #
    # pack_pos: when every per-row position fits 10 bits (p <= 1024 —
    # static: p is the padded position count), pos and the iota/fwd
    # payload ride ONE u32 trailing key (pos<<11 | iota<<1 | fwd), so
    # both row sorts carry 4 operands instead of 5/6.  The extra iota
    # bits below pos are harmless: (h16, kmer, pos) is already total.
    # Long-contig iterations (p > 1024, max-seq-len 200000) keep the
    # wide operand lists.
    pack_pos = p <= 1024
    if pack_pos:
        posk = (store_pos.astype(jnp.int32) << 11) | pk
        s_h, s_hi, s_lo, s_posk = jax.lax.sort(
            (big_if_inval, mk_hi, mk_lo, posk),
            dimension=1, num_keys=4, is_stable=False)
        s_pos = s_posk >> 11
        s_pk = s_posk & 0x7FF
    else:
        s_h, s_hi, s_lo, s_pos, s_pk = jax.lax.sort(
            (big_if_inval, mk_hi, mk_lo, store_pos, pk),
            dimension=1, num_keys=4, is_stable=False)

    if params.ignore_multi_kmer:
        # the reference's duplicate-skip loop (kmermatcher.cpp:277-301)
        # processes the first entry AFTER a duplicate run without re-checking
        # it — a 3-state machine over the selection order:
        #   TOP: multi-run start -> SKIP; else process
        #   SKIP: inside run; last element -> LAND
        #   LAND: process unconditionally -> TOP
        eq_next = jnp.concatenate(
            [(s_hi[:, :-1] == s_hi[:, 1:]) & (s_lo[:, :-1] == s_lo[:, 1:]),
             jnp.zeros((n, 1), bool)], axis=1)

        one = jnp.int32(1)
        two = jnp.int32(2)
        zero = jnp.int32(0)

        def scan_step(state, eqn):
            proc = ((state == 0) & ~eqn) | (state == 2)
            new_state = jnp.where(
                state == 0, jnp.where(eqn, one, zero),
                jnp.where(state == 1, jnp.where(eqn, one, two), zero))
            return new_state.astype(jnp.int32), proc

        _, proc_t = jax.lax.scan(scan_step, jnp.zeros(n, jnp.int32),
                                 eq_next.T)
        processed = proc_t.T
    else:
        processed = jnp.ones((n, p), dtype=bool)

    s_elig = (s_h < INVALID_HASH) & processed
    nonb = s_elig & (s_h < h_kc[:, None])
    bnd = s_elig & (s_h == h_kc[:, None])
    r_all = jnp.cumsum((nonb | bnd).astype(jnp.int32), axis=1)
    r_bnd = jnp.cumsum(bnd.astype(jnp.int32), axis=1)
    sel = (nonb | (bnd & ((too_much[:, None] == 0) | (r_bnd <= too_much[:, None])))) \
        & (r_all <= kc[:, None])

    # compact to KSEL slots keeping selection order — the selected entries'
    # values ride the sort as payload operands (one 1-key row sort instead
    # of a sort plus three row gathers)
    # unstable: order_key is unique for selected slots; ties are all
    # sentinel garbage masked by sel_valid downstream
    if pack_pos:
        # okp = min(order_key, 1024)<<21 | pos<<11 | iota<<1 | fwd —
        # exactly 32 bits; selected rows have order_key < 1024 unique,
        # the 1024 sentinel sinks every unselected slot past them
        # u32: the 1024 sentinel shifted left 21 is 2^31 and must not
        # wrap negative (an i32 pack sent every unselected slot FIRST)
        ok11 = jnp.where(sel, jnp.arange(p, dtype=jnp.uint32)[None, :],
                         jnp.uint32(1024))
        okp = (ok11 << jnp.uint32(21)) | s_posk.astype(jnp.uint32)
        c_okp, c_hi, c_lo, c_h = jax.lax.sort(
            (okp, s_hi, s_lo, s_h), dimension=1, num_keys=1,
            is_stable=False)
        take = min(ksel, p)
        c_okp = c_okp[:, :take]
        sel_valid = (c_okp >> jnp.uint32(21)) < 1024
        c_pos = ((c_okp >> jnp.uint32(11)) & jnp.uint32(0x3FF)) \
            .astype(jnp.int32)
        c_pk = (c_okp & jnp.uint32(0x7FF)).astype(jnp.int32)
    else:
        order_key = jnp.where(
            sel, jnp.arange(p, dtype=jnp.int32)[None, :], INVALID_HASH)
        c_key, c_hi, c_lo, c_pos, c_pk, c_h = jax.lax.sort(
            (order_key, s_hi, s_lo, s_pos, s_pk, s_h), dimension=1,
            num_keys=1, is_stable=False)
        take = min(ksel, p)
        c_key = c_key[:, :take]
        sel_valid = c_key < INVALID_HASH
    c_hi = c_hi[:, :take]
    if params.is_nucl:
        # restore store_kmer's bit63 (fwd flag) that the dup-mask forced on
        c_fwd = (c_pk[:, :take] & 1).astype(jnp.uint32)
        c_hi = (c_hi & jnp.uint32(0x7FFFFFFF)) | (c_fwd << jnp.uint32(31))
    sel_kmer = (c_hi.astype(jnp.uint64) << jnp.uint64(32)) | \
        c_lo[:, :take].astype(jnp.uint64)
    sel_pos = c_pos[:, :take]
    sel_h16 = c_h[:, :take]
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
    """Running max of `key` within segments delimited by seg_start (bool).
    seg_start[0] is True at every call site."""
    from .pallas_scan import seg_scan_pallas, use_pallas_scan
    if use_pallas_scan():
        return seg_scan_pallas("cummax", seg_start, key)[1]

    def op(a, b):
        a_flag, a_val = a
        b_flag, b_val = b
        val = jnp.where(b_flag, b_val, jnp.maximum(a_val, b_val))
        return (a_flag | b_flag, val)
    _, out = jax.lax.associative_scan(op, (seg_start, key))
    return out


def flatten_table(sel_kmer, sel_pos, sel_valid, seq_hash, keys, lengths):
    """Selected k-mers + whole-sequence-hash entries -> flat table arrays."""
    n, ksel = sel_kmer.shape
    ids = jnp.broadcast_to(keys[:, None], (n, ksel))
    lens = jnp.broadcast_to(lengths[:, None].astype(jnp.int32), (n, ksel))
    kmer = jnp.concatenate([sel_kmer.reshape(-1), seq_hash])
    sid = jnp.concatenate([ids.reshape(-1), keys]).astype(jnp.uint32)
    pos = jnp.concatenate([sel_pos.reshape(-1), jnp.zeros(n, dtype=jnp.int32)])
    slen = jnp.concatenate([lens.reshape(-1), lengths.astype(jnp.int32)])
    valid = jnp.concatenate([sel_valid.reshape(-1), lengths > 0])
    return kmer, sid, pos, slen, valid


def pairs_from_table(kmer, sid, pos, slen, valid, params: KmerParams):
    """Sort the k-mer table, assign representatives, emit filtered pairs
    (kmermatcher.cpp:406-558). Shared by the single-device and sharded paths.

    Returns (rep u32, tgt u32, diag i32, rev bool, keep bool) unsorted by
    pair key — feed to sort_pairs/best_diagonal_hits.

    kmer: u64[T], or an (hi u32[T], lo u32[T]) tuple — the split path
    passes the halves directly so no 64-bit emulation pass re-extracts
    them from the full-size table inside every per-range program.
    """
    if isinstance(kmer, tuple):
        k_hi, k_lo = kmer
    else:
        k_hi = (kmer >> jnp.uint64(32)).astype(jnp.uint32)
        k_lo = kmer.astype(jnp.uint32)
    m_hi = (k_hi | jnp.uint32(0x80000000)) if params.is_nucl else k_hi
    m_hi = jnp.where(valid, m_hi, jnp.uint32(0xFFFFFFFF))
    m_lo = jnp.where(valid, k_lo, jnp.uint32(0xFFFFFFFF))

    # sort by (kmer, len desc, id, pos); invalid entries sink to the end.
    # u64 keys are split into native u32 hi/lo pairs — TPU emulates 64-bit
    # comparators, and the sort comparator cost dominates compile + run
    # time, so the trailing key and payloads (pos <= 2^29, fwd, valid) ride
    # in ONE u32: 5 operands instead of 7
    neg_len_u = ~slen.astype(jnp.uint32)  # len desc == ~len asc
    fwd_bit = (k_hi >> jnp.uint32(31)) & jnp.uint32(1)
    packed = ((pos.astype(jnp.uint32) << jnp.uint32(2))
              | (fwd_bit << jnp.uint32(1)) | valid.astype(jnp.uint32))
    # unstable: (kmer, len, sid, packed pos/fwd/valid) is a total order —
    # pos is unique within a sequence, so no two entries tie on all five
    mh_s, ml_s, nl_s, sid_s, pk_s = jax.lax.sort(
        (m_hi, m_lo, neg_len_u, sid, packed),
        dimension=0, num_keys=5, is_stable=False)
    slen_s = (~nl_s).astype(jnp.int32)
    pos_s = (pk_s >> jnp.uint32(2)).astype(jnp.int32)
    fwd_s = ((pk_s >> jnp.uint32(1)) & jnp.uint32(1)).astype(jnp.uint8)
    valid_s = (pk_s & jnp.uint32(1)).astype(bool)

    new_group = jnp.concatenate(
        [jnp.array([True]),
         (mh_s[1:] != mh_s[:-1]) | (ml_s[1:] != ml_s[:-1])])
    t = mh_s.shape[0]
    # representative = first entry of each group; broadcast its (id, packed
    # pos/fwd, neg-len) down the group with ONE segmented first-carry scan
    # instead of a position scan plus three 1.5M-element random gathers.
    # On real TPUs the scan runs as the VMEM-resident Pallas kernel
    # (ops/pallas_scan.py, 0.32 ms vs 7.8 ms for the XLA slice/pad tree
    # at 2M entries); new_group[0] is True, satisfying its contract.
    from .pallas_scan import first_carry_pallas, use_pallas_scan
    if params.narrow_rows:
        # (pos, fwd, len) fit one carry word -> 3-operand scan
        rep_w = ((pk_s >> jnp.uint32(2)) << jnp.uint32(16)) \
            | (fwd_s.astype(jnp.uint32) << jnp.uint32(15)) \
            | (slen_s.astype(jnp.uint32)
               & jnp.uint32(0x7FFF if params.is_nucl else 0xFFFF))
        if not params.is_nucl:
            rep_w = ((pk_s >> jnp.uint32(2)) << jnp.uint32(16)) \
                | (slen_s.astype(jnp.uint32) & jnp.uint32(0xFFFF))

        if use_pallas_scan():
            _, rep_id, rep_wc = first_carry_pallas(new_group, sid_s, rep_w)
        else:
            def _first_op3(a, b):
                af, a1, a2 = a
                bf, b1, b2 = b
                return (af | bf, jnp.where(bf, b1, a1),
                        jnp.where(bf, b2, a2))
            _, rep_id, rep_wc = jax.lax.associative_scan(
                _first_op3, (new_group, sid_s, rep_w))
        rep_pos = (rep_wc >> jnp.uint32(16)).astype(jnp.int32)
        if params.is_nucl:
            rep_len = (rep_wc & jnp.uint32(0x7FFF)).astype(jnp.int32)
            rep_fwd_bit = (rep_wc >> jnp.uint32(15)) & jnp.uint32(1)
        else:
            rep_len = (rep_wc & jnp.uint32(0xFFFF)).astype(jnp.int32)
            rep_fwd_bit = jnp.zeros_like(rep_wc)
    else:
        if use_pallas_scan():
            _, rep_id, rep_pk, rep_nl = first_carry_pallas(
                new_group, sid_s, pk_s, nl_s)
        else:
            def _first_op(a, b):
                af, a1, a2, a3 = a
                bf, b1, b2, b3 = b
                return (af | bf, jnp.where(bf, b1, a1),
                        jnp.where(bf, b2, a2), jnp.where(bf, b3, a3))
            _, rep_id, rep_pk, rep_nl = jax.lax.associative_scan(
                _first_op, (new_group, sid_s, pk_s, nl_s))
        rep_pos = (rep_pk >> jnp.uint32(2)).astype(jnp.int32)
        rep_len = (~rep_nl).astype(jnp.int32)
        rep_fwd_bit = (rep_pk >> jnp.uint32(1)) & jnp.uint32(1)

    # singleton groups are dropped (kmermatcher.cpp:476-478): an entry stays
    # iff it doesn't start a group or the next entry doesn't either
    same_prev = ~new_group
    same_next = jnp.concatenate([~new_group[1:], jnp.array([False])])
    non_singleton = same_prev | same_next

    if params.is_nucl:
        rep_fwd = rep_fwd_bit != 0
        tgt_fwd = fwd_s != 0
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
    return rep_id, sid_s, diagonal, rev, keep


def sort_pairs(rep_id, tgt_id, diagonal, rev, keep):
    """Sort pairs by (rep, tgt, diag); dropped entries sink to the end."""
    rep_key = jnp.where(keep, rep_id, jnp.uint32(0xFFFFFFFF))
    return jax.lax.sort((rep_key, tgt_id, diagonal, rev, keep),
                        dimension=0, num_keys=3)


def build_pairs(sel_kmer, sel_pos, sel_valid, seq_hash, keys, lengths,
                params: KmerParams):
    """Global table -> (rep, tgt, diag) pairs sorted by pair key."""
    kmer, sid, pos, slen, valid = flatten_table(
        sel_kmer, sel_pos, sel_valid, seq_hash, keys, lengths)
    rep_id, sid_s, diagonal, rev, keep = pairs_from_table(
        kmer, sid, pos, slen, valid, params)
    return sort_pairs(rep_id, sid_s, diagonal, rev, keep)


def _segment_ends(change):
    """For segments delimited by `change` flags: last index of each segment."""
    t = change.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    rev_change = jnp.flip(jnp.concatenate([change[1:], jnp.array([True])]))
    rev_first = _segmented_cummax(jnp.where(rev_change, idx, -1), rev_change)
    return (t - 1) - jnp.flip(rev_first)


def _segment_last2(val, change):
    """(segment end index, val at segment end) per position — one flipped
    first-carry scan; the flipped segment's first element is the original
    segment's last."""
    from .pallas_scan import seg_scan_pallas, use_pallas_scan
    t = change.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    rev_change = jnp.flip(jnp.concatenate([change[1:], jnp.array([True])]))
    if use_pallas_scan():  # rev_change[0] is True by construction
        _, f_idx, f_val = seg_scan_pallas(
            "first", rev_change, jnp.flip(idx), jnp.flip(val))
        return jnp.flip(f_idx), jnp.flip(f_val)

    def op(a, b):
        af, a1, a2 = a
        bf, b1, b2 = b
        return (af | bf, jnp.where(bf, b1, a1), jnp.where(bf, b2, a2))

    _, f_idx, f_val = jax.lax.associative_scan(
        op, (rev_change, jnp.flip(idx), jnp.flip(val)))
    return jnp.flip(f_idx), jnp.flip(f_val)


def _seg_suffix_max2(c, pk, payload, change):
    """Segmented suffix max of the lexicographic (c, pk) key carrying
    `payload` — all-i32 tuple scan instead of an emulated-int64 packed key."""
    from .pallas_scan import seg_scan_pallas, use_pallas_scan
    rev_change = jnp.flip(jnp.concatenate([change[1:], jnp.array([True])]))
    if use_pallas_scan():
        _, fc, fpk, fd = seg_scan_pallas(
            "sfx2", rev_change, jnp.flip(c), jnp.flip(pk),
            jnp.flip(payload))
        return jnp.flip(fc), jnp.flip(fpk), jnp.flip(fd)

    def op(a, b):
        af, ac, apk, ad = a
        bf, bc, bpk, bd = b
        a_wins = ~bf & ((ac > bc) | ((ac == bc) & (apk >= bpk)))
        return (af | bf,
                jnp.where(a_wins, ac, bc),
                jnp.where(a_wins, apk, bpk),
                jnp.where(a_wins, ad, bd))

    _, fc, fpk, fd = jax.lax.associative_scan(
        op, (rev_change, jnp.flip(c), jnp.flip(pk), jnp.flip(payload)))
    return jnp.flip(fc), jnp.flip(fpk), jnp.flip(fd)


def best_diagonal_hits(rep, tgt, diag, rev, valid, absorb=True):
    """Per (rep, target): most frequent diagonal + entry count
    (kmermatcher.cpp:870-913). With absorb=True (single-device default) it
    includes the faithful quirk that the reference's run scan checks only the
    TARGET id, so a hit absorbs the following rep's entries when the same
    target sits at the boundary. The sharded path uses absorb=False (clean
    per-(rep,target) runs) since the absorbed entries may live on another
    shard; this deviates from the reference only in the inflated counts /
    strand sign of those rare boundary hits.

    Returns (rep, tgt, score i32 signed, diag i32, hit_valid bool) — one hit
    marked at each (rep,tgt) segment START; self pairs excluded.
    """
    t = rep.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    # stop target runs at the valid->invalid boundary (the reference scan
    # stops at the table sentinel)
    tgt = jnp.where(valid, tgt, jnp.uint32(0xFFFFFFFF))
    first = jnp.concatenate([jnp.array([True]), jnp.zeros(t - 1, bool)])
    tgt_change = first | jnp.concatenate([jnp.array([False]), tgt[1:] != tgt[:-1]])
    pair_change = tgt_change | jnp.concatenate(
        [jnp.array([False]), rep[1:] != rep[:-1]])
    if not absorb:
        tgt_change = pair_change
    run_change = tgt_change | jnp.concatenate(
        [jnp.array([False]), diag[1:] != diag[:-1]])

    run_first = _segmented_cummax(jnp.where(run_change, idx, -1), run_change)
    run_end, rev_end = _segment_last2(rev.astype(jnp.int32), run_change)
    tgt_end = _segment_ends(tgt_change)

    # per-entry scan key: (run-local count, position<<1|rev) — position
    # encodes the reference's ">= updates, latest wins" tie-break; diag and
    # rev ride the scans as payloads so no position gathers are needed
    c = idx - run_first + 1
    pk = (idx << 1) | rev.astype(jnp.int32)
    sfx_c, sfx_pk, sfx_diag = _seg_suffix_max2(c, pk, diag, tgt_change)

    # later-runs candidate: suffix evaluated at the start of the NEXT run in
    # the same target segment. suffix is non-increasing within a segment, so
    # that equals the segmented suffix max over next-position run starts —
    # a static shift + one more scan instead of a gather at run_end+1.
    nxt_new_run = jnp.concatenate([run_change[1:], jnp.array([False])])
    nxt_new_tgt = jnp.concatenate([tgt_change[1:], jnp.array([True])])
    pick = nxt_new_run & ~nxt_new_tgt
    neg1 = jnp.int32(-1)
    a_c = jnp.where(pick, jnp.concatenate([sfx_c[1:], neg1[None]]), neg1)
    a_pk = jnp.where(pick, jnp.concatenate([sfx_pk[1:], neg1[None]]), neg1)
    a_diag = jnp.concatenate([sfx_diag[1:], neg1[None]])
    b_c, b_pk, b_diag = _seg_suffix_max2(a_c, a_pk, a_diag, tgt_change)

    # own-run candidate, clipped to start at this entry (diag is constant
    # within a run, so the candidate's diag is the entry's own)
    ca_c = run_end - idx + 1
    ca_pk = (run_end << 1) | rev_end
    b_wins = (b_c > ca_c) | ((b_c == ca_c) & (b_pk > ca_pk))
    best_diag = jnp.where(b_wins, b_diag, diag)
    best_rev = jnp.where(b_wins, b_pk & 1, rev_end).astype(bool)

    top_score = tgt_end - idx + 1
    score = jnp.where(best_rev, -top_score, top_score)
    hit_valid = pair_change & valid & (rep != tgt)
    return rep, tgt, score.astype(jnp.int32), best_diag, hit_valid


@functools.partial(jax.jit, static_argnames=("params",))
def _stage_select(seqs, lengths, keys, hash_shift, params):
    sk, sp, sv, sh, _ = select_kmers(seqs, lengths, params, hash_shift)
    return flatten_table(sk, sp, sv, sh, keys, lengths)


@functools.partial(jax.jit, static_argnames=("params",))
def _stage_pairs(kmer, sid, pos, slen, valid, params):
    rep_id, sid_s, diagonal, rev, keep = pairs_from_table(
        kmer, sid, pos, slen, valid, params)
    return sort_pairs(rep_id, sid_s, diagonal, rev, keep)


@functools.partial(jax.jit, static_argnames=("hit_capacity",))
def _stage_hits(rep, tgt, diag, rev, valid, hit_capacity):
    hr, ht, hs, hd, hv = best_diagonal_hits(rep, tgt, diag, rev, valid)
    # compact: stable sort by ~valid keeps (rep, tgt) order among the valid;
    # the count is recoverable from the order key, so validity doesn't ride
    # through the sort as a sixth operand
    sentinel = jnp.int32(2**31 - 1)
    order = jnp.where(hv, jnp.arange(hr.shape[0], dtype=jnp.int32), sentinel)
    o_s, cr, ct, cs, cd = jax.lax.sort(
        (order, hr, ht, hs, hd), dimension=0, num_keys=1)
    h = hit_capacity
    n_valid = jnp.minimum((o_s != sentinel).sum(), h).astype(jnp.int32)
    return cr[:h], ct[:h], cs[:h], cd[:h], n_valid


@functools.partial(jax.jit, static_argnames=("params", "hit_capacity"))
def _stage_all(seqs, lengths, keys, hash_shift, params, hit_capacity):
    table = _stage_select(seqs, lengths, keys, hash_shift, params)
    pairs = _stage_pairs(*table, params)
    return _stage_hits(*pairs, hit_capacity)


@functools.partial(jax.jit,
                   static_argnames=("params", "hit_capacity", "fetch_m"))
def kmermatch_device_packed(seqs, lengths, keys, hash_shift, params,
                            hit_capacity, fetch_m):
    """Whole matcher as ONE dispatch returning ONE fetchable flat
    i32[4*fetch_m + 1] array: (rep, tgt, score, diag) rows then the hit
    count — a single RPC dispatch + a single RPC fetch per iteration on
    tunneled backends, where each jit call blocks on a round trip.
    All fields fit i32 (row keys < 2^31; score is a +-count; diag is
    bounded by max_seq_len).

    Also returns the full device-resident (rep, tgt, diag) hit arrays so
    downstream device stages (rescoring) can consume the hits without the
    host ever re-uploading them."""
    rep, tgt, score, diag, n_hits = _stage_all(
        seqs, lengths, keys, hash_shift, params, hit_capacity)
    m = min(fetch_m, rep.shape[0])
    flat = jnp.stack([rep[:m].astype(jnp.int32), tgt[:m].astype(jnp.int32),
                      score[:m], diag[:m]]).reshape(-1)
    return jnp.concatenate([flat, n_hits.reshape(1)]), (rep, tgt, diag)


@functools.partial(jax.jit, static_argnames=("hit_capacity", "fetch_m"))
def merge_pairs_packed(ops, n_valid, hit_capacity, fetch_m):
    """Device merge of per-split pair streams (the split analogue of the
    reference's k-way split-file merge, kmermatcher.cpp:947-1020): ONE
    (rep, tgt, diag) sort over the concatenated kept pairs + the same
    stage-5 scan as the monolithic path, so split output == single-pass
    output (including the absorb quirk) and the device-resident hit arrays
    survive for the rescore-by-index fast path.

    ops: i32[3, P] stacked (rep, tgt, diag<<1|rev); rows past n_valid are
    padding. Returns the same packed flat array + device hit arrays as
    kmermatch_device_packed."""
    rep = ops[0].astype(jnp.uint32)
    tgt = ops[1].astype(jnp.uint32)
    diag = jnp.right_shift(ops[2], 1)  # arithmetic shift keeps the sign
    rev = (ops[2] & 1).astype(bool)
    valid = jnp.arange(ops.shape[1], dtype=jnp.int32) < n_valid
    pairs = sort_pairs(rep, tgt, diag, rev, valid)
    cr, ct, cs, cd, n_hits = _stage_hits(*pairs, hit_capacity)
    m = min(fetch_m, cr.shape[0])
    flat = jnp.stack([cr[:m].astype(jnp.int32), ct[:m].astype(jnp.int32),
                      cs[:m], cd[:m]]).reshape(-1)
    return jnp.concatenate([flat, n_hits.reshape(1)]), (cr, ct, cd)


@functools.partial(jax.jit, static_argnames=("params",))
def select_table_h16(seqs, lengths, keys, hash_shift, params):
    """Selection + flat table + per-entry 16-bit range key, as ONE
    device-resident program shared by all hash-range splits — re-running
    the selection per split (the old structure) multiplied its cost by
    the split count on exactly the largest workloads.

    The whole-sequence entries carry an already-hashed value whose range
    key is its own low 16 bits (kmermatch.py build_kmer_table rule)."""
    sk, sp, sv, sh, sh16 = select_kmers(seqs, lengths, params, hash_shift)
    kmer, sid, pos, slen, valid = flatten_table(sk, sp, sv, sh, keys,
                                                lengths)
    h16 = jnp.concatenate([
        sh16.reshape(-1), (sh & jnp.uint64(0xFFFF)).astype(jnp.int32)])
    return kmer, sid, pos, slen, valid, h16


@functools.partial(jax.jit,)
def sort_table_by_range(kmer, sid, pos, slen, valid, h16):
    """ONE-key sort of the resident table by 16-bit range key (invalid
    entries sink to the sentinel), payloads riding along — the split
    path's ranges then become dynamic SLICES of the sorted table: no
    index uploads, no full-table fetches, no multi-key sort at table
    size (1-key comparators compile fine at 24M entries; the 5-key ones
    are minutes-pathological past ~2M).  Also returns the per-bin
    boundary array (searchsorted over all 65536 bins, 256 KB) — the
    device equivalent of the reference's exact histogram
    (kmermatcher.cpp:617-620).

    FIVE operands instead of seven: XLA's TPU sort is a compare-exchange
    network whose HBM traffic scales with operand count (the 24M-entry
    run was 202 ms / 31% of the scale-64 iteration's device time in the
    r05 trace), so slen's low 15 bits ride INSIDE the u32 sort key
    (intra-bin order is irrelevant — every range is re-sorted by the
    total-order 5-key pair sort) and (pos, slen>>15, valid) pack into
    one word.  Requires slen < 2^18 (callers guard; the reference caps
    --max-seq-len at 200000 on the nucl path, Nuclassembler.cpp:10-32)."""
    key = jnp.where(
        valid,
        (h16.astype(jnp.uint32) << jnp.uint32(16))
        | (slen.astype(jnp.uint32) & jnp.uint32(0x7FFF)),
        jnp.uint32(0xFFFFFFFF))
    mk_hi = (kmer >> jnp.uint64(32)).astype(jnp.uint32)
    mk_lo = kmer.astype(jnp.uint32)
    posw = ((pos.astype(jnp.uint32) << jnp.uint32(4))
            | ((slen.astype(jnp.uint32) >> jnp.uint32(15))
               << jnp.uint32(1))
            | valid.astype(jnp.uint32))
    # unstable: intra-bin order is irrelevant (every range is re-sorted
    # by the total-order 5-key pair sort); measured 193 -> 164 ms at 24M
    skey, s_hi, s_lo, s_sid, s_pw = jax.lax.sort(
        (key, mk_hi, mk_lo, sid, posw), dimension=0, num_keys=1,
        is_stable=False)
    s_valid = (s_pw & jnp.uint32(1)).astype(bool)
    s_pos = (s_pw >> jnp.uint32(4)).astype(jnp.int32)
    s_slen = ((skey & jnp.uint32(0x7FFF))
              | ((s_pw >> jnp.uint32(1)) & jnp.uint32(7))
              << jnp.uint32(15)).astype(jnp.int32)
    s_slen = jnp.where(s_valid, s_slen, 0)
    # bin boundaries: valid keys for bin h live in [h<<16, h<<16|0x7FFF],
    # so the h-th boundary is searchsorted(h<<16) and the final boundary
    # (total valid count) is searchsorted(0xFFFF8000)
    marks = jnp.concatenate([
        jnp.arange(0x10000, dtype=jnp.uint32) << jnp.uint32(16),
        jnp.array([0xFFFF8000], dtype=jnp.uint32)])
    bounds = jnp.searchsorted(skey, marks)
    # hi/lo stay SPLIT across the interface: per-range programs would
    # otherwise re-run the u64 emulation extract over the full-size table
    # (2 x 24M-element custom-calls per range in the r05 trace)
    return (s_hi, s_lo, s_sid, s_pos, s_slen, s_valid), bounds


@functools.partial(jax.jit,)
def sort_table_by_range_wide(kmer, sid, pos, slen, valid, h16):
    """sort_table_by_range without the packed-word bound: seven operands,
    any slen — the fallback for DBs holding sequences >= 2^18 residues
    (backend.py guards on the max length)."""
    key = jnp.where(valid, h16, jnp.int32(0x10000))
    mk_hi = (kmer >> jnp.uint64(32)).astype(jnp.uint32)
    mk_lo = kmer.astype(jnp.uint32)
    s = jax.lax.sort(
        (key, mk_hi, mk_lo, sid, pos, slen.astype(jnp.int32),
         valid.astype(jnp.int32)), dimension=0, num_keys=1,
        is_stable=False)
    skey, s_hi, s_lo, s_sid, s_pos, s_slen, s_valid = s
    bounds = jnp.searchsorted(skey, jnp.arange(0x10001, dtype=jnp.int32))
    return (s_hi, s_lo, s_sid, s_pos, s_slen,
            s_valid.astype(bool)), bounds


@functools.partial(jax.jit, static_argnames=("params", "cap", "kcap"))
def pairs_slice_compact(s_hi, s_lo, s_sid, s_pos, s_slen, s_valid, start,
                        lo_off, n_take, params, cap, kcap):
    """Pair emission for ONE hash range of the sorted resident table:
    dynamic slice [start, start+cap), pair emission, keep-compaction to
    kcap slots (1-key order sort).  Nothing is fetched — the compacted
    parts stay device-resident for merge_parts_packed, and the kept
    count rides back as a device scalar.

    lo_off: the caller pre-clamps start to t-cap near the table end
    (dynamic_slice would silently clamp and shift the window) and passes
    the shift here so the ok-window re-targets the range's entries."""
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, cap)
    idx0 = jnp.arange(cap, dtype=jnp.int32)
    ok = (idx0 >= lo_off) & (idx0 < lo_off + n_take) & sl(s_valid)
    rep, tgt, diag, rev, keep = pairs_from_table(
        (sl(s_hi), sl(s_lo)), sl(s_sid), sl(s_pos), sl(s_slen), ok, params)
    idx = jnp.arange(cap, dtype=jnp.int32)
    order = jnp.where(keep, idx, jnp.int32(2**31 - 1))
    # diag and rev ride as ONE word (diag<<1|rev): 4 sort operands, and
    # the merge consumes the packed form directly
    dr = (diag << 1) | rev.astype(jnp.int32)
    # unstable: order is a unique iota for kept entries; dropped ties are
    # all-sentinel and truncated at kcap
    _, cr, ct, cdr = jax.lax.sort(
        (order, rep, tgt, dr), dimension=0, num_keys=1, is_stable=False)
    packed = jnp.stack([cr[:kcap].astype(jnp.int32),
                        ct[:kcap].astype(jnp.int32), cdr[:kcap]])
    return packed, keep.sum().astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("hit_capacity", "fetch_m"))
def merge_parts_packed(parts, counts, hit_capacity, fetch_m):
    """Device merge of the per-range compacted pair parts: parts
    i32[R, 4, kcap] (rep, tgt, diag, rev), counts i32[R] kept per part.
    Same stage-5 scan + packed output as merge_pairs_packed.

    The packed tail is [n_hits, counts[0..R-1]]: the per-range kept
    counts ride ALONG with the merged result, so the host validates the
    per-range kcap in the same blocking fetch that returns the hits —
    one device round trip per iteration instead of two (each fetch on a
    tunneled backend blocks on dispatch + compute + RTT).

    parts: i32[R, 3, kcap] (rep, tgt, diag<<1|rev) per range."""
    r, _, kcap = parts.shape
    rep = parts[:, 0, :].reshape(-1).astype(jnp.uint32)
    tgt = parts[:, 1, :].reshape(-1).astype(jnp.uint32)
    dr = parts[:, 2, :].reshape(-1)
    diag = jnp.right_shift(dr, 1)  # arithmetic shift keeps the sign
    rev = (dr & 1).astype(bool)
    valid = (jax.lax.broadcasted_iota(jnp.int32, (r, kcap), 1)
             < counts[:, None]).reshape(-1)
    pairs = sort_pairs(rep, tgt, diag, rev, valid)
    cr, ct, cs, cd, n_hits = _stage_hits(*pairs, hit_capacity)
    m = min(fetch_m, cr.shape[0])
    flat = jnp.stack([cr[:m].astype(jnp.int32), ct[:m].astype(jnp.int32),
                      cs[:m], cd[:m]]).reshape(-1)
    return (jnp.concatenate([flat, n_hits.reshape(1),
                             counts.astype(jnp.int32).reshape(-1)]),
            (cr, ct, cd))


@functools.partial(jax.jit, static_argnames=("params", "cap"))
def pairs_for_take(kmer, sid, pos, slen, take, n_take, params, cap):
    """Memory-bounded split unit over the resident table: the caller
    (ops/backend.py) computes each hash range's compacted entry indices
    ON THE HOST from one fetched range-key array, so NO full-table sort
    ever compiles — a 6M-entry (scale 16) / 24M-entry (scale 64)
    device compaction sort was a pathologically slow remote compile, the
    reason no scale>4 benchmark ever completed before round 4.  The
    expensive multi-operand sorts run at `cap` (split) size only.

    take: int32[cap] entry indices ascending (host order == the old
    device compaction's stable index sort); rows past n_take are
    padding. Returns packed i32[5, cap] (rep, tgt, diag, rev, keep)."""
    ok = jnp.arange(cap, dtype=jnp.int32) < n_take
    rep, tgt, diag, rev, keep = pairs_from_table(
        kmer[take], sid[take], pos[take], slen[take], ok, params)
    packed = jnp.stack([rep.astype(jnp.int32), tgt.astype(jnp.int32),
                        diag, rev.astype(jnp.int32),
                        keep.astype(jnp.int32)])
    return packed


@functools.partial(jax.jit,)
def table_range_keys(valid, h16):
    """i32[T] per-entry 16-bit range key with invalid entries sentineled
    — ONE small fetch lets the host compact every split's indices."""
    return jnp.where(valid, h16, jnp.int32(0x7FFFFFFF))


def kmermatch_pairs_range(seqs, lengths, keys, hash_shift, params, lo, hi,
                          cap):
    """select_table_h16 + host compaction + pairs_for_take in one call
    (compat path for single-range callers/tests)."""
    table = select_table_h16(seqs, lengths, keys, hash_shift, params)
    rk = np.asarray(table_range_keys(table[4], table[5]))
    idx = np.nonzero((rk >= lo) & (rk <= hi))[0]
    n_in = len(idx)
    take = np.zeros(cap, dtype=np.int32)
    take[:min(n_in, cap)] = idx[:cap]
    packed = pairs_for_take(table[0], table[1], table[2], table[3],
                            jnp.asarray(take), jnp.int32(min(n_in, cap)),
                            params, cap)
    return packed, n_in


def kmermatch_device(seqs, lengths, keys, hash_shift, params: KmerParams,
                     hit_capacity, fused=True):
    """Full device k-mer matcher: padded numeric batch -> compacted hits.

    Returns (rep u32[H], tgt u32[H], score i32[H], diag i32[H], n_hits i32).
    fused=True dispatches one program (fewer RPC round trips on a tunneled
    backend); fused=False runs the three stages as separate jits so the
    persistent compilation cache is hit per stage.
    """
    if fused:
        return _stage_all(seqs, lengths, keys, hash_shift, params,
                          hit_capacity)
    table = _stage_select(seqs, lengths, keys, hash_shift, params)
    pairs = _stage_pairs(*table, params)
    return _stage_hits(*pairs, hit_capacity)
