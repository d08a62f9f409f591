"""Host<->device glue: run the device k-mer matcher / rescorer on a SeqDB and
return host-format results, so workflows can switch backends transparently.

Transfer discipline: on a tunneled TPU backend every host<->device round
trip costs ~50ms of latency, so the glue (a) caches the device-resident
copies of the padded DB per SeqDB, (b) uploads per-call operands as ONE
stacked array, and (c) fetches per-call results as ONE stacked array at a
bucketed static size (exact-size slices would recompile the fetch)."""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..data import seqdb
from . import device_kmer
from .device_kmer import KmerParams, ksel_capacity
from .device_rescore import rescore_pairs


# Accumulated seconds of BLOCKING device dispatch+fetch per op family —
# the device-vs-host wall split the reference's phase timers report
# (kmermatcher.cpp:406-436).  On a tunneled backend a fetch covers
# dispatch + compute + transfer + RTT; bench.py snapshots this dict around
# each stage to emit the *_device components of stages_s.
DEVICE_TIME = {}


def _fetch(x, key):
    """np.asarray(x) with the blocking time accounted to DEVICE_TIME[key]."""
    t0 = time.perf_counter()
    out = np.asarray(x)
    DEVICE_TIME[key] = DEVICE_TIME.get(key, 0.0) + (time.perf_counter() - t0)
    return out


def _bucket(x, step):
    """Bucket a dynamic dimension: fixed steps below 8x the step, then
    1/8th-of-magnitude geometric steps — contigs GROW every iteration, so
    fixed-step column buckets would recompile every program each
    iteration once rows lengthen past the step."""
    x = max(x, 1)
    if x > 8 * step:
        step = max(step, 1 << (int(x - 1).bit_length() - 3))
    return ((x + step - 1) // step) * step


def db_to_padded(db, alphabet="kmer", bucket_rows=2048, bucket_cols=128):
    """Map a SeqDB to (codes uint8[N, Lmax], lengths i32[N], keys u32[N]).

    alphabet: 'kmer' (reduced-13 / nucl), 'score' (full matrix codes), or
    'char' (raw ASCII). Shapes are bucketed so jit compilations are reused
    across iterations even as contigs grow; padding rows have length 0 and
    keys past the real range.
    """
    cache = getattr(db, "_padded_cache", None)
    if cache is None:
        cache = db._padded_cache = {}
    ck = (alphabet, bucket_rows, bucket_cols)
    if ck in cache:
        return cache[ck]
    is_nucl = db.dbtype == seqdb.NUCLEOTIDES
    if alphabet == "kmer":
        mat = constants.nucleotide() if is_nucl else constants.reduced(13)
    else:
        mat = constants.nucleotide() if is_nucl else constants.blosum62()
    raw_lengths = db.seq_lens().astype(np.int64)
    n = db.size
    n_pad = _bucket(n, bucket_rows)
    lmax = _bucket(int(raw_lengths.max()) if n else 1, bucket_cols)
    fill = mat.alphabet_size - 1 if alphabet != "char" else 0
    out = np.full((n_pad, lmax), fill, dtype=np.uint8)
    if n:
        # native per-record copy with a 256-entry byte LUT (identity for
        # 'char'): the numpy fancy-index gather paid ~30 bytes of index
        # traffic per payload byte and dominated cold-start time
        import ctypes
        from .. import native

        if alphabet == "char":
            lut8 = np.arange(256, dtype=np.uint8)
        else:
            lut8 = np.ascontiguousarray(mat.aa2num.astype(np.uint8))
        src = np.asarray(db.data)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        native.lib().pad_records(
            src.ctypes.data_as(u8p),
            np.ascontiguousarray(db.offsets, dtype=np.int64).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int64)),
            np.ascontiguousarray(raw_lengths, dtype=np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)),
            np.int64(n), lut8.ctypes.data_as(u8p), out.ctypes.data_as(u8p),
            np.int64(lmax))
    lengths = np.zeros(n_pad, dtype=np.int32)
    lengths[:n] = raw_lengths
    keys = np.arange(n_pad, dtype=np.uint32) + np.uint32(2**31)
    keys[:n] = db.keys.astype(np.uint32)
    cache[ck] = (out, lengths, keys)
    return out, lengths, keys


def db_to_device(db, alphabet="kmer", bucket_rows=2048, bucket_cols=128):
    """db_to_padded plus device residency: the jnp copies are cached on the
    SeqDB so each iteration reuses them instead of re-uploading ~MBs."""
    cache = getattr(db, "_device_cache", None)
    if cache is None:
        cache = db._device_cache = {}
    ck = (alphabet, bucket_rows, bucket_cols)
    if ck not in cache:
        codes, lengths, keys = db_to_padded(db, alphabet, bucket_rows,
                                            bucket_cols)
        cache[ck] = (jnp.asarray(codes), jnp.asarray(lengths),
                     jnp.asarray(keys))
    return cache[ck]


def kmermatcher_jax(db, k, kmers_per_sequence=21, kmers_per_sequence_scale=None,
                    hash_shift=67, ignore_multi_kmer=False,
                    include_only_extendable=False, cov_thr=0.0,
                    hit_capacity=None, return_arrays=False,
                    split_memory_limit=0):
    """Device kmermatcher returning the host hits-dict format (or flat
    arrays with return_arrays — the fast path for rescore_diagonal_jax).

    split_memory_limit (bytes, 0 = monolithic): when the k-mer table's
    device footprint would exceed it, the 16-bit hash space is split into
    exact-histogram ranges (compute_hash_splits — the same mechanism as
    the host and mesh paths) and each range runs as a capacity-bounded
    device program; the per-split pair streams are merged on the host, so
    the output is identical to the single-pass run."""
    is_nucl = db.dbtype == seqdb.NUCLEOTIDES
    if kmers_per_sequence_scale is None:
        kmers_per_sequence_scale = 0.2 if is_nucl else 0.0
    jc, jl, jk = db_to_device(db, "kmer")
    lmax = jc.shape[1]
    params = KmerParams(
        k=k,
        alphabet_size=(constants.nucleotide() if is_nucl else constants.reduced(13)).alphabet_size,
        kmers_per_sequence=kmers_per_sequence,
        kmers_per_sequence_scale=kmers_per_sequence_scale,
        is_nucl=is_nucl,
        ignore_multi_kmer=ignore_multi_kmer,
        include_only_extendable=include_only_extendable,
        cov_thr=cov_thr,
        ksel=ksel_capacity(kmers_per_sequence, kmers_per_sequence_scale, lmax),
        # padded width bounds every length and is geometrically bucketed,
        # so the flag is compile-stable per workload family
        narrow_rows=lmax < ((1 << 15) if is_nucl else (1 << 16)),
    )
    from .kmermatch import (ENTRY_BYTES, compute_hash_splits,
                            emit_hits, parse_memory_limit)
    if not split_memory_limit:
        # device budget: tables past this size exceed what the TPU
        # compiler handles as ONE program in reasonable time (the
        # 6M-entry monolithic sort OOMs the remote compiler on v5e, and
        # a 3M-entry 5-operand sort compile ran >15 min) — split
        # automatically, like the reference splits when RAM runs out
        # (kmermatcher.cpp:594-779); override with PLASS_DEVICE_TABLE_LIMIT
        import os
        ent_limit = int(os.environ.get("PLASS_DEVICE_TABLE_LIMIT",
                                       str(3 * 1024 * 1024)))
        if db.size * (params.ksel + 1) + db.size > ent_limit:
            split_memory_limit = ent_limit * ENTRY_BYTES
    if split_memory_limit:
        limit = parse_memory_limit(split_memory_limit)
        est = (db.size * (params.ksel + 1) + db.size) * ENTRY_BYTES
        if est > limit:
            # sorted-table split: selection runs ONCE, the table is
            # 1-key-sorted by 16-bit range key on device (1-key
            # comparators compile fine at any size; the old per-range
            # full-table compaction + 5-key sort programs took >15 min
            # to compile past ~2M entries), the exact per-bin histogram
            # comes back as a 256 KB boundary fetch (the reference's
            # pre-split histogram, kmermatcher.cpp:617-620), and each
            # range is a dynamic SLICE — no index uploads, no full-table
            # fetches.  Per-range kept pairs stay DEVICE-RESIDENT and
            # merge through the exact monolithic stage-5 scan.
            # per-range budget: the 5-key pair sort's compile time is
            # the constraint (pathological past ~2M entries), tighter
            # than the monolithic trigger above
            budget = min(limit // ENTRY_BYTES, 2 * 1024 * 1024)
            table = device_kmer.select_table_h16(jc, jl, jk, hash_shift,
                                                 params)
            # 5-operand packed range sort needs slen < 2^18 (reference
            # max-seq-len cap is 200000); wide 7-operand fallback beyond
            sort_fn = (device_kmer.sort_table_by_range
                       if int(db.seq_lens().max(initial=0)) < (1 << 18)
                       else device_kmer.sort_table_by_range_wide)
            sorted6, bounds_d = sort_fn(*table)
            bounds = _fetch(bounds_d, "kmermatch")
            hist = np.diff(bounds)  # per-h16-bin valid-entry counts
            if int(hist.sum()) > budget:
                ranges = []
                lo = 0
                acc = 0
                for h in range(65536):
                    if acc + int(hist[h]) > budget and acc > 0:
                        ranges.append((lo, h - 1))
                        lo = h
                        acc = 0
                    acc += int(hist[h])
                ranges.append((lo, 0xFFFF))
            else:
                ranges = [(0, 0xFFFF)]
            if len(ranges) > 1:
                t = int(table[0].shape[0])
                counts = np.array([int(bounds[hi + 1] - bounds[lo])
                                   for (lo, hi) in ranges])
                # cap pinned to the constant budget (not the workload's
                # max range count): the expensive 5-key pair sort then
                # compiles ONCE per (params, kcap) and every workload,
                # scale and iteration reuses it
                cap = min(_bucket(budget, 4096), t)
                kcap = min(cap, max(
                    _FETCH_GUESSES.get(("kcap", is_nucl), 16384),
                    _round_up(int(counts.max()) // 8)))
                nr = len(ranges)
                # hit capacity bounds hits by total kept pairs (nr*kcap):
                # _stage_hits' sorts run at nr*kcap regardless, so the
                # bound costs nothing and needs no pre-fetch of the
                # exact total — the merge is dispatched IMMEDIATELY
                # after the range programs and its single fetch carries
                # the hits AND the per-range kept counts (the old
                # structure blocked on a separate kept fetch first)
                while True:
                    parts = []
                    ndev = []
                    for (lo, hi) in ranges:
                        start = int(bounds[lo])
                        n_take = int(bounds[hi + 1] - bounds[lo])
                        start_eff = max(0, min(start, t - cap))
                        lo_off = start - start_eff
                        pk, n_keep = device_kmer.pairs_slice_compact(
                            *sorted6, jnp.int32(start_eff),
                            jnp.int32(lo_off), jnp.int32(n_take),
                            params, cap, kcap)
                        parts.append(pk)
                        ndev.append(n_keep)
                    stacked = jnp.stack(parts)
                    nstack = jnp.stack(ndev)
                    # NOT _round_up: merge_parts_packed clamps its
                    # internal fetch slice to min(hit_cap, nr*kcap), so
                    # any host fetch size above nr*kcap would parse the
                    # packed buffer with the wrong stride. nr and kcap
                    # are already bucketed, so compile reuse is kept.
                    hit_cap = nr * kcap
                    guess = _FETCH_GUESSES.get(is_nucl, 16384)
                    m = min(guess, hit_cap)
                    packed_dev, dev = device_kmer.merge_parts_packed(
                        stacked, nstack, hit_cap, m)
                    packed = _fetch(packed_dev, "kmermatch")
                    kept = packed[4 * m + 1:]
                    if int(kept.max()) <= kcap:
                        break
                    kcap = min(cap, _round_up(int(kept.max())))
                _FETCH_GUESSES[("kcap", is_nucl)] = kcap
                if int(kept.sum()) == 0:
                    z = np.zeros(0, dtype=np.uint32)
                    hits_z = _insert_self_hits(
                        db, z, z, np.zeros(0, np.int32),
                        np.zeros(0, np.int32))
                    if return_arrays:
                        return hits_z
                    return {int(kk): [(int(kk), 0, 0)] for kk in db.keys}
                n = int(packed[4 * m])
                if n > m:
                    m = min(_round_up(n * 2), hit_cap)
                    packed_dev, dev = device_kmer.merge_parts_packed(
                        stacked, nstack, hit_cap, m)
                    packed = _fetch(packed_dev, "kmermatch")
                _FETCH_GUESSES[is_nucl] = m
                body = packed[:4 * m].reshape(4, m)
                rep = body[0][:n].astype(np.uint32)
                tgt = body[1][:n].astype(np.uint32)
                score = body[2][:n].astype(np.int32)
                diag = body[3][:n].astype(np.int32)
                if return_arrays:
                    return _insert_self_hits(db, rep, tgt, score, diag,
                                             dev=dev, dev_m=m)
                hits = {int(kk): [(int(kk), 0, 0)] for kk in db.keys}
                for r0, t0, s0, d0 in zip(rep.tolist(), tgt.tolist(),
                                          score.tolist(), diag.tolist()):
                    hits[r0].append((t0, s0, d0))
                return hits
    if hit_capacity is None:
        # geometric rounding: db.size changes every workflow iteration and
        # hit_capacity is a static shape — keep the compiled program reusable
        hit_capacity = _round_up(db.size * (params.ksel + 1) + db.size)
    # ONE dispatch + ONE fetch: the whole matcher runs as a single program
    # whose output is already the bucketed packed slice + hit count
    # (each jit call and each fetch is a blocking RPC on tunneled backends).
    # The fetch-slice guess persists across iterations (new DB objects) per
    # workload family, geometrically bucketed so shifts reuse the compile.
    guess = _FETCH_GUESSES.get(is_nucl, 16384)
    m = min(guess, hit_capacity)
    packed_dev, dev = device_kmer.kmermatch_device_packed(
        jc, jl, jk, hash_shift, params, hit_capacity, m)
    packed = _fetch(packed_dev, "kmermatch")
    n = int(packed[-1])
    if n > m:  # guess too small: rerun at the true size, raise the guess
        m = min(_round_up(n * 2), hit_capacity)
        packed_dev, dev = device_kmer.kmermatch_device_packed(
            jc, jl, jk, hash_shift, params, hit_capacity, m)
        packed = _fetch(packed_dev, "kmermatch")
    _FETCH_GUESSES[is_nucl] = m
    body = packed[:-1].reshape(4, m)
    rep = body[0][:n].astype(np.uint32)
    tgt = body[1][:n].astype(np.uint32)
    score = body[2][:n].astype(np.int32)
    diag = body[3][:n].astype(np.int32)
    if return_arrays:
        return _insert_self_hits(db, rep, tgt, score, diag, dev=dev,
                                 dev_m=m)
    hits = {int(kk): [(int(kk), 0, 0)] for kk in db.keys}
    for r, t, s, d in zip(rep.tolist(), tgt.tolist(), score.tolist(), diag.tolist()):
        hits[r].append((t, s, d))
    return hits


class KmerHits(tuple):
    """(qk, tk, score, diag) flat host arrays, self rows interleaved; also
    carries the device-resident raw hit arrays and the self/hit slot
    layout, so the device rescorer can address hits by INDEX instead of
    re-uploading (qrow, trow, diag) triples — one third the upload bytes
    on a tunneled backend."""
    dev = None        # (rep, tgt, diag) device arrays, hits compacted first
    dev_m = 0         # static fetched-slice length covering all n hits
    group_starts = None
    hit_slots = None
    pre = None        # sharded path: carried (score, first, last, idents)
    pre_mode = None   # rescore mode the carried columns were computed with


def _insert_self_hits(db, rep, tgt, score, diag, dev=None, dev_m=0):
    """Flat (q, t, score, diag) arrays with a (k, k, 0, 0) self row at each
    query-group start — the array equivalent of the hits dict (device hit
    arrays arrive grouped by ascending representative)."""
    keys = db.keys.astype(np.int64)
    n = len(keys)
    counts = np.zeros(n, dtype=np.int64)
    pos = np.searchsorted(keys, rep.astype(np.int64))
    np.add.at(counts, pos, 1)
    m = len(rep) + n
    group_starts = np.concatenate([[0], np.cumsum(counts + 1)[:-1]])
    qk = np.empty(m, dtype=np.int64)
    tk = np.empty(m, dtype=np.int64)
    sc = np.zeros(m, dtype=np.int64)
    dg = np.zeros(m, dtype=np.int32)
    qk[group_starts] = keys
    tk[group_starts] = keys
    mask = np.ones(m, dtype=bool)
    mask[group_starts] = False
    hit_slots = np.nonzero(mask)[0]
    qk[hit_slots] = rep
    tk[hit_slots] = tgt
    sc[hit_slots] = score
    dg[hit_slots] = diag
    out = KmerHits((qk, tk, sc, dg))
    out.dev = dev
    out.dev_m = dev_m
    out.group_starts = group_starts
    out.hit_slots = hit_slots
    return out


# sufficient exchange-bucket capacities observed per (is_nucl, n_devices):
# new iterations start at the proven size instead of re-discovering it
# through overflow retries (each retry recompiles the mesh program)
_CAPACITY_HINTS = {}

# kmer fetch-slice sizes observed per workload family (is_nucl) — new
# iterations over fresh DB objects start at the proven slice size
_FETCH_GUESSES = {}

# retries the most recent kmermatcher_sharded call needed (observability:
# with the selection-demand probe sizing stage 2 up front, any workload
# should converge with AT MOST one retry — asserted by dryrun_multichip
# and tests/test_sharding.py)
LAST_SHARDED_RETRIES = 0


def kmermatcher_sharded(db, k, kmers_per_sequence=21,
                        kmers_per_sequence_scale=None, hash_shift=67,
                        ignore_multi_kmer=False,
                        include_only_extendable=False, cov_thr=0.0,
                        n_devices=None, bucket_capacity=None,
                        max_retries=4, return_arrays=False):
    """Multi-chip kmermatcher over a jax.sharding.Mesh of all local devices
    (parallel/mesh.py): data-parallel selection, hash-range all_to_all,
    per-shard pair emission, representative-routed exchange, local hit
    emission + on-shard END_TO_END rescoring.

    With return_arrays (the product path), returns KmerHits flat arrays
    whose hit rows CARRY the mesh step's stage-5 rescore columns —
    rescore_diagonal_jax consumes them directly instead of re-dispatching
    the scan. Otherwise returns the host hits-dict format.

    Documented deviation: pairs are routed by contiguous representative
    range, so each shard scans a contiguous segment of the globally
    sorted pair stream and the reference's run-absorption quirk
    (kmermatcher.cpp:880-898) is reproduced EXACTLY except across the
    n_shards-1 segment edges — the same class of boundary cut the
    reference's own split path makes at its split-file merge boundaries
    (its --split-memory-limit output differs from its unsplit output in
    3 records on the bundled examples; see tests/test_split.py docstring).
    """
    import jax
    from ..parallel import distributed
    from ..parallel.mesh import (make_mesh, selection_demand_fn,
                                 sharded_iteration_fn)

    is_nucl = db.dbtype == seqdb.NUCLEOTIDES
    if kmers_per_sequence_scale is None:
        kmers_per_sequence_scale = 0.2 if is_nucl else 0.0
    multiproc = distributed.is_multiprocess()
    n_devices = n_devices or len(jax.devices())
    codes, lengths, row_keys = db_to_padded(db, "kmer")
    score_codes, _, _ = db_to_padded(db, "score")
    chars, _, _ = db_to_padded(db, "char")
    n_pad, lmax = codes.shape
    params = KmerParams(
        k=k,
        alphabet_size=(constants.nucleotide() if is_nucl
                       else constants.reduced(13)).alphabet_size,
        kmers_per_sequence=kmers_per_sequence,
        kmers_per_sequence_scale=kmers_per_sequence_scale,
        is_nucl=is_nucl,
        ignore_multi_kmer=ignore_multi_kmer,
        include_only_extendable=include_only_extendable,
        cov_thr=cov_thr,
        ksel=ksel_capacity(kmers_per_sequence, kmers_per_sequence_scale, lmax),
        # padded width bounds every length and is geometrically bucketed,
        # so the flag is compile-stable per workload family
        narrow_rows=lmax < ((1 << 15) if is_nucl else (1 << 16)),
    )
    sub_flat, comp, code2char, alpha = _score_tables(db)
    mesh = make_mesh(n_devices)
    per_shard = n_pad // n_devices
    if bucket_capacity is None:
        # capacity found sufficient on an earlier iteration of the same
        # workload family avoids the sizing retry (and its recompile)
        hint = _CAPACITY_HINTS.get((is_nucl, n_devices), 0)
        bucket_capacity = max(per_shard * (params.ksel + 1), hint)
    rowids = np.arange(n_pad, dtype=np.uint32)
    from jax.sharding import PartitionSpec as P
    args = [(codes, P("shards")), (lengths, P("shards")),
            (rowids, P("shards")), (score_codes, P()), (chars, P()),
            (lengths, P()), (sub_flat, P()), (comp, P()),
            (code2char, P()), (np.int32(hash_shift), P())]
    if multiproc:
        # every process holds the full host arrays (shared-filesystem
        # contract, like the reference's NFS mmap); each materializes
        # only its addressable shards of the global arrays
        ops = [distributed.host_to_global(mesh, np.asarray(a), s)
               for a, s in args]
    else:
        ops = [jnp.asarray(a) for a, _ in args]
    # size stage 2 EXACTLY before compiling the full step: the probe's
    # compiled shape is capacity-independent (reused across iterations),
    # and its per-(src, dst) counts make the initial bucket capacity
    # sufficient for the selection exchange — the reference computes its
    # histogram before splitting the same way (kmermatcher.cpp:617-620).
    # Without it, a skewed hash block costs one overflow retry (= one
    # multi-minute recompile) per understated exchange stage.
    probe = selection_demand_fn(mesh, params)
    sel_counts = distributed.fetch_global(
        probe(ops[0], ops[1], ops[9]))
    sel_need = int(sel_counts.max())
    if sel_need > bucket_capacity:
        bucket_capacity = _round_up(sel_need)
    # overflow-safe: the step reports entries dropped at any exchange /
    # compaction PLUS the exact per-bucket demand, so one retry jumps
    # straight to a sufficient capacity (each new capacity recompiles —
    # silent truncation would corrupt hits on skewed hash distributions)
    for attempt in range(max_retries + 1):
        hit_capacity = bucket_capacity
        fn = sharded_iteration_fn(mesh, params, bucket_capacity,
                                  hit_capacity, alpha)
        (cr, ct, cs, cd, cv, r_score, r_first, r_last, r_idents, overflow,
         needed) = fn(*ops)
        n_dropped = int(distributed.fetch_global(overflow).sum())
        if n_dropped == 0:
            global LAST_SHARDED_RETRIES
            LAST_SHARDED_RETRIES = attempt
            _CAPACITY_HINTS[(is_nucl, n_devices)] = bucket_capacity
            break
        if attempt == max_retries:
            raise RuntimeError(
                f"sharded kmermatcher: {n_dropped} entries still overflow "
                f"exchange buckets at capacity {bucket_capacity} after "
                f"{max_retries} retries")
        need = int(distributed.fetch_global(needed).max())
        from ..utils.log import logger
        new_cap = max(bucket_capacity * 2, ((need + 4095) // 4096) * 4096)
        logger.warning(
            f"sharded exchange overflow ({n_dropped} entries dropped at "
            f"capacity {bucket_capacity}); retrying at {new_cap} "
            f"(measured per-bucket demand {need})")
        bucket_capacity = new_cap
    cr = distributed.fetch_global(cr)
    ct = distributed.fetch_global(ct)
    cs = distributed.fetch_global(cs)
    cd = distributed.fetch_global(cd)
    cv = distributed.fetch_global(cv)
    keymap = row_keys
    if return_arrays:
        # compact valid hits, stable-sort by representative KEY so groups
        # arrive in ascending-query order (the hits-dict iteration order),
        # and carry the stage-5 rescore columns alongside each hit row
        sel = np.nonzero(cv)[0]
        qk_keys = keymap[cr[sel]].astype(np.int64)
        order = np.argsort(qk_keys, kind="stable")
        sel = sel[order]
        rep_k = keymap[cr[sel]].astype(np.uint32)
        tgt_k = keymap[ct[sel]].astype(np.uint32)
        out = _insert_self_hits(db, rep_k, tgt_k, cs[sel].astype(np.int32),
                                cd[sel])
        out.pre = (distributed.fetch_global(r_score)[sel].astype(np.int64),
                   distributed.fetch_global(r_first)[sel].astype(np.int32),
                   distributed.fetch_global(r_last)[sel].astype(np.int32),
                   distributed.fetch_global(r_idents)[sel].astype(np.float64))
        out.pre_mode = 3
        return out
    hits = {int(kk): [(int(kk), 0, 0)] for kk in db.keys}
    for r, t, s, d in zip(cr[cv].tolist(), ct[cv].tolist(),
                          cs[cv].tolist(), cd[cv].tolist()):
        rk = int(keymap[r])
        tk = int(keymap[t])
        hits[rk].append((tk, s, d))
    return hits


# ---------------------------------------------------------------------------
# Device rescoring glue
# ---------------------------------------------------------------------------

def _score_tables(db):
    """(sub_flat i32[A*A], comp i32[A], code2char u8[A], aa2num) for the DB type."""
    is_nucl = db.dbtype == seqdb.NUCLEOTIDES
    mat = constants.nucleotide() if is_nucl else constants.blosum62()
    alpha = mat.alphabet_size
    sub_flat = mat.sub.astype(np.int32).reshape(-1)
    if mat.reverse is not None:
        comp = mat.reverse.astype(np.int32)
    else:
        comp = np.arange(alpha, dtype=np.int32)
    code2char = mat.num2aa.astype(np.uint8)
    return sub_flat, comp, code2char, alpha


def _fast_sub_pattern(db):
    """Static (match, mismatch, comp_tuple, canon_char_tuple) when the
    DB's substitution matrix is the uniform q==t and q<X ? m : x shape
    (the nucleotide matrix is exactly 2/-3) — lets the Pallas rescore
    collapse its per-hit one-hot MXU contraction to one compare plus
    static select chains. None for structured matrices (blosum62).
    PLASS_PALLAS_FAST=0 disables."""
    import os
    if os.environ.get("PLASS_PALLAS_FAST", "1") != "1":
        return None
    sub_flat, comp, code2char, alpha = _score_tables(db)
    sub = sub_flat.reshape(alpha, alpha)
    m, x = int(sub[0, 0]), int(sub[0, 1])
    want = np.full((alpha, alpha), x, dtype=np.int64)
    for i in range(alpha - 1):
        want[i, i] = m
    if m == x or not np.array_equal(sub.astype(np.int64), want):
        return None
    comp_t = tuple(int(c) for c in comp)
    c2cc_t = tuple(int(code2char[comp[a]]) for a in range(alpha))
    return (m, x, comp_t, c2cc_t)


def _round_up(x, step=4096):
    """Round a dynamic buffer size to a geometric grid: 4096 steps below
    32k, then 1/8th-of-magnitude steps — bounds the number of DISTINCT
    compiled shapes logarithmically (each new static size is a full
    remote recompile, minutes at large-table shapes)."""
    if x > 32768:
        step = 1 << (int(x - 1).bit_length() - 3)
    return ((x + step - 1) // step) * step


def _pallas_rows(db):
    """Device-resident 'score' + 'char' rows padded to a power-of-two
    column count, cached per SeqDB — the Pallas kernel's dynamic
    pltpu.roll silently corrupts lanes at non-pow2 widths (the column
    bucketing produces 384/640/...), so the kernel always runs on these
    copies. Pad values match db_to_padded's fill and are masked by the
    overlap window either way."""
    cache = getattr(db, "_device_cache", None)
    if cache is None:
        cache = db._device_cache = {}
    if "pallas_rows" not in cache:
        jc, _, _ = db_to_device(db, "score")
        jch, _, _ = db_to_device(db, "char")
        lmax = jc.shape[1]
        w = 1 << (lmax - 1).bit_length()
        if w != lmax:
            is_nucl = db.dbtype == seqdb.NUCLEOTIDES
            mat = constants.nucleotide() if is_nucl else constants.blosum62()
            jc = jnp.pad(jc, ((0, 0), (0, w - lmax)),
                         constant_values=mat.alphabet_size - 1)
            jch = jnp.pad(jch, ((0, 0), (0, w - lmax)))
        cache["pallas_rows"] = (jc, jch, w)
    return cache["pallas_rows"]


def _score_tables_device(db):
    """Device-resident copies of the scoring tables, cached per SeqDB."""
    cache = getattr(db, "_device_cache", None)
    if cache is None:
        cache = db._device_cache = {}
    if "score_tables" not in cache:
        sub_flat, comp, code2char, alpha = _score_tables(db)
        cache["score_tables"] = (jnp.asarray(sub_flat), jnp.asarray(comp),
                                 jnp.asarray(code2char), alpha)
    return cache["score_tables"]


@functools.partial(jax.jit,
                   static_argnames=("mode", "alpha", "width", "has_rev"))
def _rescore_from_dev(codes, chars, lengths, lut, dev_rep, dev_tgt, dev_diag,
                      idxops, sub_flat, comp, code2char, alpha, mode, width,
                      has_rev):
    """Rescore hits addressed by device-resident index: idxops i32[Hb] =
    (hit index << 1) | qrev selects rows of the kmer stage's device hit
    arrays, so the only upload is one word per hit and the only fetch is
    the packed i32[4, Hb] result (score, first, last, idents — separate
    columns: 16-bit packing sign-corrupts overlaps >= 32768 at
    max_seq_len 200000); overlap and distance are host-derivable from
    lengths + diagonal."""
    sel = idxops >> 1
    qrev = (idxops & 1).astype(bool)
    qrow = lut[dev_rep[sel].astype(jnp.int32)]
    trow = lut[dev_tgt[sel].astype(jnp.int32)]
    dg = dev_diag[sel]
    score, first, last, _ov, _dist, idents = rescore_pairs(
        codes, chars, lengths, qrow, trow, dg, qrev, sub_flat, comp,
        code2char, alpha, mode=mode, width=width, has_rev=has_rev)
    return jnp.stack([score.astype(jnp.int32), first.astype(jnp.int32),
                      last.astype(jnp.int32), idents.astype(jnp.int32)])


@functools.partial(jax.jit,
                   static_argnames=("alpha", "width", "interpret",
                                    "has_rev", "fast"))
def _rescore_from_dev_pallas(codes, chars, lengths, lut, dev_rep, dev_tgt,
                             dev_diag, idxops, sub2d, comp, code2char,
                             alpha, width, interpret, has_rev, fast=None):
    """_rescore_from_dev with the Pallas kernel as the scoring engine
    (END_TO_END; has_rev enables the nucleotide reverse-strand path):
    hits addressed by index into the k-mer stage's device arrays, rows
    streamed by the kernel's scalar-prefetch BlockSpecs — same
    one-word-per-hit upload, same packed i32[4, Hb] fetch."""
    from .pallas_rescore import rescore_pairs_pallas
    sel = idxops >> 1
    qrev = idxops & 1
    qrow = lut[dev_rep[sel].astype(jnp.int32)]
    trow = lut[dev_tgt[sel].astype(jnp.int32)]
    dg = dev_diag[sel]
    score, first, last, _ov, _dist, idents = rescore_pairs_pallas(
        codes, chars, lengths, qrow, trow, dg, sub2d, alpha, width=width,
        interpret=interpret,
        qrev=qrev if has_rev else None,
        comp_perm=comp if has_rev else None,
        code2char=code2char if has_rev else None,
        fast=fast)
    return jnp.stack([score.astype(jnp.int32), first.astype(jnp.int32),
                      last.astype(jnp.int32), idents.astype(jnp.int32)])


@functools.partial(jax.jit, static_argnames=("mode", "alpha", "width"))
def _rescore_packed(codes, chars, lengths, ops, sub_flat, comp, code2char,
                    alpha, mode, width):
    """rescore_pairs with ONE stacked i32[3, H] input (qrow, trow,
    diag<<1|qrev) and ONE stacked i32[5, H] output (score, first, last,
    ov, idents; dist = |diag| is host-derivable) — a single upload and a
    single fetch per call instead of ten round trips."""
    qrow, trow = ops[0], ops[1]
    dg = jnp.right_shift(ops[2], 1)  # arithmetic shift keeps the sign
    qrev = (ops[2] & 1).astype(bool)
    outs = rescore_pairs(codes, chars, lengths, qrow, trow, dg, qrev,
                         sub_flat, comp, code2char, alpha, mode=mode,
                         width=width)
    score, first, last, ov, _dist, idents = outs
    return jnp.stack([score.astype(jnp.int32), first, last, ov,
                      idents.astype(jnp.int32)])


def _self_rescore_host(db, mode):
    """Analytic rescoring of the (k, k, diag 0) self rows — identical to
    what rescore_pairs computes for qrow==trow, dist 0, so these ~N rows
    never ride the host<->device link. Cached per SeqDB + mode.

    mode 3 (END_TO_END): first/last from the '*'-skip on the raw chars,
    score = clipped sum of diagonal substitution scores over the window,
    idents = window size. mode 0 (HAMMING): idents = score = overlap."""
    cache = getattr(db, "_self_rescore_cache", None)
    if cache is None:
        cache = db._self_rescore_cache = {}
    if mode in cache:
        return cache[mode]
    n = db.size
    lens = db.seq_lens().astype(np.int64)
    ov = lens.astype(np.int32)
    if mode == 0:
        z = np.full(n, -1, dtype=np.int32)
        out = (ov.astype(np.int64), z, z, ov, ov.astype(np.int64))
        cache[mode] = out
        return out
    is_nucl = db.dbtype == seqdb.NUCLEOTIDES
    mat = constants.nucleotide() if is_nucl else constants.blosum62()
    sub = mat.sub.astype(np.int64)
    offsets = db.offsets.astype(np.int64)
    data = db.data
    nonempty = lens > 0
    safe_off = np.minimum(offsets, max(len(data) - 1, 0))
    first_char = np.where(nonempty, data[safe_off], 0)
    last_char = np.where(nonempty,
                         data[np.minimum(offsets + np.maximum(lens, 1) - 1,
                                         max(len(data) - 1, 0))], 0)
    star = np.uint8(ord("*"))
    first = (first_char == star).astype(np.int32)
    last_idx = np.maximum(ov - 1, 0)
    strip = (last_idx > 0) & (last_char == star)
    last = (last_idx - strip).astype(np.int32)
    codes = mat.aa2num[data].astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(sub[codes, codes])])
    lo = offsets + first
    hi = offsets + np.minimum(last.astype(np.int64), lens - 1) + 1
    hi = np.maximum(hi, lo)
    score = np.maximum(cs[hi] - cs[lo], 0)
    idents = np.maximum(0, np.minimum(last, ov - 1) - first + 1)
    score[~nonempty] = 0
    idents[~nonempty] = 0
    out = (score, first, last, ov, idents.astype(np.int64))
    cache[mode] = out
    return out


def rescore_diagonal_jax(db, hits, params=None, evaluer=None,
                         return_flat=False):
    """Device-accelerated rescorediagonal; same output as rescore_diagonal.

    With return_flat, returns {"qk": int64[M], "rec": RESULT_DTYPE[M]} of
    the SURVIVING records grouped by query (ascending) — the zero-copy
    input format of the native greedy extender."""
    from .evalue import EvalueComputer
    from .rescore import RESULT_DTYPE, RescoreParams

    params = params or RescoreParams()
    is_nucl = db.dbtype == seqdb.NUCLEOTIDES
    if evaluer is None:
        evaluer = EvalueComputer.for_matrix(
            "nucleotide_ungapped" if is_nucl else "blosum62_ungapped",
            db.total_residues())

    codes, lengths, keys = db_to_padded(db, "score")
    jc, jl, _ = db_to_device(db, "score")
    jch, _, _ = db_to_device(db, "char")
    jsub, jcomp, jc2c, alpha = _score_tables_device(db)
    lut = db.id_lookup_array()
    use_dev = isinstance(hits, KmerHits) and hits.dev is not None \
        and params.rescore_mode in (0, 3)
    if use_dev:
        cache = db._device_cache
        if "lut" not in cache:
            cache["lut"] = jnp.asarray(lut.astype(np.int32))
        jlut = cache["lut"]

    if isinstance(hits, tuple):
        qk, tk, pref, dg = hits  # flat arrays from return_arrays=True
        qk = np.asarray(qk, dtype=np.int64)
        tk = np.asarray(tk, dtype=np.int64)
        pref = np.asarray(pref, dtype=np.int64)
        dg = np.asarray(dg, dtype=np.int32)
        m = len(qk)
    else:
        qkeys, tkeys, prefs, diags = [], [], [], []
        for q in sorted(hits):
            for (t, s, d) in hits[q]:
                qkeys.append(q)
                tkeys.append(t)
                prefs.append(s)
                diags.append(d)
        m = len(qkeys)
        qk = np.asarray(qkeys, dtype=np.int64)
        tk = np.asarray(tkeys, dtype=np.int64)
        pref = np.asarray(prefs, dtype=np.int64)
        dg = np.asarray(diags, dtype=np.int32)
    if m == 0:
        return {int(k): np.zeros(0, dtype=RESULT_DTYPE) for k in db.keys}
    qrow = lut[qk].astype(np.int32)
    trow = lut[tk].astype(np.int32)
    qrev = is_nucl & (pref < 0)

    lmax = codes.shape[1]
    dist = np.abs(dg).astype(np.int64)
    score = np.zeros(m, dtype=np.int64)
    first = np.zeros(m, dtype=np.int32)
    last = np.zeros(m, dtype=np.int32)
    ov = np.zeros(m, dtype=np.int32)
    idents = np.zeros(m, dtype=np.float64)
    done = np.zeros(m, dtype=bool)

    # the inserted (k, k, diag 0) self rows — roughly the whole DB, and for
    # a fresh read set the majority of all rows — are analytic on the host;
    # never ship them (genuine device hits exclude rep == tgt)
    self_mask = (qk == tk) & (dg == 0) & (pref == 0)
    if self_mask.any():
        s_sc, s_f, s_l, s_ov, s_id = _self_rescore_host(
            db, params.rescore_mode)
        rows = qrow[self_mask]
        score[self_mask] = s_sc[rows]
        first[self_mask] = s_f[rows]
        last[self_mask] = s_l[rows]
        ov[self_mask] = s_ov[rows]
        idents[self_mask] = s_id[rows]
        done |= self_mask

    # bucket remaining pairs by their overlap width so short-read hits
    # don't pay the longest-contig row width in the device scan (the
    # overlap only depends on lengths + diagonal, host-computable up front)
    qlen_h = lengths[qrow].astype(np.int64)
    tlen_h = lengths[trow].astype(np.int64)
    ov_h = np.where(dg >= 0, np.minimum(tlen_h, qlen_h - dist),
                    np.minimum(tlen_h - dist, qlen_h))
    ov_h = np.maximum(ov_h, 0)

    # Pallas kernel on the PRODUCT path (device-resident hits): one
    # dispatch over full rows addressed by hit index. Default per
    # pallas_on_product() (on-chip measurement; PLASS_PALLAS overrides).
    from .pallas_rescore import (pallas_enabled, pallas_on_product,
                                 rescore_pairs_pallas)
    if (use_dev and params.rescore_mode == 3
            and pallas_on_product() and not bool(done.all())):
        idxs = np.nonzero(~done)[0]
        mb = len(idxs)
        hb = _round_up(mb)
        didx = np.searchsorted(hits.hit_slots, idxs).astype(np.int32)
        ops1 = np.zeros(hb, dtype=np.int32)
        ops1[:mb] = (didx << 1) | qrev[idxs]
        pjc, pjch, pw = _pallas_rows(db)
        out_dev = _rescore_from_dev_pallas(
            pjc, pjch, jl, jlut, *hits.dev, jnp.asarray(ops1),
            jsub.reshape(alpha, alpha), jcomp, jc2c, alpha,
            pw, jax.default_backend() == "cpu", is_nucl,
            fast=_fast_sub_pattern(db))
        packed = _fetch(out_dev, "rescore")
        score[idxs] = packed[0, :mb].astype(np.int64)
        first[idxs] = packed[1, :mb]
        last[idxs] = packed[2, :mb]
        ov[idxs] = ov_h[idxs].astype(np.int32)
        idents[idxs] = packed[3, :mb].astype(np.float64)
        done[idxs] = True

    # opt-in Pallas kernel (PLASS_PALLAS=1): score ALL remaining protein
    # hits in one pallas dispatch over full rows (ops/pallas_rescore.py)
    if (not is_nucl and params.rescore_mode == 3 and pallas_enabled()
            and not use_dev and not bool(done.all())):
        idxs = np.nonzero(~done)[0]
        hb = _round_up(len(idxs))
        pq = np.zeros(hb, dtype=np.int32)
        pt = np.zeros(hb, dtype=np.int32)
        pd = np.zeros(hb, dtype=np.int32)
        pq[:len(idxs)] = qrow[idxs]
        pt[:len(idxs)] = trow[idxs]
        pd[:len(idxs)] = dg[idxs]
        pjc, pjch, pw = _pallas_rows(db)
        psc, pf, pl_, _ov_d, _dist_d, pid = rescore_pairs_pallas(
            pjc, pjch, jl, jnp.asarray(pq), jnp.asarray(pt),
            jnp.asarray(pd), jnp.asarray(jsub).reshape(alpha, alpha),
            alpha, width=pw,
            interpret=jax.default_backend() == "cpu")
        mb = len(idxs)
        psc = _fetch(psc, "rescore")
        score[idxs] = psc[:mb].astype(np.int64)
        first[idxs] = np.asarray(pf)[:mb]
        last[idxs] = np.asarray(pl_)[:mb]
        ov[idxs] = ov_h[idxs].astype(np.int32)
        idents[idxs] = np.asarray(pid)[:mb].astype(np.float64)
        done[idxs] = True

    # sharded path: hit rows already carry the mesh step's stage-5 rescore
    # columns — consume them instead of re-dispatching the diagonal scan
    if isinstance(hits, KmerHits) and hits.pre is not None \
            and params.rescore_mode == hits.pre_mode:
        p_sc, p_first, p_last, p_id = hits.pre
        slots = hits.hit_slots
        score[slots] = p_sc
        first[slots] = p_first
        last[slots] = p_last
        ov[slots] = ov_h[slots].astype(np.int32)
        idents[slots] = p_id
        done[slots] = True
    w = 128
    widths = []
    while w < lmax:
        widths.append(w)
        w *= 4
    widths.append(lmax)
    pending = []
    for w in widths:
        sel = ~done & (ov_h <= w)
        done |= sel
        idxs = np.nonzero(sel)[0]
        if not len(idxs):
            continue
        mb = len(idxs)
        hb = _round_up(mb)
        if use_dev:
            # address hits by index into the kmer stage's device arrays:
            # one word per hit up, three words per hit down; all width
            # buckets are dispatched before the first (blocking) fetch
            didx = np.searchsorted(hits.hit_slots, idxs).astype(np.int32)
            ops1 = np.zeros(hb, dtype=np.int32)
            ops1[:mb] = (didx << 1) | qrev[idxs]
            out_dev = _rescore_from_dev(
                jc, jch, jl, jlut, *hits.dev, jnp.asarray(ops1), jsub,
                jcomp, jc2c, alpha, params.rescore_mode, w, is_nucl)
            pending.append((idxs, mb, out_dev))
            continue
        ops = np.zeros((3, hb), dtype=np.int32)
        ops[0, :mb] = qrow[idxs]
        ops[1, :mb] = trow[idxs]
        ops[2, :mb] = (dg[idxs].astype(np.int32) << 1) | qrev[idxs]
        # one stacked upload + one stacked fetch at the padded size
        # (exact-size device slices would recompile the fetch every call)
        packed = _fetch(_rescore_packed(
            jc, jch, jl, jnp.asarray(ops), jsub, jcomp, jc2c, alpha,
            params.rescore_mode, w), "rescore")
        score[idxs] = packed[0, :mb].astype(np.int64)
        first[idxs] = packed[1, :mb]
        last[idxs] = packed[2, :mb]
        ov[idxs] = packed[3, :mb]
        idents[idxs] = packed[4, :mb].astype(np.float64)
    for idxs, mb, out_dev in pending:
        packed = _fetch(out_dev, "rescore")
        score[idxs] = packed[0, :mb].astype(np.int64)
        first[idxs] = packed[1, :mb]
        last[idxs] = packed[2, :mb]
        ov[idxs] = ov_h[idxs].astype(np.int32)
        idents[idxs] = packed[3, :mb].astype(np.float64)
    return _rescore_finish(db, params, evaluer, qk, tk, pref, dg, m,
                           lengths, qrow, trow, qrev, score, first, last,
                           ov, dist, idents, return_flat)


def _rescore_finish(db, params, evaluer, qk, tk, pref, dg, m, lengths,
                    qrow, trow, qrev, score, first, last, ov, dist, idents,
                    return_flat):
    """Host post-processing shared by the fused and bucketed device paths:
    E-values, coordinates, coverage/seqId filters, record assembly.

    Default engine is the OpenMP kernel (native/finish.cpp, one parallel
    pass); PLASS_NATIVE_FINISH=0 selects this numpy reference path (~40
    single-threaded full-array passes, ~0.4 s at bench scale 64)."""
    from .rescore import RESULT_DTYPE

    if os.environ.get("PLASS_NATIVE_FINISH", "1") == "1":
        try:
            rec, keep = _rescore_finish_native(
                params, evaluer, tk, dg, m, lengths, qrow, trow, qrev,
                score, first, last, ov, dist, idents)
            return _rescore_group(db, qk, m, rec, keep, return_flat)
        except Exception as e:  # pragma: no cover - fallback safety
            import warnings
            warnings.warn(f"native rescore_finish failed ({e}); "
                          "numpy fallback")

    qlen = lengths[qrow].astype(np.int64)
    tlen = lengths[trow].astype(np.int64)
    evalue = evaluer.evalue(score, qlen)
    bit = (evaluer.bit_score(score) + 0.5).astype(np.int64)
    aln_len = (last - first + 1).astype(np.int64)
    pos_diag = dg >= 0
    qs = np.where(pos_diag, first + dist, first)
    qe = np.where(pos_diag, last + dist, last)
    ts = np.where(pos_diag, first, first + dist)
    te = np.where(pos_diag, last, last + dist)

    if params.seq_id_mode == 1:
        denom = np.minimum(qlen, tlen)
    elif params.seq_id_mode == 2:
        denom = np.maximum(qlen, tlen)
    else:
        denom = aln_len
    seq_id = idents / denom
    is_identity = qrow == trow
    seq_id = np.where((evalue <= params.eval_thr) | is_identity, seq_id, 0.0)

    qcov = (np.minimum(qlen, np.maximum(qs, qe)) - np.minimum(qs, qe) + 1) / qlen
    tcov = (np.minimum(tlen, np.maximum(ts, te)) - np.minimum(ts, te) + 1) / tlen
    # reverse hits: flip query coords back (rescorediagonal.cpp:294-297)
    qs = np.where(qrev, qlen - qs - 1, qs)
    qe = np.where(qrev, qlen - qe - 1, qe)

    if params.cov_mode == 0:
        has_cov = (qcov >= params.cov_thr) & (tcov >= params.cov_thr)
    elif params.cov_mode == 1:
        has_cov = tcov >= params.cov_thr
    elif params.cov_mode == 2:
        has_cov = qcov >= params.cov_thr
    else:
        has_cov = np.ones(m, dtype=bool)
    eps = np.finfo(np.float32).eps
    keep = (ov > 0) & (is_identity |
                       ((aln_len >= params.aln_len_thr) & has_cov &
                        (seq_id >= params.seq_id_thr - eps) &
                        (evalue <= params.eval_thr)))
    # canBeCovered pre-filter (rescorediagonal.cpp:211)
    if params.cov_thr > 0 and params.cov_mode in (0, 2):
        small = np.minimum(qlen, tlen).astype(np.float64)
        big = np.maximum(qlen, tlen).astype(np.float64)
        if params.cov_mode == 0:
            keep &= small / big >= params.cov_thr
        else:
            keep &= big * params.cov_thr <= small

    rec = np.zeros(m, dtype=RESULT_DTYPE)
    rec["dbKey"] = tk
    rec["score"] = bit
    rec["qcov"] = qcov
    rec["dbcov"] = tcov
    rec["seqId"] = seq_id
    rec["eval"] = evalue
    rec["alnLength"] = aln_len
    rec["qStartPos"] = qs
    rec["qEndPos"] = qe
    rec["qLen"] = qlen
    rec["dbStartPos"] = ts
    rec["dbEndPos"] = te
    rec["dbLen"] = tlen
    return _rescore_group(db, qk, m, rec, keep, return_flat)


def _rescore_finish_native(params, evaluer, tk, dg, m, lengths, qrow, trow,
                           qrev, score, first, last, ov, dist, idents):
    """One OpenMP pass over all hit rows (native/finish.cpp): E-values,
    coordinates, filters and packed RESULT_DTYPE records. Bit-compatible
    with the numpy path except possibly the last ulp of the eval field
    (libm vs cephes erfc/exp), which no downstream consumer reads."""
    import ctypes
    from .. import native
    from .rescore import RESULT_DTYPE

    L = native.lib()
    e = evaluer
    dparams = np.array([
        e.lam, e.K, e.log_K, e.a_I, e.b_I, e.a_J, e.b_J,
        e.alpha_I, e.beta_I, e.alpha_J, e.beta_J, e.sigma, e.tau,
        e.vi_y_thr, e.vj_y_thr, e.c_y_thr, e.db_res_count,
        params.eval_thr, params.seq_id_thr, params.cov_thr],
        dtype=np.float64)
    rec = np.zeros(m, dtype=RESULT_DTYPE)
    keep = np.zeros(m, dtype=np.uint8)

    def p(a, ct):
        a = np.ascontiguousarray(a)
        return a, a.ctypes.data_as(ctypes.POINTER(ct))

    tk_a, tk_p = p(tk.astype(np.int64), ctypes.c_int64)
    dg_a, dg_p = p(dg.astype(np.int32), ctypes.c_int32)
    qr_a, qr_p = p(qrow.astype(np.int32), ctypes.c_int32)
    tr_a, tr_p = p(trow.astype(np.int32), ctypes.c_int32)
    ln_a, ln_p = p(lengths.astype(np.int32), ctypes.c_int32)
    rv_a, rv_p = p(qrev.astype(np.uint8), ctypes.c_uint8)
    sc_a, sc_p = p(score.astype(np.int64), ctypes.c_int64)
    f_a, f_p = p(first.astype(np.int32), ctypes.c_int32)
    l_a, l_p = p(last.astype(np.int32), ctypes.c_int32)
    ov_a, ov_p = p(ov.astype(np.int32), ctypes.c_int32)
    di_a, di_p = p(dist.astype(np.int64), ctypes.c_int64)
    id_a, id_p = p(idents.astype(np.float64), ctypes.c_double)
    L.rescore_finish(
        m, tk_p, dg_p, qr_p, tr_p, ln_p, rv_p, sc_p, f_p, l_p, ov_p,
        di_p, id_p,
        dparams.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        np.int32(params.seq_id_mode), np.int32(params.cov_mode),
        np.int64(params.aln_len_thr),
        rec.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return rec, keep.astype(bool)


def _rescore_group(db, qk, m, rec, keep, return_flat):
    """Grouping tail shared by the native and numpy finish paths."""
    from .rescore import RESULT_DTYPE

    if return_flat:
        return {"qk": qk[keep], "rec": rec[keep]}
    # group per query preserving input order
    out = {}
    boundaries = np.nonzero(np.diff(qk))[0] + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [m]])
    for s0, e0 in zip(starts, ends):
        key = int(qk[s0])
        sel = keep[s0:e0]
        out[key] = rec[s0:e0][sel]
    for k in db.keys:
        out.setdefault(int(k), np.zeros(0, dtype=RESULT_DTYPE))
    return out
