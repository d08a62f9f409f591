"""Multi-chip sharding of the assembly iteration (replaces the reference's
MPI hash-range splits + rank-0 merge, kmermatcher.cpp:594-779,632-658).

Design (mirrors the reference's memory model — sequences replicated like the
shared-NFS mmap, the k-mer table sharded):

 1. sequences are data-parallel over the mesh axis for extraction+selection
 2. each selected entry is routed to the shard owning its 16-bit hash range
    via `jax.lax.all_to_all` over ICI (same k-mer -> same hash -> same
    shard, so k-mer GROUPS are complete within a shard)
 3. each shard sorts its table slice, assigns representatives and emits
    (rep, target, diagonal) pairs locally
 4. pairs are re-routed by CONTIGUOUS representative range with a second
    all-to-all so every shard holds a contiguous segment of the globally
    sorted pair stream (runs complete per shard, absorption exact except
    at segment edges) — this replaces the reference's rank-0 k-way merge
    (kmermatcher.cpp:946-1020) with a scalable exchange instead of a
    serial merge
 5. best-diagonal hit emission + diagonal rescoring run where the hits
    live, reading the replicated sequence arrays

The collectives ride ICI; nothing round-trips through the filesystem.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import device_kmer
from ..ops.device_kmer import KmerParams
from ..ops.device_rescore import rescore_pairs


def make_mesh(n_devices=None, axis="shards"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# jitted program cache: the builders close fresh python functions, so an
# unmemoized call would RETRACE (and on remote backends recompile) the
# whole step every iteration even at identical shapes/capacities
_FN_CACHE = {}


def _cached(key, build):
    fn = _FN_CACHE.get(key)
    if fn is None:
        fn = _FN_CACHE[key] = build()
    return fn


def _exchange(fields, dest, valid, n_shards, capacity, axis):
    """Route entries to their destination shard with per-destination buckets.

    fields: list of (array, fill_value); dest: int32[T] in [0, n_shards);
    valid: bool[T]. Returns the received flat arrays [n_shards*capacity],
    a received-valid mask, and the number of entries THIS shard failed to
    send because a destination bucket overflowed (int32 scalar) — callers
    must check it and retry with a larger capacity; entries past capacity
    are dropped from the buffers, never silently kept.
    """
    t = dest.shape[0]
    dest = jnp.where(valid, dest, n_shards)
    order = jnp.argsort(dest, stable=True)
    dest_s = dest[order]
    rank_in_dest = jnp.cumsum(
        jnp.where(dest_s[:, None] == jnp.arange(n_shards)[None, :], 1, 0),
        axis=0)
    # exact per-destination demand: lets the caller retry ONCE at the
    # right capacity instead of doubling (each doubling recompiles)
    max_fill = rank_in_dest[-1].max().astype(jnp.int32)
    my_rank = jnp.take_along_axis(
        rank_in_dest, jnp.clip(dest_s, 0, n_shards - 1)[:, None], axis=1)[:, 0] - 1
    fits = (dest_s < n_shards) & (my_rank < capacity)
    n_dropped = ((dest_s < n_shards) & ~fits).sum().astype(jnp.int32)
    slot = jnp.clip(dest_s, 0, n_shards - 1) * capacity + my_rank

    def a2a(x):
        return jax.lax.all_to_all(
            x.reshape(n_shards, capacity), axis, 0, 0, tiled=False).reshape(-1)

    oob = n_shards * capacity  # out-of-bounds index -> dropped by mode="drop"
    widx = jnp.where(fits, slot, oob)
    out = []
    for arr, fill in fields:
        v = arr[order]
        buf = jnp.full((n_shards * capacity,), fill, dtype=arr.dtype)
        buf = buf.at[widx].set(v, mode="drop")
        out.append(a2a(buf))
    vbuf = jnp.zeros((n_shards * capacity,), dtype=bool)
    vbuf = vbuf.at[widx].set(True, mode="drop")
    out.append(a2a(vbuf))
    out.append(n_dropped)
    out.append(max_fill)
    return out


def sharded_iteration_fn(mesh, params: KmerParams, bucket_capacity,
                         hit_capacity, alpha, axis="shards"):
    """Build (memoized) the jitted multi-chip step.

    Inputs: (seqs, lengths, keys) sharded on the sequence axis;
    (codes, chars, all_lengths) replicated for rescoring; score LUTs;
    hash_shift scalar. Keys must be the renumbered 0..N-1 row ids.
    Outputs are per-shard hit arrays (sharded on axis 0).
    """
    key = ("step", mesh, params, bucket_capacity, hit_capacity, alpha, axis)
    return _cached(key, lambda: _build_iteration_fn(
        mesh, params, bucket_capacity, hit_capacity, alpha, axis))


def _build_iteration_fn(mesh, params, bucket_capacity, hit_capacity, alpha,
                        axis):
    n_shards = mesh.devices.size

    def step(seqs, lengths, keys, codes, chars_arr, all_lengths, sub_flat,
             comp, c2c, hash_shift):
        # ---- stage 1: local selection (data parallel)
        sk, sp, sv, sh, sh16 = device_kmer.select_kmers(
            seqs, lengths, params, hash_shift)
        n, ksel = sk.shape
        ids = jnp.broadcast_to(keys[:, None], (n, ksel)).reshape(-1)
        lens = jnp.broadcast_to(lengths[:, None], (n, ksel)).reshape(-1)
        kmer = jnp.concatenate([sk.reshape(-1), sh])
        sid = jnp.concatenate([ids, keys])
        pos = jnp.concatenate([sp.reshape(-1), jnp.zeros(n, jnp.int32)])
        slen = jnp.concatenate([lens, lengths]).astype(jnp.int32)
        h16 = jnp.concatenate([
            sh16.reshape(-1),
            (sh & jnp.uint64(0xFFFF)).astype(jnp.int32)])
        valid = jnp.concatenate([sv.reshape(-1), lengths > 0])

        # ---- stage 2: hash-range exchange (same k-mer -> same shard)
        dest = (h16 * n_shards) // 65536
        r_kmer, r_sid, r_pos, r_slen, r_valid, drop1, need1 = _exchange(
            [(kmer, device_kmer.U64MAX), (sid, np.uint32(0)),
             (pos, np.int32(0)), (slen, np.int32(0))],
            dest, valid, n_shards, bucket_capacity, axis)

        # ---- stage 3: per-shard sort + group + pair emission (shared core)
        rep_id, sid_s, diagonal, rev, keep = device_kmer.pairs_from_table(
            r_kmer, r_sid, r_pos, r_slen, r_valid, params)

        # ---- stage 4: re-route pairs by CONTIGUOUS representative range
        # so each shard holds a contiguous segment of the globally sorted
        # pair stream — run-absorption (kmermatcher.cpp:880-898) then runs
        # exactly as on one device, deviating only at the n_shards-1
        # segment edges (the reference's own split path cuts runs at its
        # split-file boundaries the same way, kmermatcher.cpp:947-1020)
        rows_per_shard = seqs.shape[0]  # P(axis) splits dim 0 evenly
        pair_dest = jnp.minimum(
            (rep_id // jnp.uint32(rows_per_shard)).astype(jnp.int32),
            n_shards - 1)
        p_rep, p_tgt, p_diag, p_rev, p_valid, drop2, need2 = _exchange(
            [(rep_id, np.uint32(0xFFFFFFFF)), (sid_s, np.uint32(0)),
             (diagonal, np.int32(0)), (rev, False)],
            pair_dest, keep, n_shards, bucket_capacity, axis)

        rk, tk, dk, rv, kp = device_kmer.sort_pairs(
            p_rep, p_tgt, p_diag, p_rev, p_valid)
        hr, ht, hs, hd, hv = device_kmer.best_diagonal_hits(rk, tk, dk, rv,
                                                            kp, absorb=True)
        horder = jnp.where(hv, jnp.arange(hr.shape[0], dtype=jnp.int32),
                           jnp.int32(2**31 - 1))
        _, cr, ct, cs, cd, cv = jax.lax.sort(
            (horder, hr, ht, hs, hd, hv), dimension=0, num_keys=1)
        n_hits = hv.sum().astype(jnp.int32)
        drop3 = jnp.maximum(n_hits - jnp.int32(hit_capacity), 0)
        cr = cr[:hit_capacity]
        ct = ct[:hit_capacity]
        cs = cs[:hit_capacity]
        cd = cd[:hit_capacity]
        cv = cv[:hit_capacity]
        overflow = (drop1 + drop2 + drop3).reshape(1)
        needed = jnp.maximum(jnp.maximum(need1, need2), n_hits).reshape(1)

        # ---- stage 5: rescore hits locally against replicated sequences
        # (first/last ride back as separate i32 columns — packing them into
        # 16-bit halves silently sign-corrupted overlaps >= 32768 columns,
        # real at max_seq_len 200000 — so the workflow can consume this
        # rescore directly instead of re-dispatching: the product path)
        qrow = cr.astype(jnp.int32)
        trow = ct.astype(jnp.int32)
        qrev = cs < 0
        score, first, last, ovl, dist, idents = rescore_pairs(
            codes, chars_arr, all_lengths,
            jnp.where(cv, qrow, 0), jnp.where(cv, trow, 0),
            cd, qrev & cv, sub_flat, comp, c2c, alpha, mode=3)
        return (cr, ct, cs, cd, cv, score, first.astype(jnp.int32),
                last.astype(jnp.int32), idents, overflow, needed)

    in_specs = (P(axis), P(axis), P(axis),     # seqs, lengths, keys sharded
                P(), P(), P(), P(), P(), P(),  # replicated arrays + luts
                P())
    out_specs = tuple(P(axis) for _ in range(11))
    mapped = _shard_map(step, mesh, in_specs, out_specs)
    return jax.jit(mapped)


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        smap = jax.shard_map
    except AttributeError:  # older jax
        from jax.experimental.shard_map import shard_map as smap
    try:
        return smap(fn, mesh=mesh, in_specs=in_specs,
                    out_specs=out_specs, check_vma=False)
    except TypeError:
        return smap(fn, mesh=mesh, in_specs=in_specs,
                    out_specs=out_specs, check_rep=False)


def selection_demand_fn(mesh, params: KmerParams, axis="shards"):
    """Capacity-INDEPENDENT probe: stage-1 selection + exact per-(source,
    destination) entry counts for the stage-2 hash-range exchange.  Its
    compiled shape depends only on the padded DB shape, so it is compiled
    once per workload family and lets kmermatcher_sharded size the
    exchange buckets exactly BEFORE compiling the full step (the
    reference computes its histogram before splitting the same way,
    kmermatcher.cpp:617-620) — without it, skewed hash blocks cost one
    overflow retry per understated stage, each a full recompile."""
    key = ("probe", mesh, params, axis)
    return _cached(key, lambda: _build_demand_fn(mesh, params, axis))


def _build_demand_fn(mesh, params, axis):
    n_shards = mesh.devices.size

    def probe(seqs, lengths, hash_shift):
        sk, sp, sv, sh, sh16 = device_kmer.select_kmers(
            seqs, lengths, params, hash_shift)
        n = seqs.shape[0]
        h16 = jnp.concatenate([
            sh16.reshape(-1),
            (sh & jnp.uint64(0xFFFF)).astype(jnp.int32)])
        valid = jnp.concatenate([sv.reshape(-1), lengths > 0])
        dest = (h16 * n_shards) // 65536
        counts = jnp.sum(
            (dest[:, None] == jnp.arange(n_shards)[None, :]) & valid[:, None],
            axis=0, dtype=jnp.int32)
        return counts.reshape(1, n_shards)

    mapped = _shard_map(probe, mesh, (P(axis), P(axis), P()), P(axis))
    return jax.jit(mapped)
