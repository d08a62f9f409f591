"""Memory-bounded k-mer table splitting (kmermatcher.cpp:594-779).

The host matcher splits the 16-bit hash space by an exact histogram so
every split's table fits --split-memory-limit, then merges the per-split
pair streams before hit emission. Unlike the reference's k-way file merge
— whose run scans cut (rep, target) runs at split-file boundaries and
produce slightly lower counts for pairs spanning splits — the merged
stream here is fully re-sorted, so split output is IDENTICAL to the
single-split run (verified: the reference's own --split-memory-limit 500K
output differs from its unsplit output in 3 records on the bundled
examples; ours does not)."""
import os

import numpy as np
import pytest

from plass_tpu.data import seqdb

GOLDEN = "/tmp/golden2/tmp/latest"

needs_golden = pytest.mark.skipif(not os.path.exists(GOLDEN),
                                  reason="golden outputs not generated")


def test_parse_memory_limit():
    from plass_tpu.ops.kmermatch import parse_memory_limit
    assert parse_memory_limit("0") == 0
    assert parse_memory_limit("") == 0
    assert parse_memory_limit("1024") == 1024
    assert parse_memory_limit("4K") == 4096
    assert parse_memory_limit("2M") == 2 << 20
    assert parse_memory_limit("1G") == 1 << 30
    assert parse_memory_limit("1.5G") == 3 << 29
    assert parse_memory_limit(123) == 123


@needs_golden
def test_device_split_equals_single_pass():
    """Device-path memory-bounded splitting (kmermatch_pairs_range driven
    by compute_hash_splits): >= 4 hash-range splits produce exactly the
    monolithic device run's hits (kmermatcher.cpp:594-779 analogue)."""
    from plass_tpu.ops.backend import kmermatcher_jax
    from plass_tpu.ops.kmermatch import compute_hash_splits

    db = seqdb.SeqDB.open(f"{GOLDEN}/aa_6f_start_long")
    keep = [int(k) for i, k in enumerate(db.keys)
            if db.lengths[i] < 260][:4000]
    db = seqdb.subdb(db, keep)
    kw = dict(kmers_per_sequence=60, hash_shift=67, ignore_multi_kmer=True,
              include_only_extendable=False)
    limit = 300 * 1024
    ranges = compute_hash_splits(db, 14, 60, 0.0, 67, True, limit)
    assert len(ranges) >= 4
    single = kmermatcher_jax(db, 14, **kw)
    split = kmermatcher_jax(db, 14, split_memory_limit=limit, **kw)
    assert {k: sorted(v) for k, v in single.items()} == \
           {k: sorted(v) for k, v in split.items()}


@needs_golden
def test_device_auto_split_return_arrays(monkeypatch):
    """The AUTO device-budget split (PLASS_DEVICE_TABLE_LIMIT) with
    return_arrays: the device merge program (merge_pairs_packed) must
    produce exactly the monolithic flat hit arrays, carry live device-
    resident hit arrays for the rescore fast path, and the auto trigger
    must fire from the env var alone (no explicit split_memory_limit)."""
    from plass_tpu.ops import backend
    from plass_tpu.ops.backend import kmermatcher_jax

    db = seqdb.SeqDB.open(f"{GOLDEN}/aa_6f_start_long")
    keep = [int(k) for i, k in enumerate(db.keys)
            if db.lengths[i] < 260][:4000]
    db = seqdb.subdb(db, keep)
    kw = dict(kmers_per_sequence=60, hash_shift=67, ignore_multi_kmer=True,
              include_only_extendable=False, return_arrays=True)
    single = kmermatcher_jax(db, 14, **kw)
    # table estimate: n * (ksel + 1) + n entries; force ~4 splits
    monkeypatch.setenv("PLASS_DEVICE_TABLE_LIMIT", str(70000))
    backend._FETCH_GUESSES.clear()
    split = kmermatcher_jax(db, 14, **kw)
    assert split.dev is not None  # rescore fast path survives the split
    for a, b in zip(single, split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(single.group_starts, split.group_starts)
    np.testing.assert_array_equal(single.hit_slots, split.hit_slots)
    # the device-resident arrays address the same hits the flat rows carry
    n_hits = len(split.hit_slots)
    for col, flat in ((0, split[0]), (1, split[1]), (2, split[3])):
        dev_col = np.asarray(split.dev[col])[:n_hits]
        np.testing.assert_array_equal(dev_col.astype(np.int64),
                                      np.asarray(flat)[split.hit_slots])


@needs_golden
def test_split_equals_single_and_golden():
    from plass_tpu.ops.kmermatch import (ENTRY_BYTES, compute_hash_splits,
                                         hits_to_db, kmermatcher)
    db = seqdb.SeqDB.open(f"{GOLDEN}/aa_6f_start_long")
    # iteration-0 parameters (include_only_extendable off, shift 67) so the
    # result is comparable against the reference's pref_0
    kw = dict(kmers_per_sequence=60, hash_shift=67, ignore_multi_kmer=True,
              include_only_extendable=False)
    single = kmermatcher(db, 14, **kw)
    # force >= 4 splits
    ranges = compute_hash_splits(db, 14, 60, 0.0, 67, True, 500 * 1024)
    assert len(ranges) >= 4
    assert ranges[0][0] == 0 and ranges[-1][1] == 0xFFFF
    for (lo, hi), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo2 == hi + 1
    split = kmermatcher(db, 14, split_memory_limit="500K", **kw)
    assert split == single
    # and equals the reference binary's (unsplit) prefilter golden
    ref = seqdb.SeqDB.open(f"{GOLDEN}/pref_0")
    mine = hits_to_db(split)
    lut = {int(k): i for i, k in enumerate(mine.keys)}
    for i in range(ref.size):
        k = int(ref.keys[i])
        assert mine.get_data(lut[k]).tobytes() == ref.get_data(i).tobytes()


@needs_golden
def test_split_nucl_equals_single(merged_reads):
    from plass_tpu.ops.kmermatch import kmermatcher
    reads, _ = merged_reads
    kw = dict(kmers_per_sequence=60, kmers_per_sequence_scale=0.1,
              hash_shift=67, ignore_multi_kmer=True,
              include_only_extendable=True)
    single = kmermatcher(reads, 22, **kw)
    split = kmermatcher(reads, 22, split_memory_limit="1M", **kw)
    assert split == single
