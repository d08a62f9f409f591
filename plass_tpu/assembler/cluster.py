"""Greedy incremental clustering + cluster-merging utilities (the `clust`,
`mergeclusters`, `result2repseq` commands used by linclust).

Reference semantics:
  - clust GREEDY/GREEDY_MEM: lib/mmseqs/src/clustering/Clustering.cpp:32-84
    (execute(4)) and ClusteringAlgorithms.cpp:271-333
    (greedyIncrementalLowMem): sequences are ordered by (length desc,
    key-sorted position asc) — SORT_BY_LENGTH, DBReader.h — and every
    element is assigned the minimum internal id among itself and all
    queries whose alignment list contains it; a serial fix-up pass then
    re-promotes any referenced non-representative to representative.
  - output format: Clustering::writeData (Clustering.cpp:85-115): per
    representative key (ascending), the rep key line first, then member
    keys (ascending) excluding the rep.
  - mergeclusters: lib/mmseqs/src/util/mergeclusters.cpp — chains
    clustering steps by splicing member lists.
  - result2repseq: lib/mmseqs/src/util/result2repseq.cpp — first key of
    each result record selects the representative sequence.
"""
import numpy as np

from ..data import seqdb

DBTYPE_CLUSTER = 6


def _length_order(db):
    """Internal ids: positions into key-sorted order, sorted by
    (entry length desc, key-sorted position asc). DBReader SORT_BY_LENGTH
    sorts by the index length field, which includes the \\n\\0 suffix —
    a constant shift, so sequence-length order is identical."""
    lens = db.lengths  # full record lengths — the reference index field
    return np.lexsort((np.arange(db.size), -lens.astype(np.int64)))


def greedy_incremental_cluster(db, alignments):
    """ClusteringAlgorithms::greedyIncrementalLowMem.

    db: SeqDB of the clustered input (keys ascending).
    alignments: {query_key: iterable of target keys} — the first column of
    each alignment record, in record line order (order is irrelevant here;
    only set membership feeds the min).

    Returns {rep_key: [member_keys ascending, rep first]} with reps
    ascending (dict preserves insertion order).
    """
    n = db.size
    order = _length_order(db)  # internal id -> key-sorted position
    keys = np.asarray(db.keys)
    internal_of_pos = np.empty(n, dtype=np.int64)
    internal_of_pos[order] = np.arange(n)
    key_to_internal = {int(keys[pos]): int(internal_of_pos[pos])
                       for pos in range(n)}

    # assigned[e] = min(e, min{q : key(e) in aln[key(q)]})
    assigned = np.arange(n, dtype=np.int64)
    for q_int in range(n):
        q_key = int(keys[order[q_int]])
        for t_key in alignments.get(q_key, ()):
            m = key_to_internal[int(t_key)]
            if q_int < assigned[m]:
                assigned[m] = q_int
    # fix-up: promote any referenced assignment target to representative
    # (ClusteringAlgorithms.cpp:323-331)
    for i in range(n):
        a = assigned[i]
        if assigned[a] != a:
            assigned[a] = a

    rep_keys = keys[order[assigned]]
    member_keys = keys[order]
    pairs = sorted(zip(rep_keys.tolist(), member_keys.tolist()))
    out = {}
    for rep, member in pairs:
        out.setdefault(rep, []).append(member)
    return out


def clusters_to_db(clusters):
    """Serialize clustering as a DBTYPE_CLUSTER record DB
    (Clustering::writeData layout: rep key line first, members minus rep)."""
    w = seqdb.DBWriter(dbtype=DBTYPE_CLUSTER)
    for rep in sorted(clusters):
        lines = [str(rep)]
        lines += [str(m) for m in clusters[rep] if m != rep]
        w.write(rep, ("\n".join(lines) + "\n").encode(), add_newline=False)
    return w.finish()


def db_to_clusters(cdb):
    """Parse a cluster DB back to {rep_key: [line keys in order]}."""
    out = {}
    for i in range(cdb.size):
        key = int(cdb.keys[i])
        txt = cdb.get_data(i).tobytes().decode()
        out[key] = [int(x) for x in txt.split()] if txt else []
    return out


def merge_clusters(seq_db, steps):
    """mergeclusters.cpp: chain clustering steps.

    steps: list of {rep_key: [line keys in record order]} — the first step's
    records start with the rep key itself (Clustering::writeData), so the
    spliced lists carry the rep as their first element.
    Returns {rep_key: [member keys in splice order]} iterated in seq_db key
    order (mergeclusters.cpp:112-147 writes per key-sorted position).
    """
    merged = {}
    first = steps[0]
    for rep in sorted(first):
        # record line order: the rep key line first, then members minus rep
        # (Clustering::writeData)
        merged[rep] = [rep] + [m for m in first[rep] if m != rep]
    for step in steps[1:]:
        for rep in sorted(step):
            acc = merged.setdefault(rep, [])
            for member in step[rep]:
                if member != rep:
                    acc.extend(merged.get(member, ()))
                    merged[member] = []
    out = {}
    for key in np.asarray(seq_db.keys).tolist():
        members = merged.get(int(key))
        if members:
            out[int(key)] = members
    return out


def merged_clusters_to_db(clusters):
    """mergeclusters output: one record per non-empty rep, member keys in
    list order (the rep is the first list element via the step-1 records)."""
    w = seqdb.DBWriter(dbtype=DBTYPE_CLUSTER)
    for rep, members in clusters.items():
        w.write(rep, ("\n".join(str(m) for m in members) + "\n").encode(),
                add_newline=False)
    return w.finish()


def result2repseq(seq_db, result_db):
    """result2repseq.cpp: write the sequence of each record's first key
    under the record's own key; output dbtype follows seq_db."""
    w = seqdb.DBWriter(dbtype=seq_db.dbtype)
    for i in range(result_db.size):
        body = result_db.get_data(i).tobytes()
        if not body:
            continue
        first = int(body.split(None, 1)[0].split(b"\t", 1)[0])
        sid = seq_db.key_to_id(first)
        w.write(int(result_db.keys[i]), seq_db.get_data(sid).tobytes(),
                add_newline=False)
    return w.finish()


def filter_lines_by_keys(result_db, keep_keys):
    """filterdb --filter-file (filterdb.cpp GET_FROM_FILE, positive
    filtering on column 1): keep lines whose first token is in the set."""
    keep = {str(int(k)) for k in keep_keys}
    w = seqdb.DBWriter(dbtype=result_db.dbtype)
    for i in range(result_db.size):
        body = result_db.get_data(i).tobytes().decode()
        kept = [ln for ln in body.splitlines()
                if ln and ln.split("\t", 1)[0].split(" ", 1)[0] in keep]
        w.write(int(result_db.keys[i]),
                ("\n".join(kept) + "\n").encode() if kept else b"",
                add_newline=False)
    return w.finish()
