"""Linear-time clustering workflow for nucleotide DBs (`linclust`) — the
redundancy-reduction stage of guided_nuclassemble.

Reference: lib/mmseqs/data/workflow/linclust.sh + src/workflow/Linclust.cpp:
kmermatcher -> HAMMING rescorediagonal (wrapped, thresholds raised to
max(0.5, thr)) -> greedy pre-clustering -> representative sub-DB ->
prefilter restriction (createsubdb + filterdb) -> gapped `align` ->
greedy clustering -> mergeclusters. The AA-only ungapped FILTER stage
(linclust.sh step 3) does not run for nucleotide input
(Linclust.cpp:95).
"""
from dataclasses import dataclass

from ..assembler.cluster import (greedy_incremental_cluster, merge_clusters)
from ..data import seqdb
from ..ops.kmermatch import kmermatcher
from ..ops.nucl_align import align_nucl
from ..ops.rescore import (RESCORE_HAMMING, RescoreParams, rescore_diagonal)
from ..utils.log import logger


@dataclass
class LinclustParams:
    """Guided reduce-redundancy defaults (GuidedNuclassembler.cpp:34-40 +
    the CLUSTER_PAR parameter string)."""
    kmer_size: int = 22
    alphabet_size: int = 5
    kmers_per_sequence: int = 60
    kmers_per_sequence_scale: float = 0.1
    hash_shift: int = 67
    seq_id_thr: float = 0.97
    cov_thr: float = 0.99
    cov_mode: int = 1
    eval_thr: float = 0.001
    gap_open: int = 5
    gap_extend: int = 2
    zdrop: int = 200
    max_seq_len: int = 200000
    ignore_multi_kmer: bool = True


def run_linclust_nucl(db, params=None, intermediates=None):
    """Cluster a nucleotide DB; returns {rep_key: [member keys]} in
    mergeclusters layout (rep first in each member list).

    intermediates: optional dict that receives the stage outputs for
    oracle comparison (pref, pref_rescore1, pre_clust, ...).
    """
    p = params or LinclustParams()
    logger.info("linclust: kmermatcher")
    pref = kmermatcher(db, p.kmer_size,
                       kmers_per_sequence=p.kmers_per_sequence,
                       kmers_per_sequence_scale=p.kmers_per_sequence_scale,
                       hash_shift=p.hash_shift,
                       ignore_multi_kmer=p.ignore_multi_kmer,
                       include_only_extendable=False,
                       cov_thr=p.cov_thr, cov_mode=p.cov_mode)

    logger.info("linclust: hamming pre-rescore")
    rp = RescoreParams(rescore_mode=RESCORE_HAMMING,
                       seq_id_thr=max(0.5, p.seq_id_thr),
                       cov_thr=max(0.5, p.cov_thr), cov_mode=p.cov_mode,
                       eval_thr=p.eval_thr, wrapped_scoring=True)
    rescore1 = rescore_diagonal(db, pref, rp)

    logger.info("linclust: greedy pre-clustering")
    pre_clust = greedy_incremental_cluster(
        db, {q: [t for (t, _, _) in rescore1.get(q, [])] for q in rescore1})

    rep_keys = sorted(pre_clust)
    rep_set = set(rep_keys)
    reps = seqdb.subdb(db, rep_keys)
    pref_filter2 = {k: [h for h in pref.get(k, []) if h[0] in rep_set]
                    for k in rep_keys}

    logger.info("linclust: gapped align on %d representatives", len(rep_keys))
    aln = align_nucl(reps, pref_filter2, seq_id_thr=p.seq_id_thr,
                     cov_thr=p.cov_thr, cov_mode=p.cov_mode,
                     eval_thr=p.eval_thr, gapo=p.gap_open, gape=p.gap_extend,
                     zdrop=p.zdrop, wrapped_scoring=True)

    logger.info("linclust: greedy clustering")
    clust = greedy_incremental_cluster(
        reps, {q: [r["dbKey"] for r in aln.get(q, [])] for q in aln})

    merged = merge_clusters(db, [pre_clust, clust])
    if intermediates is not None:
        intermediates.update(pref=pref, pref_rescore1=rescore1,
                             pre_clust=pre_clust, reps=reps,
                             pref_filter2=pref_filter2, aln=aln, clust=clust)
    logger.info("linclust: %d clusters", len(merged))
    return merged
