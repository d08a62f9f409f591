"""Device batched SW SCORE_ONLY kernel vs the native ssw oracle — exact
score equality on real candidate pairs, and align_protein's device
pre-filter producing identical results to the pure-native path."""
import os

import numpy as np
import pytest

from plass_tpu.data import seqdb

GOLDEN = "/tmp/golden2/tmp/latest"

needs_golden = pytest.mark.skipif(not os.path.exists(GOLDEN),
                                  reason="golden outputs not generated")


@pytest.fixture(scope="module")
def aa_db():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden outputs not generated")
    db = seqdb.SeqDB.open(f"{GOLDEN}/aa_6f_start_long")
    keep = [int(k) for i, k in enumerate(db.keys) if db.lengths[i] < 300]
    return seqdb.subdb(db, keep[:4000])


@pytest.fixture(scope="module")
def candidate_hits(aa_db):
    from plass_tpu.ops.kmermatch import kmermatcher
    return kmermatcher(aa_db, 14, kmers_per_sequence=60, hash_shift=67,
                       ignore_multi_kmer=True,
                       include_only_extendable=False)


@needs_golden
def test_device_scores_match_native_ssw(aa_db, candidate_hits):
    from plass_tpu import constants
    from plass_tpu.ops.device_align import batch_pair_scores
    from plass_tpu.ops.protein_align import (ProteinAligner,
                                             calc_local_aa_bias)
    from plass_tpu.ops.evalue import EvalueComputer

    mat = constants.blosum62()
    pairs = [(q, t) for q, v in candidate_hits.items()
             for (t, _s, _d) in v if q != t][:800]
    assert len(pairs) >= 100

    def bias_fn(qid):
        qnum = mat.aa2num[np.asarray(aa_db.get_seq(qid))]
        tmp = calc_local_aa_bias(mat.sub.astype(np.int8), mat.pback, qnum)
        comp = np.where(tmp < 0.0, tmp - 0.5, tmp + 0.5).astype(np.int8)
        return qnum, comp.astype(np.int32)

    dev = batch_pair_scores(aa_db, aa_db, pairs, bias_fn, 11, 1)

    evaluer = EvalueComputer.for_matrix("blosum62_11_1",
                                        aa_db.total_residues())
    aligner = ProteinAligner(mat, True)
    bad = []
    for (q, t) in pairs:
        qnum = mat.aa2num[np.asarray(aa_db.get_seq(aa_db.key_to_id(q)))]
        aligner.init_query(qnum)
        tnum = mat.aa2num[np.asarray(aa_db.get_seq(aa_db.key_to_id(t)))]
        r = aligner.ssw_align(tnum, 11, 1, 1, 1e30, evaluer, 0, 0.0,
                              len(qnum) // 2)
        if int(r["score1"]) != dev[(q, t)]:
            bad.append((q, t, int(r["score1"]), dev[(q, t)]))
    assert not bad, bad[:10]


@needs_golden
def test_align_prefilter_identical_results(aa_db, candidate_hits):
    from plass_tpu.ops.protein_align import align_protein

    hits = {q: v[:30] for q, v in list(candidate_hits.items())[:300]}
    base = align_protein(aa_db, hits, eval_thr=1e-3,
                         device_prefilter=False)
    pre = align_protein(aa_db, hits, eval_thr=1e-3,
                        device_prefilter=True)
    assert base.keys() == pre.keys()
    for k in base:
        assert base[k] == pre[k], k
