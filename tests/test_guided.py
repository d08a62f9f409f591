"""Guided assembly + linclust parity tests against reference goldens
(regenerate per .claude/skills/verify/SKILL.md: penguin guided_nuclassemble
--threads 1 --num-iterations 2 --min-contig-len 150 into /tmp/goldenguided2),
plus golden-free unit tests of the clustering semantics."""
import os

import numpy as np
import pytest

from plass_tpu.data import seqdb

GOLDEN = "/tmp/goldenguided2"
LIN = f"{GOLDEN}/tmp/latest/clu_tmp/latest"

needs_golden = pytest.mark.skipif(not os.path.exists(f"{GOLDEN}/assembly.fasta"),
                                  reason="guided golden not generated")


def _cmp(mine, refpath):
    ref = seqdb.SeqDB.open(refpath)
    assert mine.size == ref.size
    lut = {int(k): i for i, k in enumerate(mine.keys)}
    for i in range(ref.size):
        k = int(ref.keys[i])
        j = lut.get(k)
        assert j is not None, f"key {k} missing"
        assert mine.get_data(j).tobytes() == ref.get_data(i).tobytes(), f"key {k}"


@needs_golden
def test_linclust_stage_parity():
    from plass_tpu.assembler.cluster import (clusters_to_db,
                                             merged_clusters_to_db,
                                             result2repseq)
    from plass_tpu.ops.kmermatch import hits_to_db
    from plass_tpu.ops.nucl_align import align_results_to_db
    from plass_tpu.workflow.linclust import LinclustParams, run_linclust_nucl

    db = seqdb.SeqDB.open(f"{GOLDEN}/tmp/latest/nuclassembly")
    inter = {}
    merged = run_linclust_nucl(db, LinclustParams(), intermediates=inter)
    _cmp(hits_to_db(inter["pref"]), f"{LIN}/pref")
    _cmp(clusters_to_db(inter["pre_clust"]), f"{LIN}/pre_clust")
    _cmp(align_results_to_db(inter["aln"]), f"{LIN}/aln")
    _cmp(clusters_to_db(inter["clust"]), f"{LIN}/clust")
    _cmp(merged_clusters_to_db(merged), f"{GOLDEN}/tmp/latest/clu")
    rep = result2repseq(db, merged_clusters_to_db(merged))
    _cmp(rep, f"{GOLDEN}/tmp/latest/nuclassembly_rep")


@needs_golden
def test_guided_end_to_end_byte_identical(example_reads, tmp_path):
    from plass_tpu.workflow.guided import (GuidedNuclAssembleParams,
                                           run_guided_nuclassemble)
    p = GuidedNuclAssembleParams(aa_num_iterations=2, nucl_num_iterations=2,
                                 min_contig_len=150, backend="numpy")
    out = str(tmp_path / "assembly.fasta")
    run_guided_nuclassemble(example_reads, out, str(tmp_path / "tmp"), p)
    assert open(out, "rb").read() == open(f"{GOLDEN}/assembly.fasta", "rb").read()


@needs_golden
def test_guided_jax_backend_byte_identical(example_reads, tmp_path):
    """Guided path on the device backend: aa k-mer match + rescore and the
    nested nuclassemble all run through ops/backend.py."""
    from plass_tpu.workflow.guided import (GuidedNuclAssembleParams,
                                           run_guided_nuclassemble)
    p = GuidedNuclAssembleParams(aa_num_iterations=2, nucl_num_iterations=2,
                                 min_contig_len=150, backend="jax")
    out = str(tmp_path / "assembly.fasta")
    run_guided_nuclassemble(example_reads, out, str(tmp_path / "tmp"), p)
    assert open(out, "rb").read() == open(f"{GOLDEN}/assembly.fasta", "rb").read()


GOLDEN_DEFAULT = "/tmp/goldenguided"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(f"{GOLDEN_DEFAULT}/assembly.fasta"),
                    reason="default guided golden not generated")
def test_guided_default_5_5_byte_identical(example_reads, tmp_path):
    """DEFAULT guided_nuclassemble: 5 aa + 5 nucl iterations
    (GuidedNuclassembler.cpp:12-15)."""
    from plass_tpu.workflow.guided import (GuidedNuclAssembleParams,
                                           run_guided_nuclassemble)
    p = GuidedNuclAssembleParams(min_contig_len=150, backend="numpy")
    out = str(tmp_path / "assembly.fasta")
    run_guided_nuclassemble(example_reads, out, str(tmp_path / "tmp"), p)
    assert open(out, "rb").read() == \
        open(f"{GOLDEN_DEFAULT}/assembly.fasta", "rb").read()


AA_GOLDEN = "/tmp/goldenlinclustaa"


@pytest.mark.skipif(not os.path.exists(f"{AA_GOLDEN}/clu.dbtype"),
                    reason="protein linclust golden not generated")
def test_protein_linclust_byte_identical():
    """Full AA linclust: auto-k kmermatcher, HAMMING, SET_COVER,
    SUBSTITUTION+precision filter, striped Smith-Waterman align."""
    from plass_tpu.assembler.cluster import merged_clusters_to_db
    from plass_tpu.workflow.linclust import LinclustParams, run_linclust
    db = seqdb.SeqDB.open(f"{AA_GOLDEN}/aa_6f_start_long")
    p = LinclustParams(kmer_size=0, kmers_per_sequence=21,
                       kmers_per_sequence_scale=0.0, seq_id_thr=0.9,
                       cov_thr=0.8, cov_mode=0, wrapped_scoring=False,
                       max_seq_len=65535, ignore_multi_kmer=False,
                       gap_open=11, gap_extend=1)
    _cmp(merged_clusters_to_db(run_linclust(db, p)), f"{AA_GOLDEN}/clu")


def test_greedy_incremental_cluster_semantics():
    """Length-desc ordering, min-id assignment and the rep fix-up pass
    (ClusteringAlgorithms.cpp:271-333)."""
    from plass_tpu.assembler.cluster import greedy_incremental_cluster
    # keys 10,20,30 with lengths 5,3,8 -> internal order by len desc: 30,10,20
    db = seqdb.SeqDB.from_records([b"AAAAA", b"CCC", b"GGGGGGGG"],
                                  keys=[10, 20, 30], dbtype=seqdb.NUCLEOTIDES)
    # 30 reaches 20; 10 reaches 20 as well -> 20 joins the smaller internal
    # id (30). 10 stays its own rep.
    clusters = greedy_incremental_cluster(
        db, {30: [30, 20], 10: [10, 20], 20: [20]})
    assert clusters == {10: [10], 30: [20, 30]}

    # fix-up: 40 is reached by 20, but 20 itself is absorbed by 30 -> 40
    # points at non-rep 20, and the fix-up re-promotes 20 to rep (pulling
    # it OUT of 30's cluster, exactly like the reference serial pass).
    db4 = seqdb.SeqDB.from_records([b"AAAAA", b"CCC", b"GGGGGGGG", b"T"],
                                   keys=[10, 20, 30, 40],
                                   dbtype=seqdb.NUCLEOTIDES)
    clusters = greedy_incremental_cluster(
        db4, {30: [30, 20], 20: [20, 40], 40: [40], 10: [10]})
    assert clusters == {10: [10], 20: [20, 40], 30: [30]}


def test_merge_clusters_splice_order():
    from plass_tpu.assembler.cluster import merge_clusters
    db = seqdb.SeqDB.from_records([b"A", b"C", b"G", b"T"],
                                  keys=[1, 2, 3, 4], dbtype=seqdb.NUCLEOTIDES)
    pre = {1: [1, 2], 3: [3], 4: [4]}
    clust = {1: [1, 3], 4: [4]}
    merged = merge_clusters(db, [pre, clust])
    # rep-first record order, spliced lists appended at the end
    assert merged == {1: [1, 2, 3], 4: [4]}


def test_ksw2_simple_alignment():
    """ksw_extz on a toy pair: extension scores and cigar."""
    from plass_tpu.ops.ksw2 import ksw_extz, M_OP
    from plass_tpu import constants
    mat = constants.nucleotide().sub.astype(np.int32).reshape(-1)
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.int64)
    ez = ksw_extz(q, q, mat, 5, 5, 2, 64, 200, score_only=False)
    assert ez.max == 16 and ez.max_q == 7 and ez.max_t == 7
    assert ez.cigar == [(M_OP, 8)]
    # one mismatch in the middle still aligns through
    t = q.copy(); t[4] = 3
    ez2 = ksw_extz(q, t, mat, 5, 5, 2, 64, 200, score_only=False)
    assert ez2.max == 16 - 5  # 7 matches (14) + mismatch (-3) ... extension max
