"""End-to-end parity tests against prebuilt golden outputs of the reference
binary (regenerated per .claude/skills/verify/SKILL.md). These are the
primary oracle, mirroring the reference's own regression strategy
(util/run_regression.sh)."""
import os

import numpy as np
import pytest

from plass_tpu.data import seqdb

GOLDEN = "/tmp/golden2/tmp/latest"


def _cmp_records(mine, ref):
    assert mine.size == ref.size
    lut = {int(k): i for i, k in enumerate(mine.keys)}
    for i in range(ref.size):
        k = int(ref.keys[i])
        j = lut.get(k)
        assert j is not None, f"key {k} missing"
        assert mine.get_data(j).tobytes() == ref.get_data(i).tobytes(), f"key {k}"


needs_golden = pytest.mark.skipif(not os.path.exists(GOLDEN),
                                  reason="golden outputs not generated")


@needs_golden
def test_mergereads_bytes(merged_reads):
    sdb, hdb = merged_reads
    ref = seqdb.SeqDB.open(f"{GOLDEN}/nucl_reads")
    assert sdb.data.tobytes() == ref.data.tobytes()
    assert np.array_equal(sdb.keys, ref.keys)


@needs_golden
def test_orfs_and_translation(merged_reads):
    from plass_tpu.ops import orf as orf_mod
    from plass_tpu.ops import translate as tr
    reads, _ = merged_reads
    odb, ohdb = orf_mod.extract_orfs(
        reads, min_length=45, max_length=32734, max_gaps=0,
        start_mode=orf_mod.START_TO_STOP, contig_start_mode=2, contig_end_mode=2)
    ref = seqdb.SeqDB.open(f"{GOLDEN}/nucl_6f_long")
    assert odb.data.tobytes() == ref.data.tobytes()
    refh = seqdb.SeqDB.open(f"{GOLDEN}/nucl_6f_long_h")
    assert ohdb.data.tobytes() == refh.data.tobytes()
    aa = tr.translate_nucs(odb, ohdb, 1, add_orf_stop=True)
    refaa = seqdb.SeqDB.open(f"{GOLDEN}/aa_6f_long")
    assert aa.data.tobytes() == refaa.data.tobytes()


@needs_golden
def test_kmermatch_rescore_assemble_iteration0():
    from plass_tpu.ops.kmermatch import kmermatcher, hits_to_db
    from plass_tpu.ops.rescore import (RescoreParams, RESCORE_END_TO_END,
                                       rescore_diagonal, results_to_db)
    from plass_tpu.ops.evalue import EvalueComputer
    from plass_tpu.assembler.findassemblystart import find_assembly_start
    from plass_tpu.assembler.extend import assemble

    db = seqdb.SeqDB.open(f"{GOLDEN}/aa_6f_start_long")
    hits = kmermatcher(db, 14, kmers_per_sequence=60, hash_shift=67,
                       ignore_multi_kmer=True, include_only_extendable=False)
    _cmp_records(hits_to_db(hits), seqdb.SeqDB.open(f"{GOLDEN}/pref_0"))

    rp = RescoreParams(rescore_mode=RESCORE_END_TO_END, seq_id_thr=0.9,
                       eval_thr=1e-5)
    alns = rescore_diagonal(db, hits, rp)
    _cmp_records(results_to_db(alns), seqdb.SeqDB.open(f"{GOLDEN}/aln_0"))

    corrected = find_assembly_start(db, alns)
    _cmp_records(corrected, seqdb.SeqDB.open(f"{GOLDEN}/corrected_seqs"))

    hits2 = kmermatcher(corrected, 14, kmers_per_sequence=60, hash_shift=67,
                        ignore_multi_kmer=True, include_only_extendable=False)
    ev = EvalueComputer.for_matrix("blosum62_ungapped", corrected.total_residues())
    alns2 = rescore_diagonal(corrected, hits2, rp, ev)
    asm, _ = assemble(corrected, alns2, seq_id_thr=0.9, keep_target=True,
                      evaluer=ev)
    _cmp_records(asm, seqdb.SeqDB.open(f"{GOLDEN}/assembly_0"))


@needs_golden
def test_full_workflow_byte_identical(example_reads, tmp_path):
    from plass_tpu.workflow.assemble import run_assemble, AssembleParams
    golden_fasta = "/tmp/golden2/assembly.fas"
    if not os.path.exists(golden_fasta):
        pytest.skip("golden fasta missing")
    out = str(tmp_path / "assembly.fas")
    p = AssembleParams(num_iterations=2, filter_proteins=0)
    run_assemble(example_reads, out, str(tmp_path / "tmp"), p)
    assert open(out, "rb").read() == open(golden_fasta, "rb").read()


@needs_golden
def test_full_workflow_jax_backend_byte_identical(example_reads, tmp_path):
    """The fused device path (array kmermatch -> flat rescore -> native
    extend) must be byte-identical too."""
    from plass_tpu.workflow.assemble import run_assemble, AssembleParams
    golden_fasta = "/tmp/golden2/assembly.fas"
    if not os.path.exists(golden_fasta):
        pytest.skip("golden fasta missing")
    out = str(tmp_path / "assembly.fas")
    p = AssembleParams(num_iterations=2, filter_proteins=0, backend="jax")
    run_assemble(example_reads, out, str(tmp_path / "tmp"), p)
    assert open(out, "rb").read() == open(golden_fasta, "rb").read()


GOLDEN12 = "/tmp/golden12/assembly.fas"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(GOLDEN12),
                    reason="default-params golden not generated")
def test_full_workflow_default_params_byte_identical(example_reads, tmp_path):
    """DEFAULT plass assemble: 12 iterations + NN coding filter
    (Assembler.cpp:10-27 defaults) — the full product path, not just the
    fast 2-iter variant."""
    from plass_tpu.workflow.assemble import run_assemble, AssembleParams
    out = str(tmp_path / "assembly.fas")
    p = AssembleParams(backend="numpy")
    run_assemble(example_reads, out, str(tmp_path / "tmp"), p)
    assert open(out, "rb").read() == open(GOLDEN12, "rb").read()


GOLDEN_NUCL = "/tmp/goldennucl"


@pytest.mark.skipif(not os.path.exists(GOLDEN_NUCL),
                    reason="nucleotide golden not generated")
def test_nuclassemble_byte_identical(example_reads, tmp_path):
    from plass_tpu.workflow.nuclassemble import (NuclAssembleParams,
                                                 run_nuclassemble)
    golden = os.path.join(GOLDEN_NUCL, "contigs.fasta")
    out = str(tmp_path / "contigs.fasta")
    p = NuclAssembleParams(num_iterations=2, min_contig_len=150,
                           backend="numpy")
    run_nuclassemble(example_reads, out, str(tmp_path / "tmp"), p)
    assert open(out, "rb").read() == open(golden, "rb").read()


@pytest.mark.skipif(not os.path.exists(GOLDEN_NUCL),
                    reason="nucleotide golden not generated")
def test_nuclassemble_jax_backend_byte_identical(example_reads, tmp_path):
    """Device pipeline (canonical k-mers, strand algebra, rev-aware
    rescoring) must match the reference bytes too."""
    from plass_tpu.workflow.nuclassemble import (NuclAssembleParams,
                                                 run_nuclassemble)
    golden = os.path.join(GOLDEN_NUCL, "contigs.fasta")
    out = str(tmp_path / "contigs.fasta")
    p = NuclAssembleParams(num_iterations=2, min_contig_len=150,
                           backend="jax")
    run_nuclassemble(example_reads, out, str(tmp_path / "tmp"), p)
    assert open(out, "rb").read() == open(golden, "rb").read()


@pytest.mark.skipif(not os.path.exists(GOLDEN_NUCL),
                    reason="nucleotide golden not generated")
def test_nuclassemble_sharded_backend_byte_identical(example_reads, tmp_path):
    """Full workflow over the 8-device virtual mesh == reference bytes.

    The sharded matcher's absorb=False deviation changes only the k-mer
    COUNT score of run-boundary pairs (measured on a 6k-ORF workload:
    identical pair sets, 2/7644 count deltas), and the count's magnitude
    is discarded by rescoring (only its strand sign survives) — so the
    product output is byte-identical to the single-device path."""
    import jax
    from plass_tpu.workflow.nuclassemble import (NuclAssembleParams,
                                                 run_nuclassemble)
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    golden = os.path.join(GOLDEN_NUCL, "contigs.fasta")
    out = str(tmp_path / "contigs.fasta")
    p = NuclAssembleParams(num_iterations=2, min_contig_len=150,
                           backend="sharded")
    run_nuclassemble(example_reads, out, str(tmp_path / "tmp"), p)
    assert open(out, "rb").read() == open(golden, "rb").read()
