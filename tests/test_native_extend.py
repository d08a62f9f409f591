"""Native (C++) greedy extenders vs the Python oracles — exact equality of
output bytes, keys, and status flags on the bundled example workloads.

The Python passes are the byte-parity-tested oracles (golden tests in
test_golden_protein.py); these tests pin the native kernels to them without
requiring the reference binaries."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from plass_tpu.data import seqdb


def _db_equal(a, b):
    assert a.size == b.size
    assert np.array_equal(a.keys, b.keys)
    for i in range(a.size):
        assert a.get_seq_bytes(i) == b.get_seq_bytes(i), f"record {i}"


@pytest.fixture(scope="module")
def nucl_iteration(merged_reads):
    """One nuclassemble iteration's inputs: reads + strand-aware hits."""
    from plass_tpu.ops.evalue import EvalueComputer
    from plass_tpu.ops.kmermatch import kmermatcher
    from plass_tpu.ops.rescore import RescoreParams, rescore_diagonal

    reads, _ = merged_reads
    hits = kmermatcher(reads, 22, kmers_per_sequence=60,
                       kmers_per_sequence_scale=0.1, hash_shift=67,
                       ignore_multi_kmer=True, include_only_extendable=True)
    ev = EvalueComputer.for_matrix("nucleotide_ungapped",
                                   reads.total_residues())
    rp = RescoreParams(rescore_mode=3, seq_id_thr=0.99, eval_thr=1e-5)
    alns = rescore_diagonal(reads, hits, rp, ev)
    return reads, alns, ev


def test_nucl_native_matches_python(nucl_iteration):
    from plass_tpu.assembler.nucl_extend import nucl_assemble

    reads, alns, ev = nucl_iteration
    py_db, py_flags = nucl_assemble(reads, alns, seq_id_thr=0.99,
                                    max_seq_len=200000, keep_target=True,
                                    evaluer=ev, use_native=False)
    nat_db, nat_flags = nucl_assemble(reads, alns, seq_id_thr=0.99,
                                      max_seq_len=200000, keep_target=True,
                                      evaluer=ev, use_native=True)
    assert np.array_equal(py_flags, nat_flags)
    _db_equal(py_db, nat_db)


def test_nucl_native_keep_target_false(nucl_iteration):
    from plass_tpu.assembler.nucl_extend import nucl_assemble

    reads, alns, ev = nucl_iteration
    py_db, _ = nucl_assemble(reads, alns, seq_id_thr=0.99,
                             keep_target=False, evaluer=ev, use_native=False)
    nat_db, _ = nucl_assemble(reads, alns, seq_id_thr=0.99,
                              keep_target=False, evaluer=ev, use_native=True)
    _db_equal(py_db, nat_db)


def test_nucl_native_max_seq_len(nucl_iteration):
    """Tiny max-seq-len forces the length-guard break path."""
    from plass_tpu.assembler.nucl_extend import nucl_assemble

    reads, alns, ev = nucl_iteration
    py_db, py_flags = nucl_assemble(reads, alns, seq_id_thr=0.99,
                                    max_seq_len=300, evaluer=ev,
                                    use_native=False)
    nat_db, nat_flags = nucl_assemble(reads, alns, seq_id_thr=0.99,
                                      max_seq_len=300, evaluer=ev,
                                      use_native=True)
    assert np.array_equal(py_flags, nat_flags)
    _db_equal(py_db, nat_db)


@pytest.fixture(scope="module")
def guided_iteration(merged_reads):
    """One guided iteration's inputs: ORF nucl+aa DBs and projected
    nucleotide alignments."""
    from plass_tpu.ops import orf as orf_mod
    from plass_tpu.ops import translate as translate_mod
    from plass_tpu.ops.kmermatch import kmermatcher
    from plass_tpu.ops.proteinaln2nucl import protein_aln_to_nucl
    from plass_tpu.ops.rescore import RescoreParams, rescore_diagonal

    reads, _ = merged_reads
    start_db, start_h = orf_mod.extract_orfs(
        reads, min_length=20, max_length=45, max_gaps=0,
        start_mode=orf_mod.START_TO_STOP, contig_start_mode=1,
        contig_end_mode=0)
    long_db, long_h = orf_mod.extract_orfs(
        reads, min_length=45, max_length=32734, max_gaps=0,
        start_mode=orf_mod.START_TO_STOP, contig_start_mode=2,
        contig_end_mode=2)
    nucl = seqdb.concat(long_db, start_db)
    hdr = seqdb.concat(long_h, start_h)
    aa = translate_mod.translate_nucs(nucl, hdr, 1, add_orf_stop=True)

    hits = kmermatcher(aa, 14, kmers_per_sequence=60,
                       kmers_per_sequence_scale=0.1, hash_shift=67,
                       ignore_multi_kmer=True, include_only_extendable=True)
    rp = RescoreParams(rescore_mode=3, seq_id_thr=0.97, cov_thr=0.0,
                       cov_mode=1, eval_thr=1e-5, add_backtrace=True)
    alns = rescore_diagonal(aa, hits, rp)
    nucl_alns = protein_aln_to_nucl(nucl, aa, alns, 5, 2)
    return nucl, aa, nucl_alns


def test_guided_native_matches_python(guided_iteration):
    from plass_tpu.assembler.guided_extend import guided_assemble

    nucl, aa, nucl_alns = guided_iteration
    py_n, py_a, py_flags = guided_assemble(nucl, aa, nucl_alns,
                                           seq_id_thr=0.99,
                                           max_seq_len=200000,
                                           use_native=False)
    nat_n, nat_a, nat_flags = guided_assemble(nucl, aa, nucl_alns,
                                              seq_id_thr=0.99,
                                              max_seq_len=200000,
                                              use_native=True)
    assert np.array_equal(py_flags, nat_flags)
    _db_equal(py_n, nat_n)
    _db_equal(py_a, nat_a)


def test_guided_native_max_seq_len(guided_iteration):
    from plass_tpu.assembler.guided_extend import guided_assemble

    nucl, aa, nucl_alns = guided_iteration
    py_n, py_a, _ = guided_assemble(nucl, aa, nucl_alns, seq_id_thr=0.99,
                                    max_seq_len=250, use_native=False)
    nat_n, nat_a, _ = guided_assemble(nucl, aa, nucl_alns, seq_id_thr=0.99,
                                      max_seq_len=250, use_native=True)
    _db_equal(py_n, nat_n)
    _db_equal(py_a, nat_a)
