import numpy as np
import pytest

from plass_tpu import constants
from plass_tpu.ops import orf as orf_mod
from plass_tpu.ops import translate as tr
from plass_tpu.ops.hashes import xxh64_u64_np, seq_hash_np
from plass_tpu.ops.kmermatch import revcomp_packed
from plass_tpu.ops.rescore import (RESCORE_END_TO_END, RESCORE_ALIGNMENT,
                                   ungapped_by_diagonal, format_seq_id)


def test_xxh64_golden():
    """Golden values produced by the vendored xxhash (XXH64 of 8 LE bytes)."""
    vals = np.array([0, 1, 0x123456789ABCDEF, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    golden = {
        (0, 0): 3803688792395291579,
        (0, 1): 11468921228449061269,
        (67, 0): 7587281261889343175,
        (67, 0x123456789ABCDEF): 412726007456387080,
        (68, 0xFFFFFFFFFFFFFFFF): 15170205024798202434,
    }
    for (seed, v), expect in golden.items():
        h = xxh64_u64_np(np.array([v], dtype=np.uint64), seed)[0]
        assert int(h) == expect


def test_seq_hash():
    # h = h*31 + x over numeric letters, uint64 wraparound
    assert int(seq_hash_np([1, 2, 3])) == ((1 * 31 + 2) * 31 + 3)


def test_matrices():
    b = constants.blosum62()
    i = {c: n for n, c in enumerate(b.letters)}
    assert b.sub[i["A"], i["A"]] == 4
    assert b.sub[i["W"], i["W"]] == 11
    assert b.sub[i["A"], i["W"]] == -3
    n = constants.nucleotide()
    assert n.sub[0, 0] == 2 and n.sub[0, 1] == -3
    r13 = constants.reduced(13)
    # groups must match the reference's printed reduced alphabet
    groups = {}
    for c in b"ACDEFGHIKLMNPQRSTVWY":
        groups.setdefault(int(r13.aa2num[c]), []).append(chr(c))
    gs = {"".join(sorted(v)) for v in groups.values()}
    assert gs == {"AST", "C", "DN", "EQ", "FY", "G", "H", "IV", "KR", "LM", "P", "W"}


def test_translate_standard():
    aa = tr.translate_array(np.frombuffer(b"ATGGCTTAA", dtype=np.uint8))
    assert aa.tobytes() == b"MA*"
    # ambiguous codon resolving to one residue
    aa = tr.translate_array(np.frombuffer(b"GGN", dtype=np.uint8))
    assert aa.tobytes() == b"G"
    # unresolvable -> X
    aa = tr.translate_array(np.frombuffer(b"NNN", dtype=np.uint8))
    assert aa.tobytes() == b"X"
    # lowercase propagates
    aa = tr.translate_array(np.frombuffer(b"atggct", dtype=np.uint8))
    assert aa.tobytes() == b"ma"


def test_stop_codons():
    assert set(tr.stop_codons(1)) == {b"TAA", b"TAG", b"TGA"}
    assert tr.start_codons(1, False) == (b"ATG",)
    assert set(tr.start_codons(1, True)) == {b"TTG", b"CTG", b"ATG"}


def test_orf_simple():
    #           0         1         2
    #           0123456789012345678901234567
    seq = np.frombuffer(b"ATGAAACCCGGGTTTTAAATGCCCTAA", dtype=np.uint8)
    orfs = orf_mod.find_orfs_in_strand(seq, 1, 1000, 10**9, orf_mod.START_TO_STOP)
    # frame 0: initial fragment ATG..TTT ends at TAA(15); then ATG(18) to TAA(24)
    spans = [(f, t) for f, t, _, _ in orfs]
    assert (0, 14) in spans
    assert (18, 23) in spans


def test_orf_leading_stop():
    # first codon is a stop -> no zero-length orf, next starts at ATG
    seq = np.frombuffer(b"TAAATGAAATTTTGA", dtype=np.uint8)
    orfs = orf_mod.find_orfs_in_strand(seq, 1, 1000, 10**9, orf_mod.START_TO_STOP)
    f0 = [o for o in orfs if o[0] % 3 == 0]
    assert f0 == [(3, 11, False, False)]


def test_revcomp_packed():
    # ACGT in 2-bit A=0 C=1 T=2 G=3 packing: A C G T = 0,1,3,2
    kmer = (0 << 6) | (1 << 4) | (3 << 2) | 2  # "ACGT"
    rc = int(revcomp_packed(np.array([kmer], dtype=np.uint64), 4)[0])
    # revcomp("ACGT") = "ACGT"
    assert rc == kmer
    kmer2 = 0  # "AAAA"
    rc2 = int(revcomp_packed(np.array([kmer2], dtype=np.uint64), 4)[0])
    # revcomp("AAAA") = "TTTT" = 2,2,2,2
    assert rc2 == (2 << 6) | (2 << 4) | (2 << 2) | 2


def test_ungapped_end_to_end():
    mat = constants.blosum62()
    q = np.frombuffer(b"AAAACCCC", dtype=np.uint8)
    t = np.frombuffer(b"AACCCC", dtype=np.uint8)
    score, start, end, diag_len, dist = ungapped_by_diagonal(
        q, t, 2, mat.ascii_mat, RESCORE_END_TO_END)
    assert diag_len == 6 and start == 0 and end == 5
    # AA then CCCC all matches: 2*4 + 4*9 = 44
    assert score == 2 * 4 + 4 * 9
    # stars at the ends are skipped
    q2 = np.frombuffer(b"*AAA*", dtype=np.uint8)
    t2 = np.frombuffer(b"*AAA*", dtype=np.uint8)
    s2, st2, e2, _, _ = ungapped_by_diagonal(q2, t2, 0, mat.ascii_mat, RESCORE_END_TO_END)
    assert st2 == 1 and e2 == 3 and s2 == 12


def test_format_seq_id():
    assert format_seq_id(1.0) == "1.00"
    assert format_seq_id(19 / 20) == "0.950"
    assert format_seq_id(28 / 30) == "0.933"
    assert format_seq_id(0.05) == "0.050"
    assert format_seq_id(0.005) == "0.005"
    assert format_seq_id(0.0) == "0.000"


def test_batch_orf_matches_scalar_oracle():
    """The vectorized extract_orfs path must reproduce the scalar
    find_orfs_in_strand state machine for every start mode / filter combo
    on random sequences with stops, starts, Ns and IUPAC letters."""
    from plass_tpu.data.seqdb import DBWriter, NUCLEOTIDES, GENERIC_DB

    rng = np.random.default_rng(7)
    letters = np.frombuffer(b"ACGTacgtNRYu.", dtype=np.uint8)
    records = []
    for i in range(160):
        L = int(rng.integers(0, 90))
        p = np.array([0.22, 0.22, 0.22, 0.22, 0.02, 0.02, 0.02, 0.02,
                      0.015, 0.005, 0.005, 0.005, 0.005])
        p = p / p.sum()
        records.append(letters[rng.choice(len(letters), L, p=p)].tobytes())
    writer = DBWriter(NUCLEOTIDES)
    for i, r in enumerate(records):
        writer.write(i * 3 + 1, r)  # non-contiguous keys
    db = writer.finish()

    def scalar_extract(seq_db, **kw):
        # the pre-vectorization reference implementation
        sw = DBWriter(NUCLEOTIDES)
        hw = DBWriter(GENERIC_DB)
        out_key = 0
        for i in range(seq_db.size):
            key = int(seq_db.keys[i])
            raw = seq_db.get_seq(i)
            if len(raw) < 3:
                continue
            seq = orf_mod._setseq(np.asarray(raw))
            rc = orf_mod._revcomp_orf(seq)
            L = len(seq)
            for strand, s in ((orf_mod.STRAND_PLUS, seq),
                              (orf_mod.STRAND_MINUS, rc)):
                orfs = orf_mod.find_orfs_in_strand(
                    s, kw["min_length"], kw["max_length"], kw["max_gaps"],
                    kw["start_mode"])
                for from_, to, inc_start, inc_end in orfs:
                    if kw["contig_start_mode"] < 2 and \
                            int(inc_start) == kw["contig_start_mode"]:
                        continue
                    if kw["contig_end_mode"] < 2 and \
                            int(inc_end) == kw["contig_end_mode"]:
                        continue
                    fp, tp = from_, to
                    if strand == orf_mod.STRAND_MINUS:
                        fp, tp = (L - 1) - from_, (L - 1) - to
                    sw.write(out_key, s[from_:to + 1].tobytes())
                    hw.write(out_key, orf_mod._orf_header(
                        key, fp, tp, inc_start, inc_end))
                    out_key += 1
        return sw.finish(sort_by_key=False), hw.finish(sort_by_key=False)

    for start_mode in (0, 1, 2):
        for csm, cem, minl, maxl, gaps in ((2, 2, 1, 10**6, 10**9),
                                           (1, 0, 3, 12, 0),
                                           (0, 2, 0, 10**6, 1)):
            kw = dict(min_length=minl, max_length=maxl, max_gaps=gaps,
                      start_mode=start_mode, contig_start_mode=csm,
                      contig_end_mode=cem)
            got_s, got_h = orf_mod.extract_orfs(db, chunk_cells=2000, **kw)
            exp_s, exp_h = scalar_extract(db, **kw)
            assert got_s.size == exp_s.size, (start_mode, csm, cem)
            assert np.array_equal(got_s.data, exp_s.data), (start_mode, csm)
            assert np.array_equal(got_h.data, exp_h.data), (start_mode, csm)
