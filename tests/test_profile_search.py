"""Byte-parity tests for the profile-search subsystem against the
reference binary: profile-query prefilter/align, --realign, iterative
(PSI-BLAST style) search, sliced target-profile search, expandaln with a
profile A-database, and the enrich workflow (reference's is broken as
shipped; tested for self-consistency)."""
import os
import subprocess

import numpy as np
import pytest

REF = "/tmp/refbuild/src/plass"
OURS = os.path.join(os.path.dirname(__file__), "..", "bin", "plass")

needs_ref = pytest.mark.skipif(not os.path.exists(REF),
                               reason="reference binary not built")


def run_ref(*args):
    return subprocess.run([REF, *[str(a) for a in args], "-v", "0"],
                          capture_output=True, check=True)


def run_ours(*args):
    return subprocess.run([OURS, *[str(a) for a in args]],
                          capture_output=True, check=True)


def db_bytes(path):
    with open(path, "rb") as f:
        data = f.read()
    with open(path + ".index", "rb") as f:
        index = f.read()
    return data, index


def _family(rng, base, n, alphabet):
    rows = []
    for i in range(n):
        mut = list(base)
        for j in rng.choice(len(base), 18, replace=False):
            mut[j] = rng.choice(alphabet)
        if i % 3 == 1:
            del mut[40:43]
        if i % 3 == 2:
            mut[60:60] = list(rng.choice(alphabet, 4))
        rows.append("".join(mut))
    return rows


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    """Target seq DB, its self-search aln, a profile DB built from it, and
    a separate query seq DB drawn from the same families."""
    d = tmp_path_factory.mktemp("psearch")
    rng = np.random.RandomState(7)
    alphabet = list("ACDEFGHIKLMNPQRSTVWY")
    bases = ["".join(rng.choice(alphabet, 120)) for _ in range(2)]
    trows = _family(rng, bases[0], 6, alphabet) + \
        _family(rng, bases[1], 6, alphabet)
    qrows = _family(rng, bases[0], 2, alphabet) + \
        _family(rng, bases[1], 2, alphabet)
    (d / "t.fasta").write_text(
        "".join(f">t{i}\n{s}\n" for i, s in enumerate(trows)))
    (d / "q.fasta").write_text(
        "".join(f">q{i}\n{s}\n" for i, s in enumerate(qrows)))
    tdb, qdb = str(d / "t"), str(d / "q")
    run_ref("createdb", d / "t.fasta", tdb)
    run_ref("createdb", d / "q.fasta", qdb)
    aln = str(d / "taln")
    run_ref("kmermatcher", tdb, d / "tpref", "-k", "6",
            "--kmer-per-seq", "60", "--threads", "1")
    run_ref("align", tdb, tdb, d / "tpref", aln, "-a", "-e", "10000",
            "--threads", "1")
    prof = str(d / "prof")
    run_ref("result2profile", tdb, tdb, aln, prof, "--threads", "1")
    return qdb, tdb, aln, prof


@needs_ref
def test_profile_query_prefilter_parity(tmp_path, dbs):
    """Profile queries through the k-mer prefilter: mapProfile scores,
    per-position ranked candidate enumeration, truncated rescale path."""
    qdb, tdb, aln, prof = dbs
    run_ref("prefilter", prof, tdb, tmp_path / "ref", "-s", "4.0",
            "--threads", "1")
    run_ours("prefilter", prof, tdb, tmp_path / "ours", "-s", "4.0")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_profile_query_align_parity(tmp_path, dbs):
    """Profile-query gapped alignment: SSW profile mode + banded cigar."""
    qdb, tdb, aln, prof = dbs
    run_ref("prefilter", prof, tdb, tmp_path / "pref", "-s", "4.0",
            "--threads", "1")
    run_ref("align", prof, tdb, tmp_path / "pref", tmp_path / "ref",
            "-a", "-e", "10000", "--threads", "1")
    run_ours("align", prof, tdb, tmp_path / "pref", tmp_path / "ours",
             "-a", "-e", "10000")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_realign_parity(tmp_path, dbs):
    """--realign: SCORE_ONLY first pass, blosum62(2.0,-0.2) re-backtrace
    keeping first-pass score/eval (Alignment.cpp realign path)."""
    qdb, tdb, aln, prof = dbs
    run_ref("prefilter", qdb, tdb, tmp_path / "pref", "-s", "4.0",
            "--threads", "1")
    run_ref("align", qdb, tdb, tmp_path / "pref", tmp_path / "ref",
            "-a", "--realign", "-e", "10000", "--threads", "1")
    run_ours("align", qdb, tdb, tmp_path / "pref", tmp_path / "ours",
             "-a", "--realign", "-e", "10000")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_iterative_search_parity(tmp_path, dbs):
    """--num-iterations 2: profile-boosted second round with result
    merging and previous-hit subtraction (blastpgp.sh)."""
    qdb, tdb, aln, prof = dbs
    run_ref("search", qdb, tdb, tmp_path / "ref", tmp_path / "rtmp",
            "--num-iterations", "2", "-s", "4.0", "--threads", "1")
    run_ours("search", qdb, tdb, tmp_path / "ours", tmp_path / "otmp",
             "--num-iterations", "2", "-s", "4.0")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_targetprofile_search_parity(tmp_path, dbs):
    """Sequence queries vs profile targets, default mode
    (searchtargetprofile.sh): profile-target prefilter (k=5, target-side
    k-mer expansion, consensus diagonal rescoring), swap, profile-query
    align, swap back."""
    qdb, tdb, aln, prof = dbs
    run_ref("search", qdb, prof, tmp_path / "ref", tmp_path / "rtmp",
            "-s", "4.0", "--threads", "1")
    run_ours("search", qdb, prof, tmp_path / "ours", tmp_path / "otmp",
             "-s", "4.0")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_sliced_profile_search_parity(tmp_path, dbs):
    """Sequence queries vs profile targets, --exhaustive-search (sliced):
    profiles run as queries, results swapped back, eval rescaled by db
    sizes."""
    qdb, tdb, aln, prof = dbs
    run_ref("search", qdb, prof, tmp_path / "ref", tmp_path / "rtmp",
            "-s", "4.0", "--threads", "1", "--exhaustive-search")
    run_ours("search", qdb, prof, tmp_path / "ours", tmp_path / "otmp",
             "-s", "4.0", "--exhaustive-search")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_expandaln_profile_a_parity(tmp_path, dbs):
    """expandaln with a profile A-database scores M states through
    profile_for_alignment (expandaln.cpp:46)."""
    qdb, tdb, aln, prof = dbs
    # profile -> target-seq alignments as the AB edge
    run_ref("prefilter", prof, tdb, tmp_path / "pref", "-s", "4.0",
            "--threads", "1")
    run_ref("align", prof, tdb, tmp_path / "pref", tmp_path / "ab",
            "-a", "-e", "10000", "--threads", "1")
    run_ref("expandaln", prof, tdb, tmp_path / "ab", aln,
            tmp_path / "ref", "--threads", "1")
    run_ours("expandaln", prof, tdb, tmp_path / "ab", aln,
             tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_enrich_runs_and_reference_is_broken(tmp_path, dbs):
    """The reference enrich dies on its own argument count (4-path
    validator vs 6-arg enrich.sh); ours follows the enrich.sh data flow
    and must produce hits for every query."""
    qdb, tdb, aln, prof = dbs
    r = subprocess.run(
        [REF, "enrich", qdb, tdb, prof, aln, str(tmp_path / "refout"),
         str(tmp_path / "rtmp"), "-v", "0"], capture_output=True)
    assert r.returncode != 0  # broken as shipped
    run_ours("enrich", qdb, tdb, prof, aln, tmp_path / "ours",
             tmp_path / "otmp", "--num-iterations", "2")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from plass_tpu.data import seqdb
    db = seqdb.SeqDB.open(str(tmp_path / "ours"))
    assert db.size == 4
    for i in range(db.size):
        assert db.get_data(i).tobytes().strip(b"\n\x00")


@needs_ref
def test_convertkb_parity(tmp_path):
    """UniProtKB flat-file conversion (convertkb.cpp column split)."""
    kb = tmp_path / "sample.dat"
    kb.write_text(
        "ID   TESTP_HUMAN             Reviewed;         120 AA.\n"
        "AC   P99999; Q88888;\n"
        "DT   01-JAN-2020, integrated into UniProtKB/Swiss-Prot.\n"
        "DE   RecName: Full=Test protein;\n"
        "GN   Name=TST1;\n"
        "OS   Homo sapiens (Human).\n"
        "OC   Eukaryota; Metazoa.\n"
        "OX   NCBI_TaxID=9606;\n"
        "CC   -!- FUNCTION: Does test things.\n"
        "DR   Pfam; PF00001; Tst; 1.\n"
        "PE   1: Evidence at protein level;\n"
        "KW   Test; Protein.\n"
        "FT   CHAIN           1..120\n"
        "SQ   SEQUENCE   12 AA;  1357 MW;  ABCDEF0123456789 CRC64;\n"
        "     MKTAYIAKQR QI\n"
        "//\n")
    run_ref("convertkb", kb, tmp_path / "ref")
    run_ours("convertkb", kb, tmp_path / "ours")
    for suf in ("_AC",):
        assert db_bytes(str(tmp_path / "ref") + suf) == \
            db_bytes(str(tmp_path / "ours") + suf)


@needs_ref
def test_createindex_search_parity(tmp_path, dbs):
    """search with a precomputed target index (createindex) must equal
    both the index-free run and the reference."""
    import shutil
    qdb, tdb, aln, prof = dbs
    run_ref("search", qdb, tdb, tmp_path / "ref", tmp_path / "rtmp",
            "-s", "4.0", "--threads", "1")
    # copy the target DB so the .idx lands in tmp_path
    t2 = str(tmp_path / "t")
    for suf in ("", ".index", ".dbtype", "_h", "_h.index", "_h.dbtype"):
        shutil.copy(tdb + suf, t2 + suf)
    run_ours("createindex", t2, tmp_path / "itmp", "-s", "4.0")
    assert os.path.exists(t2 + ".idx.npz")
    run_ours("search", qdb, t2, tmp_path / "ours", tmp_path / "otmp",
             "-s", "4.0")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


def test_databases_listing():
    """databases with no args prints the catalog."""
    r = subprocess.run([OURS, "databases"], capture_output=True)
    assert r.returncode == 0
    out = r.stdout.decode()
    assert "UniProtKB/Swiss-Prot" in out and "PDB" in out
