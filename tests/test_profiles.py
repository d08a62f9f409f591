"""Byte-parity tests for the profile/MSA subsystem against the reference
binary: result2profile, profile2pssm, profile2consensus, profile2repseq,
result2msa, filterresult, msa2profile.
"""
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


@pytest.fixture(scope="module")
def search_result(tmp_path_factory):
    """Self-search alignment DB with backtraces over a protein family."""
    d = tmp_path_factory.mktemp("prof")
    rng = np.random.RandomState(11)
    alphabet = list("ACDEFGHIKLMNPQRSTVWY")
    base = "".join(rng.choice(alphabet, 120))
    rows = []
    for i in range(8):
        mut = list(base)
        for j in rng.choice(len(base), 18, replace=False):
            mut[j] = rng.choice(alphabet)
        # some indels for non-trivial backtraces
        if i % 3 == 1:
            del mut[40:43]
        if i % 3 == 2:
            mut[60:60] = list(rng.choice(alphabet, 4))
        rows.append((f">p{i}", "".join(mut)))
    fasta = d / "in.fasta"
    fasta.write_text("".join(f"{h}\n{s}\n" for h, s in rows))
    db = str(d / "seq")
    aln = str(d / "aln")
    run_ref("createdb", fasta, db)
    run_ref("kmermatcher", db, d / "pref", "-k", "6",
            "--kmer-per-seq", "60", "--threads", "1")
    run_ref("align", db, db, d / "pref", aln, "-a", "-e", "10000",
            "--threads", "1")
    return db, aln


@needs_ref
def test_result2profile_parity(tmp_path, search_result):
    db, aln = search_result
    run_ref("result2profile", db, db, aln, tmp_path / "ref", "--threads", "1")
    run_ours("result2profile", db, db, aln, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@pytest.fixture(scope="module")
def profile_db(tmp_path_factory, search_result):
    db, aln = search_result
    d = tmp_path_factory.mktemp("profdb")
    out = str(d / "prof")
    run_ref("result2profile", db, db, aln, out, "--threads", "1")
    return out


@needs_ref
def test_profile2pssm_parity(tmp_path, profile_db):
    run_ref("profile2pssm", profile_db, tmp_path / "ref.tsv", "--threads", "1")
    run_ours("profile2pssm", profile_db, tmp_path / "ours.tsv")
    assert (tmp_path / "ref.tsv").read_bytes() == (tmp_path / "ours.tsv").read_bytes()
    run_ref("profile2pssm", profile_db, tmp_path / "refdb", "--db-output", "--threads", "1")
    run_ours("profile2pssm", profile_db, tmp_path / "oursdb", "--db-output")
    assert db_bytes(str(tmp_path / "refdb")) == db_bytes(str(tmp_path / "oursdb"))


@needs_ref
def test_profile2seq_parity(tmp_path, profile_db):
    for cmd in ("profile2consensus", "profile2repseq"):
        run_ref(cmd, profile_db, tmp_path / f"ref_{cmd}", "--threads", "1")
        run_ours(cmd, profile_db, tmp_path / f"ours_{cmd}")
        assert db_bytes(str(tmp_path / f"ref_{cmd}")) == \
            db_bytes(str(tmp_path / f"ours_{cmd}")), cmd


@needs_ref
def test_filterresult_parity(tmp_path, search_result):
    db, aln = search_result
    run_ref("filterresult", db, db, aln, tmp_path / "ref", "--threads", "1")
    run_ours("filterresult", db, db, aln, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_result2msa_parity(tmp_path, search_result):
    db, aln = search_result
    run_ref("result2msa", db, db, aln, tmp_path / "ref", "--threads", "1")
    run_ours("result2msa", db, db, aln, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_result2msa_filtered_parity(tmp_path, search_result):
    db, aln = search_result
    run_ref("result2msa", db, db, aln, tmp_path / "ref", "--threads", "1",
            "--filter-msa", "1")
    run_ours("result2msa", db, db, aln, tmp_path / "ours", "--filter-msa", "1")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_msa2profile_parity(tmp_path, search_result):
    db, aln = search_result
    msa = tmp_path / "msa"
    run_ref("result2msa", db, db, aln, msa, "--threads", "1")
    run_ref("msa2profile", msa, tmp_path / "ref", "--threads", "1")
    run_ours("msa2profile", msa, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_expandaln_parity(tmp_path, search_result):
    db, aln = search_result
    run_ref("expandaln", db, db, aln, aln, tmp_path / "ref", "--threads", "1")
    run_ours("expandaln", db, db, aln, aln, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_expand2profile_parity(tmp_path, search_result):
    db, aln = search_result
    run_ref("expand2profile", db, db, aln, aln, tmp_path / "ref", "--threads", "1")
    run_ours("expand2profile", db, db, aln, aln, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_summarizealis_parity(tmp_path, search_result):
    db, aln = search_result
    run_ref("summarizealis", aln, tmp_path / "ref", "--threads", "1")
    run_ours("summarizealis", aln, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_convertmsa_parity(tmp_path, search_result):
    db, aln = search_result
    sto = tmp_path / "flat.sto"
    run_ref("result2msa", db, db, aln, sto, "--msa-format-mode", "4",
            "--threads", "1")
    run_ref("convertmsa", sto, tmp_path / "ref")
    run_ours("convertmsa", sto, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_result2msa_stockholm_parity(tmp_path, search_result):
    db, aln = search_result
    run_ref("result2msa", db, db, aln, tmp_path / "ref.sto",
            "--msa-format-mode", "4", "--threads", "1")
    run_ours("result2msa", db, db, aln, tmp_path / "ours.sto",
             "--msa-format-mode", "4")
    assert (tmp_path / "ref.sto").read_bytes() == (tmp_path / "ours.sto").read_bytes()


@pytest.fixture(scope="module")
def nucl_search_result(tmp_path_factory):
    d = tmp_path_factory.mktemp("dnamsa")
    rng = np.random.RandomState(3)
    base = "".join(rng.choice(list("ACGT"), 150))
    rows = []
    for i in range(6):
        mut = list(base)
        for j in rng.choice(len(base), 10, replace=False):
            mut[j] = rng.choice(list("ACGT"))
        if i % 2:
            del mut[50:53]
        rows.append((f">n{i}", "".join(mut)))
    fasta = d / "in.fasta"
    fasta.write_text("".join(f"{h}\n{s}\n" for h, s in rows))
    db = str(d / "seq")
    aln = str(d / "aln")
    run_ref("createdb", fasta, db)
    run_ref("kmermatcher", db, d / "pref", "-k", "15",
            "--kmer-per-seq", "60", "--threads", "1")
    run_ref("align", db, db, d / "pref", aln, "-a", "-e", "10000",
            "--threads", "1")
    return db, aln


@needs_ref
def test_result2dnamsa_parity(tmp_path, nucl_search_result):
    db, aln = nucl_search_result
    run_ref("result2dnamsa", db, db, aln, tmp_path / "ref", "--threads", "1")
    run_ours("result2dnamsa", db, db, aln, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_profile2cs_parity(tmp_path, profile_db):
    run_ref("profile2cs", profile_db, tmp_path / "ref", "--threads", "1")
    run_ours("profile2cs", profile_db, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))
    assert db_bytes(str(tmp_path / "ref.255")) == \
        db_bytes(str(tmp_path / "ours.255"))


@needs_ref
def test_convertca3m_parity(tmp_path, search_result):
    db, aln = search_result
    ca = str(tmp_path / "ca3m")
    run_ref("result2msa", db, db, aln, ca, "--msa-format-mode", "1",
            "--threads", "1")
    # the ca3m triplet has no base .dbtype; the CLI validator wants one
    import shutil
    shutil.copy(ca + "_ca3m.ffdata.dbtype", ca + ".dbtype")
    run_ref("convertca3m", ca, tmp_path / "ref", "--threads", "1")
    run_ours("convertca3m", ca, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@pytest.fixture(scope="module")
def hhm_db(tmp_path_factory):
    """Synthetic HH-suite .hhm flat-file ffindex DB."""
    import random
    d = tmp_path_factory.mktemp("hhm")
    rng = random.Random(7)

    def rec(name, seq):
        lines = ["HHsearch 1.5", f"NAME  {name} test protein family",
                 "FAM   ", ">Consensus", seq.lower(),
                 f">{name} query header", seq, "#",
                 "NULL   3706 5728 4211 4064 4839 3729 4763 4308 4069 3323 "
                 "5509 4640 4464 4937 4285 4423 3815 3783 6325 4665",
                 "HMM    A\tC\tD\tE\tF\tG\tH\tI\tK\tL\tM\tN\tP\tQ\tR\tS\tT\tV\tW\tY",
                 "       M->M\tM->I\tM->D\tI->M\tI->I\tD->M\tD->D\tNeff\tNeff_I\tNeff_D",
                 "       0\t*\t*\t0\t*\t0\t*\t*\t*\t*"]
        for pos, aa in enumerate(seq, 1):
            vals = []
            for _ in range(20):
                r = rng.random()
                vals.append("*" if r < 0.1 else
                            "0" if r < 0.15 else str(rng.randint(1, 12000)))
            lines.append(aa + " " + str(pos) + "\t" + "\t".join(vals) +
                         "\t" + str(pos))
            lines.append("       0\t*\t*\t*\t*\t*\t*\t" +
                         str(rng.randint(1000, 9000)) + "\t0\t0")
            lines.append("")
        lines.append("//")
        return "\n".join(lines) + "\n"

    data = b""
    index = []
    for name, seq in [("prot1", "ACDEFGHIKLMNPQRSTVWY"),
                      ("prot2", "MKVLAWYTTGH"), ("prot3", "GGSSLLKKRRE")]:
        blob = rec(name, seq).encode() + b"\x00"
        index.append((f"{name}.hhm", len(data), len(blob)))
        data += blob
    (d / "hhmdb.ffdata").write_bytes(data)
    (d / "hhmdb.ffindex").write_text(
        "".join(f"{k}\t{o}\t{l}\n" for k, o, l in index))
    return str(d / "hhmdb")


@needs_ref
def test_convertprofiledb_parity(tmp_path, hhm_db):
    run_ref("convertprofiledb", hhm_db, tmp_path / "ref", "--threads", "1")
    run_ours("convertprofiledb", hhm_db, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))
    assert db_bytes(str(tmp_path / "ref_h")) == \
        db_bytes(str(tmp_path / "ours_h"))


@needs_ref
def test_msa2result_parity(tmp_path, search_result):
    # NOTE: with the default --match-mode 0 the reference reads an
    # UNINITIALIZED maskedColumns buffer (the fill loop is commented out,
    # msa2result.cpp:277-287) — usually zero pages, but a dirty heap chunk
    # makes its own output nondeterministic. If the reference disagrees
    # with itself across two runs, skip that sub-case.
    db, aln = search_result
    msadb = str(tmp_path / "msadb")
    run_ref("result2msa", db, db, aln, msadb, "--threads", "1")
    for extra in ([], ["--match-mode", "1"], ["--skip-query"]):
        tag = "_".join(extra) or "default"
        run_ref("msa2result", msadb, tmp_path / f"rs{tag}",
                tmp_path / f"rr{tag}", "--threads", "1", *extra)
        run_ours("msa2result", msadb, tmp_path / f"os{tag}",
                 tmp_path / f"or{tag}", *extra)
        same = (db_bytes(str(tmp_path / f"rs{tag}")) ==
                db_bytes(str(tmp_path / f"os{tag}")) and
                db_bytes(str(tmp_path / f"rs{tag}_h")) ==
                db_bytes(str(tmp_path / f"os{tag}_h")) and
                db_bytes(str(tmp_path / f"rr{tag}")) ==
                db_bytes(str(tmp_path / f"or{tag}")))
        if not same:
            run_ref("msa2result", msadb, tmp_path / f"rs2{tag}",
                    tmp_path / f"rr2{tag}", "--threads", "1", *extra)
            if db_bytes(str(tmp_path / f"rr{tag}")) != \
                    db_bytes(str(tmp_path / f"rr2{tag}")):
                continue  # reference UB: nondeterministic with itself
        assert same, extra


@needs_ref
def test_msa2profile_match_modes(tmp_path, search_result):
    db, aln = search_result
    msadb = str(tmp_path / "msadb")
    run_ref("result2msa", db, db, aln, msadb, "--threads", "1")
    for mm in ("0", "1"):
        run_ref("msa2profile", msadb, tmp_path / f"ref{mm}",
                "--match-mode", mm, "--threads", "1")
        run_ours("msa2profile", msadb, tmp_path / f"ours{mm}",
                 "--match-mode", mm)
        assert db_bytes(str(tmp_path / f"ref{mm}")) == \
            db_bytes(str(tmp_path / f"ours{mm}")), mm
        assert db_bytes(str(tmp_path / f"ref{mm}_h")) == \
            db_bytes(str(tmp_path / f"ours{mm}_h")), mm
