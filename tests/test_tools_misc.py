"""Byte-parity tests for clusthash, ungappedprefilter, alignall and easy-rbh
against the reference binary (/tmp/refbuild/src/plass)."""
import os
import subprocess

import pytest

REF = "/tmp/refbuild/src/plass"
OURS = os.path.join(os.path.dirname(__file__), "..", "bin", "plass")
GOLDENSEARCH = "/tmp/goldensearch"

needs_ref = pytest.mark.skipif(not os.path.exists(REF),
                               reason="reference binary not built")
needs_fixture = pytest.mark.skipif(not os.path.exists(GOLDENSEARCH),
                                   reason="goldensearch fixture missing")


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
def aa_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("misc_aa")
    fasta = d / "in.fasta"
    rows = [
        (">s0", "MKLVAGTREWQPLHIDCNSFYMKLVAGTREWQPLHIDCNSFY"),
        (">s1", "MKLVAGTREWQPLHIDCNSFYMKLVAGTREWQPLHIDCNSFY"),
        (">s2", "MKLVAGTREWQPLHIDCNSFYMKLVAGTREWQALHIDCNSFY"),
        (">s3", "ACDEFGHIKLMNPQRSTVWYACDEFGHIKLMNPQRSTVWYACDEF"),
        (">s4", "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"),
        # NOT low-complexity: a poly-P singleton makes the reference's
        # alignall -a self-alignment read uninitialized memory and emit
        # a flaky degenerate record (score 4, 0M backtrace, denormal
        # E-value) — the oracle itself is non-deterministic there
        (">s5", "GLNWSEVARDMGVKTAEHICRELIQGDRFTPEQAK"),
    ]
    fasta.write_text("".join(f"{h}\n{s}\n" for h, s in rows))
    db = str(d / "seq")
    run_ref("createdb", fasta, db)
    return db


@pytest.fixture(scope="module")
def nucl_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("misc_nucl")
    fasta = d / "in.fasta"
    rows = [
        (">n0", "ACGTACGTTGCAACGTGGGCCCTTTAAACGT"),
        (">n1", "ACGTTTAAAGGGCCCACGTTGCAACGTACGT"),
        (">n2", "TTTTACGCGCGCGCGACGTACGTACGATCGATCGAAAA"),
        (">n3", "ACGTACGTTGCAACGTGGGCCCTTTAAACGT"),
    ]
    fasta.write_text("".join(f"{h}\n{s}\n" for h, s in rows))
    db = str(d / "seq")
    run_ref("createdb", fasta, db)
    return db


@needs_ref
def test_clusthash_aa(aa_db, tmp_path):
    run_ref("clusthash", aa_db, tmp_path / "ref", "--threads", 1)
    run_ours("clusthash", aa_db, tmp_path / "my", "--threads", 1)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


@needs_ref
def test_clusthash_nucl(nucl_db, tmp_path):
    run_ref("clusthash", nucl_db, tmp_path / "ref", "--threads", 1)
    run_ours("clusthash", nucl_db, tmp_path / "my", "--threads", 1)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


@needs_ref
def test_ungappedprefilter_aa(aa_db, tmp_path):
    run_ref("ungappedprefilter", aa_db, aa_db, tmp_path / "ref",
            "--threads", 1)
    run_ours("ungappedprefilter", aa_db, aa_db, tmp_path / "my",
             "--threads", 1)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


@needs_ref
def test_ungappedprefilter_nucl(nucl_db, tmp_path):
    run_ref("ungappedprefilter", nucl_db, nucl_db, tmp_path / "ref",
            "--threads", 1)
    run_ours("ungappedprefilter", nucl_db, nucl_db, tmp_path / "my",
             "--threads", 1)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


@needs_ref
@needs_fixture
def test_ungappedprefilter_qt(tmp_path):
    q = os.path.join(GOLDENSEARCH, "q")
    t = os.path.join(GOLDENSEARCH, "t")
    run_ref("ungappedprefilter", q, t, tmp_path / "ref", "--threads", 1)
    run_ours("ungappedprefilter", q, t, tmp_path / "my", "--threads", 1)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


@pytest.fixture(scope="module")
def clu_sets(tmp_path_factory, aa_db):
    """A small result DB listing per-entry key sets (cluster format)."""
    d = tmp_path_factory.mktemp("misc_sets")
    from plass_tpu.data import seqdb
    w = seqdb.DBWriter(seqdb.CLUSTER_RES if hasattr(seqdb, "CLUSTER_RES")
                       else seqdb.GENERIC_DB)
    w.write(0, b"0\n1\n2\n", add_newline=False)
    w.write(3, b"3\n4\n", add_newline=False)
    w.write(5, b"5\n", add_newline=False)
    path = str(d / "clu")
    w.finish().save(path)
    return path


@needs_ref
def test_alignall(aa_db, clu_sets, tmp_path):
    run_ref("alignall", aa_db, clu_sets, tmp_path / "ref", "--threads", 1)
    run_ours("alignall", aa_db, clu_sets, tmp_path / "my", "--threads", 1)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


@needs_ref
def test_alignall_backtrace(aa_db, clu_sets, tmp_path):
    run_ref("alignall", aa_db, clu_sets, tmp_path / "ref", "--threads", 1,
            "-a")
    run_ours("alignall", aa_db, clu_sets, tmp_path / "my", "--threads", 1,
             "-a")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


@needs_ref
@needs_fixture
def test_easy_rbh(tmp_path):
    qf = os.path.join(GOLDENSEARCH, "q.fasta")
    tf = os.path.join(GOLDENSEARCH, "t.fasta")
    run_ref("easy-rbh", qf, tf, tmp_path / "ref.tsv", tmp_path / "reftmp",
            "--threads", 1)
    run_ours("easy-rbh", qf, tf, tmp_path / "my.tsv", tmp_path / "mytmp",
             "--threads", 1)
    assert (tmp_path / "ref.tsv").read_bytes() \
        == (tmp_path / "my.tsv").read_bytes()


def test_version():
    out = subprocess.run([OURS, "version"], capture_output=True, check=True)
    assert out.stdout.strip()


@pytest.fixture(scope="module")
def domain_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("misc_dom")
    from plass_tpu.data import seqdb
    w = seqdb.DBWriter(seqdb.GENERIC_DB)
    w.write(10, (b"q1\tP001\t99.0\t50\t0\t0\t5\t54\t1\t50\t1e-20\t100\n"
                 b"q1\tP002\t80.0\t40\t5\t0\t10\t49\t3\t42\t1e-10\t60\n"
                 b"q1\tP003\t70.0\t30\t8\t0\t60\t89\t1\t30\t1e-8\t50\n"),
            add_newline=False)
    w.write(20, b"q2\tP001\t95.0\t45\t2\t0\t2\t46\t4\t48\t5e-15\t80\n",
            add_newline=False)
    tab = str(d / "tab")
    w.finish().save(tab)
    lens = str(d / "len.tsv")
    with open(lens, "w") as f:
        f.write("10\t100\n20\t60\nP001\t55\nP002\t45\nP003\t35\n")
    return tab, lens


@needs_ref
def test_summarizetabs(domain_fixture, tmp_path):
    tab, lens = domain_fixture
    run_ref("summarizetabs", tab, lens, tmp_path / "ref", "--threads", 1,
            "-e", 0.001)
    run_ours("summarizetabs", tab, lens, tmp_path / "my", "--threads", 1,
             "-e", 0.001)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


@needs_ref
def test_extractdomains(tmp_path):
    from plass_tpu.data import seqdb
    w = seqdb.DBWriter(seqdb.ALIGNMENT_RES)
    w.write(10, (b"10\tP001\t4\t53\t100\t0\t49\t55\t1e-20\n"
                 b"10\tP003\t59\t88\t100\t0\t29\t35\t1e-08\n"),
            add_newline=False)
    dom = str(tmp_path / "dom")
    w.finish().save(dom)
    core = "MKLVAGTREWQPLHIDCNSFY" * 4 + "MKLVAGTREWQPLHID"
    msa = (f">q1 first\n{core}\n"
           f">m1 Split=1 \n{core[:14]}-{core[15:]}\n"
           f">m2\n{core[:32]}{core[32:43].lower()}{core[43:93]}--{core[95:]}\n"
           f">consensus_q1\n{core}\n")
    w = seqdb.DBWriter(seqdb.MSA_DB)
    w.write(10, msa.encode(), add_newline=False)
    msadb = str(tmp_path / "msa")
    w.finish().save(msadb)
    run_ref("extractdomains", dom, msadb, tmp_path / "ref", "--threads", 1,
            "-e", 1000, "-c", 0.0)
    run_ours("extractdomains", dom, msadb, tmp_path / "my", "--threads", 1,
             "-e", 1000, "-c", 0.0)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


@needs_ref
def test_extractdomains_ca3m(aa_db, tmp_path):
    """--msa-type 0: the MSA DB is a compressed-A3M ffindex triple decoded
    through CompressedA3M::extractA3M (extractdomains.cpp:219-233,273-277)."""
    from plass_tpu.data import seqdb
    aln = str(tmp_path / "aln")
    run_ref("kmermatcher", aa_db, tmp_path / "pref", "-k", 6,
            "--kmer-per-seq", 60, "--threads", 1)
    run_ref("align", aa_db, aa_db, tmp_path / "pref", aln, "-a",
            "-e", 10000, "--threads", 1)
    ca = str(tmp_path / "ca3m")
    run_ref("result2msa", aa_db, aa_db, aln, ca, "--msa-format-mode", "1",
            "--threads", "1")
    # the CLI path's dbtype must read MSA (11) to pass the reference's
    # input validator even in --msa-type 0 (ca3m) mode — the ca3m triple
    # itself is located via the _ca3m/_sequence/_header suffixes
    import struct
    with open(ca + ".dbtype", "wb") as f:
        f.write(struct.pack("<i", seqdb.MSA_DB))
    w = seqdb.DBWriter(seqdb.ALIGNMENT_RES)
    w.write(0, (b"0\tP001\t2\t35\t42\t0\t33\t40\t1e-20\n"
                b"0\tP003\t10\t40\t42\t0\t30\t35\t1e-08\n"),
            add_newline=False)
    w.write(3, b"3\tP009\t5\t40\t45\t2\t37\t44\t1e-12\n", add_newline=False)
    dom = str(tmp_path / "dom")
    w.finish().save(dom)
    run_ref("extractdomains", dom, ca, tmp_path / "ref", "--threads", 1,
            "-e", 1000, "-c", 0.0, "--msa-type", 0)
    run_ours("extractdomains", dom, ca, tmp_path / "my", "--threads", 1,
             "-e", 1000, "-c", 0.0, "--msa-type", 0)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))
