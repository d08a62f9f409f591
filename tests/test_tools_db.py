"""Byte-parity tests for the batch-2 DB utility tools against the reference
binary (/tmp/refbuild/src/plass). Each test runs the reference tool and ours
on the same inputs and compares the output DB (data + index) byte-for-byte.
"""
import os
import subprocess

import numpy as np
import pytest

from plass_tpu.data import seqdb

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
def seq_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("dbs")
    fasta = d / "in.fasta"
    rows = [
        (">s0 first", "MKLVAGTREWQPLHIDCNSFYMKLVAGTREWQPLHIDCNSFY"),
        (">s1 second", "ACDEFGHIKLMNPQRSTVWYACDEFGHIKLMNPQRSTVWYACDEF"),
        (">s2", "PPPPPPPPPPPPPPPPPPPPPPPPPPPPPPPPPPPPPPPP"),
        (">s3 x", "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"),
    ]
    fasta.write_text("".join(f"{h}\n{s}\n" for h, s in rows))
    db = str(d / "seq")
    run_ref("createdb", fasta, db)
    return db


@pytest.fixture(scope="module")
def nucl_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("ndbs")
    fasta = d / "in.fasta"
    rows = [
        (">n0", "ACGTACGTTGCAACGTGGGCCCTTTAAACGT"),
        (">n1", "TTTTACGCGCGCGCGACGTACGTACGATCGATCGAAAA"),
        (">n2", "GGGGGGGGGGGGGGGGGGGGCCCCCCCCCCCCCCC"),
    ]
    fasta.write_text("".join(f"{h}\n{s}\n" for h, s in rows))
    db = str(d / "nucl")
    run_ref("createdb", fasta, db)
    return db


@needs_ref
def test_createdb_lookup_parity(tmp_path, seq_db):
    fasta = tmp_path / "in.fasta"
    fasta.write_text(">a1 hello\nMKLV\n>a2\nACDE\n")
    run_ref("createdb", fasta, tmp_path / "ref")
    run_ours("createdb", fasta, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))
    assert (tmp_path / "ref.lookup").read_bytes() == (tmp_path / "ours.lookup").read_bytes()
    assert (tmp_path / "ref.source").read_bytes() == (tmp_path / "ours.source").read_bytes()


@needs_ref
def test_compress_interop(tmp_path, seq_db):
    # ours compress -> reference decompress roundtrips
    run_ours("compress", seq_db, tmp_path / "c_ours")
    run_ref("decompress", tmp_path / "c_ours", tmp_path / "d_ref", "--threads", "1")
    assert db_bytes(str(tmp_path / "d_ref")) == db_bytes(seq_db)
    # reference compress -> ours decompress roundtrips
    run_ref("compress", seq_db, tmp_path / "c_ref", "--threads", "1")
    run_ours("decompress", tmp_path / "c_ref", tmp_path / "d_ours")
    assert db_bytes(str(tmp_path / "d_ours")) == db_bytes(seq_db)
    # our SeqDB.open transparently decompresses
    db = seqdb.SeqDB.open(str(tmp_path / "c_ref"))
    orig = seqdb.SeqDB.open(seq_db)
    assert [db.get_seq_bytes(i) for i in range(db.size)] == \
        [orig.get_seq_bytes(i) for i in range(orig.size)]


@needs_ref
def test_dbtype_parity(seq_db, nucl_db):
    for db in (seq_db, nucl_db, seq_db + "_h"):
        # dbtype accepts no flags (parseParameters(..., false, 0, 0))
        ref = subprocess.run([REF, "dbtype", db], capture_output=True,
                             check=True).stdout
        ours = run_ours("dbtype", db).stdout
        assert ours.strip() == ref.strip()


@needs_ref
def test_view_parity(seq_db):
    ref = run_ref("view", seq_db, "--id-list", "1,3").stdout
    ours = run_ours("view", seq_db, "--id-list", "1,3").stdout
    assert ours == ref


@needs_ref
def test_renamedbkeys_parity(tmp_path, seq_db):
    order = tmp_path / "order.tsv"
    order.write_text("0\t10\n1\t11\n2\t12\n3\t13\n")
    run_ref("renamedbkeys", order, seq_db, tmp_path / "ref", "--threads", "1")
    run_ours("renamedbkeys", order, seq_db, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))
    assert db_bytes(str(tmp_path / "ref_h")) == db_bytes(str(tmp_path / "ours_h"))


@needs_ref
def test_suffixid_parity(tmp_path, seq_db):
    run_ref("suffixid", seq_db + "_h", tmp_path / "ref", "--threads", "1")
    run_ours("suffixid", seq_db + "_h", tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_unpackdb_parity(tmp_path, seq_db):
    run_ref("unpackdb", seq_db, tmp_path / "ref")
    run_ours("unpackdb", seq_db, tmp_path / "ours")
    ref_files = sorted(os.listdir(tmp_path / "ref"))
    our_files = sorted(os.listdir(tmp_path / "ours"))
    assert ref_files == our_files
    for f in ref_files:
        assert (tmp_path / "ref" / f).read_bytes() == (tmp_path / "ours" / f).read_bytes()


@needs_ref
def test_countkmer_parity(nucl_db, seq_db):
    # countkmer's param list has no --threads/-v
    ref = subprocess.run([REF, "countkmer", nucl_db, "-k", "3"],
                         capture_output=True, check=True).stdout
    ours = run_ours("countkmer", nucl_db, "-k", "3").stdout
    assert ours == ref
    ref = subprocess.run([REF, "countkmer", seq_db, "-k", "2"],
                         capture_output=True, check=True).stdout
    ours = run_ours("countkmer", seq_db, "-k", "2").stdout
    assert ours == ref


@needs_ref
def test_masksequence_parity(tmp_path, nucl_db, seq_db):
    for i, db in enumerate((nucl_db, seq_db)):
        run_ref("masksequence", db, tmp_path / f"ref{i}", "--threads", "1")
        run_ours("masksequence", db, tmp_path / f"ours{i}")
        assert db_bytes(str(tmp_path / f"ref{i}")) == db_bytes(str(tmp_path / f"ours{i}"))


@needs_ref
def test_translateaa_parity(tmp_path, seq_db):
    run_ref("translateaa", seq_db, tmp_path / "ref", "--threads", "1")
    run_ours("translateaa", seq_db, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@pytest.fixture(scope="module")
def aln_db(tmp_path_factory, seq_db):
    """Alignment DB produced by the reference search pipeline."""
    d = tmp_path_factory.mktemp("aln")
    out = str(d / "aln")
    run_ref("kmermatcher", seq_db, d / "pref", "-k", "6",
            "--kmer-per-seq", "30", "--threads", "1", "--hash-shift", "5")
    run_ref("rescorediagonal", seq_db, seq_db, d / "pref", out,
            "--rescore-mode", "3", "-e", "10000", "--threads", "1")
    return out


@needs_ref
def test_summarizeresult_parity(tmp_path, aln_db):
    run_ref("summarizeresult", aln_db, tmp_path / "ref", "--threads", "1")
    run_ours("summarizeresult", aln_db, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_extractalignedregion_parity(tmp_path, seq_db, aln_db):
    run_ref("extractalignedregion", seq_db, seq_db, aln_db, tmp_path / "ref",
            "--threads", "1")
    run_ours("extractalignedregion", seq_db, seq_db, aln_db, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))
