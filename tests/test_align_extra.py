"""Byte-parity tests for transitivealign and alignbykmer against the
reference binary (skipped when /tmp/refbuild is absent)."""
import os
import subprocess

import numpy as np
import pytest

REF = "/tmp/refbuild/src/plass"
OURS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "bin", "plass")

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
def protein_search(tmp_path_factory):
    d = tmp_path_factory.mktemp("ta")
    rng = np.random.RandomState(11)
    alphabet = list("ACDEFGHIKLMNPQRSTVWY")
    base = "".join(rng.choice(alphabet, 120))
    rows = []
    for i in range(8):
        mut = list(base)
        for j in rng.choice(len(base), 18, replace=False):
            mut[j] = rng.choice(alphabet)
        if i % 3 == 1:
            del mut[40:43]
        if i % 3 == 2:
            mut[60:60] = list(rng.choice(alphabet, 4))
        rows.append((f">p{i}", "".join(mut)))
    fasta = d / "in.fasta"
    fasta.write_text("".join(f"{h}\n{s}\n" for h, s in rows))
    db = str(d / "seq")
    run_ref("createdb", fasta, db)
    run_ref("kmermatcher", db, d / "pref", "-k", "6",
            "--kmer-per-seq", "60", "--threads", "1")
    run_ref("align", db, db, d / "pref", d / "aln", "-a", "-e", "10000",
            "--threads", "1")
    return db, str(d / "pref"), str(d / "aln")


@pytest.fixture(scope="module")
def nucl_search(tmp_path_factory):
    d = tmp_path_factory.mktemp("abk")
    rng = np.random.RandomState(5)
    base = "".join(rng.choice(list("ACGT"), 300))
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rows = []
    for i in range(10):
        mut = list(base)
        for j in rng.choice(len(base), 20, replace=False):
            mut[j] = rng.choice(list("ACGT"))
        if i % 3 == 1:
            del mut[100:107]
        if i % 3 == 2:
            mut[200:200] = list(rng.choice(list("ACGT"), 5))
        s = "".join(mut)
        if i % 4 == 3:
            s = "".join(comp[c] for c in reversed(s))
        rows.append((f">n{i}", s))
    fasta = d / "in.fasta"
    fasta.write_text("".join(f"{h}\n{s}\n" for h, s in rows))
    db = str(d / "seq")
    run_ref("createdb", fasta, db)
    run_ref("kmermatcher", db, d / "pref", "-k", "15",
            "--kmer-per-seq", "60", "--threads", "1")
    return db, str(d / "pref")


@needs_ref
def test_transitivealign_parity(tmp_path, protein_search):
    db, pref, aln = protein_search
    run_ref("transitivealign", db, aln, tmp_path / "ref", "--threads", "1")
    run_ours("transitivealign", db, aln, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_alignbykmer_protein_parity(tmp_path, protein_search):
    db, pref, aln = protein_search
    run_ref("alignbykmer", db, db, pref, tmp_path / "ref", "--threads", "1")
    run_ours("alignbykmer", db, db, pref, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_alignbykmer_nucl_parity(tmp_path, nucl_search):
    db, pref = nucl_search
    run_ref("alignbykmer", db, db, pref, tmp_path / "ref", "--threads", "1")
    run_ours("alignbykmer", db, db, pref, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))
