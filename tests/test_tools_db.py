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


@pytest.fixture(scope="module")
def contig_pipeline(tmp_path_factory):
    """Reference-built: nucl contigs -> ORFs -> translated ORFs -> aa
    self-search alignment (the offsetalignment input shape)."""
    d = tmp_path_factory.mktemp("offset")
    fasta = d / "contigs.fasta"
    rng = np.random.RandomState(7)
    rows = []
    base = "".join(rng.choice(list("ACGT"), 240))
    for i in range(6):
        mut = list(base)
        for j in rng.choice(len(base), 12, replace=False):
            mut[j] = rng.choice(list("ACGT"))
        rows.append((f">c{i}", "".join(mut)))
    fasta.write_text("".join(f"{h}\n{s}\n" for h, s in rows))
    contigs = str(d / "contigs")
    orfs = str(d / "orfs")
    aa = str(d / "aa")
    aln = str(d / "aln")
    run_ref("createdb", fasta, contigs)
    run_ref("extractorfs", contigs, orfs, "--min-length", "20", "--threads", "1")
    run_ref("translatenucs", orfs, aa, "--threads", "1")
    run_ref("kmermatcher", aa, d / "pref", "-k", "6",
            "--kmer-per-seq", "60", "--threads", "1")
    run_ref("rescorediagonal", aa, aa, d / "pref", aln,
            "--rescore-mode", "3", "-e", "10000", "--threads", "1")
    return contigs, orfs, aln


@needs_ref
def test_offsetalignment_translated_parity(tmp_path, contig_pipeline):
    contigs, orfs, aln = contig_pipeline
    run_ref("offsetalignment", contigs, orfs, contigs, orfs, aln,
            tmp_path / "ref", "--search-type", "2", "--threads", "1")
    run_ours("offsetalignment", contigs, orfs, contigs, orfs, aln,
             tmp_path / "ours", "--search-type", "2")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_offsetalignment_nucl_parity(tmp_path, contig_pipeline):
    contigs, orfs, _ = contig_pipeline
    # nucl ORF self-search: rescorediagonal on the nucl ORF DB
    run_ref("kmermatcher", orfs, tmp_path / "pref", "-k", "15",
            "--kmer-per-seq", "60", "--threads", "1")
    run_ref("rescorediagonal", orfs, orfs, tmp_path / "pref", tmp_path / "naln",
            "--rescore-mode", "3", "-e", "10000", "--threads", "1")
    run_ref("offsetalignment", contigs, orfs, contigs, orfs, tmp_path / "naln",
            tmp_path / "ref", "--search-type", "3", "--threads", "1")
    run_ours("offsetalignment", contigs, orfs, contigs, orfs, tmp_path / "naln",
             tmp_path / "ours", "--search-type", "3")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))


@needs_ref
def test_summarizeheaders_parity(tmp_path, seq_db):
    # uniprot-style headers
    fasta = tmp_path / "up.fasta"
    fasta.write_text(
        ">sp|P12345|AAA_HUMAN Protein alpha OS=Homo sapiens GN=AAA PE=1 SV=2\nMKLV\n"
        ">tr|Q99999|BBB_MOUSE hypothetical protein OS=Mus musculus PE=4 SV=1\nMKIV\n"
        ">sp|P55555|CCC_YEAST Protein gamma OS=S. cerevisiae PE=2 SV=3\nMKLL\n")
    hdb = tmp_path / "updb"
    run_ref("createdb", fasta, hdb)
    clu = tmp_path / "clu"
    (tmp_path / "clu.tsv").write_text("")
    # build a cluster DB by hand: rep 0 with members 0,1,2
    with open(clu, "wb") as f:
        f.write(b"0\n1\n2\n\x00")
    with open(str(clu) + ".index", "w") as f:
        f.write("0\t0\t7\n")
    with open(str(clu) + ".dbtype", "wb") as f:
        f.write((6).to_bytes(4, "little"))
    # the reference validator wants a sequence dbtype on db1/db2 even though
    # the tool summarizes header text; disguise the header DB as Aminoacid
    import shutil
    hdrdb = tmp_path / "hdrseq"
    shutil.copyfile(str(hdb) + "_h", hdrdb)
    shutil.copyfile(str(hdb) + "_h.index", str(hdrdb) + ".index")
    (tmp_path / "hdrseq.dbtype").write_bytes((0).to_bytes(4, "little"))
    for htype in ("1", "2"):
        run_ref("summarizeheaders", hdrdb, hdrdb, clu,
                tmp_path / f"ref{htype}", "--header-type", htype, "--threads", "1")
        run_ours("summarizeheaders", hdrdb, hdrdb, clu,
                 tmp_path / f"ours{htype}", "--header-type", htype)
        assert db_bytes(str(tmp_path / f"ref{htype}")) == \
            db_bytes(str(tmp_path / f"ours{htype}"))


@needs_ref
def test_diffseqdbs_parity(tmp_path, seq_db):
    fasta = tmp_path / "new.fasta"
    fasta.write_text(">s1 second\nACDEF\n>s4 novel\nMMMM\n>s0 first\nMKLV\n")
    newdb = tmp_path / "newdb"
    run_ref("createdb", fasta, newdb)
    run_ref("diffseqdbs", seq_db, newdb, tmp_path / "rm_ref",
            tmp_path / "keep_ref", tmp_path / "new_ref", "--threads", "1")
    run_ours("diffseqdbs", seq_db, newdb, tmp_path / "rm_ours",
             tmp_path / "keep_ours", tmp_path / "new_ours")
    for f in ("rm", "keep", "new"):
        assert (tmp_path / f"{f}_ref").read_bytes() == \
            (tmp_path / f"{f}_ours").read_bytes(), f


@needs_ref
def test_gff2db_parity(tmp_path, nucl_db):
    gff = tmp_path / "in.gff"
    gff.write_text(
        "# comment\n"
        "n0\tsrc\tCDS\t3\t20\t.\t+\t0\tID=x1\n"
        "n1\tsrc\tCDS\t5\t30\t.\t-\t0\tID=x2\n"
        "n1\tsrc\tgene\t2\t12\t.\t+\t0\tID=x3\n")
    run_ref("gff2db", gff, nucl_db, tmp_path / "ref", "--gff-type", "CDS",
            "--threads", "1")
    run_ours("gff2db", gff, nucl_db, tmp_path / "ours", "--gff-type", "CDS")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))
    assert db_bytes(str(tmp_path / "ref_h")) == db_bytes(str(tmp_path / "ours_h"))
    assert (tmp_path / "ref.lookup").read_bytes() == (tmp_path / "ours.lookup").read_bytes()


@needs_ref
def test_maskbygff_parity(tmp_path, nucl_db):
    gff = tmp_path / "in.gff"
    gff.write_text("0\tsrc\tCDS\t3\t10\t.\t+\t0\tID=x1\n"
                   "2\tsrc\tCDS\t1\t8\t.\t-\t0\tID=x2\n")
    run_ref("maskbygff", gff, nucl_db, tmp_path / "ref")
    run_ours("maskbygff", gff, nucl_db, tmp_path / "ours")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "ours"))
