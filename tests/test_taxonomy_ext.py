"""Byte-parity tests for the extended taxonomy subsystem: binary
taxonomy dumps, filtertaxseqdb, aggregatetax(weights), nrtotaxmapping,
lcaalign, the approx-2bLCA taxonomy workflow and easy-taxonomy.

Oracle: the reference binary at /tmp/refbuild/src/plass, fixtures from
/tmp/goldentax (util/gen_goldens_tax.sh)."""
import os
import shutil
import struct
import subprocess

import pytest

REF = "/tmp/refbuild/src/plass"
OURS = os.path.join(os.path.dirname(__file__), "..", "bin", "plass")
GOLDEN = "/tmp/goldentax"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF) and os.path.exists(f"{GOLDEN}/t_nodes.dmp")),
    reason="reference binary or taxonomy goldens missing")


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


def mask_taxnode_padding(blob):
    """Zero TaxonNode struct padding (bytes 12:16 of each 32-byte node):
    the reference serializes heap garbage there."""
    b = bytearray(blob)
    n = struct.unpack_from("<Q", b, 4)[0]
    for i in range(n):
        off = 16 + i * 32 + 12
        b[off:off + 4] = b"\0\0\0\0"
    return bytes(b)


@pytest.fixture(scope="module")
def dump():
    return f"{GOLDEN}/dump"


@pytest.fixture(scope="module")
def bintax_db(tmp_path_factory, dump):
    """goldentax t with a binary _taxonomy built by our serializer."""
    d = tmp_path_factory.mktemp("bintax")
    for ext in ("", ".index", ".dbtype", ".lookup"):
        if os.path.exists(f"{GOLDEN}/t{ext}"):
            shutil.copyfile(f"{GOLDEN}/t{ext}", d / f"t{ext}")
    shutil.copyfile(f"{GOLDEN}/t_mapping", d / "t_mapping")
    run_ours("createbintaxonomy", f"{dump}/names.dmp", f"{dump}/nodes.dmp",
             f"{dump}/merged.dmp", d / "t_taxonomy")
    return str(d / "t")


def test_createbintaxonomy_bytes(tmp_path, dump):
    run_ref("createbintaxonomy", f"{dump}/names.dmp", f"{dump}/nodes.dmp",
            f"{dump}/merged.dmp", tmp_path / "ref")
    run_ours("createbintaxonomy", f"{dump}/names.dmp", f"{dump}/nodes.dmp",
             f"{dump}/merged.dmp", tmp_path / "my")
    ref = (tmp_path / "ref").read_bytes()
    my = (tmp_path / "my").read_bytes()
    assert mask_taxnode_padding(ref) == mask_taxnode_padding(my)


def test_reference_consumes_our_binary(bintax_db, tmp_path):
    """The reference lca must read our _taxonomy dump byte-for-byte."""
    run_ref("lca", bintax_db, f"{GOLDEN}/res", tmp_path / "lca",
            "--threads", 1)
    assert db_bytes(str(tmp_path / "lca")) == db_bytes(f"{GOLDEN}/lca_plain")


def test_our_lca_reads_binary(bintax_db, tmp_path):
    run_ours("lca", bintax_db, f"{GOLDEN}/res", tmp_path / "lca")
    assert db_bytes(str(tmp_path / "lca")) == db_bytes(f"{GOLDEN}/lca_plain")


def test_filtertaxseqdb(bintax_db, tmp_path):
    run_ref("filtertaxseqdb", bintax_db, tmp_path / "ref",
            "--taxon-list", 2, "--threads", 1)
    run_ours("filtertaxseqdb", bintax_db, tmp_path / "my",
             "--taxon-list", 2)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


def test_filtertaxseqdb_soft(bintax_db, tmp_path):
    run_ref("filtertaxseqdb", bintax_db, tmp_path / "ref",
            "--taxon-list", "!10", "--subdb-mode", 1, "--threads", 1)
    run_ours("filtertaxseqdb", bintax_db, tmp_path / "my",
             "--taxon-list", "!10", "--subdb-mode", 1)
    ref_idx = (tmp_path / "ref.index").read_bytes()
    my_idx = (tmp_path / "my.index").read_bytes()
    assert ref_idx == my_idx
    assert os.path.islink(tmp_path / "my")


@pytest.fixture(scope="module")
def setmap(tmp_path_factory):
    """Two sets covering the lca_plain query keys."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from plass_tpu.data import seqdb
    d = tmp_path_factory.mktemp("setmap")
    lca = seqdb.SeqDB.open(f"{GOLDEN}/lca_plain")
    keys = [int(k) for k in lca.keys]
    w = seqdb.DBWriter(seqdb.GENERIC_DB)
    half = len(keys) // 2
    w.write(10, ("\n".join(str(k) for k in keys[:half]) + "\n").encode(),
            add_newline=False)
    w.write(20, ("\n".join(str(k) for k in keys[half:]) + "\n").encode(),
            add_newline=False)
    w.finish().save(str(d / "setmap"))
    return str(d / "setmap")


def test_aggregatetax(setmap, tmp_path):
    run_ref("aggregatetax", f"{GOLDEN}/t", setmap, f"{GOLDEN}/lca_plain",
            tmp_path / "ref", "--threads", 1)
    run_ours("aggregatetax", f"{GOLDEN}/t", setmap, f"{GOLDEN}/lca_plain",
             tmp_path / "my")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


def test_aggregatetaxweights(setmap, tmp_path):
    args = ("--lca-ranks", "genus,species", "--tax-lineage", 1)
    run_ref("aggregatetaxweights", f"{GOLDEN}/t", setmap,
            f"{GOLDEN}/lca_plain", f"{GOLDEN}/res", tmp_path / "ref",
            "--threads", 1, *args)
    run_ours("aggregatetaxweights", f"{GOLDEN}/t", setmap,
             f"{GOLDEN}/lca_plain", f"{GOLDEN}/res", tmp_path / "my", *args)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


@pytest.fixture(scope="module")
def nr_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("nr")
    rows = [
        ("WP_001.1 hypothetical protein [SpeciesA1]", "MKLVAGTREWQPLHID"),
        ("XP_002.2 some protein [bad [SpeciesA2]", "ACDEFGHIKLMNPQRS"),
        ("NOACC unknown [SpeciesB1]\x01WP_001.1 again [SpeciesA1]",
         "MKTAYIAKQRQISFVK"),
        ("ZZZ_9.9 nothing known [NotATaxon]", "PPPPPPPPPPPP"),
        ("YP_003.1 multi [GenusA] protein [SpeciesA2]", "MKLVAGTREWQ"),
    ]
    fasta = d / "nr.fasta"
    fasta.write_text("".join(f">{h}\n{s}\n" for h, s in rows))
    acc = d / "acc2tax.tsv"
    acc.write_text("accession\taccession.version\ttaxid\tgi\n"
                   "WP_001\tWP_001.1\t11\t1\n"
                   "YP_003\tYP_003.1\t12\t2\n")
    db = str(d / "nrdb")
    run_ref("createdb", fasta, db)
    for f in ("names", "nodes", "merged"):
        shutil.copyfile(f"{GOLDEN}/t_{f}.dmp", f"{db}_{f}.dmp")
    return db, str(acc)


def test_nrtotaxmapping(nr_db, tmp_path):
    db, acc = nr_db
    run_ref("nrtotaxmapping", acc, db, tmp_path / "ref", "--threads", 1)
    run_ours("nrtotaxmapping", acc, db, tmp_path / "my")
    assert ((tmp_path / "ref").read_bytes()
            == (tmp_path / "my").read_bytes())


@pytest.fixture(scope="module")
def pref(tmp_path_factory):
    d = tmp_path_factory.mktemp("pref")
    out = str(d / "pref")
    run_ref("prefilter", f"{GOLDEN}/q", f"{GOLDEN}/t", out,
            "--threads", 1, "-s", 2)
    return out


@pytest.mark.parametrize("args", [
    (), ("--alignment-mode", 3), ("-c", 0.5, "--cov-mode", 2),
    ("-e", 10, "--alignment-mode", 2, "--max-rejected", 3)])
def test_lcaalign(pref, tmp_path, args):
    run_ref("lcaalign", f"{GOLDEN}/q", f"{GOLDEN}/t", pref,
            tmp_path / "ref", "--threads", 1, *args)
    run_ours("lcaalign", f"{GOLDEN}/q", f"{GOLDEN}/t", pref,
             tmp_path / "my", *args)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


def test_search_no_backtrace(tmp_path):
    """Regression: plain search defaults to SCORE_COV (estimated seq.id),
    not SCORE_COV_SEQID (setSearchDefaults, Search.cpp:22)."""
    run_ref("search", f"{GOLDEN}/q", f"{GOLDEN}/t", tmp_path / "ref",
            tmp_path / "rtmp", "--threads", 1)
    run_ours("search", f"{GOLDEN}/q", f"{GOLDEN}/t", tmp_path / "my",
             tmp_path / "mtmp")
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))


def test_taxonomy_approx_2blca(tmp_path):
    run_ref("taxonomy", f"{GOLDEN}/q", f"{GOLDEN}/t", tmp_path / "ref",
            tmp_path / "rtmp", "--threads", 1, "--tax-output-mode", 2)
    run_ours("taxonomy", f"{GOLDEN}/q", f"{GOLDEN}/t", tmp_path / "my",
             tmp_path / "mtmp", "--tax-output-mode", 2)
    assert db_bytes(str(tmp_path / "ref")) == db_bytes(str(tmp_path / "my"))
    assert (db_bytes(str(tmp_path / "ref_aln"))
            == db_bytes(str(tmp_path / "my_aln")))


def test_easy_taxonomy(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from plass_tpu.data import seqdb
    db = seqdb.SeqDB.open(f"{GOLDEN}/q")
    hdb = seqdb.SeqDB.open(f"{GOLDEN}/q_h")
    fasta = tmp_path / "q.fasta"
    with open(fasta, "w") as f:
        for i in range(db.size):
            h = hdb.get_seq_bytes(hdb.key_to_id(int(db.keys[i]))).decode()
            f.write(">" + h + "\n" + db.get_seq_bytes(i).decode() + "\n")
    run_ref("easy-taxonomy", fasta, f"{GOLDEN}/t", tmp_path / "ref",
            tmp_path / "rtmp", "--threads", 1)
    run_ours("easy-taxonomy", fasta, f"{GOLDEN}/t", tmp_path / "my",
             tmp_path / "mtmp")
    for suffix in ("_lca.tsv", "_report", "_tophit_report", "_tophit_aln"):
        assert ((tmp_path / f"ref{suffix}").read_bytes()
                == (tmp_path / f"my{suffix}").read_bytes()), suffix
