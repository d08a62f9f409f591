import pytest

pytestmark = pytest.mark.smoke

import numpy as np

from plass_tpu.data import seqdb


def test_roundtrip(tmp_path):
    w = seqdb.DBWriter(seqdb.AMINO_ACIDS)
    w.write(2, b"ACDEF")
    w.write(0, b"MKLV")
    w.write(1, b"GG")
    db = w.finish()
    assert list(db.keys) == [0, 1, 2]
    assert db.get_seq_bytes(0) == b"MKLV"
    assert db.get_seq_bytes(2) == b"ACDEF"
    assert db.seq_len(1) == 2
    p = str(tmp_path / "db")
    db.save(p)
    db2 = seqdb.SeqDB.open(p)
    assert db2.dbtype == seqdb.AMINO_ACIDS
    assert db2.get_seq_bytes(0) == b"MKLV"
    assert np.array_equal(db2.offsets, db.offsets)


def test_write_order_layout():
    # data stays in write order; index sorted by key (reference DBWriter)
    w = seqdb.DBWriter(seqdb.AMINO_ACIDS)
    w.write(5, b"AA")
    w.write(1, b"CC")
    db = w.finish()
    assert db.data.tobytes().startswith(b"AA\n\x00CC")
    assert list(db.keys) == [1, 5]


def test_concat_renumbers():
    a = seqdb.SeqDB.from_records([b"AA", b"CC"], dbtype=seqdb.AMINO_ACIDS)
    b = seqdb.SeqDB.from_records([b"GG"], dbtype=seqdb.AMINO_ACIDS)
    c = seqdb.concat(a, b)
    assert list(c.keys) == [0, 1, 2]
    assert c.get_seq_bytes(2) == b"GG"


def test_subdb_lex_order():
    db = seqdb.SeqDB.from_records([b"A%d" % i for i in range(12)],
                                  dbtype=seqdb.AMINO_ACIDS)
    sub = seqdb.subdb(db, [0, 2, 10, 11], order="lex")
    # lexicographic processing order 0,10,11,2 -> data layout
    assert sub.data.tobytes().startswith(b"A0\n\x00A10\n\x00A11\n\x00A2")
    # index still numeric
    assert list(sub.keys) == [0, 2, 10, 11]
