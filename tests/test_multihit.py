"""Parity tests for the multi-hit subsystem against reference goldens
(regenerate with util/gen_goldens_mh.sh)."""
import os

import pytest

from plass_tpu.data import seqdb

GOLDEN = "/tmp/goldenmh"

needs_golden = pytest.mark.skipif(
    not os.path.exists(f"{GOLDEN}/mh.dbtype"),
    reason="multihit goldens not generated")


def _command_space(name):
    from plass_tpu.cli.tools import BASE_COMMANDS
    cmd = {c.name: c for c in BASE_COMMANDS}[name]
    return cmd.params_fn()


def _records(path):
    db = seqdb.SeqDB.open(path)
    return {int(db.keys[i]): db.get_data(i).tobytes()
            for i in range(db.size)}


@needs_golden
def test_multihitdb_bytes(tmp_path):
    from plass_tpu.cli.tools import _multihitdb
    space = _command_space("multihitdb")
    out = str(tmp_path / "mh")
    _multihitdb([f"{GOLDEN}/g1.fasta", f"{GOLDEN}/g2.fasta", out,
                 str(tmp_path / "tmp")], space)
    for suffix in ("", "_nucl", "_member_to_set", "_set_to_member",
                   "_set_size"):
        assert _records(out + suffix) == _records(f"{GOLDEN}/mh{suffix}"), \
            suffix


@needs_golden
def test_multihitsearch_bytes(tmp_path):
    from plass_tpu.cli.tools import _multihitsearch
    space = _command_space("multihitsearch")
    out = str(tmp_path / "mhs")
    _multihitsearch([f"{GOLDEN}/mh", f"{GOLDEN}/mh", out,
                     str(tmp_path / "tmp")], space)
    assert _records(out) == _records(f"{GOLDEN}/mhs")


@needs_golden
def test_combinepvalperset_bytes(tmp_path):
    from plass_tpu.cli.tools import _combinepvalperset
    space = _command_space("combinepvalperset")
    out = str(tmp_path / "cpv")
    _combinepvalperset([f"{GOLDEN}/mh", f"{GOLDEN}/mh", f"{GOLDEN}/mhs",
                        out], space)
    assert _records(out) == _records(f"{GOLDEN}/cpv")


def test_pvalue_combination_modes():
    """combinepvalperset math (golden-free): product mode multiplies,
    min mode applies the Bonferroni-style bound."""
    import math

    from plass_tpu.data.multihit import _precompute_log_b
    # B coefficients: logB[i] decreasing in i, finite
    log_b = _precompute_log_b(5, 0.1)
    assert len(log_b) == 5
    assert all(b >= log_b[-1] for b in log_b)
    assert log_b[4] == pytest.approx(5 * math.log(0.1))
