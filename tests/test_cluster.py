"""Parity tests for cascaded clustering and the easy-* workflows against
reference goldens (regenerate with util/gen_goldens.sh)."""
import os

import pytest

from plass_tpu.data import seqdb

GOLDEN = "/tmp/goldensearch"

needs_golden = pytest.mark.skipif(
    not os.path.exists(f"{GOLDEN}/clu_cascaded.dbtype"),
    reason="cluster goldens not generated")


def _command_space(name):
    from plass_tpu.cli.tools import BASE_COMMANDS
    cmd = {c.name: c for c in BASE_COMMANDS}[name]
    return cmd.params_fn()


def _load_records(path):
    db = seqdb.SeqDB.open(path)
    return {int(db.keys[i]): db.get_data(i).tobytes()
            for i in range(db.size)}


@needs_golden
def test_cascaded_cluster_bytes(tmp_path):
    """3-step cascaded clustering (linclust -> KMER_SCORE prefilter step
    -> two diagonal-scored steps, set-cover, mergeclusters)."""
    from plass_tpu.workflow.cluster import run_cluster
    s = seqdb.SeqDB.open(f"{GOLDEN}/s")
    out = str(tmp_path / "clu")
    run_cluster(s, out, str(tmp_path / "tmp"))
    assert _load_records(out) == _load_records(f"{GOLDEN}/clu_cascaded")


@needs_golden
def test_easy_cluster_outputs(tmp_path):
    from plass_tpu.cli.tools import _easy_cluster
    space = _command_space("easy-cluster")
    prefix = str(tmp_path / "ec")
    _easy_cluster([f"{GOLDEN}/s.fasta", prefix, str(tmp_path / "tmp")],
                  space)
    for suffix in ("_cluster.tsv", "_rep_seq.fasta", "_all_seqs.fasta"):
        assert (open(prefix + suffix, "rb").read()
                == open(f"{GOLDEN}/ec{suffix}", "rb").read()), suffix


@needs_golden
def test_easy_linclust_outputs(tmp_path):
    from plass_tpu.cli.tools import _easy_linclust
    space = _command_space("easy-linclust")
    prefix = str(tmp_path / "el")
    _easy_linclust([f"{GOLDEN}/s.fasta", prefix, str(tmp_path / "tmp")],
                   space)
    for suffix in ("_cluster.tsv", "_rep_seq.fasta", "_all_seqs.fasta"):
        assert (open(prefix + suffix, "rb").read()
                == open(f"{GOLDEN}/el{suffix}", "rb").read()), suffix


@needs_golden
def test_easy_search_m8(tmp_path):
    from plass_tpu.cli.tools import _easy_search
    space = _command_space("easy-search")
    out = str(tmp_path / "es.tsv")
    _easy_search([f"{GOLDEN}/q.fasta", f"{GOLDEN}/t.fasta", out,
                  str(tmp_path / "tmp")], space)
    assert open(out, "rb").read() == open(f"{GOLDEN}/es.tsv", "rb").read()


@needs_golden
def test_rbh_bytes(tmp_path):
    """Reciprocal-best-hit workflow (rbh.sh: two searches at the driver's
    serialized -s 4.0, bitscore sort/extract, swap, merge, result2rbh)."""
    from plass_tpu.cli.tools import _rbh
    space = _command_space("rbh")
    out = str(tmp_path / "rbh")
    _rbh([f"{GOLDEN}/q", f"{GOLDEN}/t", out, str(tmp_path / "tmp")], space)
    assert _load_records(out) == _load_records(f"{GOLDEN}/rbh_res")


@needs_golden
def test_map_bytes(tmp_path):
    """map workflow: prefilter with coverage gate + ungapped
    rescorediagonal at high identity."""
    from plass_tpu.cli.tools import _map
    space = _command_space("map")
    out = str(tmp_path / "map")
    _map([f"{GOLDEN}/q", f"{GOLDEN}/t", out, str(tmp_path / "tmp")], space)
    assert _load_records(out) == _load_records(f"{GOLDEN}/map_res")


def test_automatic_cluster_params():
    """setAutomaticThreshold/Iterations boundaries (Cluster.cpp:22-40)."""
    from plass_tpu.workflow.cluster import (automatic_iterations,
                                            automatic_threshold)
    assert automatic_threshold(0.0) == 6.0
    assert automatic_threshold(0.3) == 6.0
    assert automatic_threshold(0.9) == 1.0
    assert abs(automatic_threshold(0.5) - 3.0) < 1e-6
    assert automatic_iterations(1.0) == 1
    assert automatic_iterations(6.0) == 3
