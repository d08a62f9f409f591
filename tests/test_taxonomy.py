"""Parity tests for the taxonomy subsystem against reference goldens
(synthetic NCBI dump, regenerate with util/gen_goldens_tax.sh)."""
import os
import shutil

import pytest

from plass_tpu.data import seqdb

GOLDEN = "/tmp/goldentax"

needs_golden = pytest.mark.skipif(
    not os.path.exists(f"{GOLDEN}/t_nodes.dmp"),
    reason="taxonomy goldens not generated")


def _command_space(name):
    from plass_tpu.cli.tools import BASE_COMMANDS
    cmd = {c.name: c for c in BASE_COMMANDS}[name]
    return cmd.params_fn()


def _records(path):
    db = seqdb.SeqDB.open(path)
    return {int(db.keys[i]): db.get_data(i).tobytes()
            for i in range(db.size)}


@needs_golden
def test_createtaxdb_mapping(tmp_path):
    from plass_tpu.cli.tools import _createtaxdb
    for ext in ("", ".index", ".dbtype"):
        shutil.copyfile(f"{GOLDEN}/t{ext}", tmp_path / f"t{ext}")
    shutil.copyfile(f"{GOLDEN}/t.lookup", tmp_path / "t.lookup")
    space = _command_space("createtaxdb")
    space.values["ncbi_tax_dump"] = f"{GOLDEN}/dump"
    space.values["tax_mapping_file"] = f"{GOLDEN}/acc2tax.tsv"
    _createtaxdb([str(tmp_path / "t"), str(tmp_path / "ctmp")], space)
    assert (open(tmp_path / "t_mapping", "rb").read()
            == open(f"{GOLDEN}/t_mapping", "rb").read())


@needs_golden
def test_lca_bytes(tmp_path):
    from plass_tpu.cli.tools import _lca
    space = _command_space("lca")
    out = str(tmp_path / "lca")
    _lca([f"{GOLDEN}/t", f"{GOLDEN}/res", out], space)
    assert _records(out) == _records(f"{GOLDEN}/lca_plain")


@needs_golden
def test_lca_ranks_lineage(tmp_path):
    from plass_tpu.cli.tools import _lca
    space = _command_space("lca")
    space.values["lca_ranks"] = "genus,species"
    space.values["tax_lineage"] = 1
    out = str(tmp_path / "lca")
    _lca([f"{GOLDEN}/t", f"{GOLDEN}/res", out], space)
    assert _records(out) == _records(f"{GOLDEN}/lca_ranks")


@needs_golden
def test_majoritylca_bytes(tmp_path):
    from plass_tpu.cli.tools import _majoritylca
    space = _command_space("majoritylca")
    space.values["vote_mode"] = 0
    out = str(tmp_path / "mlca")
    _majoritylca([f"{GOLDEN}/t", f"{GOLDEN}/res", out], space)
    assert _records(out) == _records(f"{GOLDEN}/mlca")


@needs_golden
def test_addtaxonomy_bytes(tmp_path):
    from plass_tpu.cli.tools import _addtaxonomy
    space = _command_space("addtaxonomy")
    out = str(tmp_path / "addtax")
    _addtaxonomy([f"{GOLDEN}/t", f"{GOLDEN}/res", out], space)
    assert _records(out) == _records(f"{GOLDEN}/addtax")
    assert (open(out, "rb").read()
            == open(f"{GOLDEN}/addtax", "rb").read())


@needs_golden
def test_taxonomyreport_bytes(tmp_path):
    from plass_tpu.cli.tools import _taxonomyreport
    space = _command_space("taxonomyreport")
    out = str(tmp_path / "report.tsv")
    _taxonomyreport([f"{GOLDEN}/t", f"{GOLDEN}/lca_plain", out], space)
    assert (open(out, "rb").read()
            == open(f"{GOLDEN}/report.tsv", "rb").read())


@needs_golden
def test_filtertaxdb_bytes(tmp_path):
    from plass_tpu.cli.tools import _filtertaxdb
    space = _command_space("filtertaxdb")
    space.values["taxon_list"] = "10"
    out = str(tmp_path / "ftax")
    _filtertaxdb([f"{GOLDEN}/t", f"{GOLDEN}/lca_plain", out], space)
    assert _records(out) == _records(f"{GOLDEN}/ftax")


@needs_golden
def test_taxonomy_workflow_bytes(tmp_path):
    from plass_tpu.cli.tools import _taxonomy
    space = _command_space("taxonomy")
    space.values["lca_mode"] = 4
    out = str(tmp_path / "taxwf")
    _taxonomy([f"{GOLDEN}/q", f"{GOLDEN}/t", out, str(tmp_path / "tmp")],
              space)
    assert _records(out) == _records(f"{GOLDEN}/taxwf")


def test_taxonomy_tree_helpers():
    """LCA/lineage/rank helpers on the synthetic tree (golden-free)."""
    from plass_tpu.data.taxonomy import Taxonomy, TaxonNode
    nodes = {t: TaxonNode(t, p, r, n) for (t, p, r, n) in [
        (1, 1, "no rank", "root"), (2, 1, "superkingdom", "Bacteria"),
        (10, 2, "genus", "GenusA"), (11, 10, "species", "SpeciesA1"),
        (12, 10, "species", "SpeciesA2"), (20, 2, "genus", "GenusB"),
        (21, 20, "species", "SpeciesB1")]}
    tax = Taxonomy(nodes, {99: 11})
    assert tax.lca([11, 12]).tax_id == 10
    assert tax.lca([11, 21]).tax_id == 2
    assert tax.lca([99, 12]).tax_id == 10  # merged redirect
    assert tax.is_ancestor(2, 21) and not tax.is_ancestor(10, 21)
    assert tax.at_ranks(nodes[11], ["genus", "species", "kingdom"]) == \
        ["GenusA", "SpeciesA1", "unknown"]
    assert tax.tax_lineage(nodes[11]) == \
        "d_Bacteria;g_GenusA;s_SpeciesA1"
