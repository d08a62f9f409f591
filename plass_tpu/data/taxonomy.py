"""NCBI taxonomy machinery (`createtaxdb`, `lca`, `taxonomy`, ...).

Reference: lib/mmseqs/src/taxonomy/NcbiTaxonomy.{h,cpp} (dmp parsing,
LCA, rank projections, lineage strings), lca.cpp, addtaxonomy.cpp,
taxonomyreport.cpp, filtertaxdb.cpp (TaxonomyExpression.h) and the
createtaxdb.sh offline path (provided dump dir + accession mapping).
"""
import os

NCBI_RANKS = {
    "forma": 1, "varietas": 2, "subspecies": 3, "species": 4,
    "species subgroup": 5, "species group": 6, "subgenus": 7, "genus": 8,
    "subtribe": 9, "tribe": 10, "subfamily": 11, "family": 12,
    "superfamily": 13, "parvorder": 14, "infraorder": 15, "suborder": 16,
    "order": 17, "superorder": 18, "infraclass": 19, "subclass": 20,
    "class": 21, "superclass": 22, "subphylum": 23, "phylum": 24,
    "superphylum": 25, "subkingdom": 26, "kingdom": 27, "superkingdom": 28,
}  # NcbiTaxonomy.h:57-84

SHORT_RANKS = {"species": "s", "genus": "g", "family": "f", "order": "o",
               "class": "c", "phylum": "p", "kingdom": "k",
               "superkingdom": "d"}  # NcbiTaxonomy.h:86-93

DEFAULT_BLACKLIST = "12908:unclassified sequences,28384:other sequences"


class TaxonNode:
    __slots__ = ("tax_id", "parent_tax_id", "rank", "name")

    def __init__(self, tax_id, parent_tax_id, rank, name):
        self.tax_id = tax_id
        self.parent_tax_id = parent_tax_id
        self.rank = rank
        self.name = name


class Taxonomy:
    """Loaded from <prefix>_nodes.dmp/_names.dmp/_merged.dmp (the layout
    createtaxdb leaves next to a sequence DB, createtaxdb.sh:74-77)."""

    def __init__(self, nodes, merged):
        self.nodes = nodes          # tax_id -> TaxonNode
        self.merged = merged        # old tax_id -> new tax_id
        self._depth = {}

    @classmethod
    def open(cls, prefix):
        for suffix in ("_nodes.dmp", "_names.dmp", "_merged.dmp"):
            if not os.path.exists(prefix + suffix):
                raise FileNotFoundError(
                    f"{prefix}{suffix} not found — run createtaxdb first")
        nodes = {}
        with open(prefix + "_nodes.dmp") as f:
            for line in f:
                parts = line.split("\t|\t")
                tax_id = int(parts[0])
                parent = int(parts[1])
                rank = parts[2].strip()
                nodes[tax_id] = TaxonNode(tax_id, parent, rank, "")
        with open(prefix + "_names.dmp") as f:
            for line in f:
                if "scientific name" not in line:
                    continue
                parts = line.split("\t|\t")
                tax_id = int(parts[0])
                if tax_id in nodes:
                    nodes[tax_id].name = parts[1].strip()
        merged = {}
        with open(prefix + "_merged.dmp") as f:
            for line in f:
                parts = line.replace("|", "").split()
                if len(parts) >= 2:
                    merged[int(parts[0])] = int(parts[1])
        return cls(nodes, merged)

    def node(self, tax_id):
        if tax_id in self.nodes:
            return self.nodes[tax_id]
        if tax_id in self.merged:
            return self.nodes.get(self.merged[tax_id])
        return None

    def exists(self, tax_id):
        return self.node(tax_id) is not None

    def _lineage_ids(self, tax_id):
        out = []
        n = self.node(tax_id)
        while n is not None:
            out.append(n.tax_id)
            if n.parent_tax_id == n.tax_id:
                break
            n = self.node(n.parent_tax_id)
        return out

    def is_ancestor(self, ancestor, child):
        if not self.exists(ancestor) or not self.exists(child):
            return False
        return self.node(ancestor).tax_id in self._lineage_ids(child)

    def lca_pair(self, a, b):
        la = self._lineage_ids(a)
        lb = set(self._lineage_ids(b))
        for t in la:
            if t in lb:
                return t
        return 1

    def lca(self, taxa):
        """NcbiTaxonomy::LCA(vector): skip unknown taxa (with the
        reference's 0-absorbs rule in lcaHelper: taxid contributions of 0
        collapse to 0/None)."""
        known = [t for t in taxa if self.exists(t)]
        if not known:
            return None
        red = known[0]
        for t in known[1:]:
            red = self.lca_pair(red, t)
        return self.node(red)

    def all_ranks(self, node):
        """NcbiTaxonomy::AllRanks (NcbiTaxonomy.cpp:411-427)."""
        result = {}
        while True:
            if node.tax_id == 1:
                result.setdefault(node.rank, node.name)
                return result
            if node.rank not in ("no_rank", "no rank"):
                result.setdefault(node.rank, node.name)
            node = self.node(node.parent_tax_id)

    def at_ranks(self, node, levels):
        """NcbiTaxonomy::AtRanks (NcbiTaxonomy.cpp:313-338)."""
        result = []
        ranks = self.all_ranks(node)
        base_rank_index = NCBI_RANKS.get(node.rank, -1)
        base_rank = "uc_" + node.name
        for level in levels:
            if level in ranks:
                result.append(ranks[level])
            elif NCBI_RANKS[level] < base_rank_index:
                result.append(base_rank)
            else:
                result.append("unknown")
        return result

    def tax_lineage(self, node, info_as_name=True):
        """NcbiTaxonomy::taxLineage (NcbiTaxonomy.cpp:367-390)."""
        chain = []
        while True:
            chain.append(node)
            parent = self.node(node.parent_tax_id)
            if parent.parent_tax_id == parent.tax_id:
                break
            node = parent
        parts = []
        for n in reversed(chain):
            if info_as_name:
                parts.append(SHORT_RANKS.get(n.rank, "-") + "_" + n.name)
            else:
                parts.append(str(n.tax_id))
        return ";".join(parts)


def read_mapping(path):
    """<db>_mapping: 'key\\ttaxid' per line (Util::readMapping)."""
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                out[int(parts[0])] = int(parts[1])
    return out


def write_mapping(path, mapping):
    with open(path, "w") as f:
        for key in sorted(mapping):
            f.write(f"{key}\t{mapping[key]}\n")


def parse_blacklist(tax, blacklist_str):
    out = []
    for item in (blacklist_str or "").split(","):
        item = item.strip()
        if not item:
            continue
        taxon = int(item.split(":")[0])
        if taxon == 0 or not tax.exists(taxon):
            continue
        if ":" in item:
            name = item.split(":", 1)[1]
            node = tax.node(taxon)
            if node is None or node.name != name:
                continue
        out.append(taxon)
    return out


class TaxonomyExpression:
    """TaxonomyExpression.h: comma-separated taxa, '!' negates; a taxon
    matches when it is (not) a descendant of any listed taxon."""

    def __init__(self, expression, tax):
        self.terms = []
        for item in expression.split(","):
            item = item.strip()
            if not item:
                continue
            negate = item.startswith("!")
            self.terms.append((negate, int(item.lstrip("!"))))
        self.tax = tax

    def matches(self, taxon):
        ok = False
        for (negate, anc) in self.terms:
            anc_ok = self.tax.is_ancestor(anc, taxon)
            if negate:
                if anc_ok:
                    return False
                ok = True
            elif anc_ok:
                ok = True
        return ok


def weighted_majority_lca(tax, hits, majority_cutoff):
    """NcbiTaxonomy::weightedMajorityLCA (NcbiTaxonomy.cpp:577-680):
    accumulate weights up the lineages, pick the directly-hit candidate
    meeting the cutoff whose nearest ranked ancestor (incl. itself) is
    deepest; ties by higher weight fraction.

    hits: [(taxon, weight)]. Returns selected taxid (0 = none).
    """
    weights = {}
    candidates = set()
    total = 0.0
    for (taxon, weight) in hits:
        if taxon == 0:
            continue
        node = tax.node(taxon)
        if node is None:
            continue
        total += weight
        candidates.add(node.tax_id)
        for t in tax._lineage_ids(taxon):
            weights[t] = weights.get(t, 0.0) + weight
    if total == 0:
        return 0
    selected = 0
    min_rank = 1 << 30
    selected_percent = 0.0
    for taxon in sorted(weights):
        if taxon not in candidates:
            continue
        percent = weights[taxon] / total
        if percent < majority_cutoff:
            continue
        node = tax.node(taxon)
        curr_min_rank = 1 << 30
        n = node
        while True:
            idx = NCBI_RANKS.get(n.rank, -1)
            if idx > 0:
                curr_min_rank = idx
                break
            if n.parent_tax_id == n.tax_id:
                break
            n = tax.node(n.parent_tax_id)
        if (curr_min_rank < min_rank
                or (curr_min_rank == min_rank
                    and percent > selected_percent)):
            selected = taxon
            min_rank = curr_min_rank
            selected_percent = percent
    return selected
