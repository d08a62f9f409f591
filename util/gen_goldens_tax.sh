#!/bin/sh -e
# Taxonomy golden fixtures: synthetic NCBI dump + reference outputs.
# Called by util/gen_goldens.sh (expects /tmp/goldensearch to exist).
REF_PLASS="${1:-/tmp/refbuild/src/plass}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

rm -rf /tmp/goldentax && mkdir -p /tmp/goldentax/dump
PYTHONPATH="$REPO" python3 - <<'PYEOF'
import shutil
from plass_tpu.data import seqdb
from plass_tpu.data.headers import parse_fasta_header
base = "/tmp/goldentax/"
nodes = [(1, 1, "no rank"), (2, 1, "superkingdom"), (131567, 1, "no rank"),
         (10, 2, "genus"), (20, 2, "genus"),
         (11, 10, "species"), (12, 10, "species"), (21, 20, "species"),
         (12908, 1, "no rank"), (28384, 1, "no rank")]
with open(base + "dump/nodes.dmp", "w") as f:
    for (t, p, r) in nodes:
        f.write(f"{t}\t|\t{p}\t|\t{r}\t|\n")
names = {1: "root", 2: "Bacteria", 131567: "cellular organisms",
         10: "GenusA", 20: "GenusB", 11: "SpeciesA1", 12: "SpeciesA2",
         21: "SpeciesB1", 12908: "unclassified sequences",
         28384: "other sequences"}
with open(base + "dump/names.dmp", "w") as f:
    for t, n in names.items():
        f.write(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n")
with open(base + "dump/merged.dmp", "w") as f:
    f.write("99\t|\t11\t|\n")
with open(base + "dump/delnodes.dmp", "w") as f:
    f.write("98\t|\n")
for name in ("t", "t_h", "q", "q_h"):
    for ext in ("", ".index", ".dbtype"):
        shutil.copyfile(f"/tmp/goldensearch/{name}{ext}",
                        f"{base}{name}{ext}")
hdb = seqdb.SeqDB.open(base + "t_h")
cycle = [11, 12, 21, 11, 21]
with open(base + "t.lookup", "w") as f, open(base + "acc2tax.tsv", "w") as g:
    for i in range(hdb.size):
        key = int(hdb.keys[i])
        acc = parse_fasta_header(
            hdb.get_data(i).tobytes().decode().rstrip("\n"))
        f.write(f"{key}\t{acc}\t0\n")
        g.write(f"{acc}\t{cycle[key % len(cycle)]}\n")
PYEOF

cd /tmp/goldentax
"$REF_PLASS" createtaxdb t tmp_ctd --ncbi-tax-dump dump \
    --tax-mapping-file acc2tax.tsv --tax-db-mode 0 --threads 1 > tax.log 2>&1
rm -f t_taxonomy
"$REF_PLASS" search q t res tmp_s --threads 1 -a >> tax.log 2>&1
"$REF_PLASS" lca t res lca_plain --threads 1 >> tax.log 2>&1
"$REF_PLASS" lca t res lca_ranks --threads 1 --lca-ranks genus,species \
    --tax-lineage 1 >> tax.log 2>&1
"$REF_PLASS" majoritylca t res mlca --threads 1 --vote-mode 0 >> tax.log 2>&1
"$REF_PLASS" addtaxonomy t res addtax --threads 1 >> tax.log 2>&1
"$REF_PLASS" taxonomyreport t lca_plain report.tsv --threads 1 >> tax.log 2>&1
"$REF_PLASS" filtertaxdb t lca_plain ftax --taxon-list 10 --threads 1 >> tax.log 2>&1
"$REF_PLASS" taxonomy q t taxwf tmp_twf --threads 1 --lca-mode 4 >> tax.log 2>&1
echo "taxonomy goldens regenerated"
