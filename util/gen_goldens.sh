#!/bin/sh -e
# Regenerate ALL golden oracle outputs from the reference binaries.
# (Reference binaries: build /root/reference with cmake+make into /tmp/refbuild.)
# Tests in tests/ skip gracefully when these are absent; run this script to
# enable the full byte-parity suite (see .claude/skills/verify/SKILL.md).
#
# Usage: util/gen_goldens.sh [refPlass] [refPenguin]

REF_PLASS="${1:-/tmp/refbuild/src/plass}"
REF_PENGUIN="${2:-/tmp/refbuild/src/penguin}"
READS_DIR="${READS_DIR:-/root/reference/examples}"
READS1="$READS_DIR/reads_1.fastq.gz"
READS2="$READS_DIR/reads_2.fastq.gz"

[ -x "$REF_PLASS" ] || { echo "missing $REF_PLASS (build the reference first)"; exit 1; }

echo "== /tmp/golden2 (plass assemble, 2 iters, no NN filter)"
rm -rf /tmp/golden2 && mkdir -p /tmp/golden2
"$REF_PLASS" assemble "$READS1" "$READS2" /tmp/golden2/assembly.fas \
    /tmp/golden2/tmp --threads 1 --num-iterations 2 --filter-proteins 0 \
    --delete-tmp-inc 0 > /tmp/golden2.log 2>&1

echo "== /tmp/golden12 (plass assemble, DEFAULT params: 12 iters + NN filter)"
rm -rf /tmp/golden12 && mkdir -p /tmp/golden12
"$REF_PLASS" assemble "$READS1" "$READS2" /tmp/golden12/assembly.fas \
    /tmp/golden12/tmp --threads 1 --delete-tmp-inc 0 > /tmp/golden12.log 2>&1

echo "== /tmp/goldennucl (penguin nuclassemble, 2 iters, min-contig 150)"
rm -rf /tmp/goldennucl && mkdir -p /tmp/goldennucl
"$REF_PENGUIN" nuclassemble "$READS1" "$READS2" /tmp/goldennucl/contigs.fasta \
    /tmp/goldennucl/tmp --threads 1 --num-iterations 2 --min-contig-len 150 \
    --delete-tmp-inc 0 > /tmp/goldennucl.log 2>&1

echo "== /tmp/goldenguided2 (penguin guided_nuclassemble, 2+2 iters)"
rm -rf /tmp/goldenguided2 && mkdir -p /tmp/goldenguided2
"$REF_PENGUIN" guided_nuclassemble "$READS1" "$READS2" \
    /tmp/goldenguided2/assembly.fasta /tmp/goldenguided2/tmp --threads 1 \
    --num-iterations 2 --min-contig-len 150 --delete-tmp-inc 0 \
    > /tmp/goldenguided2.log 2>&1

echo "== /tmp/goldenguided (penguin guided_nuclassemble, default 5+5 iters)"
rm -rf /tmp/goldenguided && mkdir -p /tmp/goldenguided
"$REF_PENGUIN" guided_nuclassemble "$READS1" "$READS2" \
    /tmp/goldenguided/assembly.fasta /tmp/goldenguided/tmp --threads 1 \
    --min-contig-len 150 --delete-tmp-inc 0 > /tmp/goldenguided.log 2>&1

echo "== /tmp/goldenlinclustaa (plass linclust on the 2-iter AA ORF DB)"
rm -rf /tmp/goldenlinclustaa && mkdir -p /tmp/goldenlinclustaa
for f in /tmp/golden2/tmp/latest/aa_6f_start_long*; do
    cp "$f" "/tmp/goldenlinclustaa/$(basename "$f")"
done
"$REF_PLASS" linclust /tmp/goldenlinclustaa/aa_6f_start_long \
    /tmp/goldenlinclustaa/clu /tmp/goldenlinclustaa/tmp --threads 1 \
    > /tmp/goldenlinclustaa.log 2>&1

echo "== /tmp/goldensearch (prefilter / search / convertalis goldens)"
rm -rf /tmp/goldensearch && mkdir -p /tmp/goldensearch
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PYTHONPATH="$REPO" python3 - <<'EOF'
from plass_tpu.data import seqdb
db = seqdb.SeqDB.open("/tmp/golden2/tmp/latest/aa_6f_start_long")
hdb = seqdb.SeqDB.open("/tmp/golden2/tmp/latest/aa_6f_start_long_h")
base = "/tmp/goldensearch/"
for name, keys in (("t", db.keys[:300]), ("q", db.keys[300:350]),
                   ("s", db.keys[:600])):
    keys = [int(k) for k in keys]
    seqdb.subdb(db, keys).save(base + name)
    seqdb.subdb(hdb, keys).save(base + name + "_h")
EOF
cd /tmp/goldensearch
"$REF_PLASS" prefilter q t pref_qt --threads 1 > pref.log 2>&1
"$REF_PLASS" prefilter s s pref_self --threads 1 -s 5.7 >> pref.log 2>&1
"$REF_PLASS" search q t search_qt tmp_qt --threads 1 -a > search.log 2>&1
"$REF_PLASS" search s s search_self tmp_self --threads 1 -s 5 \
    --max-seqs 5000 --min-ungapped-score 100 -a --min-seq-id 0.89 >> search.log 2>&1
"$REF_PLASS" convertalis q t search_qt m8_qt.tsv --threads 1 >> search.log 2>&1
"$REF_PLASS" convertalis s s search_self m8_self.tsv --threads 1 >> search.log 2>&1
"$REF_PLASS" convert2fasta s s.fasta > cluster.log 2>&1
"$REF_PLASS" convert2fasta q q.fasta >> cluster.log 2>&1
"$REF_PLASS" convert2fasta t t.fasta >> cluster.log 2>&1
"$REF_PLASS" cluster s clu_cascaded tmp_clu --threads 1 >> cluster.log 2>&1
"$REF_PLASS" easy-cluster s.fasta ec tmp_ec --threads 1 >> cluster.log 2>&1
"$REF_PLASS" easy-linclust s.fasta el tmp_el --threads 1 >> cluster.log 2>&1
"$REF_PLASS" easy-search q.fasta t.fasta es.tsv tmp_es --threads 1 >> cluster.log 2>&1
"$REF_PLASS" rbh q t rbh_res tmp_rbh --threads 1 >> cluster.log 2>&1
"$REF_PLASS" map q t map_res tmp_map --threads 1 >> cluster.log 2>&1

echo "== /tmp/goldentax (taxonomy fixture + goldens)"
sh "$REPO/util/gen_goldens_tax.sh" "$REF_PLASS"

echo "== /tmp/goldenmh (multi-hit fixture + goldens)"
sh "$REPO/util/gen_goldens_mh.sh" "$REF_PLASS"

echo "all goldens regenerated"
