#!/bin/sh -e
# Multi-hit golden fixtures (multihitdb/multihitsearch/combinepvalperset).
# Called by util/gen_goldens.sh (expects /tmp/goldennucl to exist).
REF_PLASS="${1:-/tmp/refbuild/src/plass}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

rm -rf /tmp/goldenmh && mkdir -p /tmp/goldenmh
PYTHONPATH="$REPO" python3 - <<'PYEOF'
import sys
from plass_tpu.data import seqdb
db = seqdb.SeqDB.open("/tmp/goldennucl/tmp/latest/nucl_reads")
picked = []
i = 0
# all-X ORFs hit uninitialized-profile UB in the reference's identity
# scoring, so use N-free reads only
while len(picked) < 30 and i < db.size:
    seq = db.get_seq(i).tobytes().decode()
    if "N" not in seq.upper():
        picked.append(seq)
    i += 1
with open("/tmp/goldenmh/g1.fasta", "w") as f1, \
        open("/tmp/goldenmh/g2.fasta", "w") as f2:
    for n, seq in enumerate(picked):
        (f1 if n < 15 else f2).write(f">read{n}\n{seq}\n")
PYEOF

cd /tmp/goldenmh
"$REF_PLASS" multihitdb g1.fasta g2.fasta mh tmp_db --threads 1 > mh.log 2>&1
"$REF_PLASS" multihitsearch mh mh mhs tmp_s --threads 1 >> mh.log 2>&1
"$REF_PLASS" combinepvalperset mh mh mhs cpv tmp_c --threads 1 >> mh.log 2>&1
echo "multihit goldens regenerated"
