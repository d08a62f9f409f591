#!/bin/sh -e
# Regression harness (reference analogue: util/run_regression.sh).
#
# The reference gates on residue-weighted sensitivity/precision curves of
# `plass assemble` against the Prochlorococcus proteome (BASELINE.md). Its
# regression read set requires network access; in this environment the
# harness instead gates on BYTE EQUALITY with the reference binary on the
# bundled example reads — a strictly stronger check: identical output
# implies identical sensitivity/precision at every threshold.
#
# Usage: util/run_regression.sh [<refPlass> <refPenguin>] [tmpdir]
#   refPlass/refPenguin: reference binaries (default /tmp/refbuild/src/...).
#   If the binaries are missing, the harness falls back to self-consistency
#   (resume determinism: a second run over the same tmp reproduces the
#   output byte for byte).
fail() { echo "REGRESSION FAIL: $1"; exit 1; }

REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF_PLASS="${1:-/tmp/refbuild/src/plass}"
REF_PENGUIN="${2:-/tmp/refbuild/src/penguin}"
TMP="${3:-$(mktemp -d /tmp/plass_regression.XXXXXX)}"
READS_DIR="${READS_DIR:-/root/reference/examples}"
READS1="$READS_DIR/reads_1.fastq.gz"
READS2="$READS_DIR/reads_2.fastq.gz"
[ -f "$READS1" ] || fail "example reads not found under $READS_DIR (set READS_DIR)"
PLASS="$REPO/bin/plass"
PENGUIN="$REPO/bin/penguin"
export PYTHONPATH="$REPO:/root/.axon_site:${PYTHONPATH:-}"
export JAX_PLATFORM_NAME="${JAX_PLATFORM_NAME:-cpu}"

echo "== plass assemble (2 iterations, no NN filter)"
rm -rf "$TMP/mine_aa" && mkdir -p "$TMP/mine_aa"
"$PLASS" assemble "$READS1" "$READS2" "$TMP/mine_aa/assembly.fas" \
    "$TMP/mine_aa/tmp" --num-iterations 2 --filter-proteins 0 \
    || fail "plass assemble died"

echo "== penguin nuclassemble (2 iterations, min-contig 150)"
rm -rf "$TMP/mine_nucl" && mkdir -p "$TMP/mine_nucl"
"$PENGUIN" nuclassemble "$READS1" "$READS2" "$TMP/mine_nucl/contigs.fasta" \
    "$TMP/mine_nucl/tmp" --num-iterations 2 --min-contig-len 150 \
    || fail "penguin nuclassemble died"

echo "== penguin guided_nuclassemble (2 iterations, min-contig 150)"
rm -rf "$TMP/mine_guided" && mkdir -p "$TMP/mine_guided"
"$PENGUIN" guided_nuclassemble "$READS1" "$READS2" \
    "$TMP/mine_guided/assembly.fasta" "$TMP/mine_guided/tmp" \
    --num-iterations 2 --min-contig-len 150 \
    || fail "penguin guided_nuclassemble died"

if [ -x "$REF_PLASS" ] && [ -x "$REF_PENGUIN" ]; then
    echo "== reference oracle runs"
    rm -rf "$TMP/ref_aa" && mkdir -p "$TMP/ref_aa"
    "$REF_PLASS" assemble "$READS1" "$READS2" "$TMP/ref_aa/assembly.fas" \
        "$TMP/ref_aa/tmp" --threads 1 --num-iterations 2 --filter-proteins 0 \
        > "$TMP/ref_aa.log" 2>&1 || fail "reference plass died"
    rm -rf "$TMP/ref_nucl" && mkdir -p "$TMP/ref_nucl"
    "$REF_PENGUIN" nuclassemble "$READS1" "$READS2" \
        "$TMP/ref_nucl/contigs.fasta" "$TMP/ref_nucl/tmp" --threads 1 \
        --num-iterations 2 --min-contig-len 150 \
        > "$TMP/ref_nucl.log" 2>&1 || fail "reference nuclassemble died"
    rm -rf "$TMP/ref_guided" && mkdir -p "$TMP/ref_guided"
    "$REF_PENGUIN" guided_nuclassemble "$READS1" "$READS2" \
        "$TMP/ref_guided/assembly.fasta" "$TMP/ref_guided/tmp" --threads 1 \
        --num-iterations 2 --min-contig-len 150 \
        > "$TMP/ref_guided.log" 2>&1 || fail "reference guided died"

    cmp "$TMP/mine_aa/assembly.fas" "$TMP/ref_aa/assembly.fas" \
        || fail "plass assemble output differs from reference"
    echo "   plass assemble: BYTE-IDENTICAL"
    cmp "$TMP/mine_nucl/contigs.fasta" "$TMP/ref_nucl/contigs.fasta" \
        || fail "nuclassemble output differs from reference"
    echo "   penguin nuclassemble: BYTE-IDENTICAL"
    cmp "$TMP/mine_guided/assembly.fasta" "$TMP/ref_guided/assembly.fasta" \
        || fail "guided_nuclassemble output differs from reference"
    echo "   penguin guided_nuclassemble: BYTE-IDENTICAL"
else
    echo "== reference binaries not found; resume-determinism check"
    rm -f "$TMP/mine_aa/assembly2.fas"
    "$PLASS" assemble "$READS1" "$READS2" "$TMP/mine_aa/assembly2.fas" \
        "$TMP/mine_aa/tmp" --num-iterations 2 --filter-proteins 0 \
        || fail "resumed assemble died"
    cmp "$TMP/mine_aa/assembly.fas" "$TMP/mine_aa/assembly2.fas" \
        || fail "resume changed the output"
    echo "   resume determinism: OK"
fi

n_aa=$(grep -c '^>' "$TMP/mine_aa/assembly.fas")
n_nucl=$(grep -c '^>' "$TMP/mine_nucl/contigs.fasta")
n_guided=$(grep -c '^>' "$TMP/mine_guided/assembly.fasta")
echo "== contig counts: protein=$n_aa nucl=$n_nucl guided=$n_guided"
[ "$n_aa" -gt 0 ] || fail "empty protein assembly"
[ "$n_nucl" -gt 0 ] || fail "empty nucleotide assembly"
[ "$n_guided" -gt 0 ] || fail "empty guided assembly"

echo "== residue-weighted sensitivity/precision gate (10-point curves)"
python3 "$REPO/util/sens_precision.py" "$TMP/sensprec" \
    || fail "sensitivity/precision curve below the frozen baseline"

# Published regression dataset (the reference's primary CI oracle,
# run_regression.sh:8-10 + azure-pipelines.yml:75-86): gate against the
# published Prochlorococcus thresholds when the tarball's contents are
# available.  The URL is NOT reachable from the build environment (zero
# egress; attempted 2026-08-21: `curl -sSI http://wwwuser.gwdg.de/
# ~compbiol/plass/plass_regression_data.tar.gz` -> "curl: (6) Could not
# resolve host") — stage the extracted tarball at PLASS_REGRESSION_DATA
# on a network-connected runner, or let this block fetch it when egress
# exists.
REGDATA="${PLASS_REGRESSION_DATA:-$TMP/regdata}"
if [ ! -f "$REGDATA/allgenomes_reads_sample_1.fastq" ]; then
    mkdir -p "$REGDATA"
    wget -T 20 -qO- "http://wwwuser.gwdg.de/~compbiol/plass/plass_regression_data.tar.gz" \
        | tar -xzC "$REGDATA" 2>/dev/null \
        || echo "== published regression data unreachable (zero-egress environment); skipping published gate"
fi
if [ -f "$REGDATA/allgenomes_reads_sample_1.fastq" ]; then
    echo "== PUBLISHED Prochlorococcus regression gate"
    python3 "$REPO/util/sens_precision.py" --published "$REGDATA" \
        "$TMP/published" \
        || fail "published sens/precision curve below run_regression.sh:78"
fi

echo "REGRESSION PASS"
