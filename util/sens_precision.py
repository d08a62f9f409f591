#!/usr/bin/env python3
"""Quantitative sensitivity/precision regression gate.

The reference gates every CI build on residue-weighted sensitivity and
precision curves of `plass assemble` against the Prochlorococcus proteome
(/root/reference/util/run_regression.sh:33-78, expected values at :78).
Its read set needs network access; this harness reproduces the SAME
metric on a deterministic synthetic community generated in-process:

 1. a seeded proteome (120 proteins, 100-400 aa) is reverse-translated
    into genomes and shredded into error-bearing paired 150 bp reads
 2. `plass assemble` (this repo) assembles them
 3. assembly<->proteome searches (this repo's `search`) produce
    alignment sets; for seq-id thresholds 0.90..0.99 the residue-weighted
    mapped fraction is computed exactly as the reference's awk
    (`mapped_distribution` / `mapped_fraction`,
    run_regression.sh:19-31): per query, the best query-coverage
    alignment weighted by query length, over the total residue mass
 4. when the reference binary exists (REF_PLASS, default
    /tmp/refbuild/src/plass), the SAME community is assembled with the
    reference `plass assemble` and both assemblies' curves are computed
    with the same comparator — the gate then anchors each point to the
    REFERENCE curve - 0.005 (the reference's own tolerance,
    run_regression.sh:73).  Without the binary, the frozen expected
    values below are the fallback gate.

Usage: python util/sens_precision.py [workdir]
Exit 0 = curves clear the gate; prints all curves either way.
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# frozen from the first run of this harness (measured on the synthetic
# community at seed 11: sens flat at 0.943 — random proteins have no
# near-duplicate confusion below 0.98 — precision 0.869 dropping to 0.720
# at 0.99); the gate catches any later change that degrades assembly
# quality, exactly like the reference's frozen curve
# (run_regression.sh:78)
EXPECTED_SENS = [0.943, 0.943, 0.943, 0.943, 0.943, 0.943, 0.943, 0.943,
                 0.943, 0.943]
EXPECTED_PREC = [0.869, 0.869, 0.869, 0.869, 0.869, 0.869, 0.869, 0.867,
                 0.856, 0.720]
THRESHOLDS = [0.90 + 0.01 * i for i in range(10)]
LENCUT = 100


def make_community(workdir, n_proteins=120, seed=11):
    """Deterministic proteome + paired error-bearing reads."""
    from plass_tpu.constants import genetic_codes

    rng = np.random.default_rng(seed)
    aa_letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    # codon table 1: aa char -> list of codons, via the 17^3 IUPAC-class
    # LUT restricted to the four unambiguous bases
    gc = genetic_codes()
    lut, _starts = gc[1]
    ncls = gc["nucl_class"]
    by_aa = {}
    for b1 in "ACGT":
        for b2 in "ACGT":
            for b3 in "ACGT":
                aa = chr(lut[ncls[ord(b1)], ncls[ord(b2)], ncls[ord(b3)]])
                by_aa.setdefault(aa, []).append(b1 + b2 + b3)
    proteins = []
    genomes = []
    for i in range(n_proteins):
        ln = int(rng.integers(100, 400))
        prot = aa_letters[rng.integers(0, 20, ln)]
        proteins.append(prot.tobytes().decode())
        dna = ["ATG"]
        for ch in proteins[-1]:
            opts = by_aa[ch]
            dna.append(opts[int(rng.integers(0, len(opts)))])
        dna.append(by_aa["*"][0])
        genomes.append("".join(dna))
    with open(os.path.join(workdir, "proteome.fasta"), "w") as f:
        for i, p in enumerate(proteins):
            f.write(f">prot{i}\n{p}\n")
    # paired reads: insert 280-450, read len 150, 0.3% substitutions,
    # ~10x coverage
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = {65: 84, 67: 71, 71: 67, 84: 65}
    r1 = open(os.path.join(workdir, "reads_1.fastq"), "w")
    r2 = open(os.path.join(workdir, "reads_2.fastq"), "w")
    rid = 0
    for g in genomes:
        garr = np.frombuffer(g.encode(), dtype=np.uint8)
        n_pairs = max(1, (len(g) * 10) // (2 * 150))
        for _ in range(n_pairs):
            insert = int(rng.integers(280, min(451, max(281, len(g)))))
            start = int(rng.integers(0, max(1, len(g) - insert)))
            frag = garr[start: start + insert].copy()
            # substitutions
            mask = rng.random(len(frag)) < 0.003
            frag[mask] = nt[rng.integers(0, 4, int(mask.sum()))]
            fwd = frag[:150]
            rev = frag[-150:][::-1]
            rev = np.array([comp.get(int(c), 78) for c in rev], dtype=np.uint8)
            q = "I" * len(fwd)
            r1.write(f"@r{rid}/1\n{fwd.tobytes().decode()}\n+\n{q}\n")
            r2.write(f"@r{rid}/2\n{rev.tobytes().decode()}\n+\n{q}\n")
            rid += 1
    r1.close()
    r2.close()
    return rid


def mapped_fraction(index_lens, best_cov_len, lencut):
    """run_regression.sh:27-31: total residue mass of entries with index
    length > lencut vs the sum of (best query coverage x query length)
    over queries whose qLen >= lencut."""
    total = int(sum(l for l in index_lens if l > lencut))
    aligned = float(sum(cov * ln for cov, ln in best_cov_len
                        if ln >= lencut))
    return total, aligned, (aligned / total if total else 0.0)


def curve(qdb, alns, thresholds, lencut):
    """Residue-weighted mapped fraction at each seq-id threshold.

    alns: {query_key: RESULT_DTYPE array}; per query the max
    (1+qEnd-qStart)/qLen over records passing the threshold
    (mapped_distribution, run_regression.sh:19-23)."""
    index_lens = [int(x) for x in qdb.lengths]  # raw index $3 (payload+2)
    points = []
    for thr in thresholds:
        best = []
        for key, rec in alns.items():
            if len(rec) == 0:
                continue
            sel = rec[np.round(rec["seqId"], 3) >= thr - 1e-9]
            if len(sel) == 0:
                continue
            cov = (1 + sel["qEndPos"] - sel["qStartPos"]) / sel["qLen"]
            best.append((float(cov.max()), int(sel["qLen"][0])))
        points.append(mapped_fraction(index_lens, best, lencut))
    return points


def assembly_curves(workdir, out_fa, tag, reference_fa=None,
                    reference_nr_fa=None):
    """Curves for one assembly FASTA via this repo's search machinery —
    the shared comparator, so reference and repo assemblies are measured
    identically.

    reference_fa / reference_nr_fa: the proteome FASTAs for precision
    (assembly -> REFERENCE) and sensitivity (REFERENCENR -> assembly),
    exactly the reference's evaluate() split (run_regression.sh:33-59).
    Defaults to the synthetic community's single proteome for both."""
    from plass_tpu.data import seqdb
    from plass_tpu.data.createdb import create_db
    from plass_tpu.workflow.search import SearchParams, run_search
    from plass_tpu.cli.tools import load_alignments

    if reference_fa is None:
        reference_fa = os.path.join(workdir, "proteome.fasta")
    if reference_nr_fa is None:
        reference_nr_fa = reference_fa
    asm, _asm_h = create_db([out_fa])
    pro, _pro_h = create_db([reference_fa])
    # length cutoff (evaluate(), run_regression.sh:40-42): index len > 100
    keep = [int(k) for i, k in enumerate(asm.keys)
            if int(asm.lengths[i]) > LENCUT]
    asm100 = seqdb.subdb(asm, keep)

    # precision: assembly -> proteome (search params run_regression.sh:44)
    prec_out = os.path.join(workdir, f"asm_vs_ref_{tag}")
    run_search(asm100, pro, prec_out, os.path.join(workdir, f"s1tmp_{tag}"),
               SearchParams(sensitivity=5.0, max_seqs=5000,
                            min_ungapped_score=100, add_backtrace=True,
                            seq_id_thr=0.89))
    prec = curve(asm100, load_alignments(prec_out), THRESHOLDS, LENCUT)

    # sensitivity: proteome(nr) -> assembly (run_regression.sh:52)
    pro_nr = pro if reference_nr_fa == reference_fa \
        else create_db([reference_nr_fa])[0]
    sens_out = os.path.join(workdir, f"ref_vs_asm_{tag}")
    run_search(pro_nr, asm100, sens_out,
               os.path.join(workdir, f"s2tmp_{tag}"),
               SearchParams(max_seqs=500000, add_backtrace=True,
                            seq_id_thr=0.89))
    sens = curve(pro_nr, load_alignments(sens_out), THRESHOLDS, LENCUT)
    return sens, prec


# Published CI thresholds for the Prochlorococcus regression dataset
# (util/run_regression.sh:78 in the reference; BASELINE.md), gated at
# value - 0.005 exactly like the reference's check().
PUBLISHED_SENS = [0.495, 0.474, 0.451, 0.422, 0.389, 0.343, 0.295, 0.245,
                  0.196, 0.133]
PUBLISHED_PREC = [0.980, 0.980, 0.979, 0.979, 0.977, 0.974, 0.965, 0.940,
                  0.864, 0.649]


def published_main(datadir, workdir):
    """Gate against the PUBLISHED regression dataset
    (plass_regression_data.tar.gz extracted into `datadir`): default
    `plass assemble` on allgenomes_reads_sample_{1,2}.fastq, curves vs
    prochloroccus_allproteins(.nr), thresholds from run_regression.sh:78.

    The tarball URL (http://wwwuser.gwdg.de/~compbiol/plass/
    plass_regression_data.tar.gz) is unreachable from this build
    environment (zero egress — DNS does not resolve; attempted
    2026-08-21, `curl: (6) Could not resolve host`), so this mode only
    runs where the data was staged, e.g. on a network-connected nightly
    runner via util/run_regression.sh's PLASS_REGRESSION_DATA hook."""
    os.makedirs(workdir, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    reads1 = os.path.join(datadir, "allgenomes_reads_sample_1.fastq")
    reads2 = os.path.join(datadir, "allgenomes_reads_sample_2.fastq")
    ref_fa = os.path.join(datadir, "prochloroccus_allproteins.fasta")
    refnr_fa = os.path.join(datadir, "prochloroccus_allproteins_nr.fasta")
    for p in (reads1, reads2, ref_fa, refnr_fa):
        if not os.path.exists(p):
            print(f"published dataset incomplete: missing {p}",
                  file=sys.stderr)
            return 2
    out_fa = os.path.join(workdir, "final.contigs.aa.fa")
    if os.path.exists(out_fa):
        os.unlink(out_fa)
    env = dict(os.environ, PYTHONPATH=repo)
    # default parameters — the published numbers came from plain
    # `plass assemble R1 R2 out tmp` (run_regression.sh:10)
    subprocess.run(
        [sys.executable, "-m", "plass_tpu.cli.plass", "assemble",
         reads1, reads2, out_fa, os.path.join(workdir, "tmp")],
        check=True, cwd=repo, env=env)
    sens, prec = assembly_curves(workdir, out_fa, "published",
                                 reference_fa=ref_fa,
                                 reference_nr_fa=refnr_fa)
    ok = True
    print("metric thr total aligned fraction published")
    for name, pts, exp in (("sens", sens, PUBLISHED_SENS),
                           ("prec", prec, PUBLISHED_PREC)):
        for thr, (tot, aln, frac), e in zip(THRESHOLDS, pts, exp):
            good = frac >= e - 0.005
            ok &= good
            print(f"{name} {thr:.2f} {tot} {aln:.0f} {frac:.3f} {e:.3f} "
                  f"{'ok' if good else 'FAIL'}")
    print("published regression gate " + ("passed" if ok else "FAILED"))
    return 0 if ok else 1


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--published":
        datadir = sys.argv[2]
        workdir = sys.argv[3] if len(sys.argv) > 3 \
            else "/tmp/plass_published_regression"
        return published_main(datadir, workdir)
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plass_sensprec"
    os.makedirs(workdir, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    make_community(workdir)
    out_fa = os.path.join(workdir, "assembly.fas")
    if os.path.exists(out_fa):
        os.unlink(out_fa)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo)  # CPU-pinned for gate determinism
    subprocess.run(
        [sys.executable, "-m", "plass_tpu.cli.plass", "assemble",
         os.path.join(workdir, "reads_1.fastq"),
         os.path.join(workdir, "reads_2.fastq"),
         out_fa, os.path.join(workdir, "tmp"),
         "--num-iterations", "4", "--filter-proteins", "0"],
        check=True, cwd=repo, env=env)
    sens, prec = assembly_curves(workdir, out_fa, "repo")

    # anchor: same community through the reference binary, same comparator
    ref_plass = os.environ.get("REF_PLASS", "/tmp/refbuild/src/plass")
    ref_sens = ref_prec = None
    if os.path.exists(ref_plass):
        ref_fa = os.path.join(workdir, "assembly_refbin.fas")
        if os.path.exists(ref_fa):
            os.unlink(ref_fa)
        subprocess.run(
            [ref_plass, "assemble",
             os.path.join(workdir, "reads_1.fastq"),
             os.path.join(workdir, "reads_2.fastq"),
             ref_fa, os.path.join(workdir, "reftmp"),
             "--num-iterations", "4", "--filter-proteins", "0",
             "--threads", "1", "-v", "1"], check=True)
        ref_sens, ref_prec = assembly_curves(workdir, ref_fa, "refbin")
        import filecmp
        if filecmp.cmp(out_fa, ref_fa, shallow=False):
            print("repo assembly is BYTE-IDENTICAL to the reference "
                  "binary's on this community")

    ok = True
    print("metric thr total aligned fraction expected source")
    for name, pts, frozen, ref in (("sens", sens, EXPECTED_SENS, ref_sens),
                                   ("prec", prec, EXPECTED_PREC, ref_prec)):
        for i, (thr, (tot, aln, frac), e) in enumerate(
                zip(THRESHOLDS, pts, frozen)):
            if ref is not None:
                e, src = ref[i][2], "refbin"
            else:
                src = "frozen"
            good = frac >= e - 0.005
            ok &= good
            print(f"{name} {thr:.2f} {tot} {aln:.0f} {frac:.3f} {e:.3f} "
                  f"{src} {'ok' if good else 'FAIL'}")
    if not ok:
        print("sens/precision gate FAILED", file=sys.stderr)
        return 1
    print("sens/precision gate passed"
          + (" (anchored to the reference binary)" if ref_sens else
             " (frozen fallback curve)"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
