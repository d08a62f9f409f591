#!/usr/bin/env python3
"""Benchmark: one assembly iteration (k-mer match + ungapped rescore +
greedy extend) on scaled protein AND nucleotide workloads, with a SCALE
sweep.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...,
"sweep": {scale: {...}}, "nucl": {...}}. The headline metric is protein
reads/s/chip at the LARGEST swept scale.

Workloads replicate the bundled example read set SCALE x with 1.5%
random substitutions (distinct keys) so the k-mer table grows
realistically. The baseline is the reference C++ binary (all cores) on
the same database when a build exists at /tmp/refbuild.

stages_s carries both the wall split per stage and the *_device
components (blocking device dispatch+fetch time, from
plass_tpu.ops.backend.DEVICE_TIME) so device time is separable from
host/RTT in every recorded artifact.

Env knobs: BENCH_SCALES="4" (set "4,16,64" for the sweep; the 16x/64x
workloads route through the auto-split device path and pay several
extra remote compiles), BENCH_NUCL_SCALES (defaults to the first
protein scale; set "4,16" to sweep the PenguiN iteration too),
BENCH_ITERS=3, BENCH_NUCL=1 (include the PenguiN iteration),
BENCH_PROFILE=<dir> (capture a jax.profiler trace of one timed
iteration per workload — the MFU/roofline view), BENCH_CACHE. A
recorded 4/16/64 sweep lives in BENCH_SWEEP_r04.json.
"""
import contextlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

SCALES = [int(s) for s in os.environ.get("BENCH_SCALES", "4").split(",")]
NUCL_SCALES = [int(s) for s in
               os.environ.get("BENCH_NUCL_SCALES", str(SCALES[0])).split(",")]
ITERS = int(os.environ.get("BENCH_ITERS", "3"))
CACHE = os.environ.get("BENCH_CACHE", "/tmp/plass_tpu_bench")
BENCH_NUCL = os.environ.get("BENCH_NUCL", "1") == "1"
PROFILE_DIR = os.environ.get("BENCH_PROFILE")
# roofline-by-default: trace ONE extra (untimed) iteration of the
# headline workload and report per-category device time + achieved HBM
# bandwidth vs the chip's peak (the workload is sort-bound, so bandwidth
# utilization is its MFU). BENCH_ROOFLINE=0 disables.
if PROFILE_DIR is None and os.environ.get("BENCH_ROOFLINE", "1") == "1":
    import tempfile
    PROFILE_DIR = tempfile.mkdtemp(prefix="plass_bench_trace_")


@contextlib.contextmanager
def _maybe_trace(name):
    """jax.profiler trace of one timed iteration (BENCH_PROFILE=<dir>):
    the per-op device timeline TensorBoard renders — the reference's
    equivalent observability is its per-phase timers
    (kmermatcher.cpp:406-436); this is the roofline/MFU view on top."""
    if not PROFILE_DIR:
        yield
        return
    import jax
    with jax.profiler.trace(os.path.join(PROFILE_DIR, name)):
        yield
REF_PLASS = "/tmp/refbuild/src/plass"
REF_PENGUIN = "/tmp/refbuild/src/penguin"
READS = ["/root/reference/examples/reads_1.fastq.gz",
         "/root/reference/examples/reads_2.fastq.gz"]


def _replicate(db, scale, letters, dbtype, path):
    from plass_tpu.data import seqdb

    rng = np.random.default_rng(42)
    writer = seqdb.DBWriter(dbtype)
    key = 0
    for rep in range(scale):
        for i in range(db.size):
            s = np.asarray(db.get_seq(i)).copy()
            if rep > 0:
                mask = rng.random(len(s)) < 0.015
                s[mask] = letters[rng.integers(0, len(letters), mask.sum())]
            writer.write(key, s.tobytes())
            key += 1
    out = writer.finish()
    out.save(path)
    return out


def build_workload(scale):
    """Scaled protein ORF DB (cached)."""
    from plass_tpu.data import seqdb
    from plass_tpu.data.createdb import merge_reads
    from plass_tpu.ops import orf as orf_mod
    from plass_tpu.ops import translate as translate_mod

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"aa_scaled_{scale}")
    if os.path.exists(path + ".dbtype"):
        return seqdb.SeqDB.open(path)
    reads, _ = merge_reads(READS)
    odb, ohdb = orf_mod.extract_orfs(
        reads, min_length=45, max_length=32734, max_gaps=0,
        start_mode=orf_mod.START_TO_STOP, contig_start_mode=2,
        contig_end_mode=2)
    aa = translate_mod.translate_nucs(odb, ohdb, 1, add_orf_stop=True)
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    return _replicate(aa, scale, letters, seqdb.AMINO_ACIDS, path)


def build_nucl_workload(scale):
    """Scaled merged-read nucleotide DB (cached)."""
    from plass_tpu.data import seqdb
    from plass_tpu.data.createdb import merge_reads

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"nucl_scaled_{scale}")
    if os.path.exists(path + ".dbtype"):
        return seqdb.SeqDB.open(path)
    reads, _ = merge_reads(READS)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    return _replicate(reads, scale, letters, seqdb.NUCLEOTIDES, path)


def build_guided_workload(scale):
    """Paired nucleotide+aa ORF DBs for the guided iteration (cached):
    the guided workflow's exact ORF stage (START + LONG concat, aa via
    translatenucs --add-orf-stop, GuidedNuclassembler.cpp:132-145) over
    the scaled merged-read set."""
    from plass_tpu.data import seqdb
    from plass_tpu.ops import orf as orf_mod
    from plass_tpu.ops import translate as tr

    os.makedirs(CACHE, exist_ok=True)
    pn = os.path.join(CACHE, f"guided_nucl_{scale}")
    pa = os.path.join(CACHE, f"guided_aa_{scale}")
    if os.path.exists(pn + ".dbtype") and os.path.exists(pa + ".dbtype"):
        return seqdb.SeqDB.open(pn), seqdb.SeqDB.open(pa)
    reads = build_nucl_workload(scale)
    stops = tr.stop_codons(1)
    starts = tr.start_codons(1, False)
    start_db, start_h = orf_mod.extract_orfs(
        reads, min_length=20, max_length=45, max_gaps=0,
        start_mode=orf_mod.START_TO_STOP, contig_start_mode=1,
        contig_end_mode=0, stop_codons=stops, start_codons=starts)
    long_db, long_h = orf_mod.extract_orfs(
        reads, min_length=45, max_length=32734, max_gaps=0,
        start_mode=orf_mod.START_TO_STOP, contig_start_mode=2,
        contig_end_mode=2, stop_codons=stops, start_codons=starts)
    nucl = seqdb.concat(long_db, start_db)
    hdr = seqdb.concat(long_h, start_h)
    aa = tr.translate_nucs(nucl, hdr, 1, add_orf_stop=True)
    nucl.save(pn)
    aa.save(pa)
    return nucl, aa


def run_guided_device_iteration(nucl, aa, name="guided"):
    """One guided aa iteration: aa kmermatch -> backtrace END_TO_END
    rescore -> proteinaln2nucl -> lockstep guided extend
    (guidedNuclAssemble.sh:81-129; defaults GuidedNuclassembler.cpp:12-15,
    aa seqId 0.97 / nucl 0.99, k 14, gapOpen 5 / gapExtend 2)."""
    from plass_tpu.ops import backend
    from plass_tpu.ops.backend import kmermatcher_jax, rescore_diagonal_jax
    from plass_tpu.ops.evalue import EvalueComputer
    from plass_tpu.ops.proteinaln2nucl import protein_aln_to_nucl
    from plass_tpu.ops.rescore import RescoreParams
    from plass_tpu.assembler.guided_extend import guided_assemble

    ev = EvalueComputer.for_matrix("blosum62_ungapped",
                                   aa.total_residues())
    rp = RescoreParams(rescore_mode=3, seq_id_thr=0.97, cov_thr=0.0,
                       cov_mode=1, eval_thr=1e-5, add_backtrace=True)

    def one(shift, stages=None):
        dt = backend.DEVICE_TIME
        d0 = dict(dt)
        t0 = time.time()
        hits = kmermatcher_jax(aa, 14, kmers_per_sequence=60,
                               kmers_per_sequence_scale=0.1,
                               hash_shift=shift, ignore_multi_kmer=True,
                               include_only_extendable=True,
                               return_arrays=True)
        t1 = time.time()
        alns = rescore_diagonal_jax(aa, hits, rp, ev, return_flat=True)
        t2 = time.time()
        nucl_alns = protein_aln_to_nucl(nucl, aa, alns, 5, 2)
        t3 = time.time()
        n2, a2, _ = guided_assemble(nucl, aa, nucl_alns, seq_id_thr=0.99,
                                    max_seq_len=200000)
        t4 = time.time()
        if stages is not None:
            stages["kmermatch"] += t1 - t0
            stages["rescore"] += t2 - t1
            stages["aln2nucl"] += t3 - t2
            stages["extend"] += t4 - t3
            for k in ("kmermatch", "rescore"):
                stages[k + "_device"] += dt.get(k, 0.0) - d0.get(k, 0.0)
        return n2

    one(66)
    one(67)
    if PROFILE_DIR:
        with _maybe_trace(name):
            one(65)
    stages = {"kmermatch": 0.0, "rescore": 0.0, "aln2nucl": 0.0,
              "extend": 0.0, "kmermatch_device": 0.0, "rescore_device": 0.0}
    t0 = time.time()
    for i in range(ITERS):
        one(68 + i, stages)
    total = (time.time() - t0) / ITERS
    return total, {k: round(v / ITERS, 4) for k, v in stages.items()}


def run_guided_reference_iteration(nucl, aa, scale):
    """Reference penguin guided aa iteration on the same DBs, pinned
    threads, best-of protocol.  Flags mirror GuidedNuclassembler.cpp's
    serialized parameter strings (:147-166)."""
    if not os.path.exists(REF_PENGUIN):
        return None, []
    bn = os.path.join(CACHE, f"refg_nucl_{scale}")
    ba = os.path.join(CACHE, f"refg_aa_{scale}")
    if not os.path.exists(bn + ".dbtype"):
        nucl.save(bn)
    if not os.path.exists(ba + ".dbtype"):
        aa.save(ba)
    times = []
    for rep in range(BASELINE_REPS):
        for i, shift in enumerate((68, 69)):
            pref = os.path.join(CACHE, f"refg_pref{i}")
            aln = os.path.join(CACHE, f"refg_aln{i}")
            alnn = os.path.join(CACHE, f"refg_alnn{i}")
            asmn = os.path.join(CACHE, f"refg_asmn{i}")
            asma = os.path.join(CACHE, f"refg_asma{i}")
            _clean([pref, aln, alnn, asmn, asma])
            t0 = time.time()
            subprocess.run([REF_PENGUIN, "kmermatcher", ba, pref,
                            "--kmer-per-seq", "60", "-k", "14",
                            "--alph-size", "13", "--kmer-per-seq-scale",
                            "0.1", "--hash-shift", str(shift),
                            "--ignore-multi-kmer", "1",
                            "--include-only-extendable", "1", "--mask", "0",
                            "--spaced-kmer-mode", "0", "--cov-mode", "1",
                            "-c", "0", "--threads", NPROC, "-v", "0"],
                           check=True, capture_output=True)
            subprocess.run([REF_PENGUIN, "rescorediagonal", ba, ba, pref,
                            aln, "--rescore-mode", "3", "--min-seq-id",
                            "0.97", "-e", "1e-5", "-c", "0", "--cov-mode",
                            "1", "-a", "--threads", NPROC, "-v", "0"],
                           check=True, capture_output=True)
            subprocess.run([REF_PENGUIN, "proteinaln2nucl", bn, bn, ba, ba,
                            aln, alnn, "--gap-open", "5", "--gap-extend",
                            "2", "--threads", NPROC, "-v", "0"],
                           check=True, capture_output=True)
            subprocess.run([REF_PENGUIN, "guidedassembleresults", bn, ba,
                            alnn, asmn, asma, "--min-seq-id", "0.99",
                            "--max-seq-len", "200000", "--threads", NPROC,
                            "-v", "0"], check=True, capture_output=True)
            times.append(round(time.time() - t0, 4))
    if not times:
        return None, []
    return min(times), times


def run_device_iteration(db, name="protein"):
    """One full protein iteration (jax backend + native extend).

    Returns (seconds, stages) where stages carries the wall split per
    stage plus the pure-device dispatch+fetch time of the k-mer matcher
    (the host-vs-device split the reference's phase timers report,
    kmermatcher.cpp:406-436)."""
    from plass_tpu.ops import backend
    from plass_tpu.ops.backend import kmermatcher_jax, rescore_diagonal_jax
    from plass_tpu.ops.evalue import EvalueComputer
    from plass_tpu.ops.rescore import RescoreParams
    from plass_tpu.assembler.extend import assemble

    ev = EvalueComputer.for_matrix("blosum62_ungapped", db.total_residues())
    rp = RescoreParams(rescore_mode=3, seq_id_thr=0.9, eval_thr=1e-5)

    def one(shift, stages=None):
        dt = backend.DEVICE_TIME
        d0 = dict(dt)
        t0 = time.time()
        hits = kmermatcher_jax(db, 14, kmers_per_sequence=60,
                               hash_shift=shift, ignore_multi_kmer=True,
                               include_only_extendable=True,
                               return_arrays=True)
        t1 = time.time()
        alns = rescore_diagonal_jax(db, hits, rp, ev, return_flat=True)
        t2 = time.time()
        asm, _ = assemble(db, alns, seq_id_thr=0.9, keep_target=True,
                          evaluer=ev)
        t3 = time.time()
        if stages is not None:
            stages["kmermatch"] += t1 - t0
            stages["rescore"] += t2 - t1
            stages["extend"] += t3 - t2
            for k in ("kmermatch", "rescore"):
                stages[k + "_device"] += dt.get(k, 0.0) - d0.get(k, 0.0)
        return asm

    one(66)  # warm up / compile (two shifts: hit-count-dependent pad
    one(67)  # buckets and overlap-width buckets both need populating)
    if PROFILE_DIR:  # traced iteration OUTSIDE the timed loop so trace
        with _maybe_trace(name):  # overhead never skews the artifact
            one(65)
    stages = {"kmermatch": 0.0, "rescore": 0.0, "extend": 0.0,
              "kmermatch_device": 0.0, "rescore_device": 0.0}
    t0 = time.time()
    for i in range(ITERS):
        one(68 + i, stages)
    total = (time.time() - t0) / ITERS
    return total, {k: round(v / ITERS, 4) for k, v in stages.items()}


def run_nucl_device_iteration(db, name="nucl"):
    """One PenguiN nucleotide iteration (jax backend + native extend)."""
    from plass_tpu.ops import backend
    from plass_tpu.ops.backend import kmermatcher_jax, rescore_diagonal_jax
    from plass_tpu.ops.evalue import EvalueComputer
    from plass_tpu.ops.rescore import RescoreParams
    from plass_tpu.assembler.nucl_extend import nucl_assemble

    ev = EvalueComputer.for_matrix("nucleotide_ungapped",
                                   db.total_residues())
    rp = RescoreParams(rescore_mode=3, seq_id_thr=0.99, eval_thr=1e-5)

    def one(shift, stages=None):
        dt = backend.DEVICE_TIME
        d0 = dict(dt)
        t0 = time.time()
        hits = kmermatcher_jax(db, 22, kmers_per_sequence=60,
                               kmers_per_sequence_scale=0.1,
                               hash_shift=shift, ignore_multi_kmer=True,
                               include_only_extendable=True,
                               return_arrays=True)
        t1 = time.time()
        alns = rescore_diagonal_jax(db, hits, rp, ev, return_flat=True)
        t2 = time.time()
        asm, _ = nucl_assemble(db, alns, seq_id_thr=0.99, keep_target=True,
                               evaluer=ev)
        t3 = time.time()
        if stages is not None:
            stages["kmermatch"] += t1 - t0
            stages["rescore"] += t2 - t1
            stages["extend"] += t3 - t2
            for k in ("kmermatch", "rescore"):
                stages[k + "_device"] += dt.get(k, 0.0) - d0.get(k, 0.0)
        return asm

    one(66)
    one(67)
    if PROFILE_DIR:
        with _maybe_trace(name):
            one(65)
    stages = {"kmermatch": 0.0, "rescore": 0.0, "extend": 0.0,
              "kmermatch_device": 0.0, "rescore_device": 0.0}
    t0 = time.time()
    for i in range(ITERS):
        one(68 + i, stages)
    total = (time.time() - t0) / ITERS
    return total, {k: round(v / ITERS, 4) for k, v in stages.items()}


def _clean(paths):
    for p in paths:
        for suf in ("", ".index", ".dbtype"):
            if os.path.exists(p + suf):
                os.unlink(p + suf)


BASELINE_REPS = int(os.environ.get("BENCH_BASELINE_REPS", "3"))
NPROC = str(os.cpu_count() or 1)


def run_reference_iteration(db, scale):
    """Reference plass on the same DB, --threads pinned to all cores,
    BASELINE_REPS repetitions per hash shift, best-of (favoring the
    reference — the reference's own regression pins its workload for
    the same reason, run_regression.sh:8-10).

    Returns (best_seconds, all_run_seconds) or (None, [])."""
    if not os.path.exists(REF_PLASS):
        return None, []
    base = os.path.join(CACHE, f"refdb_{scale}")
    if not os.path.exists(base + ".dbtype"):
        db.save(base)
    times = []
    for rep in range(BASELINE_REPS):
        for i, shift in enumerate((68, 69)):
            pref = os.path.join(CACHE, f"ref_pref{i}")
            aln = os.path.join(CACHE, f"ref_aln{i}")
            asm = os.path.join(CACHE, f"ref_asm{i}")
            _clean([pref, aln, asm])
            t0 = time.time()
            subprocess.run([REF_PLASS, "kmermatcher", base, pref,
                            "--kmer-per-seq", "60", "-k", "14",
                            "--alph-size", "13", "--hash-shift", str(shift),
                            "--ignore-multi-kmer", "1",
                            "--include-only-extendable", "1", "--mask", "0",
                            "--spaced-kmer-mode", "0", "--cov-mode", "0",
                            "-c", "0", "--threads", NPROC, "-v", "0"],
                           check=True, capture_output=True)
            subprocess.run([REF_PLASS, "rescorediagonal", base, base, pref,
                            aln, "--rescore-mode", "3", "--min-seq-id",
                            "0.9", "-e", "1e-5", "-c", "0", "--threads",
                            NPROC, "-v", "0"],
                           check=True, capture_output=True)
            subprocess.run([REF_PLASS, "assembleresults", base, aln, asm,
                            "--min-seq-id", "0.9", "--threads", NPROC,
                            "-v", "0"], check=True, capture_output=True)
            times.append(round(time.time() - t0, 4))
    if not times:  # BENCH_BASELINE_REPS=0: device-only (profiling) run
        return None, []
    return min(times), times


def run_nucl_reference_iteration(db, scale):
    """Reference penguin nucleotide iteration, same best-of protocol.

    Returns (best_seconds, all_run_seconds) or (None, [])."""
    if not os.path.exists(REF_PENGUIN):
        return None, []
    base = os.path.join(CACHE, f"refnucl_{scale}")
    if not os.path.exists(base + ".dbtype"):
        db.save(base)
    times = []
    for rep in range(BASELINE_REPS):
        for i, shift in enumerate((68, 69)):
            pref = os.path.join(CACHE, f"refn_pref{i}")
            aln = os.path.join(CACHE, f"refn_aln{i}")
            asm = os.path.join(CACHE, f"refn_asm{i}")
            _clean([pref, aln, asm])
            t0 = time.time()
            subprocess.run([REF_PENGUIN, "kmermatcher", base, pref,
                            "--kmer-per-seq", "60", "-k", "22",
                            "--kmer-per-seq-scale", "0.1", "--hash-shift",
                            str(shift), "--ignore-multi-kmer", "1",
                            "--include-only-extendable", "1", "--mask", "0",
                            "--spaced-kmer-mode", "0", "--cov-mode", "0",
                            "-c", "0", "--threads", NPROC, "-v", "0"],
                           check=True, capture_output=True)
            subprocess.run([REF_PENGUIN, "rescorediagonal", base, base,
                            pref, aln, "--rescore-mode", "3",
                            "--min-seq-id", "0.99", "-e", "1e-5", "-c", "0",
                            "--threads", NPROC, "-v", "0"],
                           check=True, capture_output=True)
            subprocess.run([REF_PENGUIN, "nuclassembleresults", base, aln,
                            asm, "--min-seq-id", "0.99", "--threads", NPROC,
                            "-v", "0"], check=True, capture_output=True)
            times.append(round(time.time() - t0, 4))
    if not times:
        return None, []
    return min(times), times


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    sweep = {}
    for scale in SCALES:
        _log(f"[bench] building workload scale={scale}")
        db = build_workload(scale)
        _log(f"[bench] device iteration scale={scale} n={db.size}")
        dev_s, stages = run_device_iteration(db, name=f"protein_s{scale}")
        _log(f"[bench] reference baseline scale={scale}")
        ref_s, ref_runs = run_reference_iteration(db, scale)
        sweep[scale] = {
            "n_reads": db.size,
            "iteration_s": round(dev_s, 4),
            "reads_per_s": round(db.size / dev_s, 1),
            "stages_s": stages,
            "baseline_reads_per_s": (round(db.size / ref_s, 1)
                                     if ref_s else None),
            "baseline_runs_s": ref_runs,
            "vs_baseline": (round(ref_s / dev_s, 3) if ref_s else None),
        }
    head_scale = SCALES[-1]
    head = sweep[head_scale]

    nucl = None
    nucl_sweep = {}
    if BENCH_NUCL:
        for nscale in NUCL_SCALES:
            _log(f"[bench] nucleotide workload scale={nscale}")
            ndb = build_nucl_workload(nscale)
            _log(f"[bench] nucleotide device iteration n={ndb.size}")
            ndev_s, nstages = run_nucl_device_iteration(
                ndb, name=f"nucl_s{nscale}")
            _log("[bench] nucleotide reference baseline")
            nref_s, nref_runs = run_nucl_reference_iteration(ndb, nscale)
            nucl_sweep[nscale] = {
                "scale": nscale,
                "n_reads": ndb.size,
                "iteration_s": round(ndev_s, 4),
                "reads_per_s": round(ndb.size / ndev_s, 1),
                "stages_s": nstages,
                "baseline_reads_per_s": (round(ndb.size / nref_s, 1)
                                         if nref_s else None),
                "baseline_runs_s": nref_runs,
                "vs_baseline": (round(nref_s / ndev_s, 3)
                                if nref_s else None),
            }
        # headline = LARGEST swept scale (same convention as protein);
        # per-scale records always live in nucl["sweep"]
        nucl = dict(nucl_sweep[NUCL_SCALES[-1]])
        nucl["headline_scale"] = NUCL_SCALES[-1]
        if len(NUCL_SCALES) > 1:
            nucl["sweep"] = nucl_sweep

    guided = None
    if os.environ.get("BENCH_GUIDED", "0") == "1":
        gscale = int(os.environ.get("BENCH_GUIDED_SCALE", str(SCALES[0])))
        _log(f"[bench] guided workload scale={gscale}")
        gnucl, gaa = build_guided_workload(gscale)
        _log(f"[bench] guided device iteration n={gaa.size}")
        gdev_s, gstages = run_guided_device_iteration(
            gnucl, gaa, name=f"guided_s{gscale}")
        _log("[bench] guided reference baseline")
        gref_s, gref_runs = run_guided_reference_iteration(gnucl, gaa,
                                                           gscale)
        guided = {
            "scale": gscale,
            "n_orfs": gaa.size,
            "iteration_s": round(gdev_s, 4),
            "orfs_per_s": round(gaa.size / gdev_s, 1),
            "stages_s": gstages,
            "baseline_orfs_per_s": (round(gaa.size / gref_s, 1)
                                    if gref_s else None),
            "baseline_runs_s": gref_runs,
            "vs_baseline": (round(gref_s / gdev_s, 3) if gref_s else None),
        }

    roofline = None
    if PROFILE_DIR:
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "util"))
            from roofline import analyze_dir
            full = analyze_dir(PROFILE_DIR)
            key = f"protein_s{head_scale}"
            r = full.get(key) or next(iter(full.values()))
            roofline = {
                "workload": key,
                "device": r["device"],
                "peak_hbm_gibps": r["peak_hbm_gibps"],
                "total_device_us": r["total_device_us"],
                "categories_us": r["categories_us"],
                "sort_self_us": r["sort_self_us"],
                "sort_achieved_hbm_gibps": r["sort_achieved_hbm_gibps"],
                "sort_pct_of_peak_hbm": r["sort_pct_of_peak_hbm"],
                "top_ops": [
                    {k: o[k] for k in ("op", "category", "self_us",
                                       "occurrences",
                                       "achieved_hbm_gibps",
                                       "pct_of_peak_hbm", "bound_by")}
                    for o in r["top_ops"][:5]],
            }
        except Exception as e:  # pragma: no cover - xprof optional
            _log(f"[bench] roofline analysis unavailable: {e}")

    print(json.dumps({
        "metric": "iteration_reads_per_s_per_chip",
        "value": head["reads_per_s"],
        "unit": "reads/s",
        "vs_baseline": head["vs_baseline"] or 1.0,
        "scale": head_scale,
        "n_reads": head["n_reads"],
        "iteration_s": head["iteration_s"],
        "stages_s": head["stages_s"],
        "baseline_reads_per_s": head["baseline_reads_per_s"],
        "sweep": sweep,
        "nucl": nucl,
        "guided": guided,
        "roofline": roofline,
    }))


if __name__ == "__main__":
    main()
