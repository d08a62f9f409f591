"""Multi-chip sharding correctness: the hash-range + rep-routed exchange must
produce exactly the single-device hit set for any shard count."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def batch():
    import __graft_entry__ as g
    return g._example_batch(n=32, lmax=48, seed=1)


def _hit_set(cr, ct, cs, cd, cv):
    cr, ct, cs, cd, cv = [np.asarray(x) for x in (cr, ct, cs, cd, cv)]
    return sorted(zip(cr[cv].tolist(), ct[cv].tolist(), cs[cv].tolist(),
                      cd[cv].tolist()))


@pytest.mark.parametrize("n_devices", [1, 2, 4, 8])
def test_sharded_matches_single_device(batch, n_devices):
    import jax
    import jax.numpy as jnp
    from plass_tpu import constants
    from plass_tpu.ops.device_kmer import KmerParams, kmermatch_device
    from plass_tpu.parallel.mesh import make_mesh, sharded_iteration_fn

    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    seqs, lengths, keys = batch
    params = KmerParams.protein_default(ksel=16, kmers_per_sequence=8)
    blosum = constants.blosum62()
    rng = np.random.default_rng(2)
    n, lmax = seqs.shape
    chars = np.zeros((n, lmax), dtype=np.uint8)
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    for i in range(n):
        chars[i, : lengths[i]] = letters[rng.integers(0, 20, lengths[i])]
    codes = blosum.aa2num[chars]

    # range-routed pairs reproduce the single-device absorb=True stream
    # exactly on this workload (no boundary-straddling runs)
    from plass_tpu.ops.device_kmer import (select_kmers, build_pairs,
                                           best_diagonal_hits)
    sk, sp, sv, sh, _ = select_kmers(jnp.asarray(seqs), jnp.asarray(lengths),
                                     params, 67)
    pairs = build_pairs(sk, sp, sv, sh, jnp.asarray(keys),
                        jnp.asarray(lengths), params)
    r, t, s, d, hv = best_diagonal_hits(*pairs, absorb=True)
    single = _hit_set(r, t, s, d, np.asarray(hv))

    mesh = make_mesh(n_devices)
    fn = sharded_iteration_fn(mesh, params, 32 * (params.ksel + 1), 256,
                              blosum.alphabet_size)
    out = fn(jnp.asarray(seqs), jnp.asarray(lengths), jnp.asarray(keys),
             jnp.asarray(codes), jnp.asarray(chars), jnp.asarray(lengths),
             jnp.asarray(blosum.sub.astype(np.int32).reshape(-1)),
             jnp.asarray(np.arange(blosum.alphabet_size, dtype=np.int32)),
             jnp.asarray(blosum.num2aa.astype(np.uint8)),
             jnp.asarray(np.int32(67)))
    assert _hit_set(*out[:5]) == single


def test_sharded_capacity_converges_in_one_retry():
    """Skewed workload (identical-sequence block routing to one shard) at a
    deliberately tight bucket capacity: the selection-demand probe sizes
    stage 2 before compiling, so the exchange converges with AT MOST one
    capacity change (the measured stage-4 pair demand) — each avoided
    retry is a saved full recompile on real hardware."""
    import jax

    import __graft_entry__ as g
    from plass_tpu.ops import backend
    from plass_tpu.ops.backend import kmermatcher_sharded

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    db = g.synthetic_protein_db(n=2048, seed=7, skew_frac=0.3)
    per_shard = -(-db.size // 8)
    hits = kmermatcher_sharded(db, 14, kmers_per_sequence=8, n_devices=8,
                               bucket_capacity=per_shard,
                               return_arrays=True)
    assert len(hits.hit_slots) > 0
    assert backend.LAST_SHARDED_RETRIES <= 1, backend.LAST_SHARDED_RETRIES


def test_multiprocess_matches_single_process(tmp_path):
    """Two jax.distributed processes x 4 virtual CPU devices produce
    exactly the hit set of the single-process 8-device mesh — the
    cross-process equivalent of the reference's MPI hash-range splits
    (kmermatcher.cpp:632-658, MMseqsMPI.cpp:10-25)."""
    import json
    import os
    import socket
    import subprocess
    import sys

    import __graft_entry__ as g
    from plass_tpu.ops.backend import kmermatcher_sharded

    # single-process oracle on the in-test 8-device virtual mesh
    db = g.synthetic_protein_db(n=1024, seed=5, skew_frac=0.2)
    single = kmermatcher_sharded(db, 14, kmers_per_sequence=8, n_devices=8)

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_json = str(tmp_path / "mp_hits.json")
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   PYTHONPATH=repo,  # no axon sitecustomize: CPU-only
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   PLASS_COORDINATOR=f"127.0.0.1:{port}",
                   PLASS_NUM_PROCESSES="2", PLASS_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(repo, "tests", "mp_worker.py"),
             out_json], env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    with open(out_json) as f:
        mp_hits = {int(k): [tuple(x) for x in v]
                   for k, v in json.load(f).items()}
    assert mp_hits == {k: sorted(v) for k, v in single.items()}


@pytest.mark.slow
def test_multiprocess_nuclassemble_byte_identical(tmp_path):
    """The PRODUCT crosses a process boundary: 2 jax.distributed processes
    x 4 virtual CPU devices run the FULL nuclassemble workflow with the
    sharded backend, and every process's output FASTA is byte-identical
    to the reference binary's golden — the cross-process analogue of the
    reference's '$RUNNER wraps the real pipeline' MPI mode
    (data/assemble.sh:92,103; oracle = determinism of merged output)."""
    import os
    import socket
    import subprocess
    import sys

    golden = "/tmp/goldennucl/contigs.fasta"
    if not os.path.exists(golden):
        pytest.skip("nucleotide golden not generated")
    reads1 = "/root/reference/examples/reads_1.fastq.gz"
    reads2 = "/root/reference/examples/reads_2.fastq.gz"
    if not os.path.exists(reads1):
        pytest.skip("example reads unavailable")

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   PYTHONPATH=repo,  # no axon sitecustomize: CPU-only
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   PLASS_COORDINATOR=f"127.0.0.1:{port}",
                   PLASS_NUM_PROCESSES="2", PLASS_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(repo, "tests", "mp_workflow_worker.py"),
             reads1, reads2, str(tmp_path)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=570)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    want = open(golden, "rb").read()
    for pid in range(2):
        got = open(str(tmp_path / f"contigs_p{pid}.fasta"), "rb").read()
        assert got == want, f"process {pid} output differs from golden"


@pytest.mark.slow
def test_multiprocess_assemble_byte_identical(tmp_path):
    """Protein twin of the nuclassemble cross-process test: 2
    jax.distributed processes x 4 virtual CPU devices run the FULL
    protein assemble workflow with the sharded backend; every process's
    output FASTA must be byte-identical to the reference golden (the
    reference's $RUNNER wraps the protein pipeline's heavy steps too,
    data/assemble.sh:92,103)."""
    import os
    import socket
    import subprocess
    import sys

    golden = "/tmp/golden2/assembly.fas"
    if not os.path.exists(golden):
        pytest.skip("protein golden not generated")
    reads1 = "/root/reference/examples/reads_1.fastq.gz"
    reads2 = "/root/reference/examples/reads_2.fastq.gz"
    if not os.path.exists(reads1):
        pytest.skip("example reads unavailable")

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   PYTHONPATH=repo,  # no axon sitecustomize: CPU-only
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   PLASS_COORDINATOR=f"127.0.0.1:{port}",
                   PLASS_NUM_PROCESSES="2", PLASS_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(repo, "tests", "mp_workflow_worker.py"),
             reads1, reads2, str(tmp_path), "protein"], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=570)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    want = open(golden, "rb").read()
    for pid in range(2):
        got = open(str(tmp_path / f"assembly_p{pid}.fas"), "rb").read()
        assert got == want, f"process {pid} output differs from golden"


def test_sharded_backend_kmermatcher(merged_reads):
    """kmermatcher_sharded over the virtual mesh returns the same hit sets
    regardless of device count (pairs routed by contiguous representative
    range, so run absorption is exact per shard — absorb=True)."""
    import jax
    from plass_tpu.data import seqdb
    from plass_tpu.ops import orf as orf_mod
    from plass_tpu.ops import translate as tr
    from plass_tpu.ops.backend import kmermatcher_sharded

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    reads, _ = merged_reads
    sub = seqdb.subdb(reads, range(200))
    odb, ohdb = orf_mod.extract_orfs(sub, min_length=45, max_length=32734,
                                     max_gaps=0, start_mode=0)
    aa = tr.translate_nucs(odb, ohdb, 1, add_orf_stop=True)
    h1 = kmermatcher_sharded(aa, 14, kmers_per_sequence=60, hash_shift=67,
                             ignore_multi_kmer=True,
                             include_only_extendable=False, n_devices=1)
    h8 = kmermatcher_sharded(aa, 14, kmers_per_sequence=60, hash_shift=67,
                             ignore_multi_kmer=True,
                             include_only_extendable=False,
                             n_devices=len(jax.devices()))
    assert {k: sorted(v) for k, v in h1.items()} == \
           {k: sorted(v) for k, v in h8.items()}


def test_sharded_matches_host_absorb_semantics(merged_reads):
    """Range-routed sharded hits vs the host matcher (reference unsplit
    semantics, golden-tested): pair sets must be IDENTICAL; k-mer count
    scores may differ only at the n_shards-1 rep-range segment edges.
    For scale: the reference binary's own --split-memory-limit run
    differs from its unsplit run in 3 records on this read set
    (tests/test_split.py docstring)."""
    import jax
    from plass_tpu.data import seqdb
    from plass_tpu.ops.kmermatch import kmermatcher
    from plass_tpu.ops.backend import kmermatcher_sharded

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    reads, _ = merged_reads
    sub = seqdb.subdb(reads, range(2000))
    kw = dict(kmers_per_sequence=60, kmers_per_sequence_scale=0.1,
              hash_shift=67, ignore_multi_kmer=True,
              include_only_extendable=True)
    host = kmermatcher(sub, 22, **kw)
    shard = kmermatcher_sharded(sub, 22, n_devices=8, **kw)
    hp = {(q, t, d) for q, v in host.items() for (t, s, d) in v}
    sp = {(q, t, d) for q, v in shard.items() for (t, s, d) in v}
    assert hp == sp, (len(hp - sp), len(sp - hp))
    hs = {(q, t, d): s for q, v in host.items() for (t, s, d) in v}
    ss = {(q, t, d): s for q, v in shard.items() for (t, s, d) in v}
    deltas = [k for k in hs if hs[k] != ss[k]]
    # absorb runs are exact within a rep-range segment; only edge cuts
    # may shave counts
    assert len(deltas) <= 8, deltas[:10]


def test_array_fast_path_matches_dict_path(merged_reads):
    """kmermatcher_jax(return_arrays) + rescore == dict-path rescore."""
    from plass_tpu.data import seqdb
    from plass_tpu.ops import orf as orf_mod
    from plass_tpu.ops import translate as tr
    from plass_tpu.ops.backend import kmermatcher_jax, rescore_diagonal_jax
    from plass_tpu.ops.rescore import RescoreParams

    reads, _ = merged_reads
    sub = seqdb.subdb(reads, range(300))
    odb, ohdb = orf_mod.extract_orfs(sub, min_length=45, max_length=32734,
                                     max_gaps=0, start_mode=0)
    aa = tr.translate_nucs(odb, ohdb, 1, add_orf_stop=True)
    kw = dict(kmers_per_sequence=60, hash_shift=67, ignore_multi_kmer=True,
              include_only_extendable=True)
    rp = RescoreParams(rescore_mode=3, seq_id_thr=0.9, eval_thr=1e-5)
    a1 = rescore_diagonal_jax(aa, kmermatcher_jax(aa, 14, **kw), rp)
    a2 = rescore_diagonal_jax(
        aa, kmermatcher_jax(aa, 14, return_arrays=True, **kw), rp)
    assert a1.keys() == a2.keys()
    for k in a1:
        assert np.array_equal(a1[k], a2[k]), k


def test_device_backend_matches_host_kmermatch(merged_reads):
    """Device pipeline == host pipeline on a real (subset) workload."""
    from plass_tpu.data import seqdb
    from plass_tpu.ops import orf as orf_mod
    from plass_tpu.ops import translate as tr
    from plass_tpu.ops.kmermatch import kmermatcher
    from plass_tpu.ops.backend import kmermatcher_jax

    reads, _ = merged_reads
    sub = seqdb.subdb(reads, range(400))
    odb, ohdb = orf_mod.extract_orfs(sub, min_length=45, max_length=32734,
                                     max_gaps=0, start_mode=0)
    aa = tr.translate_nucs(odb, ohdb, 1, add_orf_stop=True)
    host = kmermatcher(aa, 14, kmers_per_sequence=60, hash_shift=67,
                       ignore_multi_kmer=True, include_only_extendable=False)
    dev = kmermatcher_jax(aa, 14, kmers_per_sequence=60, hash_shift=67,
                          ignore_multi_kmer=True, include_only_extendable=False)
    assert host == dev


def test_exchange_overflow_retries_to_exact_results(merged_reads):
    """Forcing bucket overflow must either retry to the exact hit set or
    raise — never silently truncate (VERDICT: skewed hash distributions)."""
    import jax
    from plass_tpu.data import seqdb
    from plass_tpu.ops import orf as orf_mod
    from plass_tpu.ops import translate as tr
    from plass_tpu.ops.backend import kmermatcher_sharded

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    reads, _ = merged_reads
    sub = seqdb.subdb(reads, range(120))
    odb, ohdb = orf_mod.extract_orfs(sub, min_length=45, max_length=32734,
                                     max_gaps=0, start_mode=0)
    aa = tr.translate_nucs(odb, ohdb, 1, add_orf_stop=True)
    kw = dict(kmers_per_sequence=60, hash_shift=67, ignore_multi_kmer=True,
              include_only_extendable=False)
    full = kmermatcher_sharded(aa, 14, n_devices=4, **kw)
    # a capacity far below the k-mer table size is repaired up-front for
    # stage 2 by the selection-demand probe; the stage-4 pair exchange
    # still overflows and the retry loop must recover the exact hit set
    tiny = kmermatcher_sharded(aa, 14, n_devices=4, bucket_capacity=64,
                               max_retries=10, **kw)
    assert {k: sorted(v) for k, v in full.items()} == \
           {k: sorted(v) for k, v in tiny.items()}
    # with retries disabled a stage-4 overflow must raise, not truncate.
    # monkeypatching the probe out reproduces the stage-2 overflow case
    # (an understated capacity must never silently truncate either stage)
    from plass_tpu.ops import backend as backend_mod
    from plass_tpu.parallel import mesh as mesh_mod
    real_probe = mesh_mod.selection_demand_fn
    import numpy as np_
    mesh_mod.selection_demand_fn = lambda *a, **k2: (
        lambda *ops: np_.zeros((4, 4), dtype=np_.int32))
    backend_mod.selection_demand_fn = mesh_mod.selection_demand_fn
    try:
        with pytest.raises(RuntimeError, match="overflow"):
            kmermatcher_sharded(aa, 14, n_devices=4, bucket_capacity=64,
                                max_retries=0, **kw)
    finally:
        mesh_mod.selection_demand_fn = real_probe
        backend_mod.selection_demand_fn = real_probe
