"""Pallas END_TO_END rescore kernel vs the XLA formulation — exact
equality on real hits (CPU interpret mode; the TPU path is exercised by
bench.py / PLASS_PALLAS=1)."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke


def _pow2_rows(codes, chars, alpha):
    """Pad row arrays to a power-of-two width (the kernel's dynamic
    pltpu.roll constraint; backend._pallas_rows does this on device)."""
    lmax = codes.shape[1]
    w = 1 << (lmax - 1).bit_length()
    if w != lmax:
        codes = np.pad(codes, ((0, 0), (0, w - lmax)),
                       constant_values=alpha - 1)
        chars = np.pad(chars, ((0, 0), (0, w - lmax)))
    return codes, chars, w


@pytest.fixture(scope="module")
def protein_hits(merged_reads):
    from plass_tpu.data import seqdb
    from plass_tpu.ops import orf as orf_mod
    from plass_tpu.ops import translate as tr
    from plass_tpu.ops.backend import db_to_padded, _score_tables
    from plass_tpu.ops.kmermatch import kmermatcher

    reads, _ = merged_reads
    sub = seqdb.subdb(reads, range(600))
    odb, ohdb = orf_mod.extract_orfs(sub, min_length=45, max_length=32734,
                                     max_gaps=0, start_mode=0)
    aa = tr.translate_nucs(odb, ohdb, 1, add_orf_stop=True)
    hits = kmermatcher(aa, 14, kmers_per_sequence=60, hash_shift=67,
                       ignore_multi_kmer=True,
                       include_only_extendable=True)
    codes, lengths, _ = db_to_padded(aa, "score")
    chars, _, _ = db_to_padded(aa, "char")
    lut = aa.id_lookup_array()
    qrow, trow, diag = [], [], []
    for q, v in hits.items():
        for (t, _s, d) in v:
            qrow.append(int(lut[q]))
            trow.append(int(lut[t]))
            diag.append(d)
    sub_flat, comp, c2c, alpha = _score_tables(aa)
    return (codes, chars, lengths, np.array(qrow, np.int32),
            np.array(trow, np.int32), np.array(diag, np.int32),
            sub_flat, comp, c2c, alpha)


def test_pallas_rescore_matches_xla(protein_hits):
    import jax.numpy as jnp
    from plass_tpu.ops.device_rescore import rescore_pairs
    from plass_tpu.ops.pallas_rescore import rescore_pairs_pallas

    (codes, chars, lengths, qrow, trow, diag, sub_flat, comp, c2c,
     alpha) = protein_hits
    assert len(qrow) > 50
    x = rescore_pairs(jnp.asarray(codes), jnp.asarray(chars),
                      jnp.asarray(lengths), jnp.asarray(qrow),
                      jnp.asarray(trow), jnp.asarray(diag),
                      jnp.zeros(len(qrow), bool), jnp.asarray(sub_flat),
                      jnp.asarray(comp), jnp.asarray(c2c), alpha,
                      mode=3, has_rev=False)
    codes_p, chars_p, w = _pow2_rows(codes, chars, alpha)
    p = rescore_pairs_pallas(
        jnp.asarray(codes_p), jnp.asarray(chars_p), jnp.asarray(lengths),
        jnp.asarray(qrow), jnp.asarray(trow), jnp.asarray(diag),
        jnp.asarray(sub_flat.reshape(alpha, alpha)), alpha,
        width=w, interpret=True)
    # unmasked: degenerate (ov <= 0) hits must agree too (first/last -1/-1)
    names = ("score", "first", "last", "ov", "dist", "idents")
    for name, xa, pa in zip(names, x, p):
        xa = np.asarray(xa)
        pa = np.asarray(pa)
        bad = np.nonzero(xa != pa)[0]
        assert len(bad) == 0, (name, bad[:5], xa[bad[:5]], pa[bad[:5]])


def test_pallas_nucl_rev_matches_xla(merged_reads):
    """Nucleotide reverse-strand path (flip + pre-complemented matrix +
    canonical chars): exact equality with the XLA formulation on real
    canonical-k-mer hits, both strands."""
    import jax.numpy as jnp
    from plass_tpu.data import seqdb
    from plass_tpu.ops.backend import db_to_padded, _score_tables
    from plass_tpu.ops.device_rescore import rescore_pairs
    from plass_tpu.ops.kmermatch import kmermatcher
    from plass_tpu.ops.pallas_rescore import rescore_pairs_pallas

    reads, _ = merged_reads
    nucl = seqdb.subdb(reads, range(500))
    hits = kmermatcher(nucl, 22, kmers_per_sequence=60,
                       kmers_per_sequence_scale=0.1, hash_shift=67,
                       ignore_multi_kmer=True,
                       include_only_extendable=True)
    codes, lengths, _ = db_to_padded(nucl, "score")
    chars, _, _ = db_to_padded(nucl, "char")
    lut = nucl.id_lookup_array()
    qrow, trow, diag, qrev = [], [], [], []
    for q, v in hits.items():
        for (t, s, d) in v:
            qrow.append(int(lut[q]))
            trow.append(int(lut[t]))
            diag.append(d)
            qrev.append(1 if s < 0 else 0)
    qrev = np.array(qrev, np.int32)
    assert qrev.sum() > 5, "need reverse-strand hits to exercise the path"
    sub_flat, comp, c2c, alpha = _score_tables(nucl)
    x = rescore_pairs(jnp.asarray(codes), jnp.asarray(chars),
                      jnp.asarray(lengths),
                      jnp.asarray(np.array(qrow, np.int32)),
                      jnp.asarray(np.array(trow, np.int32)),
                      jnp.asarray(np.array(diag, np.int32)),
                      jnp.asarray(qrev.astype(bool)),
                      jnp.asarray(sub_flat), jnp.asarray(comp),
                      jnp.asarray(c2c), alpha, mode=3, has_rev=True)
    codes_p, chars_p, w = _pow2_rows(codes, chars, alpha)
    p = rescore_pairs_pallas(
        jnp.asarray(codes_p), jnp.asarray(chars_p), jnp.asarray(lengths),
        jnp.asarray(np.array(qrow, np.int32)),
        jnp.asarray(np.array(trow, np.int32)),
        jnp.asarray(np.array(diag, np.int32)),
        jnp.asarray(sub_flat.reshape(alpha, alpha)), alpha,
        width=w, interpret=True, qrev=jnp.asarray(qrev),
        comp_perm=jnp.asarray(comp), code2char=jnp.asarray(c2c))
    names = ("score", "first", "last", "ov", "dist", "idents")
    for name, xa, pa in zip(names, x, p):
        xa = np.asarray(xa)
        pa = np.asarray(pa)
        bad = np.nonzero(xa != pa)[0]
        assert len(bad) == 0, (name, bad[:5], xa[bad[:5]], pa[bad[:5]],
                               qrev[bad[:5]])


def test_pallas_product_path_matches_xla(merged_reads, monkeypatch):
    """The PRODUCT path (device-resident hits from kmermatcher_jax
    return_arrays, rescored by index): PLASS_PALLAS=1 must produce records
    identical to the XLA width-bucketed scan."""
    from plass_tpu.data import seqdb
    from plass_tpu.ops import orf as orf_mod
    from plass_tpu.ops import translate as tr
    from plass_tpu.ops.backend import kmermatcher_jax, rescore_diagonal_jax
    from plass_tpu.ops.rescore import RescoreParams

    reads, _ = merged_reads
    sub = seqdb.subdb(reads, range(600))
    odb, ohdb = orf_mod.extract_orfs(sub, min_length=45, max_length=32734,
                                     max_gaps=0, start_mode=0)
    aa = tr.translate_nucs(odb, ohdb, 1, add_orf_stop=True)
    rp = RescoreParams(rescore_mode=3, seq_id_thr=0.9, eval_thr=1e-5)
    hits = kmermatcher_jax(aa, 14, kmers_per_sequence=60, hash_shift=67,
                           ignore_multi_kmer=True,
                           include_only_extendable=True, return_arrays=True)
    assert hits.dev is not None
    monkeypatch.setenv("PLASS_PALLAS", "0")
    xla = rescore_diagonal_jax(aa, hits, rp, return_flat=True)
    monkeypatch.setenv("PLASS_PALLAS", "1")
    pal = rescore_diagonal_jax(aa, hits, rp, return_flat=True)
    np.testing.assert_array_equal(xla["qk"], pal["qk"])
    assert len(xla["rec"]) > 50
    np.testing.assert_array_equal(xla["rec"], pal["rec"])

    # nucleotide product path (reverse-strand hits through the kernel)
    nucl = seqdb.subdb(reads, range(600))
    nrp = RescoreParams(rescore_mode=3, seq_id_thr=0.99, eval_thr=1e-5)
    nhits = kmermatcher_jax(nucl, 22, kmers_per_sequence=60,
                            kmers_per_sequence_scale=0.1, hash_shift=67,
                            ignore_multi_kmer=True,
                            include_only_extendable=True,
                            return_arrays=True)
    assert nhits.dev is not None
    monkeypatch.setenv("PLASS_PALLAS", "0")
    nx = rescore_diagonal_jax(nucl, nhits, nrp, return_flat=True)
    monkeypatch.setenv("PLASS_PALLAS", "1")
    npal = rescore_diagonal_jax(nucl, nhits, nrp, return_flat=True)
    np.testing.assert_array_equal(nx["qk"], npal["qk"])
    assert len(nx["rec"]) > 50
    np.testing.assert_array_equal(nx["rec"], npal["rec"])


def test_pallas_fast_sub_matches_generic(merged_reads):
    """The uniform-matrix fast path (static compare/select chains instead
    of one-hot MXU contractions) is record-exact vs the generic Pallas
    kernel on real nucleotide hits, both strands (interpret mode)."""
    import jax.numpy as jnp
    from plass_tpu.data import seqdb
    from plass_tpu.ops.backend import (db_to_padded, _score_tables,
                                       _fast_sub_pattern)
    from plass_tpu.ops.kmermatch import kmermatcher
    from plass_tpu.ops.pallas_rescore import rescore_pairs_pallas

    reads, _ = merged_reads
    nucl = seqdb.subdb(reads, range(400))
    hits = kmermatcher(nucl, 22, kmers_per_sequence=60,
                       kmers_per_sequence_scale=0.1, hash_shift=67,
                       ignore_multi_kmer=True,
                       include_only_extendable=True)
    codes, lengths, _ = db_to_padded(nucl, "score")
    chars, _, _ = db_to_padded(nucl, "char")
    lut = nucl.id_lookup_array()
    qrow, trow, diag, qrev = [], [], [], []
    for q, v in hits.items():
        for (t, s, d) in v:
            qrow.append(int(lut[q]))
            trow.append(int(lut[t]))
            diag.append(d)
            qrev.append(1 if s < 0 else 0)
    qrev = np.array(qrev, np.int32)
    assert qrev.sum() > 5
    sub_flat, comp, c2c, alpha = _score_tables(nucl)
    fast = _fast_sub_pattern(nucl)
    assert fast is not None and fast[0] == 2 and fast[1] == -3
    codes_p, chars_p, w = _pow2_rows(codes, chars, alpha)
    args = (jnp.asarray(codes_p), jnp.asarray(chars_p),
            jnp.asarray(lengths),
            jnp.asarray(np.array(qrow, np.int32)),
            jnp.asarray(np.array(trow, np.int32)),
            jnp.asarray(np.array(diag, np.int32)),
            jnp.asarray(sub_flat.reshape(alpha, alpha)), alpha)
    kw = dict(width=w, interpret=True, qrev=jnp.asarray(qrev),
              comp_perm=jnp.asarray(comp), code2char=jnp.asarray(c2c))
    gen = rescore_pairs_pallas(*args, **kw)
    fst = rescore_pairs_pallas(*args, fast=fast, **kw)
    names = ("score", "first", "last", "ov", "dist", "idents")
    for name, ga, fa in zip(names, gen, fst):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(fa),
                                      err_msg=name)


def test_pallas_seg_scan_kinds_match_xla():
    """ops/pallas_scan.py: every op kind matches the XLA associative_scan
    bit-for-bit, across block boundaries and with trailing padding
    (interpret mode, shrunken 1K blocks so the SMEM carry crosses many
    grid steps)."""
    import jax
    import jax.numpy as jnp
    from plass_tpu.ops import pallas_scan as ps

    old_blk, old_r = ps.BLK, ps._R
    ps.BLK = 1024
    ps._R = ps.BLK // ps._C
    try:
        rng = np.random.default_rng(3)
        n = 1024 * 4 + 700   # padding + 4 block boundaries
        flag = rng.random(n) < 0.02
        flag[0] = True
        fl = jnp.asarray(flag)
        a = jnp.asarray(rng.integers(-2**31, 2**31, n).astype(np.int32))
        b = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64)
                        .astype(np.uint32))
        c = jnp.asarray(rng.integers(-100, 2**20, n).astype(np.int32))

        def first_op(x, y):
            return (x[0] | y[0],) + tuple(
                jnp.where(y[0], q, p) for p, q in zip(x[1:], y[1:]))
        ref = jax.lax.associative_scan(first_op, (fl, a, b))
        got = ps.seg_scan_pallas("first", fl, a, b, interpret=True)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r).astype(np.int64),
                                          np.asarray(g).astype(np.int64))

        def cm_op(x, y):
            return (x[0] | y[0],
                    jnp.where(y[0], y[1], jnp.maximum(x[1], y[1])))
        ref = jax.lax.associative_scan(cm_op, (fl, a))
        got = ps.seg_scan_pallas("cummax", fl, a, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref[1]),
                                      np.asarray(got[1]))

        def sfx_op(x, y):
            af, ac, apk, ad = x
            bf, bc, bpk, bd = y
            a_wins = ~bf & ((ac > bc) | ((ac == bc) & (apk >= bpk)))
            return (af | bf, jnp.where(a_wins, ac, bc),
                    jnp.where(a_wins, apk, bpk),
                    jnp.where(a_wins, ad, bd))
        pk = jnp.asarray(rng.integers(-1, 2**24, n).astype(np.int32))
        ref = jax.lax.associative_scan(sfx_op, (fl, c, pk, a))
        got = ps.seg_scan_pallas("sfx2", fl, c, pk, a, interpret=True)
        for r, g in zip(ref[1:], got[1:]):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
    finally:
        ps.BLK, ps._R = old_blk, old_r
