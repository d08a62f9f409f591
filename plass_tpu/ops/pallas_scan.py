"""Pallas TPU kernels for the segmented scans of the device k-mer
matcher (pairs_from_table's representative first-carry; the run/segment
scans of best_diagonal_hits).

XLA lowers jax.lax.associative_scan as a ~2·log2(N)-level slice/pad tree
with every level materialized through HBM: a 3-operand 2M-element scan
measured 7.8 ms on v5e — ~25x off what VMEM-resident levels achieve
(0.32 ms, measured) — and the split path runs one per hash range (10+
ranges at bench scale 64).  Each 64K-element grid step does a 7-level
lane-dimension Hillis-Steele, a 9-level sublane scan of the row
summaries, and carries the running prefix across steps in SMEM — one
HBM read + one write per operand total.

Supported op kinds (inclusive scans over (flag, *vals) int32 tuples):
  "first"  — op(a,b) = (af|bf, bv if bf else av).  CONTRACT: flag[0]
             must be True (all call sites start a segment at index 0);
             rolled-in lane padding then never escapes.
  "cummax" — op(a,b) = (af|bf, bv if bf else max(av, bv)); identity
             val INT32_MIN.
  "sfx2"   — vals (c, pk, d): op(a,b) keeps a iff ~bf and (ac,apk)
             lexicographically >= (bc,bpk), else b; flag ORs; identity
             (INT32_MIN, INT32_MIN, anything).  (The suffix form is the
             caller's flip around this forward scan.)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover - CPU-only environments
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

BLK = 65536
_C = 128
_R = BLK // _C
_IMIN = -2147483648


def _identity_vals(kind, nvals):
    if kind == "first":
        return [0] * nvals
    if kind == "cummax":
        return [_IMIN] * nvals
    if kind == "sfx2":
        return [_IMIN, _IMIN] + [0] * (nvals - 2)
    raise ValueError(kind)


def _combine(kind, a, b):
    """op(earlier, later) on (flag, *vals) tuples of arrays/scalars."""
    af, avs = a[0], a[1:]
    bf, bvs = b[0], b[1:]
    f = af | bf
    if kind == "first":
        return (f,) + tuple(jnp.where(bf > 0, bv, av)
                            for av, bv in zip(avs, bvs))
    if kind == "cummax":
        return (f,) + tuple(jnp.where(bf > 0, bv, jnp.maximum(av, bv))
                            for av, bv in zip(avs, bvs))
    if kind == "sfx2":
        ac, apk = avs[0], avs[1]
        bc, bpk = bvs[0], bvs[1]
        a_wins = (bf == 0) & ((ac > bc) | ((ac == bc) & (apk >= bpk)))
        return (f,) + tuple(jnp.where(a_wins, av, bv)
                            for av, bv in zip(avs, bvs))
    raise ValueError(kind)


def _roll_down(x, d, axis, interpret):
    """x shifted towards HIGHER indices by static d (callers mask the
    wrapped-in elements to the op identity)."""
    if interpret or pltpu is None:
        return jnp.roll(x, d, axis=axis)
    return pltpu.roll(x, d, axis)


def _kern(*refs, kind, nvals, interpret):
    with jax.enable_x64(False):
        _kern_body(*refs, kind=kind, nvals=nvals, interpret=interpret)


def _kern_body(*refs, kind, nvals, interpret):
    f_ref = refs[0]
    v_refs = refs[1:1 + nvals]
    of_ref = refs[1 + nvals]
    ov_refs = refs[2 + nvals:2 + 2 * nvals]
    carry = refs[-1]  # SMEM (1 + nvals,) int32
    step = pl.program_id(0)
    idv = _identity_vals(kind, nvals)

    f = f_ref[...]                       # (R, C) int32 0/1
    vs = [r[...] for r in v_refs]
    lane = jax.lax.broadcasted_iota(jnp.int32, (_R, _C), 1)
    d = 1
    while d < _C:                        # within-row prefix (lanes)
        keep = lane >= d
        sf = jnp.where(keep, _roll_down(f, d, 1, interpret), 0)
        svs = [jnp.where(keep, _roll_down(v, d, 1, interpret),
                         jnp.int32(i0))
               for v, i0 in zip(vs, idv)]
        out = _combine(kind, (sf,) + tuple(svs), (f,) + tuple(vs))
        f, vs = out[0], list(out[1:])
        d *= 2

    # inclusive row-summary scan (sublanes) on the last-lane column
    rowi = jax.lax.broadcasted_iota(jnp.int32, (_R, 1), 0)
    pf = f[:, _C - 1:_C]
    pvs = [v[:, _C - 1:_C] for v in vs]
    d = 1
    while d < _R:
        keep = rowi >= d
        sf = jnp.where(keep, _roll_down(pf, d, 0, interpret), 0)
        svs = [jnp.where(keep, _roll_down(v, d, 0, interpret),
                         jnp.int32(i0))
               for v, i0 in zip(pvs, idv)]
        out = _combine(kind, (sf,) + tuple(svs), (pf,) + tuple(pvs))
        pf, pvs = out[0], list(out[1:])
        d *= 2

    # exclusive row prefix: rows shifted down one; row 0 gets identity
    keep0 = rowi >= 1
    qf = jnp.where(keep0, _roll_down(pf, 1, 0, interpret), 0)
    qvs = [jnp.where(keep0, _roll_down(v, 1, 0, interpret), jnp.int32(i0))
           for v, i0 in zip(pvs, idv)]

    # fold in the cross-step SMEM carry: op(carry, Q_r)
    cf = jnp.where(step == 0, 0, carry[0])
    cvs = [jnp.where(step == 0, jnp.int32(i0), carry[1 + i])
           for i, i0 in enumerate(idv)]
    rout = _combine(kind, (cf,) + tuple(cvs), (qf,) + tuple(qvs))
    rf, rvs = rout[0], rout[1:]

    # final combine: op(carry_in_row, within)
    fout = _combine(kind, (rf,) + tuple(rvs), (f,) + tuple(vs))
    of_ref[...] = fout[0]
    for i in range(nvals):
        ov_refs[i][...] = fout[1 + i]

    # update the carry with the block summary op(old, P_last) — scalar
    # extraction of a vector element has no Mosaic lowering, so the last
    # row's values come out as masked max reductions (jnp.sum on ints
    # re-widens to i64 under the session's global x64 mode)
    last = rowi == _R - 1
    bf = jnp.max(jnp.where(last, pf, 0))
    bvs = [jnp.max(jnp.where(last, v, jnp.int32(_IMIN))) for v in pvs]
    old = (jnp.where(step == 0, 0, carry[0]),) + tuple(
        jnp.where(step == 0, jnp.int32(i0), carry[1 + i])
        for i, i0 in enumerate(idv))
    new = _combine(kind, old, (bf,) + tuple(bvs))
    carry[0] = new[0]
    for i in range(nvals):
        carry[1 + i] = new[1 + i]


@functools.partial(jax.jit, static_argnames=("kind", "nvals", "interpret"))
def _scan_padded(f, vs, kind, nvals, interpret):
    from jax.experimental.pallas import tpu as _pt

    n = f.shape[0]
    rows = n // _C
    grid = n // BLK
    args = [f.reshape(rows, _C)] + [v.reshape(rows, _C) for v in vs]
    spec = pl.BlockSpec((_R, _C), lambda i: (i, 0))
    out = pl.pallas_call(
        functools.partial(_kern, kind=kind, nvals=nvals,
                          interpret=interpret),
        grid=(grid,),
        in_specs=[spec] * (1 + nvals),
        out_specs=[spec] * (1 + nvals),
        out_shape=[jax.ShapeDtypeStruct((rows, _C), jnp.int32)]
        * (1 + nvals),
        scratch_shapes=[_pt.SMEM((1 + nvals,), jnp.int32)],
        interpret=interpret,
    )(*args)
    return tuple(o.reshape(-1) for o in out)


def seg_scan_pallas(kind, flag, *vals, interpret=False):
    """Inclusive segmented scan of `kind` over (flag, *vals); int32
    vals (u32 inputs are bitcast through i32 and back — order-preserving
    only for ops that never COMPARE them, i.e. "first").  Arbitrary
    lengths (padded to a 64K multiple internally; trailing padding never
    affects prefixes of real elements)."""
    n = flag.shape[0]
    pad = (-n) % BLK
    f = flag.astype(jnp.int32)
    dts = [v.dtype for v in vals]
    vs = [jax.lax.bitcast_convert_type(v, jnp.int32)
          if v.dtype == jnp.uint32 else v.astype(jnp.int32) for v in vals]
    if pad:
        idv = _identity_vals(kind, len(vs))
        f = jnp.concatenate([f, jnp.zeros(pad, jnp.int32)])
        vs = [jnp.concatenate([v, jnp.full(pad, i0, jnp.int32)])
              for v, i0 in zip(vs, idv)]
    with jax.enable_x64(False):
        # (the session runs global x64 for u64 k-mers, under which
        # BlockSpec index-map constants lower as i64 — Mosaic rejects)
        out = _scan_padded(f, tuple(vs), kind, len(vs), interpret)
    of = out[0][:n].astype(bool)
    ovs = []
    for o, dt in zip(out[1:], dts):
        o = o[:n]
        if dt == jnp.uint32:
            o = jax.lax.bitcast_convert_type(o, jnp.uint32)
        else:
            o = o.astype(dt)
        ovs.append(o)
    return (of, *ovs)


def first_carry_pallas(flag, *vals, interpret=False):
    """Segmented first-carry: flag[0] must be True (see module doc)."""
    return seg_scan_pallas("first", flag, *vals, interpret=interpret)


def use_pallas_scan():
    """Pallas scans on the product path: default on real TPUs, off
    elsewhere (the XLA associative_scan is fine on CPU); PLASS_PALLAS_SCAN
    overrides."""
    import os
    v = os.environ.get("PLASS_PALLAS_SCAN")
    if v is not None:
        return v == "1"
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
