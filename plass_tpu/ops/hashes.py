"""Exact XXH64 for 8-byte little-endian inputs, vectorized.

The k-mer matcher selects k-mers by the low 16 bits of
XXH64(uint64 kmer_index, seed=hashShift) (reference:
lib/mmseqs/src/linclust/kmermatcher.cpp:33-38,161,205). Selection parity
requires the exact hash. Implemented for NumPy (host) and JAX (device);
both operate on uint64 lanes.
"""
import jax.numpy as jnp
import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _u64(x):
    return np.uint64(x)


def xxh64_u64_np(values, seed):
    """XXH64 of each uint64 (as 8 LE bytes) with the given seed. NumPy."""
    v = np.asarray(values, dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = _u64((seed + _P5 + 8) & _M64)
        k1 = v * _u64(_P2)
        k1 = (k1 << _u64(31)) | (k1 >> _u64(33))
        k1 = k1 * _u64(_P1)
        acc = acc ^ k1
        acc = ((acc << _u64(27)) | (acc >> _u64(37))) * _u64(_P1) + _u64(_P4)
        acc ^= acc >> _u64(33)
        acc = acc * _u64(_P2)
        acc ^= acc >> _u64(29)
        acc = acc * _u64(_P3)
        acc ^= acc >> _u64(32)
    return acc


def xxh64_u64_jnp(values, seed):
    """Same as xxh64_u64_np but traceable on device (uint64 emulated on TPU)."""
    p1 = np.uint64(_P1)
    p2 = np.uint64(_P2)
    p3 = np.uint64(_P3)
    p4 = np.uint64(_P4)
    v = values.astype(jnp.uint64)
    if isinstance(seed, (int, np.integer)):
        acc = jnp.asarray(np.uint64((int(seed) + _P5 + 8) & _M64))
    else:  # traced scalar
        acc = seed.astype(jnp.uint64) + np.uint64((_P5 + 8) & _M64)
    k1 = v * p2
    k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))
    k1 = k1 * p1
    acc = acc ^ k1
    acc = ((acc << np.uint64(27)) | (acc >> np.uint64(37))) * p1 + p4
    acc = acc ^ (acc >> np.uint64(33))
    acc = acc * p2
    acc = acc ^ (acc >> np.uint64(29))
    acc = acc * p3
    acc = acc ^ (acc >> np.uint64(32))
    return acc


def seq_hash_np(num_seq):
    """Util::hash (Util.h:337-345): h = h*31 + x[i] over numeric letters."""
    h = np.uint64(0)
    with np.errstate(over="ignore"):
        for x in num_seq:
            h = h * np.uint64(31) + np.uint64(x)
    return h


def seq_hash_batch_np(padded, lengths):
    """Vectorized Util::hash over a padded batch [N, Lmax] with lengths[N]."""
    n, lmax = padded.shape
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=np.uint64)
        mask_idx = np.arange(lmax)
        for j in range(lmax):
            active = j < lengths
            h = np.where(active, h * np.uint64(31) + padded[:, j].astype(np.uint64), h)
    return h
