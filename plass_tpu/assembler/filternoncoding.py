"""Coding/non-coding neural filter (reference: src/assembler/
filternoncoding.cpp:26-181, weights from the bundled kerasify model).

57-dim feature vector per protein: [length, 20 Laplace-smoothed amino-acid
frequencies (matrix alphabet order, denom = totalAA + 20), 36 reduced-7
dipeptide frequencies (little-endian index, X excluded, denom = total + 36)],
fed to a 57->32->64->1 MLP (relu, relu, sigmoid). Sequences scoring <=
threshold are replaced with empty records.

The MLP is a tiny matmul chain — run with JAX so the whole filter is one
batched device call.
"""
import numpy as np

from .. import constants
from ..data import seqdb


def features(db):
    """Feature matrix float32[N, 57] in reference order."""
    blosum = constants.blosum62()
    red7 = constants.reduced(7)
    a20 = blosum.alphabet_size - 1  # 20
    r6 = red7.alphabet_size - 1     # 6
    n = db.size
    feats = np.zeros((n, 1 + a20 + r6 * r6), dtype=np.float32)
    for i in range(n):
        s = np.asarray(db.get_seq(i))
        num = blosum.aa2num[s]
        L = len(s)
        feats[i, 0] = L
        counts = np.bincount(num[num < a20], minlength=a20).astype(np.float64) + 1.0
        total = float((num < a20).sum())
        feats[i, 1: 1 + a20] = (counts / (total + a20)).astype(np.float32)
        # dipeptides on reduced-7; skip any pair containing X
        rnum = red7.aa2num[s]
        if L >= 2:
            a = rnum[:-1]
            b = rnum[1:]
            ok = (a != r6) & (b != r6)
            idx = a[ok].astype(np.int64) + b[ok].astype(np.int64) * red7.alphabet_size
            di = np.bincount(idx, minlength=red7.alphabet_size ** 2).astype(np.float64) + 1.0
            total_di = float(ok.sum())
        else:
            di = np.ones(red7.alphabet_size ** 2, dtype=np.float64)
            total_di = 0.0
        # keep only indices whose little-endian digits are both non-X,
        # in ascending raw-index order (filternoncoding.cpp:111-122)
        sel = []
        for raw in range(red7.alphabet_size ** 2):
            k0 = raw % red7.alphabet_size
            k1 = raw // red7.alphabet_size
            if k0 == r6 or k1 == r6:
                continue
            sel.append(raw)
        feats[i, 1 + a20:] = (di[sel] / (total_di + r6 * r6)).astype(np.float32)
    return feats


def predict(feats):
    """Run the MLP; returns float32[N] coding scores."""
    import jax.numpy as jnp
    x = jnp.asarray(feats)
    for w, b, act in constants.coding_filter_weights():
        x = x @ jnp.asarray(w) + jnp.asarray(b)
        if act == "relu":
            x = jnp.maximum(x, 0.0)
        elif act == "sigmoid":
            x = 1.0 / (1.0 + jnp.exp(-x))
    return np.asarray(x)[:, 0]


def filter_noncoding(db, threshold=0.2):
    """Keep sequences with score > threshold; others become empty records."""
    scores = predict(features(db))
    writer = seqdb.DBWriter(db.dbtype)
    for i in range(db.size):
        key = int(db.keys[i])
        if scores[i] > threshold:
            writer.write(key, db.get_seq_bytes(i))
        else:
            writer.write(key, b"", add_newline=True)
    return writer.finish()
