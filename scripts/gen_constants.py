#!/usr/bin/env python3
"""Generate numeric constants for plass_tpu from the reference data files.

This script replicates — in NumPy, from first principles — the *mathematical*
derivations the reference performs at startup, and freezes the results into
``plass_tpu/constants/data/*.npz`` so the runtime never needs the reference tree.

Derivations replicated (reference citations for behavior parity):
 - Substitution-matrix roundtrip score->prob->score with bit scaling
   (lib/mmseqs/src/commons/SubstitutionMatrix.cpp:342-423, BaseMatrix.cpp:109-157)
 - Reduced amino-acid alphabets via greedy mutual-information coupling
   (lib/mmseqs/src/prefiltering/ReducedMatrix.cpp:5-148)
 - Nucleotide matrix + IUPAC letter mapping (commons/NucleotideMatrix.cpp)
 - NCBI genetic-code translation tables (commons/TranslateNucl.h:82-470);
   the ncbieaa/sncbieaa strings are public-domain NCBI data extracted verbatim.
 - kerasify neural-net weights for the coding filter
   (lib/kerasify/keras_model.cpp binary format; data/predict_coding_acc9743_57x32x64.model)
 - ALP Gumbel parameters for E-values (lib/mmseqs/src/alignment/EvalueComputation.h:56-76)

Inputs read (data only, no code): /root/reference/lib/mmseqs/data/{blosum62,nucleotide}.out,
/root/reference/data/predict_coding_acc9743_57x32x64.model,
genetic-code data strings from /root/reference/lib/mmseqs/src/commons/TranslateNucl.h.

Run:  python scripts/gen_constants.py
"""
import os
import re
import struct
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "plass_tpu", "constants", "data")

ANY_BACK = 1e-5  # BaseMatrix.cpp:10


# ---------------------------------------------------------------------------
# Substitution matrix parsing + generation
# ---------------------------------------------------------------------------

def parse_out_matrix(path):
    """Parse an MMseqs .out matrix file -> (letters, halfbit scores, pBack, lambda)."""
    letters = None
    rows = {}
    pback = None
    lam = None
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("#"):
                if line.startswith("# Background (precomputed optional):"):
                    pback = np.array([float(x) for x in line.split(":")[1].split()])
                elif line.startswith("# Lambda     (precomputed optional):"):
                    lam = float(line.split(":")[1])
                continue
            parts = line.split()
            if not parts:
                continue
            if letters is None:
                letters = [p[0].upper() for p in parts]
                continue
            rows[parts[0].upper()] = np.array([float(x) for x in parts[1:]])
    n = len(letters)
    scores = np.zeros((n, n))
    for i, aa in enumerate(letters):
        scores[i] = rows[aa]
    return letters, scores, pback, lam


def scores_to_prob(scores, pback, lam, letters):
    """SubstitutionMatrix::readProbMatrix: P_ab = exp(lambda*s_ab) * pa * pb."""
    n = len(letters)
    xi = letters.index("X")
    x_positive = bool((scores[xi] > 0).any() or (scores[:, xi] > 0).any())
    pback = pback.copy()
    if not x_positive:
        for i in range(n - 1):
            pback[i] = pback[i] * (1.0 - pback[xi])
    prob = np.exp(lam * scores) * pback[:, None] * pback[None, :]
    return prob, pback


def gen_sub_matrix_double(prob, contains_x):
    """BaseMatrix::generateSubMatrix (double version): S = log2(P/(pa*pb))."""
    n = prob.shape[0]
    pback = prob.sum(axis=1)
    if contains_x:
        pback[n - 1] = ANY_BACK
    sub = np.log2(prob / (pback[:, None] * pback[None, :]))
    return sub, pback


def gen_sub_matrix_int(prob, contains_x, bit_factor, bias=0.0):
    """BaseMatrix::generateSubMatrix (short version): round-half-away scaled scores."""
    sub, pback = gen_sub_matrix_double(prob, contains_x)
    scaled = bit_factor * sub + bias
    out = np.where(scaled < 0.0, scaled - 0.5, scaled + 0.5).astype(np.int64)
    return out.astype(np.int16), pback


def protein_letter_map(letters):
    """SubstitutionMatrix::setupLetterMapping — ASCII char -> alphabet index."""
    idx = {aa: i for i, aa in enumerate(letters)}
    x = idx["X"]
    aa2num = np.full(256, x, dtype=np.uint8)
    for c in range(256):
        u = chr(c).upper()
        if u in "ATGCDEFHIKLMNPQRSVWYX":
            aa2num[c] = idx[u]
        elif u == "J":
            aa2num[c] = idx["L"]
        elif u in "UO":
            aa2num[c] = x
        elif u == "Z":
            aa2num[c] = idx["E"]
        elif u == "B":
            aa2num[c] = idx["D"]
    return aa2num


def nucleotide_letter_map(letters):
    """NucleotideMatrix::setupLetterMapping."""
    idx = {aa: i for i, aa in enumerate(letters)}
    x = idx["X"]
    aa2num = np.full(256, x, dtype=np.uint8)
    for c in range(256):
        u = chr(c).upper()
        if u in "ATGC":
            aa2num[c] = idx[u]
        elif u in "UW":
            aa2num[c] = idx["T"]
        elif u in "KBDVRS":
            aa2num[c] = idx["G"]
        elif u in "MYH":
            aa2num[c] = idx["C"]
    return aa2num


# ---------------------------------------------------------------------------
# Reduced alphabet (ReducedMatrix.cpp greedy mutual-information coupling)
# ---------------------------------------------------------------------------

def _couple(prob, size, i, j):
    """Merge letter j into i inside the top-left size x size block; drop j.

    Mirrors ReducedMatrix::coupleBases — only the first `size` rows/columns
    participate (the X row/column beyond them is never pulled in).
    """
    n = prob.shape[0]
    p = prob[:size, :size].copy()
    p[:, i] += p[:, j]
    p = np.delete(p, j, axis=1)
    p[i] += p[j]
    p = np.delete(p, j, axis=0)
    out = np.zeros((n, n))
    out[: size - 1, : size - 1] = p
    return out


def _mutual_info(prob, size):
    p = prob[:size, :size]
    pback = p.sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.log2(p / (pback[:, None] * pback[None, :]))
    return float(np.nansum(p * s))


def reduced_alphabet(prob21, letters, reduced_size, bit_factor):
    """ReducedMatrix constructor. Returns (aa2num 256-map, rep letters, int sub matrix)."""
    n_org = len(letters)  # 21 incl X
    reduced_letters = list(letters)  # all 21, X last
    prob = prob21.copy()
    # map letter -> current column index among the first n_org-1 (X untouched)
    steps = n_org - reduced_size
    # group membership: original letter -> representative letter
    rep_of = {aa: aa for aa in letters}
    for step in range(steps):
        size = n_org - 1 - step
        best = (0.0, None, None)
        for i in range(size):
            for j in range(i + 1, size):
                merged = _couple(prob, size, i, j)
                info = _mutual_info(merged, size - 1)
                if info > best[0]:
                    best = (info, i, j)
        _, bi, bj = best
        reduced_aa = reduced_letters[bi]
        lost_aa = reduced_letters[bj]
        del reduced_letters[bj]
        for aa, r in list(rep_of.items()):
            if r == lost_aa:
                rep_of[aa] = reduced_aa
        prob = _couple(prob, size, bi, bj)

    # build char -> reduced index map; reduced_letters order defines indices
    rep_index = {aa: i for i, aa in enumerate(reduced_letters)}
    base_map = protein_letter_map(letters)
    aa2num = np.zeros(256, dtype=np.uint8)
    for c in range(256):
        orig_letter = letters[base_map[c]]
        aa2num[c] = rep_index[rep_of[orig_letter]]

    # final substitution matrix with X column restored (ReducedMatrix.cpp:110-127)
    size = reduced_size
    prob_new = prob[: size - 1, : size - 1]  # collapsed non-X letters... X was never merged
    # recompute following the reference exactly:
    full = np.zeros((size, size))
    full[: size - 1, : size - 1] = prob_new[: size - 1, : size - 1]
    pback = np.zeros(size)
    pback[: size] = full.sum(axis=1)
    pback[size - 1] = ANY_BACK
    for i in range(size - 1):
        pback[i] = pback[i] * (1.0 - pback[size - 1])
    orig_pback = prob21.sum(axis=1)
    orig_pback[n_org - 1] = ANY_BACK
    orig_idx = {aa: i for i, aa in enumerate(letters)}
    for i in range(size):
        oi = orig_idx[reduced_letters[i]]
        pab = prob21[oi, n_org - 1] / (orig_pback[oi] * orig_pback[n_org - 1])
        full[size - 1, i] = pab * pback[i] * pback[size - 1]
        full[i, size - 1] = pab * pback[size - 1] * pback[i]
    sub_int, _ = gen_sub_matrix_int(full, True, bit_factor)
    return aa2num, "".join(reduced_letters), sub_int


# ---------------------------------------------------------------------------
# Genetic codes (extract public-domain NCBI data strings from TranslateNucl.h)
# ---------------------------------------------------------------------------

def extract_genetic_codes():
    path = os.path.join(REF, "lib/mmseqs/src/commons/TranslateNucl.h")
    src = open(path).read()
    # enum name -> id
    enum_block = re.search(r"enum GenCode \{(.*?)\};", src, re.S).group(1)
    ids = {}
    cur = 0
    for part in enum_block.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            name, val = part.split("=")
            cur = int(val.strip())
            ids[name.strip()] = cur
        else:
            cur += 1
            ids[part] = cur
    # case blocks
    codes = {}
    for m in re.finditer(
        r"case (\w+):.*?ncbieaa\s*=\s*\"([A-Z*]+)\";\s*sncbieaa\s*=\s*\"([-M*]+)\";",
        src,
        re.S,
    ):
        name, ncbieaa, sncbieaa = m.groups()
        if name in ids:
            codes[ids[name]] = (ncbieaa, sncbieaa)
    assert 1 in codes and codes[1][0].startswith("FFLLSSSS"), codes.get(1)
    return codes


IUPAC = {
    "A": "A", "C": "C", "G": "G", "T": "T", "U": "T",
    "R": "AG", "Y": "CT", "S": "CG", "W": "AT", "K": "GT", "M": "AC",
    "B": "CGT", "D": "AGT", "H": "ACT", "V": "ACG", "N": "ACGT",
}
# class index per nucleotide char: 0..15 for the IUPAC codes above, 16 = invalid
IUPAC_ORDER = "ACGTURYSWKMBDHVN"


def nucl_class_map():
    cls = np.full(256, 16, dtype=np.uint8)
    for i, ch in enumerate(IUPAC_ORDER):
        cls[ord(ch)] = i
        cls[ord(ch.lower())] = i
    return cls


def build_codon_lut(ncbieaa, sncbieaa):
    """17^3 LUT over IUPAC classes -> (residue char, is_start flag).

    Replicates the NCBI ambiguity resolution (TranslateNucl.h:360-470): expand
    each ambiguous codon; if all expansions agree -> that residue; special
    groups B (D/N), Z (E/Q), J (I/L); else X. Invalid chars -> X.
    """
    base_idx = {"T": 0, "C": 1, "A": 2, "G": 3}

    def translate_exact(c1, c2, c3):
        i = base_idx[c1] * 16 + base_idx[c2] * 4 + base_idx[c3]
        return ncbieaa[i], sncbieaa[i]

    lut = np.full((17, 17, 17), ord("X"), dtype=np.uint8)
    start = np.zeros((17, 17, 17), dtype=bool)
    for i1, ch1 in enumerate(IUPAC_ORDER):
        for i2, ch2 in enumerate(IUPAC_ORDER):
            for i3, ch3 in enumerate(IUPAC_ORDER):
                aa = None
                orf = None
                for b1 in IUPAC[ch1]:
                    for b2 in IUPAC[ch2]:
                        for b3 in IUPAC[ch3]:
                            a, s = translate_exact(b1, b2, b3)
                            if aa is None:
                                aa = a
                            elif aa != a:
                                if aa in ("B", "D", "N") and a in ("D", "N"):
                                    aa = "B"
                                elif aa in ("Z", "E", "Q") and a in ("E", "Q"):
                                    aa = "Z"
                                elif aa in ("J", "I", "L") and a in ("I", "L"):
                                    aa = "J"
                                else:
                                    aa = "X"
                            if orf is None:
                                orf = s
                            elif orf != s:
                                orf = "X"
                lut[i1, i2, i3] = ord(aa)
                start[i1, i2, i3] = orf == "M"
    return lut, start


# ---------------------------------------------------------------------------
# kerasify model parsing (lib/kerasify/keras_model.cpp binary format)
# ---------------------------------------------------------------------------

def parse_kerasify(path):
    """Parse a kerasify .model file (Dense/Activation layers only)."""
    LAYER_DENSE = 1
    ACT = {1: "linear", 2: "relu", 3: "softplus", 4: "sigmoid", 5: "tanh", 6: "hard_sigmoid"}
    layers = []
    with open(path, "rb") as f:
        (num_layers,) = struct.unpack("<I", f.read(4))
        for _ in range(num_layers):
            (ltype,) = struct.unpack("<I", f.read(4))
            if ltype == LAYER_DENSE:
                w_rows, w_cols = struct.unpack("<II", f.read(8))
                (b_n,) = struct.unpack("<I", f.read(4))
                w = np.frombuffer(f.read(4 * w_rows * w_cols), dtype="<f4").reshape(w_rows, w_cols)
                b = np.frombuffer(f.read(4 * b_n), dtype="<f4")
                (act,) = struct.unpack("<I", f.read(4))
                layers.append(("dense", w, b, ACT.get(act, "linear")))
            else:
                raise ValueError(f"unsupported kerasify layer type {ltype}")
    return layers


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def main():
    os.makedirs(OUT, exist_ok=True)

    # ---- protein matrix (blosum62, bitFactor 2.0 — half-bit integer scores)
    letters, scores, pback_pre, lam = parse_out_matrix(
        os.path.join(REF, "lib/mmseqs/data/blosum62.out"))
    prob, pback = scores_to_prob(scores, pback_pre, lam, letters)
    sub_int, _ = gen_sub_matrix_int(prob, True, 2.0)
    aa2num = protein_letter_map(letters)
    # 256x256 ascii-indexed LUT (SubstitutionMatrix::createAsciiSubMat)
    ascii_mat = sub_int[aa2num[:, None], aa2num[None, :]]
    # likelihood ratios P(a,b)/(pa*pb) for tantan masking
    # (ProbabilityMatrix, BaseMatrix.h:80-93)
    lratio = prob / (pback[:, None] * pback[None, :])
    # pseudocount matrix R[a][b] = P(a|b) = prob[a][b]/rowsum(prob)[b]
    # (BaseMatrix::generateSubMatrix, BaseMatrix.cpp:109-121; the divisor is
    # computeBackground's row-sum background with X pinned to ANY_BACK, NOT
    # the file background stored as `pback`)
    rowsum_pback = prob.sum(axis=1)
    rowsum_pback[len(letters) - 1] = ANY_BACK
    pseudo_r = (prob / rowsum_pback[None, :]).astype(np.float32)
    np.savez(
        os.path.join(OUT, "blosum62.npz"),
        letters=np.frombuffer("".join(letters).encode(), dtype=np.uint8),
        sub=sub_int, pback=pback, aa2num=aa2num, ascii_mat=ascii_mat,
        lratio=lratio, prob=prob, pseudo_r=pseudo_r,
    )

    # ---- seed matrix for the sensitive prefilter (VTML80, bitFactor 8.0)
    # Prefiltering.cpp:64 builds the k-mer scoring matrix from
    # --seed-sub-mat (default VTML80.out) at bit factor 8; kmer thresholds
    # (Prefiltering::getKmerThreshold) are expressed in this scale.
    vletters, vscores, vpback_pre, vlam = parse_out_matrix(
        os.path.join(REF, "lib/mmseqs/data/VTML80.out"))
    vprob, vpback = scores_to_prob(vscores, vpback_pre, vlam, vletters)
    # Prefiltering::getSubstitutionMatrix applies a -0.2 score bias before
    # rounding (Prefiltering.cpp:966-973) to both the seed and the
    # ungapped-diagonal matrices.
    vsub_int, _ = gen_sub_matrix_int(vprob, True, 8.0, bias=-0.2)
    vaa2num = protein_letter_map(vletters)
    vascii = vsub_int[vaa2num[:, None], vaa2num[None, :]]
    vlratio = vprob / (vpback[:, None] * vpback[None, :])
    np.savez(
        os.path.join(OUT, "vtml80_8.npz"),
        letters=np.frombuffer("".join(vletters).encode(), dtype=np.uint8),
        sub=vsub_int, pback=vpback, aa2num=vaa2num, ascii_mat=vascii,
        lratio=vlratio,
    )

    # ---- blosum62 at bitFactor 2.0 with the prefilter's -0.2 bias
    # (ungapped diagonal scoring inside the sensitive prefilter only;
    # align/rescorediagonal use bias 0.0 = blosum62.npz)
    psub_int, _ = gen_sub_matrix_int(prob, True, 2.0, bias=-0.2)
    ppback = pback
    pascii = psub_int[aa2num[:, None], aa2num[None, :]]
    np.savez(
        os.path.join(OUT, "blosum62_pref.npz"),
        letters=np.frombuffer("".join(letters).encode(), dtype=np.uint8),
        sub=psub_int, pback=ppback, aa2num=aa2num, ascii_mat=pascii,
    )

    # ---- nucleotide matrix (bitFactor 1.0)
    nletters, nscores, npback_pre, nlam = parse_out_matrix(
        os.path.join(REF, "lib/mmseqs/data/nucleotide.out"))
    nprob, npback = scores_to_prob(nscores, npback_pre, nlam, nletters)
    nsub_int, _ = gen_sub_matrix_int(nprob, True, 1.0)
    naa2num = nucleotide_letter_map(nletters)
    nascii = nsub_int[naa2num[:, None], naa2num[None, :]]
    # reverse residue: A<->T, C<->G, X->X  (indices in nucleotide.out order A C T G X)
    nidx = {aa: i for i, aa in enumerate(nletters)}
    reverse = np.arange(len(nletters), dtype=np.uint8)
    reverse[nidx["A"]] = nidx["T"]
    reverse[nidx["T"]] = nidx["A"]
    reverse[nidx["C"]] = nidx["G"]
    reverse[nidx["G"]] = nidx["C"]
    nlratio = nprob / (npback[:, None] * npback[None, :])
    np.savez(
        os.path.join(OUT, "nucleotide.npz"),
        letters=np.frombuffer("".join(nletters).encode(), dtype=np.uint8),
        sub=nsub_int, pback=npback, aa2num=naa2num, ascii_mat=nascii, reverse=reverse,
        lratio=nlratio,
    )

    # ---- reduced alphabets (13 for kmermatcher, 7 for filternoncoding,
    # 3 for clusthash — CLUST_HASH_DEFAULT_ALPH_SIZE, Parameters.h:239)
    for size in (13, 7, 3):
        ra2n, rletters, rsub = reduced_alphabet(prob, letters, size, 2.0)
        np.savez(
            os.path.join(OUT, f"reduced{size}.npz"),
            aa2num=ra2n,
            letters=np.frombuffer(rletters.encode(), dtype=np.uint8),
            sub=rsub,
        )
        print(f"reduced alphabet {size}: {rletters}")

    # ---- VTML80-based reduced-13 (standalone kmerindexdb/kmersearch use
    # the default --seed-sub-mat VTML80.out; createlinindex/linsearch
    # override it to blosum62)
    vra2n, vrletters, vrsub = reduced_alphabet(vprob, vletters, 13, 2.0)
    np.savez(
        os.path.join(OUT, "vtml80_reduced13.npz"),
        aa2num=vra2n,
        letters=np.frombuffer(vrletters.encode(), dtype=np.uint8),
        sub=vrsub,
    )
    print(f"vtml80 reduced 13: {vrletters}")

    # ---- genetic codes
    codes = extract_genetic_codes()
    code_ids = sorted(codes)
    luts = np.zeros((len(code_ids), 17, 17, 17), dtype=np.uint8)
    starts = np.zeros((len(code_ids), 17, 17, 17), dtype=bool)
    for i, cid in enumerate(code_ids):
        luts[i], starts[i] = build_codon_lut(*codes[cid])
    np.savez(
        os.path.join(OUT, "genetic_codes.npz"),
        code_ids=np.array(code_ids, dtype=np.int32),
        luts=luts, starts=starts, nucl_class=nucl_class_map(),
    )

    # ---- coding-filter NN weights
    layers = parse_kerasify(os.path.join(REF, "data/predict_coding_acc9743_57x32x64.model"))
    arrays = {}
    acts = []
    for i, (_, w, b, act) in enumerate(layers):
        arrays[f"w{i}"] = w
        arrays[f"b{i}"] = b
        acts.append(act)
    arrays["activations"] = np.array(acts)
    np.savez(os.path.join(OUT, "coding_filter.npz"), **arrays)
    print("coding filter layers:", [(w.shape, act) for _, w, b, act in layers])

    # ---- E-value Gumbel parameters (EvalueComputation.h:56-76 hardcoded table)
    # order: lambda K aJ bJ aI bI alphaJ betaJ alphaI betaI sigma tau
    evalue = {
        "blosum62_ungapped": np.array([
            0.3207378152604042354, 0.13904657125294345166,
            0.76221128839920349041, 0.0, 0.76221128839920349041, 0.0,
            4.5269915477182944841, 0.0, 4.5269915477182944841, 0.0,
            4.5269915477182944841, 0.0]),
        "blosum62_11_1": np.array([
            0.27359865037097330642, 0.044620920658722244834,
            1.5938724404943873658, -19.959867650284412122,
            1.5938724404943873658, -19.959867650284412122,
            30.455610143099914211, -622.28684628915891608,
            30.455610143099914211, -622.28684628915891608,
            29.602444874818868215, -601.81087985041381216]),
        "nucleotide_7_1": np.array([
            1.0960171987681839, 0.33538787507026158,
            2.0290734315292083, -0.46514786408422282,
            2.0290734315292083, -0.46514786408422282,
            5.0543294182155085, 15.130999712620039,
            5.0543294182155085, 15.130999712620039,
            5.0543962679167036, 15.129930117400917]),
    }
    # nucleotide ungapped params are computed by ALP at runtime in the reference;
    # they are appended by scripts/extract_alp_params.sh into nucleotide_ungapped.txt
    extra = os.path.join(OUT, "nucleotide_ungapped.txt")
    if os.path.exists(extra):
        vals = [float(x) for x in open(extra).read().split()]
        evalue["nucleotide_ungapped"] = np.array(vals)
    np.savez(os.path.join(OUT, "evalue_params.npz"), **evalue)

    print("sub matrix A row:", sub_int[0][:10])
    print("nucl sub:", nsub_int)
    print("wrote constants to", OUT)


if __name__ == "__main__":
    sys.exit(main())
