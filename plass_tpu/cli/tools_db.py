"""Base DB utility tools, batch 2 (reference: lib/mmseqs/src/util/):
compress/decompress, dbtype, view, renamedbkeys, suffixid, unpackdb,
countkmer, masksequence, translateaa, summarizeresult, extractalignedregion.
"""
import os

import numpy as np

from ..data import seqdb
from ..utils.log import logger
from . import params as P
from .app import Command


def _compress(positional, space):
    """compress (util/compress.cpp:50-52): re-store every record
    ZSTD-compressed; dbtype gets bit 31 set."""
    if len(positional) != 2:
        raise ValueError("usage: compress <i:db> <o:db>")
    if seqdb.is_compressed(positional[0]):
        logger.info("Database is already compressed.")
        return 0
    db = seqdb.SeqDB.open(positional[0])
    seqdb.save_compressed(db, positional[1])
    return 0


def _decompress(positional, space):
    """decompress (util/compress.cpp:54-56)."""
    if len(positional) != 2:
        raise ValueError("usage: decompress <i:db> <o:db>")
    if not seqdb.is_compressed(positional[0]):
        logger.info("Database is already decompressed.")
        return 0
    db = seqdb.SeqDB.open(positional[0])  # open() inflates records
    db.save(positional[1])
    return 0


def _dbtype(positional, space):
    """dbtype (util/dbtype.cpp): print the human-readable DB type."""
    if len(positional) != 1:
        raise ValueError("usage: dbtype <i:db>")
    print(seqdb.DBTYPE_NAMES.get(seqdb.read_dbtype(positional[0]), "Unknown"))
    return 0


def _view(positional, space):
    """view (util/view.cpp): print selected records to stdout."""
    import sys
    if len(positional) < 1:
        raise ValueError("usage: view <i:db> --id-list k1,k2,...")
    v = space.values
    db = seqdb.SeqDB.open(positional[0])
    ids = [s for s in v.get("id_list", "").split(",") if s]
    if v.get("id_mode", 0) == 1:
        from ..data.createdb import read_lookup
        name2key = {name: key for key, name, _ in read_lookup(positional[0])}
        keys = []
        for ref in ids:
            if ref not in name2key:
                logger.warning("Could not find %s in lookup", ref)
                continue
            keys.append(name2key[ref])
    else:
        keys = [int(s) for s in ids]
    for key in keys:
        i = db.key_to_id(key)
        if i is None:
            logger.error("Key %s not found in database", key)
            continue
        sys.stdout.buffer.write(db.get_data(i).tobytes())
    sys.stdout.flush()
    return 0


def _renamedbkeys(positional, space):
    """renamedbkeys (util/renamedbkeys.cpp): rewrite keys via an
    'oldKey newKey' mapping file; renames lookup/_mapping/header too."""
    if len(positional) != 3:
        raise ValueError("usage: renamedbkeys <i:mapFile> <i:db> <o:db>")
    map_file, src, dst = positional
    pairs = []
    with open(map_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                logger.warning("Not enough columns in mapping file")
                continue
            pairs.append((int(parts[0]), int(parts[1])))
    db = seqdb.SeqDB.open(src)
    writer = seqdb.DBWriter(db.dbtype)
    for old, new in pairs:
        i = db.key_to_id(old)
        if i is None:
            raise ValueError(f"Key {old} not found in database")
        writer.write(new, db.get_data(i).tobytes(), add_newline=False)
    writer.finish().save(dst)
    if os.path.exists(src + "_h.dbtype"):
        hdb = seqdb.SeqDB.open(src + "_h")
        hw = seqdb.DBWriter(hdb.dbtype)
        for old, new in pairs:
            i = hdb.key_to_id(old)
            if i is not None:
                hw.write(new, hdb.get_data(i).tobytes(), add_newline=False)
        hw.finish().save(dst + "_h")
    if os.path.exists(src + ".lookup"):
        from ..data.createdb import read_lookup, write_lookup
        remap = dict(pairs)
        entries = [(remap[k], name, fn)
                   for k, name, fn in read_lookup(src) if k in remap]
        entries.sort(key=lambda e: e[0])
        write_lookup(dst, entries)
    if os.path.exists(src + "_mapping"):
        remap = dict(pairs)
        out = []
        with open(src + "_mapping") as f:
            for line in f:
                a, b = line.split("\t")[:2]
                if int(a) in remap:
                    out.append((remap[int(a)], int(b)))
        out.sort(key=lambda e: e[0])
        with open(dst + "_mapping", "w") as f:
            for a, b in out:
                f.write(f"{a}\t{b}\n")
    return 0


def _suffixid(positional, space):
    """suffixid (util/prefixid.cpp:96-99): append the key (or --prefix
    string / lookup accession) after a TAB to every record line."""
    from ..data.dbtools import prefix_id
    if len(positional) != 2:
        raise ValueError("usage: suffixid <i:db> <o:db>")
    v = space.values
    db = seqdb.SeqDB.open(positional[0])
    out = prefix_id(db, prefix=v.get("prefix") or None, tsv=v.get("tsv", False),
                    suffix=True)
    if v.get("tsv", False):
        with open(positional[1], "wb") as f:
            order = seqdb.data_order(out)
            for i in order:
                f.write(out.get_data(int(i)).tobytes())
    else:
        out.save(positional[1])
    return 0


def _unpackdb(positional, space):
    """unpackdb (util/unpackdb.cpp): one file per record in an output dir."""
    if len(positional) != 2:
        raise ValueError("usage: unpackdb <i:db> <o:dir>")
    v = space.values
    db = seqdb.SeqDB.open(positional[0])
    os.makedirs(positional[1], exist_ok=True)
    names = {}
    if v.get("unpack_name_mode", 1) == 1 and os.path.exists(positional[0] + ".lookup"):
        from ..data.createdb import read_lookup
        names = {k: name for k, name, _ in read_lookup(positional[0])}
    suffix = v.get("unpack_suffix", "")
    for i in range(db.size):
        key = int(db.keys[i])
        base = names.get(key, str(key))
        # FileUtil::sanitizeFilename replaces path separators
        base = base.replace("/", "_").replace("\\", "_")
        with open(os.path.join(positional[1], base + suffix), "wb") as f:
            f.write(db.get_data(i).tobytes())
    return 0


def _countkmer(positional, space):
    """countkmer (util/countkmer.cpp): global k-mer count table on stdout.
    Nucleotide k-mers print through the reference's quirky A,C,T,G code
    table (Indexer::printKmer)."""
    from .. import constants
    if len(positional) != 1:
        raise ValueError("usage: countkmer <i:seqDB>")
    v = space.values
    k = v.get("kmer_size", 5)  # countkmer's own default (countkmer.cpp:19)
    db = seqdb.SeqDB.open(positional[0])
    is_nucl = db.dbtype == seqdb.NUCLEOTIDES
    mat = constants.nucleotide() if is_nucl else constants.blosum62()
    a = mat.alphabet_size - 1  # X excluded
    idx_size = a ** k
    counts = np.zeros(idx_size, dtype=np.uint64)
    powers = a ** np.arange(k, dtype=np.int64)
    for i in range(db.size):
        num = mat.aa2num[db.get_seq(i)].astype(np.int64)
        if len(num) < k:
            continue
        windows = np.lib.stride_tricks.sliding_window_view(num, k)
        valid = ~(windows == a).any(axis=1)
        if is_nucl:
            # Indexer::computeKmerIdx: big-endian 2-bit packing
            idxs = np.zeros(len(windows), dtype=np.int64)
            for pos in range(k):
                idxs = (idxs << 2) | windows[:, pos]
        else:
            idxs = (windows * powers).sum(axis=1)
        np.add.at(counts, idxs[valid], 1)
    lines = []
    nucl_code = "ACTG"  # Indexer::printKmer quirk: T/G swapped
    for i in range(idx_size):
        if is_nucl:
            s = "".join(nucl_code[(i >> (2 * (k - 1 - j))) & 3] for j in range(k))
        else:
            digits = []
            rem = i
            for j in range(k):
                digits.append(rem % a)
                rem //= a
            s = "".join(mat.letters[d] for d in digits)
        lines.append(f"{i}\t{s}\t{counts[i]}")
    print("\n".join(lines))
    return 0


def _masksequence(positional, space):
    """masksequence (util/masksequence.cpp): tantan-mask to lowercase
    (minMaskProb 0.5, maxCycleLength 50)."""
    from .. import constants
    from ..ops.tantan import TantanMasker
    if len(positional) != 2:
        raise ValueError("usage: masksequence <i:seqDB> <o:seqDB>")
    db = seqdb.SeqDB.open(positional[0])
    mat = constants.nucleotide() if db.dbtype == seqdb.NUCLEOTIDES \
        else constants.blosum62()
    masker = TantanMasker(mat, min_mask_prob=0.5)
    writer = seqdb.DBWriter(db.dbtype)
    x_idx = mat.alphabet_size - 1
    for i in range(db.size):
        raw = db.get_seq(i)
        num = mat.aa2num[raw]
        masked = masker.mask(num)
        is_masked = (masked == x_idx) & (num != x_idx)
        out = np.where(is_masked,
                       np.char.lower(raw.view("S1")).view(np.uint8),
                       np.char.upper(raw.view("S1")).view(np.uint8))
        writer.write(int(db.keys[i]), out.tobytes())
    writer.finish().save(positional[1])
    return 0


def _translateaa(positional, space):
    """translateaa (util/translateaa.cpp): protein -> nucleotide by the
    first codon (A<C<G<T nested order) coding each residue; X -> NNN."""
    from .. import constants
    from ..ops.translate import translate_array
    if len(positional) != 2:
        raise ValueError("usage: translateaa <i:aaDB> <o:nuclDB>")
    v = space.values
    table = v.get("translation_table", 1)
    mat = constants.blosum62()
    codons = {}
    nucs = b"ACGT"
    for n1 in nucs:
        for n2 in nucs:
            for n3 in nucs:
                codon = bytes([n1, n2, n3])
                aa = translate_array(np.frombuffer(codon, dtype=np.uint8),
                                     table=table).tobytes()
                if aa not in codons:
                    codons[aa] = codon
    lut = {}
    for i in range(20):
        aa = mat.letters[i].encode()
        lut[i] = codons.get(aa, b"NNN")
    lut[20] = b"NNN"
    db = seqdb.SeqDB.open(positional[0])
    writer = seqdb.DBWriter(seqdb.NUCLEOTIDES)
    for i in range(db.size):
        num = mat.aa2num[db.get_seq(i)]
        out = b"".join(lut[int(c)] for c in num)
        writer.write(int(db.keys[i]), out)
    writer.finish().save(positional[1])
    return 0


def _summarizeresult(positional, space):
    """summarizeresult (util/summarizeresult.cpp): greedy non-overlapping
    domain selection over each query's alignment list."""
    from ..ops.rescore import format_result_line
    if len(positional) != 2:
        raise ValueError("usage: summarizeresult <i:alnDB> <o:alnDB>")
    v = space.values
    cov_thr = v.get("cov_thr", 0.0)
    max_overlap = v.get("overlap", 0.0)
    add_bt = v.get("add_backtrace", False)
    db = seqdb.SeqDB.open(positional[0])
    writer = seqdb.DBWriter(seqdb.ALIGNMENT_RES)
    for i in seqdb.data_order(db):
        i = int(i)
        covered = None
        out = []
        for line in db.get_data(i).tobytes().decode().split("\n"):
            if not line:
                continue
            f = line.split("\t")
            (dbkey, score, seqid, evalue, qs, qe, qlen, ts, te, tlen) = f[:10]
            qs, qe, qlen, ts, te, tlen = map(int, (qs, qe, qlen, ts, te, tlen))
            if covered is None:
                covered = np.zeros(qlen, dtype=bool)
            if qs > qlen or qe > qlen:
                logger.warning("Query alignment start or end is greater than "
                               "query length! Skipping line.")
                continue
            dbcov = (abs(te - ts) + 1) / tlen
            if dbcov <= cov_thr:
                continue
            lo, hi = min(qs, qe), max(qs, qe)
            counter = int(covered[lo:hi].sum())
            pct = counter / (hi - lo + 1)
            if pct <= max_overlap:
                covered[lo:hi] = True
                if not add_bt and len(f) > 10:
                    line = "\t".join(f[:10])
                out.append(line + "\n")
        writer.write(int(db.keys[i]), "".join(out).encode(), add_newline=False)
    writer.finish().save(positional[1])
    return 0


def _extractalignedregion(positional, space):
    """extractalignedregion (util/extractalignedregion.cpp): cut the aligned
    region out of the query (--extract-mode 1) or target (2, default)."""
    if len(positional) != 4:
        raise ValueError("usage: extractalignedregion <i:qDB> <i:tDB> "
                         "<i:alnDB> <o:seqDB>")
    v = space.values
    mode = v.get("extract_mode", 2)
    qdb = seqdb.SeqDB.open(positional[0])
    tdb = qdb if positional[1] == positional[0] else seqdb.SeqDB.open(positional[1])
    adb = seqdb.SeqDB.open(positional[2])
    writer = seqdb.DBWriter(tdb.dbtype)
    for i in seqdb.data_order(adb):
        i = int(i)
        qkey = int(adb.keys[i])
        for line in adb.get_data(i).tobytes().decode().split("\n"):
            if not line:
                continue
            f = line.split("\t")
            tkey, qs, qe, ts, te = int(f[0]), int(f[4]), int(f[5]), int(f[7]), int(f[8])
            if mode == 1:
                seq = qdb.get_seq(qdb.key_to_id(qkey)).tobytes()[qs:qe + 1]
            else:
                seq = tdb.get_seq(tdb.key_to_id(tkey)).tobytes()[ts:te + 1]
            writer.write(qkey, seq)
    writer.finish().save(positional[3])
    return 0


def _db_flags():
    return P.common_flags() + [
        P.Flag("--id-list", "id_list", str, "", "Entries to print, comma-separated"),
        P.Flag("--id-mode", "id_mode", int, 0, "0: DB keys, 1: FASTA ids (.lookup)", r"[0-1]"),
        P.Flag("--idx-entry-type", "idx_entry_type", int, 0, "0 seq, 1 src seq, 2 header, 3 src header", r"[0-3]"),
        P.Flag("--prefix", "prefix", str, "", "Prefix/suffix string"),
        P.Flag("--tsv", "tsv", bool, False, "Output TSV instead of a DB"),
        P.Flag("--mapping-file", "mapping_file", str, "", "Lookup mapping file"),
        P.Flag("--unpack-suffix", "unpack_suffix", str, "", "File suffix for unpacked files"),
        P.Flag("--unpack-name-mode", "unpack_name_mode", int, 1, "0: DB key, 1: accession", r"[0-1]"),
        P.Flag("-k", "kmer_size", int, 5, "k-mer size"),
        P.Flag("--translation-table", "translation_table", int, 1, "Genetic code table"),
        P.Flag("-c", "cov_thr", float, 0.0, "Coverage threshold"),
        P.Flag("--overlap", "overlap", float, 0.0, "Maximum overlap of covered regions"),
        P.Flag("-a", "add_backtrace", bool, False, "Keep backtraces"),
        P.Flag("--extract-mode", "extract_mode", int, 2, "Extract 1: query, 2: target", r"[1-2]"),
    ]


COMMANDS = [
    Command("compress", _compress, lambda: P.ParamSpace(P.common_flags()),
            "<i:db> <o:db>", "Compress DB entries with ZSTD", hidden=True),
    Command("decompress", _decompress, lambda: P.ParamSpace(P.common_flags()),
            "<i:db> <o:db>", "Decompress DB entries", hidden=True),
    Command("dbtype", _dbtype, lambda: P.ParamSpace(P.common_flags()),
            "<i:db>", "Print the DB type", hidden=True),
    Command("view", _view, lambda: P.ParamSpace(_db_flags()),
            "<i:db>", "Print DB entries to stdout", hidden=True),
    Command("renamedbkeys", _renamedbkeys, lambda: P.ParamSpace(P.common_flags()),
            "<i:mapFile> <i:db> <o:db>", "Rename DB keys by a two-column mapping", hidden=True),
    Command("suffixid", _suffixid, lambda: P.ParamSpace(_db_flags()),
            "<i:db> <o:db>", "Suffix each line with the record key", hidden=True),
    Command("unpackdb", _unpackdb, lambda: P.ParamSpace(_db_flags()),
            "<i:db> <o:dir>", "Unpack a DB into separate files", hidden=True),
    Command("countkmer", _countkmer, lambda: P.ParamSpace(_db_flags()),
            "<i:seqDB>", "Count k-mers over the whole DB", hidden=True),
    Command("masksequence", _masksequence, lambda: P.ParamSpace(P.common_flags()),
            "<i:seqDB> <o:seqDB>", "Soft-mask low-complexity regions (tantan)", hidden=True),
    Command("translateaa", _translateaa, lambda: P.ParamSpace(_db_flags()),
            "<i:aaDB> <o:nuclDB>", "Back-translate protein to nucleotide", hidden=True),
    Command("summarizeresult", _summarizeresult, lambda: P.ParamSpace(_db_flags()),
            "<i:alnDB> <o:alnDB>", "Greedy non-overlapping domain selection", hidden=True),
    Command("extractalignedregion", _extractalignedregion, lambda: P.ParamSpace(_db_flags()),
            "<i:qDB> <i:tDB> <i:alnDB> <o:seqDB>", "Extract aligned regions", hidden=True),
]
