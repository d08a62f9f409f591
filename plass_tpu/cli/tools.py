"""Shared base tools exposed by both binaries (reference:
lib/mmseqs/src/MMseqsBase.cpp base commands used on the plass/penguin
paths: createdb, extractorfs, translatenucs, kmermatcher, rescorediagonal,
concatdbs, createsubdb, convert2fasta, rmdb/mvdb/cpdb)."""
import os

import numpy as np

from ..data import seqdb
from ..ops.rescore import RESULT_DTYPE
from ..utils.log import logger
from . import params as P
from .app import Command


def load_alignments(path):
    """Parse an alignment DB into {query_key: RESULT_DTYPE array}."""
    db = seqdb.SeqDB.open(path)
    out = {}
    for i in range(db.size):
        key = int(db.keys[i])
        rows = []
        for line in db.get_data(i).tobytes().decode().strip().split("\n"):
            if not line:
                continue
            f = line.split("\t")
            rows.append((int(f[0]), int(f[1]), 0.0, 0.0, float(f[2]), float(f[3]),
                         int(f[5]) - int(f[4]) + 1, int(f[4]), int(f[5]), int(f[6]),
                         int(f[7]), int(f[8]), int(f[9])))
        out[key] = np.array(rows, dtype=RESULT_DTYPE)
    return out


def load_prefilter(path):
    """Parse a prefilter DB into {query_key: [(target, score, diag), ...]};
    diagonals are short-cast on disk and recovered by the rescorer's
    +-65536 scan."""
    db = seqdb.SeqDB.open(path)
    out = {}
    for i in range(db.size):
        key = int(db.keys[i])
        hits = []
        for line in db.get_data(i).tobytes().decode().strip().split("\n"):
            if not line:
                continue
            t, s, d = line.split("\t")
            hits.append((int(t), int(s), int(d)))
        out[key] = hits
    return out


def _createdb(positional, space):
    from ..data.createdb import create_db
    if len(positional) < 2:
        raise ValueError("usage: createdb <i:fastaFile1> ... <o:seqDB>")
    sdb, hdb = create_db(positional[:-1])
    sdb.save(positional[-1])
    hdb.save(positional[-1] + "_h")
    return 0


def _extractorfs(positional, space):
    from ..ops import orf as orf_mod
    from ..ops import translate as tr
    if len(positional) != 2:
        raise ValueError("usage: extractorfs <i:seqDB> <o:seqDB>")
    db = seqdb.SeqDB.open(positional[0])
    v = space.values
    odb, ohdb = orf_mod.extract_orfs(
        db, min_length=v["orf_min_length"], max_length=v["orf_max_length"],
        max_gaps=v["orf_max_gaps"], start_mode=v["orf_start_mode"],
        contig_start_mode=v["contig_start_mode"], contig_end_mode=v["contig_end_mode"],
        forward_frames=_frames(v["forward_frames"]),
        reverse_frames=_frames(v["reverse_frames"]),
        stop_codons=tr.stop_codons(v["translation_table"]),
        start_codons=tr.start_codons(v["translation_table"], v["use_all_table_starts"]))
    odb.save(positional[1])
    ohdb.save(positional[1] + "_h")
    return 0


def _frames(spec):
    mask = 0
    for f in str(spec).split(","):
        if f.strip():
            mask |= 1 << (int(f) - 1)
    return mask


def _translatenucs(positional, space):
    from ..ops.translate import translate_nucs
    if len(positional) != 2:
        raise ValueError("usage: translatenucs <i:seqDB> <o:seqDB>")
    db = seqdb.SeqDB.open(positional[0])
    hdr = None
    add_stop = os.path.exists(positional[0] + "_h.dbtype")
    if add_stop:
        hdr = seqdb.SeqDB.open(positional[0] + "_h")
    out = translate_nucs(db, hdr, space.values["translation_table"],
                         add_orf_stop=add_stop,
                         max_seq_len=space.values["max_seq_len"])
    out.save(positional[1])
    return 0


def _kmermatcher(positional, space):
    from ..ops.kmermatch import kmermatcher, hits_to_db
    if len(positional) != 2:
        raise ValueError("usage: kmermatcher <i:seqDB> <o:prefDB>")
    db = seqdb.SeqDB.open(positional[0])
    v = space.values
    is_nucl = db.dbtype == seqdb.NUCLEOTIDES
    k = v["kmer_size"].nucleotides if is_nucl else v["kmer_size"].aminoacids
    scale = (v["kmers_per_sequence_scale"].nucleotides if is_nucl
             else v["kmers_per_sequence_scale"].aminoacids)
    hits = kmermatcher(db, k, kmers_per_sequence=v["kmers_per_sequence"],
                       kmers_per_sequence_scale=scale, hash_shift=v["hash_shift"],
                       ignore_multi_kmer=v["ignore_multi_kmer"],
                       include_only_extendable=v["include_only_extendable"],
                       cov_thr=v["cov_thr"], cov_mode=v["cov_mode"])
    hits_to_db(hits, is_nucl).save(positional[1])
    return 0


def _rescorediagonal(positional, space):
    from ..ops.rescore import RescoreParams, rescore_diagonal, results_to_db
    if len(positional) != 4:
        raise ValueError("usage: rescorediagonal <i:qDB> <i:tDB> <i:prefDB> <o:alnDB>")
    db = seqdb.SeqDB.open(positional[0])
    hits = load_prefilter(positional[2])
    v = space.values
    is_nucl = db.dbtype == seqdb.NUCLEOTIDES
    rp = RescoreParams(
        rescore_mode=v["rescore_mode"],
        seq_id_thr=(v["min_seq_id"].nucleotides if is_nucl else v["min_seq_id"].aminoacids),
        cov_thr=v["cov_thr"], cov_mode=v["cov_mode"], eval_thr=v["eval_thr"],
        aln_len_thr=(v["min_aln_len"].nucleotides if is_nucl else v["min_aln_len"].aminoacids),
        seq_id_mode=v["seq_id_mode"], add_backtrace=v["add_backtrace"],
        sort_results=v["sort_results"])
    alns = rescore_diagonal(db, hits, rp)
    results_to_db(alns).save(positional[3])
    return 0


def _concatdbs(positional, space):
    if len(positional) != 3:
        raise ValueError("usage: concatdbs <i:db1> <i:db2> <o:db>")
    a = seqdb.SeqDB.open(positional[0])
    b = seqdb.SeqDB.open(positional[1])
    seqdb.concat(a, b).save(positional[2])
    return 0


def _createsubdb(positional, space):
    if len(positional) != 3:
        raise ValueError("usage: createsubdb <i:subsetFile> <i:db> <o:db>")
    keys = [int(line.split()[0]) for line in open(positional[0]) if line.strip()]
    db = seqdb.SeqDB.open(positional[1])
    seqdb.subdb(db, keys).save(positional[2])
    return 0


def _convert2fasta(positional, space):
    if len(positional) != 2:
        raise ValueError("usage: convert2fasta <i:seqDB> <o:fasta>")
    db = seqdb.SeqDB.open(positional[0])
    hdr_path = positional[0] + "_h"
    headers = None
    if os.path.exists(hdr_path + ".dbtype"):
        headers = seqdb.SeqDB.open(hdr_path)
    with open(positional[1], "w") as f:
        for i in range(db.size):
            if headers is not None:
                h = headers.get_seq_bytes(headers.key_to_id(int(db.keys[i]))).decode()
            else:
                h = str(int(db.keys[i]))
            f.write(f">{h}\n{db.get_seq_bytes(i).decode()}\n")
    return 0


def _rmdb(positional, space):
    for name in positional:
        for suffix in ("", ".index", ".dbtype"):
            if os.path.exists(name + suffix):
                os.unlink(name + suffix)
    return 0


BASE_COMMANDS = [
    Command("createdb", _createdb, lambda: P.ParamSpace(P.common_flags() + P.orf_flags()),
            "<i:fastaFile1[.gz]> ... <o:seqDB>", "Convert FASTA/Q to sequence DB", hidden=True),
    Command("extractorfs", _extractorfs, lambda: P.ParamSpace(P.common_flags() + P.orf_flags()),
            "<i:seqDB> <o:seqDB>", "Six-frame ORF extraction", hidden=True),
    Command("translatenucs", _translatenucs, lambda: P.ParamSpace(P.common_flags() + P.orf_flags()),
            "<i:seqDB> <o:seqDB>", "Translate nucleotides to proteins", hidden=True),
    Command("kmermatcher", _kmermatcher, lambda: P.ParamSpace(P.common_flags() + P.kmermatcher_flags() + P.align_flags()),
            "<i:seqDB> <o:prefDB>", "Find overlapping k-mers", hidden=True),
    Command("rescorediagonal", _rescorediagonal, lambda: P.ParamSpace(P.common_flags() + P.kmermatcher_flags() + P.align_flags()),
            "<i:qDB> <i:tDB> <i:prefDB> <o:alnDB>", "Ungapped diagonal rescoring", hidden=True),
    Command("concatdbs", _concatdbs, lambda: P.ParamSpace(P.common_flags()),
            "<i:db1> <i:db2> <o:db>", "Concatenate DBs", hidden=True),
    Command("createsubdb", _createsubdb, lambda: P.ParamSpace(P.common_flags()),
            "<i:subsetFile> <i:db> <o:db>", "Create subset DB", hidden=True),
    Command("convert2fasta", _convert2fasta, lambda: P.ParamSpace(P.common_flags()),
            "<i:seqDB> <o:fasta>", "Convert DB to FASTA", hidden=True),
    Command("rmdb", _rmdb, lambda: P.ParamSpace(P.common_flags()),
            "<i:db>", "Remove a DB file family", hidden=True),
]
