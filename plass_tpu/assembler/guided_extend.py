"""Protein-guided nucleotide greedy extension (the `guidedassembleresults`
command).

Reference: src/assembler/guidedassembleresult.cpp. The skeleton is the
nucleotide extender (assembler/nucl_extend.py) with the same Bayesian
Beta-posterior candidate queue (CompareResultBySeqId, lines 23-76 — bit-for-
bit the nuclassembleresult comparator, so the libstdc++ heap replica is
reused), plus:
 - candidates enter the queue only if their NUCLEOTIDE seqId (as parsed
   back from the alignment text, 3-digit truncation) passes the threshold
   (line 197-201); alnLength is recomputed as max(span)+1 by the record
   parser (Matcher::parseAlignmentRecord), not taken from proteinaln2nucl
 - stop-codon barriers: no right extension when the query's amino-acid
   sequence ends with '*' or the target's starts with '*'; mirrored for the
   left side (lines 232-243)
 - the amino-acid contig is grown in lockstep with the nucleotide contig
   (right: aa fragment at dbEnd/3+1 of length tLen/3-dbEnd/3-1; left:
   dbStart/3 + hasStart leading residues, lines 266-300)
 - both nucleotide and amino-acid results are written (the aa output feeds
   the next guided iteration's kmermatcher)
"""
import numpy as np

from .. import constants
from ..data import seqdb
from ..ops.rescore import (RESCORE_END_TO_END, format_seq_id,
                           ungapped_by_diagonal)
from .extend import (_Cand, WAS_IN_ALIGNMENT, WAS_CANDIDATE, WAS_CONSUMED,
                     IS_CONTIG)
from .nucl_extend import LibstdcxxHeap, _posterior_less, _select_nucl_fragment


def _parsed_seq_id(seq_id):
    """The reference re-reads seqId from the 3-digit text column
    (Matcher::parseAlignmentRecord via strtod); replicate the round trip."""
    return float(format_seq_id(seq_id))


def guided_assemble(nucl_db, aa_db, alignments, seq_id_thr=0.99,
                    max_seq_len=200000, keep_target=True,
                    rescore_mode=RESCORE_END_TO_END, use_native=True):
    """alignments: {query_key: [proteinaln2nucl record dicts]}.

    Returns (nucl_out, aa_out, was_extended). Runs in the native kernel
    (native/nucl_extend.cpp guided_assemble_greedy) unless
    use_native=False or the two DBs are not row-aligned."""
    if use_native and rescore_mode == RESCORE_END_TO_END \
            and np.array_equal(nucl_db.keys, aa_db.keys):
        try:
            return _guided_assemble_native(nucl_db, aa_db, alignments,
                                           seq_id_thr, max_seq_len,
                                           keep_target)
        except Exception as e:  # pragma: no cover - fallback safety
            import warnings
            warnings.warn(f"native guided assemble failed ({e}); "
                          f"python fallback")
    if isinstance(alignments, dict) and "qk" in alignments:
        alignments = _flat_to_dicts(alignments)
    mat = constants.nucleotide()
    ascii_mat = mat.ascii_mat
    lut = nucl_db.id_lookup_array()
    was_extended = np.zeros(nucl_db.size, dtype=np.uint8)
    nucl_writer = seqdb.DBWriter(nucl_db.dbtype)
    aa_writer = seqdb.DBWriter(aa_db.dbtype)

    for qpos in range(nucl_db.size):
        qkey = int(nucl_db.keys[qpos])
        nucl_query = bytearray(nucl_db.get_seq_bytes(qpos))
        aa_qid = aa_db.key_to_id(qkey)
        aa_query = bytearray(aa_db.get_seq_bytes(aa_qid))
        orig_qlen = len(nucl_query)
        exclude_left = aa_query[:1] == b"*"
        exclude_right = aa_query[-1:] == b"*"

        recs = alignments.get(qkey, [])
        heap = LibstdcxxHeap(_posterior_less)
        n_aln = len(recs)
        for r in recs:
            seq_id = _parsed_seq_id(r["seqId"])
            if seq_id < seq_id_thr:
                continue
            qs, qe = int(r["qStartPos"]), int(r["qEndPos"])
            ts, te = int(r["dbStartPos"]), int(r["dbEndPos"])
            aln_len = max(qe - qs, te - ts) + 1  # Matcher::computeAlnLength
            cand = _Cand(int(r["dbKey"]), int(r["score"]), seq_id, aln_len,
                         qs, qe, int(r["qLen"]), ts, te, int(r["dbLen"]))
            heap.push(cand)
            if n_aln > 1:
                was_extended[int(lut[cand.db_key])] |= WAS_IN_ALIGNMENT

        query_could_be_extended = False
        while len(heap):
            left_off = 0
            right_off = 0
            deferred = []
            while True:
                best = _select_nucl_fragment(heap, qkey)
                if best is None:
                    break
                tid = int(lut[best.db_key])
                tseq = np.asarray(nucl_db.get_seq(tid))
                tlen = len(tseq)
                aa_t = aa_db.get_seq_bytes(aa_db.key_to_id(best.db_key))
                # stop-codon barriers (guidedassembleresult.cpp:232-243)
                if best.dbstart == 0:
                    if ((tlen - (best.dbend + 1)) <= right_off
                            or exclude_right or aa_t[:1] == b"*"):
                        continue
                elif best.qstart == 0:
                    if (best.dbstart <= left_off or exclude_left
                            or aa_t[-1:] == b"*"):
                        continue
                was_extended[tid] |= WAS_CANDIDATE

                if best.dbstart == 0 and best.qend == orig_qlen - 1:
                    # right extension
                    if right_off > 0:
                        deferred.append(best)
                        continue
                    frag_len = tlen - (best.dbend + 1)
                    if len(nucl_query) + frag_len >= max_seq_len:
                        break
                    aa_frag_len = (tlen // 3 - best.dbend // 3) - 1
                    nucl_query.extend(tseq[best.dbend + 1:].tobytes())
                    start = best.dbend // 3 + 1
                    aa_query.extend(aa_t[start: start + aa_frag_len])
                    right_off += frag_len
                    was_extended[tid] |= WAS_CONSUMED
                elif best.qstart == 0 and best.dbend == tlen - 1:
                    # left extension
                    if left_off > 0:
                        deferred.append(best)
                        continue
                    frag_len = best.dbstart
                    if len(nucl_query) + frag_len >= max_seq_len:
                        break
                    has_start = 1 if aa_t[:1] == b"*" else 0
                    nucl_query[:0] = tseq[:frag_len].tobytes()
                    aa_query[:0] = aa_t[: frag_len // 3 + has_start]
                    left_off += frag_len
                    was_extended[tid] |= WAS_CONSUMED

            if left_off > 0 or right_off > 0:
                query_could_be_extended = True
            if len(heap):
                break
            orig_qlen = len(nucl_query)
            qarr = np.frombuffer(bytes(nucl_query), dtype=np.uint8)
            for cand in deferred:
                tid = int(lut[cand.db_key])
                tseq = np.asarray(nucl_db.get_seq(tid))
                diag = (cand.qstart + left_off) - cand.dbstart
                score, start, end, diag_len, dist = ungapped_by_diagonal(
                    qarr, tseq, diag, ascii_mat, rescore_mode)
                if diag >= 0:
                    qs, qe = start + dist, end + dist
                    ts, te = start, end
                else:
                    qs, qe = start, end
                    ts, te = start + dist, end + dist
                idcnt = int((qarr[qs:qe] == tseq[ts:ts + (qe - qs)]).sum()) \
                    if qe > qs else 0
                cand.seq_id = idcnt / float(qe - qs) if qe != qs else float("nan")
                cand.qlen = len(nucl_query)
                cand.dblen = len(tseq)
                cand.aln_len = diag_len
                cand.score = int((score / (diag_len + 0.5)) * 100)
                cand.qstart, cand.qend = qs, qe
                cand.dbstart, cand.dbend = ts, te
                if cand.seq_id >= seq_id_thr:
                    heap.push(cand)

        if query_could_be_extended:
            was_extended[qpos] |= IS_CONTIG
            nucl_writer.write(qkey, bytes(nucl_query))
            aa_writer.write(qkey, bytes(aa_query))

    for i in range(nucl_db.size):
        is_not_contig = not (was_extended[i] & IS_CONTIG)
        was_not_consumed = not (was_extended[i] & WAS_CONSUMED)
        if is_not_contig and (keep_target or was_not_consumed):
            nucl_writer.write(int(nucl_db.keys[i]), nucl_db.get_seq_bytes(i))
            aa_writer.write(int(aa_db.keys[i]), aa_db.get_seq_bytes(i))

    return (nucl_writer.finish(sort_by_key=True),
            aa_writer.finish(sort_by_key=True), was_extended)


def _flat_to_dicts(f):
    """Expand protein_aln_to_nucl's flat format into per-query record
    dicts (python-path fallback only). seqId is already parsed, so the
    python loop's _parsed_seq_id round-trip is a no-op on it."""
    out = {}
    for i in range(len(f["qk"])):
        out.setdefault(int(f["qk"][i]), []).append({
            "dbKey": int(f["dbkey"][i]), "score": int(f["score"][i]),
            "seqId": float(f["seqid"][i]),
            "qStartPos": int(f["qs"][i]), "qEndPos": int(f["qe"][i]),
            "qLen": int(f["qlen"][i]), "dbStartPos": int(f["ts"][i]),
            "dbEndPos": int(f["te"][i]), "dbLen": int(f["tlen"][i]),
        })
    return out


def _guided_assemble_native(nucl_db, aa_db, alignments, seq_id_thr,
                            max_seq_len, keep_target):
    """Flatten the per-query record dicts (pre-filtered by the parsed-text
    seqId threshold, guidedassembleresult.cpp:197-201), run the native
    lockstep kernel, rebuild both output DBs in the oracle's order."""
    import ctypes
    from .extend import _flat_seqs, _native_output_db, _native_ptr as ptr
    from .. import constants as _c
    from .. import native

    mat = _c.nucleotide()
    n = nucl_db.size
    lut = nucl_db.id_lookup_array()
    seq_data, seq_off, seq_lens = _flat_seqs(nucl_db)
    aa_data, aa_off_flat, aa_lens = _flat_seqs(aa_db)
    keys = nucl_db.keys.astype(np.uint32)

    if isinstance(alignments, dict) and "qk" in alignments:
        # flat nucleotide-coordinate records straight from
        # protein_aln_to_nucl's vectorized path: seqId is already the
        # parsed text round-trip value, so only the threshold filter and
        # per-query offsets remain — no per-record python loop
        f = alignments
        n_aln_raw = np.ascontiguousarray(f["n_aln_raw"].astype(np.int32))
        keep = f["seqid"] >= seq_id_thr
        qk_kept = f["qk"][keep]
        lo = np.searchsorted(qk_kept, keys.astype(np.int64), side="left")
        hi = np.searchsorted(qk_kept, keys.astype(np.int64), side="right")
        aln_off = np.zeros(n + 1, dtype=np.int64)
        aln_off[1:] = np.cumsum((hi - lo).astype(np.int64))
        span = np.maximum(f["qe"] - f["qs"], f["te"] - f["ts"]) + 1
        a = {
            "dbkey": f["dbkey"][keep].astype(np.uint32),
            "dbid": f["dbid"][keep].astype(np.int32),
            "score": f["score"][keep].astype(np.int32),
            "seqid": f["seqid"][keep].astype(np.float64),
            "alnlen": span[keep].astype(np.int32),
            "qs": f["qs"][keep].astype(np.int32),
            "qe": f["qe"][keep].astype(np.int32),
            "qlen": f["qlen"][keep].astype(np.int32),
            "ts": f["ts"][keep].astype(np.int32),
            "te": f["te"][keep].astype(np.int32),
            "tlen": f["tlen"][keep].astype(np.int32),
        }
        a = {k: np.ascontiguousarray(v) for k, v in a.items()}
    else:
        counts = np.zeros(n + 1, dtype=np.int64)
        n_aln_raw = np.zeros(n, dtype=np.int32)
        flat = {k: [] for k in ("dbkey", "dbid", "score", "seqid", "alnlen",
                                "qs", "qe", "qlen", "ts", "te", "tlen")}
        for i in range(n):
            recs = alignments.get(int(keys[i]), [])
            n_aln_raw[i] = len(recs)
            kept = 0
            for r in recs:
                seq_id = _parsed_seq_id(r["seqId"])
                if seq_id < seq_id_thr:
                    continue
                qs, qe = int(r["qStartPos"]), int(r["qEndPos"])
                ts, te = int(r["dbStartPos"]), int(r["dbEndPos"])
                flat["dbkey"].append(int(r["dbKey"]))
                flat["dbid"].append(int(lut[int(r["dbKey"])]))
                flat["score"].append(int(r["score"]))
                flat["seqid"].append(seq_id)
                flat["alnlen"].append(max(qe - qs, te - ts) + 1)
                flat["qs"].append(qs)
                flat["qe"].append(qe)
                flat["qlen"].append(int(r["qLen"]))
                flat["ts"].append(ts)
                flat["te"].append(te)
                flat["tlen"].append(int(r["dbLen"]))
                kept += 1
            counts[i + 1] = kept
        aln_off = np.cumsum(counts)
        a = {k: np.ascontiguousarray(
                np.asarray(v, dtype=np.float64 if k == "seqid" else
                           (np.uint32 if k == "dbkey" else np.int32)))
             for k, v in flat.items()}

    ascii_mat = np.ascontiguousarray(mat.ascii_mat.astype(np.int16))
    flags = np.zeros(n, dtype=np.uint8)
    n_out_off = np.zeros(n, dtype=np.int64)
    n_out_len = np.zeros(n, dtype=np.int64)
    a_out_off = np.zeros(n, dtype=np.int64)
    a_out_len = np.zeros(n, dtype=np.int64)
    out_is_contig = np.zeros(n, dtype=np.uint8)
    n_cap = int(seq_off[-1]) + int(a["tlen"].sum()) + 1024
    a_cap = int(aa_off_flat[-1]) + int(a["tlen"].sum()) // 3 + 1024
    lib = native.lib()

    while True:
        n_buf = np.empty(n_cap, dtype=np.uint8)
        a_buf = np.empty(a_cap, dtype=np.uint8)
        rc = lib.guided_assemble_greedy(
            ptr(seq_data, ctypes.c_uint8), ptr(seq_off, ctypes.c_int64),
            ptr(seq_lens, ctypes.c_int32),
            ptr(aa_data, ctypes.c_uint8), ptr(aa_off_flat, ctypes.c_int64),
            ptr(aa_lens, ctypes.c_int32),
            ptr(keys, ctypes.c_uint32), np.int32(n),
            ptr(aln_off, ctypes.c_int64), ptr(n_aln_raw, ctypes.c_int32),
            ptr(a["dbkey"], ctypes.c_uint32), ptr(a["dbid"], ctypes.c_int32),
            ptr(a["score"], ctypes.c_int32), ptr(a["seqid"], ctypes.c_double),
            ptr(a["alnlen"], ctypes.c_int32), ptr(a["qs"], ctypes.c_int32),
            ptr(a["qe"], ctypes.c_int32), ptr(a["qlen"], ctypes.c_int32),
            ptr(a["ts"], ctypes.c_int32), ptr(a["te"], ctypes.c_int32),
            ptr(a["tlen"], ctypes.c_int32), ptr(ascii_mat, ctypes.c_int16),
            float(seq_id_thr), int(max_seq_len),
            ptr(flags, ctypes.c_uint8),
            ptr(n_buf, ctypes.c_uint8), np.int64(n_cap),
            ptr(n_out_off, ctypes.c_int64), ptr(n_out_len, ctypes.c_int64),
            ptr(a_buf, ctypes.c_uint8), np.int64(a_cap),
            ptr(a_out_off, ctypes.c_int64), ptr(a_out_len, ctypes.c_int64),
            ptr(out_is_contig, ctypes.c_uint8))
        if rc == 0:
            break
        n_cap *= 2
        a_cap *= 2
        flags[:] = 0

    nucl_out = _native_output_db(nucl_db, keys, seq_data, seq_off, seq_lens,
                                 flags, n_buf, n_out_off, n_out_len,
                                 out_is_contig, keep_target)
    aa_out = _native_output_db(aa_db, keys, aa_data, aa_off_flat, aa_lens,
                               flags, a_buf, a_out_off, a_out_len,
                               out_is_contig, keep_target)
    return nucl_out, aa_out, flags
