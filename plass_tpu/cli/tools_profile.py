"""Profile / MSA tools (reference: lib/mmseqs/src/util/result2profile.cpp,
result2msa.cpp, msa2profile.cpp, profile2pssm.cpp, profile2seq.cpp,
convertprofiledb.cpp).
"""
import numpy as np

from ..data import seqdb
from ..utils.log import logger
from . import params as P
from .app import Command

EVAL_PROFILE_DEFAULT = 0.1  # Parameters.cpp evalProfile default


def _parse_aln_line(line):
    from ..ops.msa import expand_cigar
    f = line.split("\t")
    return {
        "dbKey": int(f[0]), "score": int(f[1]), "seqId": float(f[2]),
        "eval": float(f[3]), "qStartPos": int(f[4]), "qEndPos": int(f[5]),
        "qLen": int(f[6]), "dbStartPos": int(f[7]), "dbEndPos": int(f[8]),
        "dbLen": int(f[9]),
        "backtrace": expand_cigar(f[10]) if len(f) > 10 else "",
        "raw": line,
    }


def _collect_msa_inputs(qdb, tdb, rdb, i, same_db, eval_profile, mat,
                        recompute_missing_bt=True):
    """Shared result2profile/result2msa record loop: returns (center_num,
    edge_seqs, alns). Hits >= evalProfile are skipped (result2profile.cpp
    only; result2msa keeps all — pass eval_profile=None)."""
    qkey = int(rdb.keys[i])
    qid = qdb.key_to_id(qkey)
    center = mat.aa2num[qdb.get_seq(qid)]
    edge_seqs = []
    alns = []
    aligner = None
    for line in rdb.get_data(i).tobytes().decode().split("\n"):
        if not line:
            continue
        r = _parse_aln_line(line)
        if r["dbKey"] == qkey and same_db:
            continue
        if eval_profile is not None and not (r["eval"] < eval_profile):
            continue
        tid = tdb.key_to_id(r["dbKey"])
        if tid is None:
            raise ValueError(f"Sequence {r['dbKey']} does not exist in "
                             "target sequence database")
        tnum = mat.aa2num[tdb.get_seq(tid)]
        if not r["backtrace"] and recompute_missing_bt:
            # Matcher::getSWResult recompute (result2profile.cpp:200-207):
            # SubstitutionMatrix(2.0, -0.2) striped SW with backtrace
            if aligner is None:
                from ..ops.protein_align import ProteinAligner
                from ..ops.evalue import EvalueComputer
                from .. import constants
                aligner = ProteinAligner(constants.blosum62_pref())
                aligner.init_query(center)
                evaluer = EvalueComputer.for_matrix(
                    "blosum62_11_1", tdb.total_residues())
                aligner._evaluer = evaluer
            res = aligner.ssw_align(tnum, 11, 1, 2, float("inf"),
                                    aligner._evaluer, 0, 0.0,
                                    max(len(center) // 2, 15))
            r["qStartPos"] = res["qStart"]
            r["dbStartPos"] = res["dbStart"]
            r["backtrace"] = res.get("cigar") or ""
        edge_seqs.append(tnum)
        alns.append(r)
    return center, edge_seqs, alns


def _qid_vec(space):
    qid = space.values.get("qid", "0.0")
    return sorted(int(float(s) * 100) for s in str(qid).split(","))


def _result2profile(positional, space, return_aln=False):
    """result2profile / filterresult (result2profile.cpp:17-291)."""
    from .. import constants
    from ..ops import msa as MSA
    if len(positional) != 4:
        raise ValueError("usage: result2profile <i:qDB> <i:tDB> <i:resDB> <o:db>")
    v = space.values
    mat = constants.blosum62()
    eval_thr = v.get("eval_thr", 0.001)
    eval_profile = v.get("eval_profile", EVAL_PROFILE_DEFAULT)
    if eval_thr < eval_profile or return_aln:
        eval_profile = eval_thr
    filter_msa = v.get("filter_msa", 1)
    is_filtering = filter_msa != 0 or return_aln
    same_db = positional[0] == positional[1]
    qdb = seqdb.SeqDB.open(positional[0])
    tdb = qdb if same_db else seqdb.SeqDB.open(positional[1])
    rdb = seqdb.SeqDB.open(positional[2])
    writer = seqdb.DBWriter(
        seqdb.ALIGNMENT_RES if return_aln else seqdb.HMM_PROFILE)
    for i in seqdb.data_order(rdb):
        i = int(i)
        qkey = int(rdb.keys[i])
        if qdb.key_to_id(qkey) is None:
            logger.warning("Invalid query sequence %s", qkey)
            continue
        center, edge_seqs, alns = _collect_msa_inputs(
            qdb, tdb, rdb, i, same_db, eval_profile, mat)
        msa, center_len = MSA.compute_msa(center, edge_seqs, alns,
                                          no_deletion=True)
        if is_filtering:
            keep, filtered_size = MSA.msa_filter(
                msa, center_len, coverage=int(v.get("cov_msa_thr", 0.0) * 100),
                qid_vec=_qid_vec(space), qsc=v.get("qsc", -20.0),
                max_seqid=int(v.get("filter_max_seq_id", 0.9) * 100),
                ndiff=v.get("filter_ndiff", 1000),
                filter_min_enable=v.get("filter_min_enable", 0),
                gap_open=v.get("gap_open", 11), gap_extend=v.get("gap_extend", 1))
            # MsaFilter::shuffleSequences compacts kept rows in order
            kept_rows = [k for k in range(msa.shape[0]) if keep[k] != 0]
            msa = msa[kept_rows]
            alns = [alns[k - 1] for k in kept_rows[1:]]
            set_size = filtered_size
        else:
            set_size = msa.shape[0]
        if return_aln:
            from ..ops.rescore import format_seq_id
            out = []
            for r in alns[:set_size - 1]:
                f = r["raw"].split("\t")
                bt = f[10] if len(f) > 10 else f"{len(r['backtrace'])}M"
                out.append("\t".join(f[:10]) + f"\t{bt}\n")
            writer.write(qkey, "".join(out).encode(), add_newline=False)
        else:
            res = MSA.compute_pssm(msa[:set_size], center_len,
                                   wg=bool(v.get("wg", False)),
                                   pca=v.get("pca", 0.0), pcb=v.get("pcb", 1.5))
            if v.get("mask_profile", 1):
                MSA.mask_profile(center, res)
            writer.write(qkey, MSA.profile_record(center, res),
                         add_newline=False)
    writer.finish().save(positional[3])
    return 0


def _result2profile_cmd(positional, space):
    return _result2profile(positional, space, return_aln=False)


def _filterresult(positional, space):
    return _result2profile(positional, space, return_aln=True)


def _msa_format_rows(msa, center_len, mat):
    rows = []
    for k in range(msa.shape[0]):
        row = msa[k, :center_len]
        rows.append("".join(mat.letters[c] if c < 20 else "-" for c in row))
    return rows


def _result2msa(positional, space):
    """result2msa (result2msa.cpp): FASTA-MSA / A3M / STOCKHOLM formats."""
    from .. import constants
    from ..data.headers import parse_fasta_header
    from ..ops import msa as MSA
    if len(positional) != 4:
        raise ValueError("usage: result2msa <i:qDB> <i:tDB> <i:resDB> <o:msaDB>")
    v = space.values
    mat = constants.blosum62()
    fmt = v.get("msa_format_mode", 2)
    filter_msa = v.get("filter_msa", 0)  # result2msa default: no filter
    skip_query = v.get("skip_query", False)
    same_db = positional[0] == positional[1]
    qdb = seqdb.SeqDB.open(positional[0])
    qhdr = seqdb.SeqDB.open(positional[0] + "_h")
    tdb = qdb if same_db else seqdb.SeqDB.open(positional[1])
    thdr = qhdr if same_db else seqdb.SeqDB.open(positional[1] + "_h")
    rdb = seqdb.SeqDB.open(positional[2])
    is_stockholm = fmt == 4
    writer = seqdb.DBWriter(seqdb.MSA_DB)
    chunks = []
    for i in seqdb.data_order(rdb):
        i = int(i)
        qkey = int(rdb.keys[i])
        if qdb.key_to_id(qkey) is None:
            logger.warning("Invalid query sequence %s", qkey)
            continue
        center, edge_seqs, alns = _collect_msa_inputs(
            qdb, tdb, rdb, i, same_db, None, mat)
        msa, center_len = MSA.compute_msa(
            center, edge_seqs, alns,
            no_deletion=not v.get("allow_deletion", False))
        kept = np.ones(msa.shape[0], dtype=bool)
        if filter_msa != 0:
            keep, _ = MSA.msa_filter(
                msa, center_len, coverage=int(v.get("cov_msa_thr", 0.0) * 100),
                qid_vec=_qid_vec(space), qsc=v.get("qsc", -20.0),
                max_seqid=int(v.get("filter_max_seq_id", 0.9) * 100),
                ndiff=v.get("filter_ndiff", 1000),
                filter_min_enable=v.get("filter_min_enable", 0))
            kept = keep != 0
        headers = [qhdr.get_data(qhdr.key_to_id(qkey)).tobytes().decode()]
        for r in alns:
            headers.append(
                thdr.get_data(thdr.key_to_id(r["dbKey"])).tobytes().decode())
        result = []
        start = 1 if skip_query else 0
        rows = _msa_format_rows(msa, center_len, mat)
        if fmt in (1, 2):  # FASTADB(+SUMMARY)
            for k in range(start, msa.shape[0]):
                if not kept[k]:
                    continue
                result.append(">" + headers[k].rstrip("\n") + "\n")
                result.append(rows[k] + "\n")
        elif fmt == 4:  # STOCKHOLM_FLAT
            result.append("# STOCKHOLM 1.0\n")
            if skip_query:
                result.append("#=GF ID " +
                              parse_fasta_header(headers[0]) + "\n")
            for k in range(start, msa.shape[0]):
                if not kept[k]:
                    continue
                result.append(parse_fasta_header(headers[k]) + " " + rows[k] + "\n")
            result.append("//\n")
        elif fmt == 5:  # A3M
            for k in range(start, msa.shape[0]):
                if not kept[k]:
                    continue
                result.append(">" + parse_fasta_header(headers[k]) + "\n")
                if k == 0:
                    result.append(rows[k] + "\n")
                else:
                    seq = edge_seqs[k - 1]
                    r = alns[k - 1]
                    bt = r["backtrace"]
                    out = []
                    seq_pos = 0
                    bt_pos = 0
                    for pos in range(center_len):
                        aa = int(msa[k, pos])
                        if aa >= MSA.GAP:
                            out.append("-")
                        else:
                            out.append(mat.letters[aa])
                            bt_pos += 1
                            seq_pos += 1
                        while bt_pos < len(bt) and bt[bt_pos] == "I":
                            bt_pos += 1
                        while bt_pos < len(bt) and bt[bt_pos] == "D":
                            out.append(mat.letters[
                                seq[r["dbStartPos"] + seq_pos]].lower())
                            bt_pos += 1
                            seq_pos += 1
                    result.append("".join(out) + "\n")
        body = "".join(result).encode()
        if is_stockholm:
            chunks.append(body)
        else:
            writer.write(qkey, body, add_newline=False)
    if is_stockholm:
        with open(positional[3], "wb") as f:
            f.writelines(chunks)
    else:
        writer.finish().save(positional[3])
    return 0


def _msa2profile(positional, space):
    """msa2profile (msa2profile.cpp): MSA records (FASTA blocks) ->
    profile DB. match-mode 0: first sequence columns define match states;
    match-mode 1: columns with >= match-ratio residues."""
    from .. import constants
    from ..ops import msa as MSA
    if len(positional) != 2:
        raise ValueError("usage: msa2profile <i:msaDB> <o:profileDB>")
    v = space.values
    mat = constants.blosum62()
    match_mode = v.get("match_mode", 0)
    match_ratio = v.get("match_ratio", 0.5)
    filter_msa = v.get("filter_msa", 1)
    db = seqdb.SeqDB.open(positional[0])
    writer = seqdb.DBWriter(seqdb.HMM_PROFILE)
    hwriter = seqdb.DBWriter(seqdb.GENERIC_DB)
    for i in seqdb.data_order(db):
        i = int(i)
        text = db.get_data(i).tobytes().decode()
        names = []
        seqs = []
        for block in text.split(">"):
            if not block.strip():
                continue
            lines = block.split("\n")
            names.append(lines[0])
            seqs.append("".join(lines[1:]))
        if not seqs:
            continue
        width = max(len(s) for s in seqs)
        setsize = len(seqs)
        raw = np.full((setsize, width), MSA.GAP, dtype=np.uint8)
        lowercase = np.zeros((setsize, width), dtype=bool)
        for k, s in enumerate(seqs):
            arr = np.frombuffer(s.encode(), dtype=np.uint8)
            lowercase[k, :len(arr)] = (arr >= ord("a")) & (arr <= ord("z"))
            num = mat.aa2num[arr]
            num[(arr == ord("-")) | (arr == ord("."))] = MSA.GAP
            raw[k, :len(arr)] = num
        # determine match columns
        if match_mode == 0:
            match_cols = (raw[0] != MSA.GAP) & ~lowercase[0]
        else:
            frac = ((raw != MSA.GAP) & ~lowercase).sum(axis=0) / setsize
            match_cols = frac >= match_ratio
        cols = np.nonzero(match_cols)[0]
        center_len = len(cols)
        padded = (center_len + MSA.BLOCK) // MSA.BLOCK * MSA.BLOCK
        msa = np.full((setsize, padded), MSA.GAP, dtype=np.uint8)
        msa[:, :center_len] = raw[:, cols]
        if filter_msa != 0:
            keep, filtered = MSA.msa_filter(
                msa, center_len, coverage=int(v.get("cov_msa_thr", 0.0) * 100),
                qid_vec=_qid_vec(space), qsc=v.get("qsc", -20.0),
                max_seqid=int(v.get("filter_max_seq_id", 0.9) * 100),
                ndiff=v.get("filter_ndiff", 1000),
                filter_min_enable=v.get("filter_min_enable", 0))
            msa = msa[[k for k in range(setsize) if keep[k] != 0]]
        center = msa[0, :center_len].copy()
        center[center == MSA.GAP] = MSA.ANY
        res = MSA.compute_pssm(msa, center_len,
                               wg=bool(v.get("wg", False)),
                               pca=v.get("pca", 1.0), pcb=v.get("pcb", 1.5))
        writer.write(int(db.keys[i]), MSA.profile_record(center, res),
                     add_newline=False)
        hwriter.write(int(db.keys[i]), (names[0].split("\n")[0] + "\n").encode(),
                      add_newline=False)
    writer.finish().save(positional[1])
    hwriter.finish().save(positional[1] + "_h")
    return 0


def _profile2pssm(positional, space):
    """profile2pssm (profile2pssm.cpp): profile DB -> integer PSSM (flat
    TSV or DB with --db-output)."""
    from ..ops.profiledb import read_profile, profile_to_pssm_lines
    if len(positional) != 2:
        raise ValueError("usage: profile2pssm <i:profileDB> <o:pssm>")
    v = space.values
    db_out = v.get("db_output", False)
    comp_bias = bool(v.get("comp_bias_corr", 1))
    db = seqdb.SeqDB.open(positional[0])
    writer = seqdb.DBWriter(seqdb.GENERIC_DB)
    flat = []
    for i in seqdb.data_order(db):
        i = int(i)
        key = int(db.keys[i])
        prof = read_profile(db.get_data(i).tobytes(), add_pc=False)
        body = profile_to_pssm_lines(prof, comp_bias_correction=comp_bias)
        if db_out:
            writer.write(key, body.encode(), add_newline=False)
        else:
            flat.append(f"Query profile of sequence {key}\n{body}")
    if db_out:
        writer.finish().save(positional[1])
    else:
        with open(positional[1], "w") as f:
            f.writelines(flat)
    return 0


def _profile2seq(positional, space, consensus):
    """profile2consensus / profile2repseq (profile2seq.cpp)."""
    from .. import constants
    from ..ops.profiledb import read_profile
    if len(positional) != 2:
        raise ValueError("usage: profile2(consensus|repseq) <i:profileDB> <o:seqDB>")
    mat = constants.blosum62()
    db = seqdb.SeqDB.open(positional[0])
    writer = seqdb.DBWriter(seqdb.AMINO_ACIDS)
    for i in seqdb.data_order(db):
        i = int(i)
        prof = read_profile(db.get_data(i).tobytes(), add_pc=False)
        nums = prof["consensus"] if consensus else prof["query"]
        writer.write(int(db.keys[i]),
                     "".join(mat.letters[c] for c in nums).encode())
    writer.finish().save(positional[1])
    return 0


def _profile2consensus(positional, space):
    return _profile2seq(positional, space, True)


def _profile2repseq(positional, space):
    return _profile2seq(positional, space, False)


def _convertprofiledb(positional, space):
    """convertprofiledb (convertprofiledb.cpp): HH-suite HMM flat file ->
    MMseqs profile DB is out of scope here; this implements the supported
    direction used in workflows: profile DB consistency re-write."""
    raise ValueError("convertprofiledb: HH-suite input conversion is not "
                     "supported in this build")


def _profile_flags():
    return P.common_flags() + [
        P.Flag("-e", "eval_thr", float, 0.001, "E-value threshold"),
        P.Flag("--e-profile", "eval_profile", float, EVAL_PROFILE_DEFAULT, "Profile E-value threshold"),
        P.Flag("--filter-msa", "filter_msa", int, 1, "Filter MSA", r"[0-1]"),
        P.Flag("--max-seq-id", "filter_max_seq_id", float, 0.9, "Filter max seq id"),
        P.Flag("--qid", "qid", str, "0.0", "Filter min seq id with query"),
        P.Flag("--qsc", "qsc", float, -20.0, "Filter min score per column"),
        P.Flag("--cov", "cov_msa_thr", float, 0.0, "Filter min coverage"),
        P.Flag("--diff", "filter_ndiff", int, 1000, "Keep N most diverse seqs"),
        P.Flag("--filter-min-enable", "filter_min_enable", int, 0, "Only filter MSAs with more than N seqs"),
        P.Flag("--wg", "wg", bool, False, "Global sequence weighting"),
        P.Flag("--pca", "pca", float, 0.0, "Pseudocount admixture strength"),
        P.Flag("--pcb", "pcb", float, 1.5, "Pseudocount Neff dependence"),
        P.Flag("--mask-profile", "mask_profile", int, 1, "Mask profile with tantan", r"[0-1]"),
        P.Flag("--comp-bias-corr", "comp_bias_corr", int, 1, "Composition bias correction", r"[0-1]"),
        P.Flag("--gap-open", "gap_open", int, 11, "Gap open cost"),
        P.Flag("--gap-extend", "gap_extend", int, 1, "Gap extend cost"),
        P.Flag("--db-output", "db_output", bool, False, "Write DB output instead of flat file"),
        P.Flag("--msa-format-mode", "msa_format_mode", int, 2, "1 FASTA-sum, 2 FASTA, 4 Stockholm, 5 A3M"),
        P.Flag("--allow-deletion", "allow_deletion", bool, False, "Allow deletions in MSA"),
        P.Flag("--skip-query", "skip_query", bool, False, "Skip the query sequence"),
        P.Flag("--match-mode", "match_mode", int, 0, "0 query columns, 1 by match-ratio", r"[0-1]"),
        P.Flag("--match-ratio", "match_ratio", float, 0.5, "Match-column residue ratio"),
        P.Flag("--summary-prefix", "summary_prefix", str, "cl", "Summary prefix"),
    ]


COMMANDS = [
    Command("result2profile", _result2profile_cmd, lambda: P.ParamSpace(_profile_flags()),
            "<i:qDB> <i:tDB> <i:resDB> <o:profileDB>", "Compute profiles from results", hidden=True),
    Command("filterresult", _filterresult, lambda: P.ParamSpace(_profile_flags()),
            "<i:qDB> <i:tDB> <i:resDB> <o:resDB>", "Filter results by MSA redundancy filter", hidden=True),
    Command("result2msa", _result2msa, lambda: P.ParamSpace(_profile_flags()),
            "<i:qDB> <i:tDB> <i:resDB> <o:msaDB>", "Compute MSAs from results", hidden=True),
    Command("msa2profile", _msa2profile, lambda: P.ParamSpace(_profile_flags()),
            "<i:msaDB> <o:profileDB>", "Convert MSA DB to profile DB", hidden=True),
    Command("profile2pssm", _profile2pssm, lambda: P.ParamSpace(_profile_flags()),
            "<i:profileDB> <o:pssmFile>", "Convert profiles to integer PSSMs", hidden=True),
    Command("profile2consensus", _profile2consensus, lambda: P.ParamSpace(_profile_flags()),
            "<i:profileDB> <o:seqDB>", "Extract consensus sequences", hidden=True),
    Command("profile2repseq", _profile2repseq, lambda: P.ParamSpace(_profile_flags()),
            "<i:profileDB> <o:seqDB>", "Extract representative sequences", hidden=True),
]
