"""Six-frame ORF extraction (reference: lib/mmseqs/src/commons/Orf.cpp:171-348,
lib/mmseqs/src/util/extractorfs.cpp:19-159).

Semantics replicated exactly:
 - per-frame scan over codons; state machine starts "inside" an ORF so the
   leading fragment before the first stop is emitted with an incomplete start
 - START_TO_STOP(0): ORF begins at the first start codon after a stop;
   ANY_TO_STOP(1): at the first codon after a stop;
   LAST_START_TO_STOP(2): restarts at every start codon
 - ORFs end right before a stop codon (stop excluded) or at the last complete
   codon of the frame (included, incomplete end)
 - emission order is by ending-codon position, frames interleaved, forward
   strand then reverse strand — this ordering defines the renumbered keys
 - length/gap filters count codons; gaps are codons containing N or letters
   with no IUPAC complement
"""
import numpy as np

from ..data.createdb import IUPAC_COMPLEMENT, iupac_revcomp
from ..data.seqdb import SeqDB, DBWriter, NUCLEOTIDES, GENERIC_DB, renumber

START_TO_STOP = 0
ANY_TO_STOP = 1
LAST_START_TO_STOP = 2

STRAND_PLUS = 1
STRAND_MINUS = -1

# stop codons of the canonical table; for other tables pass explicit lists
_STOPS_T1 = (b"TAA", b"TAG", b"TGA")
_STARTS_ATG = (b"ATG",)


def _codon_flags(seq_u8, codons):
    """bool[L] - position p starts one of the given 3-byte codons (uppercased)."""
    L = len(seq_u8)
    if L < 3:
        return np.zeros(L, dtype=bool)
    up = seq_u8 & np.uint8(~0x20 & 0xFF)
    flags = np.zeros(L, dtype=bool)
    c0 = up[:-2]
    c1 = up[1:-1]
    c2 = up[2:]
    hit = np.zeros(L - 2, dtype=bool)
    for c in codons:
        hit |= (c0 == c[0]) & (c1 == c[1]) & (c2 == c[2])
    flags[: L - 2] = hit
    return flags


def _gap_flags(seq_u8):
    """bool[L] - codon at p contains N or a letter without IUPAC complement."""
    up = seq_u8 & np.uint8(~0x20 & 0xFF)
    bad = (up == ord("N")) | (IUPAC_COMPLEMENT[seq_u8] == ord("."))
    L = len(seq_u8)
    flags = np.zeros(L, dtype=bool)
    if L >= 3:
        flags[: L - 2] = bad[:-2] | bad[1:-1] | bad[2:]
    return flags


def find_orfs_in_strand(seq_u8, min_length, max_length, max_gaps, start_mode,
                        frames_mask=0b111, stop_codons=_STOPS_T1,
                        start_codons=_STARTS_ATG):
    """Find ORFs on one strand. Returns list of (from, to, incomplete_start,
    incomplete_end) in reference emission order (ending position ascending)."""
    L = len(seq_u8)
    results = []
    if L < 3:
        return results
    is_stop = _codon_flags(seq_u8, stop_codons)
    is_start = _codon_flags(seq_u8, start_codons)
    is_gap = _gap_flags(seq_u8)

    for frame in range(3):
        if not (frames_mask >> frame) & 1:
            continue
        # complete-codon positions for this frame
        positions = np.arange(frame, L - 2, 3)
        if len(positions) == 0:
            continue
        stops = positions[is_stop[positions]]
        starts = positions[is_start[positions]]
        last_pos = int(positions[-1])

        # segments are delimited by stop codons; None marks the frame end
        # (the isLast emission at the final complete codon, Orf.cpp:276,318)
        inside = True
        has_start = False
        cur_from = frame
        prev_stop = None
        for stop_pos in list(int(s) for s in stops) + [None]:
            if inside and (stop_pos is None or cur_from <= stop_pos):
                end_by_stop = stop_pos is not None
                to = (stop_pos - 1) if end_by_stop else (last_pos + 2)
                from_ = cur_from
                if start_mode == LAST_START_TO_STOP:
                    # every start codon resets the ORF begin (Orf.cpp:292-303)
                    lo = np.searchsorted(starts, from_)
                    hi = np.searchsorted(starts, to, side="right")
                    if hi > lo:
                        from_ = int(starts[hi - 1])
                        has_start = True
                if end_by_stop:
                    n_codons = (stop_pos - from_) // 3
                else:
                    n_codons = (last_pos + 3 - from_) // 3
                if not (n_codons == 0 and end_by_stop):
                    seg_end = stop_pos if end_by_stop else last_pos + 1
                    seg_positions = np.arange(from_, seg_end, 3)
                    n_gaps = int(is_gap[seg_positions].sum()) if len(seg_positions) else 0
                    if not (n_gaps > max_gaps or n_codons > max_length or n_codons < min_length):
                        emit_pos = stop_pos if end_by_stop else last_pos
                        results.append((from_, to, not has_start,
                                        not end_by_stop, emit_pos))
                inside = False
                has_start = False
            if stop_pos is None:
                break
            if not inside:
                # next ORF begins after this stop
                nxt = stop_pos + 3
                if start_mode == ANY_TO_STOP:
                    if nxt <= last_pos:
                        cur_from = nxt
                        inside = True
                        has_start = False
                else:
                    idx = np.searchsorted(starts, nxt)
                    if idx < len(starts):
                        cur_from = int(starts[idx])
                        inside = True
                        has_start = True
            prev_stop = stop_pos
    # reference emits an ORF at the scan position where it ends (the stop
    # codon, or the frame's last codon), walking positions ascending across
    # interleaved frames — sort by that emission position
    results.sort(key=lambda r: r[4])
    return [r[:4] for r in results]


def _setseq(seq_u8):
    """Orf::setSequence char handling: only lowercase 'u' -> 't'
    (Orf.cpp:141-144 — the 'U' branch is overwritten by the next statement)."""
    out = seq_u8.copy()
    out[out == ord("u")] = ord("t")
    return out


def _revcomp_orf(seq_u8):
    """Orf revcomp: IUPAC complement with '.' replaced by 'N' (Orf.cpp:146-151)."""
    rc = iupac_revcomp(seq_u8)
    rc = rc.copy()
    rc[rc == ord(".")] = ord("N")
    return rc


def extract_orfs(seq_db, min_length=30, max_length=32734, max_gaps=2**31 - 1,
                 start_mode=ANY_TO_STOP, contig_start_mode=2, contig_end_mode=2,
                 forward_frames=0b111, reverse_frames=0b111,
                 stop_codons=_STOPS_T1, start_codons=_STARTS_ATG):
    """extractorfs: nucleotide DB -> (orf nucleotide DB, orf header DB).

    Output keys are renumbered 0..N-1; headers are
    ``<contig key>\\t<from>±<len>[\\t<completeflag>]`` (Orf::writeOrfHeader).
    """
    seq_writer = DBWriter(NUCLEOTIDES)
    hdr_writer = DBWriter(GENERIC_DB)
    out_key = 0
    for i in range(seq_db.size):
        key = int(seq_db.keys[i])
        raw = seq_db.get_seq(i)
        if len(raw) < 3:
            continue
        seq = _setseq(raw)
        rc = _revcomp_orf(seq)
        L = len(seq)
        for strand, s in ((STRAND_PLUS, seq), (STRAND_MINUS, rc)):
            mask = forward_frames if strand == STRAND_PLUS else reverse_frames
            if mask == 0:
                continue
            orfs = find_orfs_in_strand(s, min_length, max_length, max_gaps,
                                       start_mode, mask, stop_codons, start_codons)
            for from_, to, inc_start, inc_end in orfs:
                if contig_start_mode < 2 and (int(inc_start) == contig_start_mode):
                    continue
                if contig_end_mode < 2 and (int(inc_end) == contig_end_mode):
                    continue
                frag = s[from_: to + 1]
                fp, tp = from_, to
                if strand == STRAND_MINUS:
                    fp = (L - 1) - from_
                    tp = (L - 1) - to
                hdr = _orf_header(key, fp, tp, inc_start, inc_end)
                seq_writer.write(out_key, frag.tobytes())
                hdr_writer.write(out_key, hdr)
                out_key += 1
    orf_db = seq_writer.finish(sort_by_key=False)
    hdr_db = hdr_writer.finish(sort_by_key=False)
    return orf_db, hdr_db


def _orf_header(key, from_pos, to_pos, inc_start, inc_end):
    """Orf::writeOrfHeader (Orf.cpp:440-457)."""
    sign = "+" if from_pos < to_pos else "-"
    length = abs(from_pos - to_pos)
    complete = int(inc_start) | (int(inc_end) << 1)
    s = f"{key}\t{from_pos}{sign}{length}"
    if complete != 0:
        s += f"\t{complete}"
    return s.encode()


def parse_orf_header(data):
    """Orf::parseOrfHeader (Orf.cpp:351-438) -> dict or None."""
    parts = data.split()
    if len(parts) < 2:
        return None
    try:
        key = int(parts[0])
        span = parts[1].decode() if isinstance(parts[1], bytes) else parts[1]
    except ValueError:
        return None
    for sep in ("+", "-"):
        if sep in span[1:]:
            a, _, b = span.partition(sep)
            try:
                frm = int(a)
                ln = int(b)
            except ValueError:
                return None
            to = frm + ln if sep == "+" else frm - ln
            complete = 0
            if len(parts) == 3:
                try:
                    complete = int(parts[2])
                except ValueError:
                    complete = 0
            return {
                "id": key, "from": frm, "to": to,
                "incomplete_start": bool(complete & 1),
                "incomplete_end": bool(complete & 2),
                "strand": STRAND_MINUS if frm > to else STRAND_PLUS,
            }
    return None
