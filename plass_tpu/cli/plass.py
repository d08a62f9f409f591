"""`plass` CLI (reference: src/plass.cpp:15-59 command table).

Visible: assemble. Hidden tools: assembleresults, findassemblystart,
filternoncoding, mergereads, createhdb, plus shared base tools.
"""
import sys

from ..data import seqdb
from ..utils.log import logger
from . import params as P
from .app import Command, run_app
from .tools import BASE_COMMANDS, load_alignments


def _assemble(positional, space):
    from ..workflow.assemble import AssembleParams, run_assemble
    if len(positional) < 3:
        logger.error("Too few input files provided.\n"
                     "For paired-end input provide READSETA_1.fastq READSETA_2.fastq ... OUTPUT.fasta tmpDir\n"
                     "For single input use READSET.fast(q|a) OUTPUT.fasta tmpDir")
        return 1
    tmp_dir = positional[-1]
    out_file = positional[-2]
    inputs = positional[:-2]
    if len(inputs) != 1 and len(inputs) % 2 != 0:
        logger.error("Too many input files provided.")
        return 1
    v = space.values
    p = AssembleParams(
        kmer_size=v["kmer_size"].aminoacids,
        alphabet_size=v["alphabet_size"].aminoacids,
        kmers_per_sequence=v["kmers_per_sequence"],
        kmers_per_sequence_scale=v["kmers_per_sequence_scale"].aminoacids,
        num_iterations=v["num_iterations"].aminoacids,
        min_seq_id=v["min_seq_id"].aminoacids,
        eval_thr=v["eval_thr"],
        cov_thr=v["cov_thr"],
        cov_mode=v["cov_mode"],
        min_aln_len=v["min_aln_len"].aminoacids,
        max_seq_len=v["max_seq_len"],
        orf_min_length=v["orf_min_length"],
        orf_max_length=v["orf_max_length"],
        translation_table=v["translation_table"],
        use_all_table_starts=v["use_all_table_starts"],
        filter_proteins=v["filter_proteins"],
        protein_filter_threshold=v["protein_filter_threshold"],
        hash_shift=v["hash_shift"],
        ignore_multi_kmer=v["ignore_multi_kmer"],
        include_only_extendable=v["include_only_extendable"],
        include_only_extendable_set="include_only_extendable" in space.was_set,
        keep_target=v["keep_target"],
        rescore_mode=v["rescore_mode"],
        remove_tmp_files=v["remove_tmp_files"],
        delete_tmp_inc=bool(v["delete_tmp_inc"]),
        backend=v.get("backend", "auto"),
    )
    run_assemble(inputs, out_file, tmp_dir, p)
    return 0


def _plass_defaults(flags_fn):
    """Plass-specific defaults (Assembler.cpp:10-27)."""
    def make():
        space = P.ParamSpace(flags_fn())
        space.values["min_seq_id"] = P.MultiParam(0.9, 0.9)
        space.values["rescore_mode"] = 3
        return space
    return make


def _assembleresults(positional, space):
    from ..assembler.extend import assemble
    if len(positional) != 3:
        raise ValueError("usage: assembleresults <seqDB> <alnDB> <outDB>")
    db = seqdb.SeqDB.open(positional[0])
    alns = load_alignments(positional[1])
    out, _ = assemble(db, alns, seq_id_thr=space.values["min_seq_id"].aminoacids,
                      max_seq_len=space.values["max_seq_len"],
                      keep_target=space.values["keep_target"])
    out.save(positional[2])
    return 0


def _findassemblystart(positional, space):
    from ..assembler.findassemblystart import find_assembly_start
    if len(positional) != 3:
        raise ValueError("usage: findassemblystart <seqDB> <alnDB> <outDB>")
    db = seqdb.SeqDB.open(positional[0])
    alns = load_alignments(positional[1])
    find_assembly_start(db, alns).save(positional[2])
    return 0


def _filternoncoding(positional, space):
    from ..assembler.filternoncoding import filter_noncoding
    if len(positional) != 2:
        raise ValueError("usage: filternoncoding <seqDB> <outDB>")
    db = seqdb.SeqDB.open(positional[0])
    filter_noncoding(db, space.values["protein_filter_threshold"]).save(positional[1])
    return 0


def _mergereads(positional, space):
    from ..data.createdb import merge_reads
    if len(positional) < 3 or (len(positional) - 1) % 2 != 0:
        raise ValueError("usage: mergereads <r1.fq> <r2.fq> [...] <outDB>")
    sdb, hdb = merge_reads(positional[:-1])
    sdb.save(positional[-1])
    hdb.save(positional[-1] + "_h")
    return 0


def _createhdb(positional, space):
    if len(positional) not in (2, 3):
        raise ValueError("usage: createhdb <seqDB> [<cycleDB>] <outDB>")
    db = seqdb.SeqDB.open(positional[0])
    cycle_keys = None
    if len(positional) == 3:
        cycle_keys = set(int(k) for k in seqdb.SeqDB.open(positional[1]).keys)
    out = positional[-1]
    w = seqdb.DBWriter(seqdb.GENERIC_DB)
    for i in range(db.size):
        line = f"{i} len:{db.seq_len(i)}"
        if cycle_keys is not None:
            line += f" cycle:{int(int(db.keys[i]) in cycle_keys)}"
        w.write(int(db.keys[i]), line.encode())
    w.finish().save(out + "_h")
    return 0


def _linclust(positional, space):
    """`linclust` (hidden): cluster a sequence DB (AA or nucl)."""
    from ..assembler.cluster import merged_clusters_to_db
    from ..workflow.linclust import LinclustParams, run_linclust
    if len(positional) != 3:
        raise ValueError("usage: linclust <i:seqDB> <o:cluDB> <tmpDir>")
    db = seqdb.SeqDB.open(positional[0])
    v = space.values
    if "cov_thr" not in space.was_set:
        v["cov_thr"] = 0.8  # linclust default (Parameters clusterworkflow)
    if "kmers_per_sequence" not in space.was_set:
        v["kmers_per_sequence"] = 21
    if "kmers_per_sequence_scale" not in space.was_set:
        v["kmers_per_sequence_scale"] = P.MultiParam(0.0, 0.2)
    if "ignore_multi_kmer" not in space.was_set:
        v["ignore_multi_kmer"] = False
    if "max_seq_len" not in space.was_set:
        v["max_seq_len"] = 65535
    is_nucl = db.dbtype == seqdb.NUCLEOTIDES
    p = LinclustParams(
        kmer_size=0 if "kmer_size" not in space.was_set else (
            v["kmer_size"].nucleotides if is_nucl else v["kmer_size"].aminoacids),
        kmers_per_sequence=v["kmers_per_sequence"],
        kmers_per_sequence_scale=(v["kmers_per_sequence_scale"].nucleotides
                                  if is_nucl
                                  else v["kmers_per_sequence_scale"].aminoacids),
        hash_shift=v["hash_shift"],
        seq_id_thr=(v["min_seq_id"].nucleotides if is_nucl
                    else v["min_seq_id"].aminoacids),
        cov_thr=v["cov_thr"], cov_mode=v["cov_mode"],
        eval_thr=0.001, gap_open=5 if is_nucl else 11,
        gap_extend=2 if is_nucl else 1,
        ignore_multi_kmer=bool(v["ignore_multi_kmer"]),
        wrapped_scoring=bool(v.get("wrapped_scoring", False)),
        max_seq_len=v["max_seq_len"])
    merged_clusters_to_db(run_linclust(db, p)).save(positional[1])
    return 0


def commands():
    mk = _plass_defaults
    return [
        Command("assemble", _assemble, mk(P.assemble_flags),
                "<i:fast[a|q]File[.gz]> | <i:fastqFile1_1[.gz] ... <o:fastaFile> <tmpDir>",
                "Assemble protein sequences by iterative greedy overlap assembly"),
        Command("assembleresults", _assembleresults, mk(P.assemble_flags),
                "<i:seqDB> <i:alnDB> <o:seqDB>", "Extend sequences", hidden=True),
        Command("findassemblystart", _findassemblystart, mk(P.assemble_flags),
                "<i:seqDB> <i:alnDB> <o:seqDB>", "Correct start codons", hidden=True),
        Command("filternoncoding", _filternoncoding, mk(P.assemble_flags),
                "<i:seqDB> <o:seqDB>", "Filter non-coding proteins", hidden=True),
        Command("mergereads", _mergereads, mk(P.assemble_flags),
                "<i:fastq> <i:fastq> <o:seqDB>", "Merge paired-end reads", hidden=True),
        Command("createhdb", _createhdb, mk(P.assemble_flags),
                "<i:seqDB> [<i:cycleDB>] <o:hdb>", "Generate header DB", hidden=True),
        Command("linclust", _linclust, mk(lambda: P.assemble_flags() + [
            P.Flag("--min-contig-len", "min_contig_len", int, 1000, "unused")]),
                "<i:seqDB> <o:cluDB> <tmpDir>", "Linear-time clustering", hidden=True),
    ] + BASE_COMMANDS


def main():
    sys.exit(run_app("plass", commands()))


if __name__ == "__main__":
    main()
