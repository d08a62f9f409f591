"""`penguin` CLI (reference: src/penguin.cpp:15-67 command table).

Visible: guided_nuclassemble, nuclassemble. Hidden: guidedassembleresults,
nuclassembleresults, mergereads, cyclecheck, createhdb + base tools.
"""
import sys

from ..data import seqdb
from ..utils.log import logger
from . import params as P
from .app import Command, run_app
from .tools import BASE_COMMANDS, load_alignments
from .plass import _mergereads, _createhdb


def _nucl_defaults():
    """Nuclassembler.cpp:10-32 defaults."""
    space = P.ParamSpace(P.nuclassemble_flags())
    v = space.values
    v["kmer_size"] = P.MultiParam(22, 22)
    v["alphabet_size"] = P.MultiParam(5, 5)
    v["min_seq_id"] = P.MultiParam(0.99, 0.99)
    v["num_iterations"] = P.MultiParam(8, 8)
    v["kmers_per_sequence_scale"] = P.MultiParam(0.1, 0.1)
    v["max_seq_len"] = 200000
    v["rescore_mode"] = 3
    return space


def _guided_defaults():
    """GuidedNuclassembler.cpp:10-41 defaults."""
    space = P.ParamSpace(P.guided_flags())
    v = space.values
    v["kmer_size"] = P.MultiParam(14, 22)
    v["alphabet_size"] = P.MultiParam(13, 5)
    v["min_seq_id"] = P.MultiParam(0.97, 0.99)
    v["num_iterations"] = P.MultiParam(5, 5)
    v["kmers_per_sequence_scale"] = P.MultiParam(0.1, 0.1)
    v["max_seq_len"] = 200000
    v["rescore_mode"] = 3
    return space


def _nuclassemble(positional, space):
    from ..workflow.nuclassemble import NuclAssembleParams, run_nuclassemble
    if len(positional) < 3:
        logger.error("usage: penguin nuclassemble <in...> <out.fasta> <tmpDir>")
        return 1
    p = NuclAssembleParams.from_space(space)
    run_nuclassemble(positional[:-2], positional[-2], positional[-1], p)
    return 0


def _guided(positional, space):
    from ..workflow.guided import (GuidedNuclAssembleParams,
                                   run_guided_nuclassemble)
    if len(positional) < 3:
        logger.error("usage: penguin guided_nuclassemble <in...> <out.fasta> <tmpDir>")
        return 1
    p = GuidedNuclAssembleParams.from_space(space)
    run_guided_nuclassemble(positional[:-2], positional[-2], positional[-1], p)
    return 0


def _nuclassembleresults(positional, space):
    from ..assembler.nucl_extend import nucl_assemble
    if len(positional) != 3:
        raise ValueError("usage: nuclassembleresults <seqDB> <alnDB> <outDB>")
    db = seqdb.SeqDB.open(positional[0])
    alns = load_alignments(positional[1])
    out, _ = nucl_assemble(db, alns,
                           seq_id_thr=space.values["min_seq_id"].nucleotides,
                           max_seq_len=space.values["max_seq_len"],
                           keep_target=space.values["keep_target"])
    out.save(positional[2])
    return 0


def _linclust(positional, space):
    from ..assembler.cluster import merged_clusters_to_db
    from ..workflow.linclust import LinclustParams, run_linclust_nucl
    if len(positional) != 3:
        raise ValueError("usage: linclust <i:seqDB> <o:cluDB> <tmpDir>")
    db = seqdb.SeqDB.open(positional[0])
    v = space.values
    p = LinclustParams(
        kmer_size=v["kmer_size"].nucleotides,
        kmers_per_sequence=v["kmers_per_sequence"],
        kmers_per_sequence_scale=v["kmers_per_sequence_scale"].nucleotides,
        hash_shift=v["hash_shift"],
        seq_id_thr=v["min_seq_id"].nucleotides, cov_thr=v["cov_thr"],
        cov_mode=v["cov_mode"], max_seq_len=v["max_seq_len"])
    merged_clusters_to_db(run_linclust_nucl(db, p)).save(positional[1])
    return 0


def _guidedassembleresults(positional, space):
    from ..assembler.guided_extend import guided_assemble
    from .tools import load_alignments_with_backtrace
    if len(positional) != 5:
        raise ValueError("usage: guidedassembleresults <i:nuclDB> <i:aaDB> "
                         "<i:alnDB> <o:nuclDB> <o:aaDB>")
    nucl_db = seqdb.SeqDB.open(positional[0])
    aa_db = seqdb.SeqDB.open(positional[1])
    alns = load_alignments_with_backtrace(positional[2])
    nucl_out, aa_out, _ = guided_assemble(
        nucl_db, aa_db, alns,
        seq_id_thr=space.values["min_seq_id"].nucleotides,
        max_seq_len=space.values["max_seq_len"],
        keep_target=space.values["keep_target"])
    nucl_out.save(positional[3])
    aa_out.save(positional[4])
    return 0


def _cyclecheck(positional, space):
    from ..assembler.cyclecheck import cycle_check_db
    if len(positional) != 2:
        raise ValueError("usage: cyclecheck <seqDB> <outDB>")
    db = seqdb.SeqDB.open(positional[0])
    cyc, info = cycle_check_db(db, chop_cycle=space.values["chop_cycle"],
                               max_seq_len=space.values["max_seq_len"])
    cyc.save(positional[1])
    return 0


def commands():
    return [
        Command("guided_nuclassemble", _guided, _guided_defaults,
                "<i:fast[a|q]File[.gz]> ... <o:fastaFile> <tmpDir>",
                "Protein-guided nucleotide assembly"),
        Command("nuclassemble", _nuclassemble, _nucl_defaults,
                "<i:fast[a|q]File[.gz]> ... <o:fastaFile> <tmpDir>",
                "Iterative greedy nucleotide assembly"),
        Command("nuclassembleresults", _nuclassembleresults, _nucl_defaults,
                "<i:seqDB> <i:alnDB> <o:seqDB>", "Extend nucleotide sequences", hidden=True),
        Command("cyclecheck", _cyclecheck, _nucl_defaults,
                "<i:seqDB> <o:seqDB>", "Detect circular contigs", hidden=True),
        Command("linclust", _linclust, _guided_defaults,
                "<i:seqDB> <o:cluDB> <tmpDir>", "Linear-time clustering", hidden=True),
        Command("guidedassembleresults", _guidedassembleresults, _guided_defaults,
                "<i:nuclDB> <i:aaDB> <i:alnDB> <o:nuclDB> <o:aaDB>",
                "Protein-guided nucleotide extension", hidden=True),
        Command("mergereads", _mergereads, _nucl_defaults,
                "<i:fastq> <i:fastq> <o:seqDB>", "Merge paired-end reads", hidden=True),
        Command("createhdb", _createhdb, _nucl_defaults,
                "<i:seqDB> [<i:cycleDB>] <o:hdb>", "Generate header DB", hidden=True),
    ] + BASE_COMMANDS


def main():
    sys.exit(run_app("penguin", commands()))


if __name__ == "__main__":
    main()
