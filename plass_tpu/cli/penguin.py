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
    from ..workflow.guided import GuidedParams, run_guided_nuclassemble
    if len(positional) < 3:
        logger.error("usage: penguin guided_nuclassemble <in...> <out.fasta> <tmpDir>")
        return 1
    p = GuidedParams.from_space(space)
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
        Command("mergereads", _mergereads, _nucl_defaults,
                "<i:fastq> <i:fastq> <o:seqDB>", "Merge paired-end reads", hidden=True),
        Command("createhdb", _createhdb, _nucl_defaults,
                "<i:seqDB> [<i:cycleDB>] <o:hdb>", "Generate header DB", hidden=True),
    ] + BASE_COMMANDS


def main():
    sys.exit(run_app("penguin", commands()))


if __name__ == "__main__":
    main()
