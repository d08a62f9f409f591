"""Push-tier byte-parity gate on COMMITTED goldens.

Every other parity suite regenerates its goldens from a locally built
reference binary (util/gen_goldens.sh) and skips when none exists — so
a fresh checkout's push CI never exercised a byte-parity assertion.
This suite closes that hole: tests/fixtures/ carries a 256-read-pair
subset of the bundled example reads plus the reference binary's outputs
on them (generated once with --threads 1, reference @ /root/reference),
and asserts the full product pipelines reproduce them byte-for-byte
with no reference build anywhere on the machine.

Fixture provenance:
  mini_{1,2}.fastq.gz  = first 256 records of examples/reads_{1,2}.fastq.gz
  mini_golden_protein.fas = plass assemble mini_1 mini_2 out tmp
        --threads 1 --num-iterations 2 --filter-proteins 0
  mini_golden_nucl.fasta  = penguin nuclassemble mini_1 mini_2 out tmp
        --threads 1 --num-iterations 2 --min-contig-len 150
"""
import os

import pytest

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
READS = [os.path.join(FIX, "mini_1.fastq.gz"),
         os.path.join(FIX, "mini_2.fastq.gz")]


@pytest.mark.smoke
def test_fixture_protein_assemble_byte_identical(tmp_path):
    """plass assemble on the committed fixture == committed reference
    golden, byte for byte (src/workflow/Assembler.cpp defaults with
    --num-iterations 2 --filter-proteins 0)."""
    from plass_tpu.workflow.assemble import AssembleParams, run_assemble

    out = str(tmp_path / "assembly.fas")
    run_assemble(READS, out, str(tmp_path / "tmp"),
                 AssembleParams(num_iterations=2, filter_proteins=0))
    got = open(out, "rb").read()
    want = open(os.path.join(FIX, "mini_golden_protein.fas"), "rb").read()
    assert got == want


@pytest.mark.smoke
def test_fixture_nuclassemble_byte_identical(tmp_path):
    """penguin nuclassemble on the committed fixture == committed
    reference golden (src/workflow/Nuclassembler.cpp defaults with
    --num-iterations 2 --min-contig-len 150)."""
    from plass_tpu.workflow.nuclassemble import (NuclAssembleParams,
                                                 run_nuclassemble)

    out = str(tmp_path / "contigs.fasta")
    run_nuclassemble(READS, out, str(tmp_path / "tmp"),
                     NuclAssembleParams(num_iterations=2,
                                        min_contig_len=150))
    got = open(out, "rb").read()
    want = open(os.path.join(FIX, "mini_golden_nucl.fasta"), "rb").read()
    assert got == want
