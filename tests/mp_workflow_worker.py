"""Subprocess worker for the CROSS-PROCESS end-to-end parity tests
(tests/test_sharding.py::test_multiprocess_nuclassemble_byte_identical
and ::test_multiprocess_assemble_byte_identical).

Each simulated host runs the FULL product workflow with the sharded
backend: host-side steps execute identically per process (the reference's
MPI model — only the heavy steps are collective, data/assemble.sh:92,103),
and the sharded kmermatcher's collectives span the global mesh.  Every
process writes its own output FASTA; the test asserts all of them are
byte-identical to the reference golden.  argv[4] selects the pipeline:
"nucl" (default) or "protein"."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plass_tpu.parallel import distributed  # noqa: E402

multi = distributed.maybe_initialize()
assert multi, "worker must run under a multi-process coordinator"

import jax  # noqa: E402

reads = [sys.argv[1], sys.argv[2]]
outdir = sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "nucl"
pid = jax.process_index()
if mode == "protein":
    from plass_tpu.workflow.assemble import AssembleParams, run_assemble

    out = os.path.join(outdir, f"assembly_p{pid}.fas")
    p = AssembleParams(num_iterations=2, filter_proteins=0,
                       backend="sharded")
    run_assemble(reads, out, os.path.join(outdir, f"tmp_p{pid}"), p)
else:
    from plass_tpu.workflow.nuclassemble import (NuclAssembleParams,
                                                 run_nuclassemble)

    out = os.path.join(outdir, f"contigs_p{pid}.fasta")
    p = NuclAssembleParams(num_iterations=2, min_contig_len=150,
                           backend="sharded")
    run_nuclassemble(reads, out, os.path.join(outdir, f"tmp_p{pid}"), p)
print(f"worker {pid} done", flush=True)
