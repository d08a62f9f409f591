"""Subprocess worker for the multi-process sharded-matcher parity test
(tests/test_sharding.py::test_multiprocess_matches_single_process).

Launched once per simulated host with PLASS_COORDINATOR /
PLASS_NUM_PROCESSES / PLASS_PROCESS_ID set; every process builds the same
synthetic DB (shared-input contract), runs the mesh matcher over the
global device mesh, and process 0 writes the hit dict to argv[1]."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plass_tpu.parallel import distributed  # noqa: E402

multi = distributed.maybe_initialize()
assert multi, "worker must run under a multi-process coordinator"

import jax  # noqa: E402

import __graft_entry__ as g  # noqa: E402
from plass_tpu.ops.backend import kmermatcher_sharded  # noqa: E402

db = g.synthetic_protein_db(n=1024, seed=5, skew_frac=0.2)
hits = kmermatcher_sharded(db, 14, kmers_per_sequence=8,
                           n_devices=len(jax.devices()))
if jax.process_index() == 0:
    with open(sys.argv[1], "w") as f:
        json.dump({str(k): sorted(v) for k, v in hits.items()}, f)
print(f"worker {jax.process_index()} done", flush=True)
