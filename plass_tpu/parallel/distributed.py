"""Multi-process (multi-host) distribution glue — the TPU-native
replacement for the reference's MPI runtime (commons/MMseqsMPI.cpp:10-25).

The reference distributes work by running the same binary on every rank
with the filesystem as the data plane (kmermatcher hash-range splits
round-robined over ranks + rank-0 k-way merge, kmermatcher.cpp:632-658).
Here every process joins one jax.distributed job instead; the global
device mesh spans all processes' chips, the k-mer exchange rides ICI/DCN
collectives (parallel/mesh.py), and results are gathered with a device
all-gather rather than a rank-0 file merge.

Processes are launched exactly like MPI ranks (one command per host):

    PLASS_COORDINATOR=host0:port PLASS_NUM_PROCESSES=4 PLASS_PROCESS_ID=i \
        plass assemble ... --backend sharded

Every process must see the same input files (shared filesystem, as the
reference requires for its NFS tmp dir — README.md:69-73)."""
import os

_INITIALIZED = False


def maybe_initialize():
    """Env-driven jax.distributed.initialize; no-op when the coordinator
    env is unset (single-process) or when already initialized.

    Reads PLASS_COORDINATOR (host:port), PLASS_NUM_PROCESSES and
    PLASS_PROCESS_ID; JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID work as fallbacks. Returns True when running
    multi-process after the call."""
    global _INITIALIZED
    import jax

    if _INITIALIZED:
        return jax.process_count() > 1
    coord = (os.environ.get("PLASS_COORDINATOR")
             or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not coord:
        return False
    nprocs = int(os.environ.get("PLASS_NUM_PROCESSES")
                 or os.environ.get("JAX_NUM_PROCESSES") or 0) or None
    pid = os.environ.get("PLASS_PROCESS_ID")
    if pid is None:
        pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs,
        process_id=None if pid is None else int(pid))
    _INITIALIZED = True
    from ..utils.log import logger
    if jax.process_index() != 0:
        # non-master verbosity squelch (MMseqsMPI.cpp:17-21)
        import logging
        logger.setLevel(logging.ERROR)
    logger.info("jax.distributed: process %d/%d, %d global devices",
                jax.process_index(), jax.process_count(),
                len(jax.devices()))
    return jax.process_count() > 1


def is_multiprocess():
    import jax
    return jax.process_count() > 1


def host_to_global(mesh, arr, spec):
    """Build a global jax.Array for `arr` (host-replicated on every
    process, like the reference's NFS-shared mmap) sharded per `spec`
    over `mesh`. Each process materializes only its addressable shards."""
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def fetch_global(x):
    """Full host copy of a (possibly non-fully-addressable) global array,
    identical on every process — the collective replacement for the
    reference's rank-0 merge + broadcast-by-filesystem."""
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
