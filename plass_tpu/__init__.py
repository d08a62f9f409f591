"""plass_tpu — a TPU-native protein/nucleotide greedy overlap assembler.

A from-scratch reimplementation of the capabilities of Plass and PenguiN
(soedinglab/plass) designed for JAX/XLA/Pallas on TPU:

 - the linclust-style k-mer matcher is a sorted k-mer table built with
   device top-k selection + segment ops (ops/kmermatch.py)
 - ungapped diagonal rescoring is a batched device kernel (ops/rescore.py)
 - greedy contig extension runs as a parallel host pass over device-scored
   candidates (assembler/extend.py)
 - workflows are a resumable step DAG instead of shell scripts (workflow/)
 - multi-host scaling uses jax.sharding meshes + collectives instead of MPI
   (parallel/)

64-bit integer support is required for k-mer packing and hashing.
"""
import os

import jax

jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the device pipeline's big sorts are costly to
# compile; shapes are bucketed (ops/backend.py) so cache hits dominate
_cache_dir = os.environ.get(
    "PLASS_TPU_JAX_CACHE", os.path.expanduser("~/.cache/plass_tpu_jax"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # older jax without these options
    pass

__version__ = "0.1.0"
