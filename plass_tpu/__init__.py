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
import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
