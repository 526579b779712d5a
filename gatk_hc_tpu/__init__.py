"""gatk_hc_tpu — a TPU-native GATK HaplotypeCaller engine.

A from-scratch reimplementation of the capabilities of
avis9ditiu/gatk-haplotypecaller-cpp17 designed TPU-first:

* host runtime (C++ via ctypes): SAM/FASTA parsing, read filters/clipping,
  read-threading De Bruijn assembly, Smith-Waterman with backtrack;
* device engine (JAX/Pallas): the PairHMM forward algorithm as a striped
  anti-diagonal Pallas kernel batched over (read, haplotype) pairs, plus
  likelihood normalization;
* orchestration (Python): region scheduling, batching, multi-chip/multi-host
  sharding via jax.sharding Mesh, VCF emission.
"""

__version__ = "0.1.0"

from .config import DEFAULT_CONFIG, HCConfig  # noqa: F401
