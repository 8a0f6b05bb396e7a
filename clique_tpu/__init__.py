"""clique_tpu — a TPU-native amplicon / lineage-barcode analysis engine.

A from-scratch re-design of the capabilities of mckennalab/clique
(reference: /root/reference) built TPU-first on jax / XLA / Pallas:

- batched affine-gap DP alignment of reads against YAML-templated amplicon
  references runs as anti-diagonal wavefront kernels on the MXU/VPU
  (``clique_tpu.align``),
- UMI / static-barcode collapsing is massively-parallel edit-distance
  clustering + consensus in JAX (``clique_tpu.collapse``,
  ``clique_tpu.consensus``),
- the event caller emits GESTALT-style lineage alleles
  (``clique_tpu.caller``),
- multi-chip scaling via ``jax.sharding.Mesh`` data-parallel read batches
  (``clique_tpu.parallel``).

Host-side orchestration (config parsing, FASTQ/SAM/BAM IO, reference
management) lives in pure Python / C++ and stays off the device.
"""

__version__ = "0.1.0"
