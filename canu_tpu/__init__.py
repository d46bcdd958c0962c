"""canu_tpu — a TPU-native long-read genome assembly framework.

A from-scratch re-design of the capabilities of Canu v1.6 (hierarchical
correct -> trim -> assemble long-read assembly; reference mounted at
/root/reference) for JAX/XLA/Pallas on TPU:

  * k-mer counting (meryl equivalent)        -> canu_tpu.ops.kmer
  * MinHash sketch overlap (MHAP equivalent) -> canu_tpu.ops.minhash
  * seed-and-extend overlap verification
    (overlapInCore equivalent)               -> canu_tpu.ops.align
  * falcon-sense read correction             -> canu_tpu.stages.correction
  * overlap-based trimming                   -> canu_tpu.stages.trimming
  * best-overlap-graph contigging (bogart)   -> canu_tpu.graph
  * consensus (utgcns equivalent)            -> canu_tpu.stages.consensus

Data layer (canu_tpu.stores) replaces gkStore/ovStore/tgStore with
numpy-backed, jnp-loadable columnar stores.  Pipeline orchestration
(canu_tpu.pipeline) replaces the Perl executive with a resumable stage
state machine.  All hot loops run on device; graph walking and
orchestration stay on host.

This is NOT a port: no code is copied from the reference; citations in
docstrings are to reference behavior being matched, e.g.
/root/reference/src/pipelines/canu.pl:653-764 for phase sequencing.
"""

__version__ = "0.1.0"
