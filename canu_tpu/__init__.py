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

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache (measured: axon remote compiles are
    minutes per shape; cached reloads are sub-second).  Opt out with
    CANU_TPU_NO_COMPILE_CACHE=1; the directory is overridable with
    CANU_TPU_COMPILE_CACHE_DIR."""
    if _os.environ.get("CANU_TPU_NO_COMPILE_CACHE"):
        return
    # CPU-only runs skip the persistent cache: CPU compiles are fast, and
    # CPU AOT entries are march-specific (reloading one compiled elsewhere
    # warns/SIGILLs).  The cache exists for the minutes-per-shape remote
    # TPU compiles.
    plat = _os.environ.get("JAX_PLATFORMS", "").lower()
    if plat and "tpu" not in plat and "axon" not in plat:
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "CANU_TPU_COMPILE_CACHE_DIR",
            _os.path.expanduser("~/.cache/canu_tpu_xla"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()
