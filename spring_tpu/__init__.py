"""spring_tpu — TPU-native FASTQ/FASTA compression framework.

A from-scratch rebuild of the capabilities of SPRING
(github.com/shubhamchandak94/Spring) designed for TPU hardware: the
reorder/match search runs as batched JAX programs, entropy coding and byte
I/O run in native C++ (csrc/), and multi-chip scaling uses jax.sharding
meshes (parallel/).
"""
import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache — the reorder round program is large
    and recompiling it per process dominates small-input runs."""
    try:
        import jax
        cache = _os.environ.get(
            "SPRING_TPU_JAX_CACHE",
            _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"))
        if cache in ("", "0", "off"):      # explicit opt-out
            return
        jax.config.update("jax_compilation_cache_dir", _os.path.abspath(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # jax missing or too old — cache is an optimization only
        pass


_enable_compile_cache()
