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


def _raise_mmap_threshold() -> None:
    """Keep big numpy buffers in the malloc arena instead of per-allocation
    mmaps. glibc mmaps allocations over 128 KB and unmaps them on free, so
    every block-sized matrix the pipeline allocates refaults its pages —
    on this class of VM (lazily-backed memory) that costs ~30 MB/s and
    swings stage times 2-3x between runs. Raising M_MMAP_THRESHOLD lets
    freed buffers be reused with their pages still resident. Opt out with
    SPRING_TPU_MALLOC_ARENA=0 (the arena retains freed peaks until trim)."""
    if _os.environ.get("SPRING_TPU_MALLOC_ARENA", "1") == "0":
        return
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 29)
    except Exception:   # non-glibc platform — purely an optimization
        pass


_raise_mmap_threshold()
_enable_compile_cache()
