"""Allocator tuning for numpy-heavy kernels.

glibc serves large (>=128 KiB) allocations via mmap and returns them to
the OS on free, so every large numpy temporary re-faults its pages.  On
hosts where page faults are slow (common under sandboxed/virtualized
kernels), that dominates kernel runtime by 10-100x.  Raising the mmap
threshold keeps big buffers on the heap, which stays mapped and is
reused across temporaries — the fault cost is paid once per worker
process instead of once per array.

Imported for its side effect by ``vcf2parquet_spark.kernels`` so Spark
Python workers (separate processes) get tuned when they import the
kernels for a vectorized UDF.  No-op on non-glibc platforms.
"""

from __future__ import annotations

import ctypes

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_TUNED = False


def tune_malloc() -> bool:
    """Idempotent; returns True if mallopt succeeded."""
    global _TUNED
    if _TUNED:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30))
        ok = bool(libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)) and ok
        _TUNED = ok
        return ok
    except OSError:
        return False


tune_malloc()


def tune_arrow_pool() -> bool:
    """Route Arrow allocations through glibc malloc (tuned above to
    retain big buffers): pyarrow's bundled jemalloc purges dirty pages
    aggressively, so every parquet-read / IPC buffer re-faults its
    pages — which this host rate-limits globally.  With the system pool
    + raised mmap threshold, a worker pays the fault cost once and
    reuses the arena across work units."""
    try:
        import pyarrow as pa
        pa.set_memory_pool(pa.system_memory_pool())
        return True
    except Exception:
        return False


tune_arrow_pool()
