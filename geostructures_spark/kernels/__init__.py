"""Pure-NumPy compute kernels (no Spark imports) — the exact-math layer
invoked from pandas/Arrow UDFs by the operators package."""

import ctypes as _ctypes
import os as _os

_malloc_tuned = False


def ensure_malloc_tuned() -> None:
    """Serve multi-MB NumPy temporaries from the reused heap arena.

    glibc mmaps allocations above ~128 KB and munmaps them on free, so every
    vectorized kernel batch re-faults its temporaries from the kernel — on
    hosts where fresh pages fault slowly (this sandbox: ~6 MB/s) that wall
    time dwarfs the compute. Raising M_MMAP_THRESHOLD keeps the buffers in
    the sbrk arena, which is reused across batches (measured ~15x on repeat
    cover-kernel calls). No-op where glibc/mallopt is unavailable.

    Called lazily from the hot batch kernels (NOT at import time), so
    merely importing this library never mutates process-global allocator
    state; only processes actually running the kernels — driver harnesses
    and executor Python workers — are tuned, exactly where the NumPy
    temporaries live. Opt out with GEOSTRUCTURES_SPARK_MALLOC_TUNE=0.
    """
    global _malloc_tuned
    if _malloc_tuned:
        return
    _malloc_tuned = True
    if _os.environ.get('GEOSTRUCTURES_SPARK_MALLOC_TUNE', '1') == '0':
        return
    try:
        libc = _ctypes.CDLL(None)
        libc.mallopt(-3, 256 * 1024 * 1024)  # M_MMAP_THRESHOLD
    except (OSError, AttributeError):
        pass
