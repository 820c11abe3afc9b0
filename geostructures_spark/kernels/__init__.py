"""Pure-NumPy compute kernels (no Spark imports) — the exact-math layer
invoked from pandas/Arrow UDFs by the operators package."""

import ctypes as _ctypes


def _raise_malloc_mmap_threshold() -> None:
    """Serve multi-MB NumPy temporaries from the reused heap arena.

    glibc mmaps allocations above ~128 KB and munmaps them on free, so every
    vectorized kernel batch re-faults its temporaries from the kernel — on
    hosts where fresh pages fault slowly (this sandbox: ~6 MB/s) that wall
    time dwarfs the compute. Raising M_MMAP_THRESHOLD keeps the buffers in
    the sbrk arena, which is reused across batches (measured ~15x on repeat
    cover-kernel calls). No-op where glibc/mallopt is unavailable."""
    try:
        libc = _ctypes.CDLL(None)
        libc.mallopt(-3, 256 * 1024 * 1024)  # M_MMAP_THRESHOLD
    except (OSError, AttributeError):
        pass


_raise_malloc_mmap_threshold()
