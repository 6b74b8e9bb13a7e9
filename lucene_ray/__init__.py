"""lucene_ray — a Ray-Data-native inverted-index build + BM25 search engine.

Reproduces the core semantics of Apache Lucene (reference snapshot at
/root/reference): StandardAnalyzer tokenization, SmallFloat norms,
delta+FOR/PFoR-compressed block postings with per-block impacts, and
float32 BM25 top-k search with block-max pruning — re-expressed as
ray.data.Dataset pipelines (map_batches over zero-copy Arrow batches,
salted groupby shuffles, actor-pool merge/search stages).
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large numpy buffers on the reusable heap instead of fresh mmaps.

    This sandbox's kernel makes first-touch page faults very expensive
    (~30 MB/s); glibc's default 128 KiB mmap threshold means every large
    numpy temporary re-faults its pages, dominating vectorized stage time
    (measured 4.5x slowdown). mallopt runs at import so every Ray worker
    that imports lucene_ray gets the fix regardless of spawn environment.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        M_TRIM_THRESHOLD = -1
        libc.mallopt(M_MMAP_THRESHOLD, 512 * 1024 * 1024)
        libc.mallopt(M_TRIM_THRESHOLD, 512 * 1024 * 1024)
    except Exception:
        pass
    try:
        # pyarrow's default (jemalloc/mimalloc) pool mmaps its own arenas,
        # bypassing the glibc tuning above — route it through malloc too.
        import pyarrow as _pa

        _pa.set_memory_pool(_pa.system_memory_pool())
    except Exception:
        pass


_tune_malloc()
