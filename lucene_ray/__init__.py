"""lucene_ray — a Ray-Data-native inverted-index build + BM25 search engine.

Reproduces the core semantics of Apache Lucene (reference snapshot at
/root/reference): StandardAnalyzer tokenization, SmallFloat norms,
delta+FOR/PFoR-compressed block postings with per-block impacts, and
float32 BM25 top-k search with block-max pruning — re-expressed as
ray.data.Dataset pipelines (map_batches over zero-copy Arrow batches,
salted groupby shuffles, actor-pool merge/search stages).
"""

__version__ = "0.1.0"
