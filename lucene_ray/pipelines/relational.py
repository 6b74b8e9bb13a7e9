"""Relational / aggregation operator coverage (SURVEY.md §2.5-§2.7).

Maps the reference's facet/grouping/join machinery to Ray Data:

- facet counts (``facet/.../StringValueFacetCounts.java``) →
  ``groupby().count()`` with per-batch pre-aggregation;
- grouping top-docs-per-group (``grouping/.../GroupingSearch.java:42``) →
  ``groupby(key).map_groups(topk)``;
- distinct values (``grouping/.../DistinctValuesCollector.java``) →
  ``ds.unique``;
- query-time semi-join (``join/.../JoinUtil.java:56``) → broadcast key set
  (``ray.put``) + vectorized filter inside ``map_batches`` (no shuffle);
- grouped stats (Q1-style) → per-batch partial aggregation then a tiny
  ``groupby().sum()`` — the partial/combiner pattern for 100 TB inputs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, cols=None):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=cols)


def agg_facet_counts(sf_dir: str):
    """Doc counts faceted by (lang, source) with per-batch pre-aggregation."""
    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "source", "n"])

    from ray.data.aggregate import Sum

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "source"])
            .aggregate(Sum("n", alias_name="n")))


def oracle_facet_counts_sql() -> str:
    return ("SELECT lang, source, count(*) AS n FROM documents "
            "GROUP BY lang, source")


def agg_facet_taxonomy(sf_dir: str):
    """Hierarchical (taxonomy) facet counts — the TaxonomyFacets role
    (facet/src/java/org/apache/lucene/facet/taxonomy/TaxonomyFacets.java:42):
    doc counts for every path PREFIX of the source/lang hierarchy, i.e.
    level-1 paths ("<source>") and level-2 drill-downs
    ("<source>/<lang>"). One per-batch Arrow partial computes both
    levels; a small combiner groupby merges. → (path, level, n)."""
    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        lvl2 = pc_.binary_join_element_wise(
            batch.column("source").cast(pa.string()),
            batch.column("lang").cast(pa.string()), "/")
        t1 = (pa.table({"path": batch.column("source").cast(pa.string())})
              .group_by("path").aggregate([([], "count_all")])
              .rename_columns(["path", "n"]))
        t1 = t1.append_column(
            "level", pa.array(np.ones(t1.num_rows, np.int64)))
        t2 = (pa.table({"path": lvl2})
              .group_by("path").aggregate([([], "count_all")])
              .rename_columns(["path", "n"]))
        t2 = t2.append_column(
            "level", pa.array(np.full(t2.num_rows, 2, np.int64)))
        return pa.concat_tables([t1, t2]).select(["path", "level", "n"])

    from ray.data.aggregate import Sum

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["path", "level"])
            .aggregate(Sum("n", alias_name="n")))


def oracle_facet_taxonomy_sql() -> str:
    return """SELECT source AS path, 1 AS level, count(*) AS n
FROM documents GROUP BY source
UNION ALL
SELECT source || '/' || lang AS path, 2 AS level, count(*) AS n
FROM documents GROUP BY source, lang"""


def agg_grouping_topk(sf_dir: str):
    """Top 3 docs per lang by (n_chars desc, doc_id asc).

    Two-pass FirstPassGroupingCollector shape
    (grouping/src/java/org/apache/lucene/search/grouping/
    FirstPassGroupingCollector.java:40): each batch emits its own top-3
    per lang, so the final groupby(lang) combiner only ever sees ≤3 rows
    per input block — a lang holding 80% of a 100-TB corpus never lands
    in one task (the skewed-group hazard of map_groups over raw rows)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_chars", "doc_id"],
                            ascending=[False, True])
        return df.groupby("lang", sort=False).head(3)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True]).head(3)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("lang").map_groups(combine, batch_format="pandas"))


def oracle_grouping_topk_sql() -> str:
    return """WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents
)
SELECT doc_id, lang, n_chars, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3"""


def agg_distinct(sf_dir: str):
    """Distinct event types (ds.unique → one row per value)."""
    ds = _read(sf_dir, "events", ["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


def oracle_distinct_sql() -> str:
    return "SELECT DISTINCT event_type FROM events"


def join_semi_broadcast(sf_dir: str):
    """Orders of BUILDING-segment customers: broadcast the (small) customer
    key set once, filter orders in map_batches — semi-join without a
    shuffle (JoinUtil semantics)."""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = (cust.map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"), "BUILDING"))
        .select(["c_custkey"]), batch_format="pyarrow"))
    key_arr = np.sort(np.concatenate(
        [b.column("c_custkey").to_numpy()
         for b in keys.iter_batches(batch_format="pyarrow")] or
        [np.empty(0, np.int64)]))
    kref = ray.put(key_arr)

    def flt(batch: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        if len(ks) == 0:                 # empty build side → empty result
            return batch.slice(0, 0)
        ck = batch.column("o_custkey").to_numpy()
        idx = np.minimum(np.searchsorted(ks, ck), len(ks) - 1)
        return batch.filter(pa.array(ks[idx] == ck))

    return (_read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderpriority"])
            .map_batches(flt, batch_format="pyarrow"))


def oracle_semi_join_sql() -> str:
    return """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')"""


def agg_lineitem_pricing(sf_dir: str):
    """Q1-style grouped stats with order-insensitive exact outputs
    (integer-cast sums, counts, min/max) and per-batch partials."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native partial aggregation (no pandas conversion): the
        # quantity column is rounded half-to-even then cast to int64 so
        # partial sums are exact integers matching the BIGINT-cast
        # oracle (DuckDB CAST(DOUBLE AS BIGINT) rounds half TO EVEN; a
        # bare pc.cast throws on non-integral doubles like 5.5).
        t = batch.set_column(
            batch.schema.get_field_index("l_quantity"), "l_quantity",
            pc.cast(pc.round(batch.column("l_quantity"),
                             round_mode="half_to_even"), pa.int64()))
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count"),
             ("l_extendedprice", "min"), ("l_extendedprice", "max")])
        return g.rename_columns(["l_returnflag", "l_linestatus", "sum_qty",
                                 "n", "min_price", "max_price"])

    from ray.data.aggregate import Max, Min, Sum

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                       Sum("n", alias_name="n"),
                       Min("min_price", alias_name="min_price"),
                       Max("max_price", alias_name="max_price")))


def oracle_lineitem_pricing_sql() -> str:
    # CAST the sum to BIGINT: DuckDB sum(BIGINT) widens to HUGEINT, which
    # value-hashes differently from the engine's int64.
    return """SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag, l_linestatus"""


QUANTILE_PS = [0.25, 0.5, 0.75, 0.9, 0.99]


def agg_quantity_quantiles(sf_dir: str) -> pa.Table:
    """EXACT distributed quantiles of a bounded-domain numeric column
    (l_quantity, domain 1..50): per-batch value-count partials, one tiny
    combiner groupby (<= |domain| rows cross the wire), then the
    rank-inversion on the driver over the <= 50-row histogram — the
    exact-quantile shape that still works on 100 TB because the exchange
    is O(|domain|), not O(rows). Convention matches DuckDB
    quantile_disc: the smallest value whose cumulative count reaches
    ceil(q * N)."""
    import math
    import os

    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        # Histogram over the RAW double values (the domain stays tiny:
        # quantities are k or k+0.5); the oracle's quantile_disc runs on
        # the raw column and only the RESULT is BIGINT-cast, so an
        # early int truncation here would shift ranks.
        v = batch.column("l_quantity").to_numpy()
        vals, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vals, pa.float64()),
                         "n": pa.array(cnt.astype(np.int64))})

    from lucene_ray.pipelines.util import ensure_cols

    hist = ensure_cols(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("n", alias_name="n"))
        .to_pandas(), ["v", "n"])
    empty = pa.table({"p": pa.array([], pa.float64()),
                      "value": pa.array([], pa.int64())})
    if len(hist) == 0:
        return empty
    hist = hist.sort_values("v")
    vals = hist["v"].to_numpy()
    cum = hist["n"].to_numpy().cumsum()
    total = int(cum[-1]) if len(cum) else 0
    if total == 0:
        return empty
    out_p, out_v = [], []
    for q in QUANTILE_PS:
        rank = math.ceil(q * total)
        i = int(np.searchsorted(cum, rank))
        out_p.append(q)
        # the oracle BIGINT-casts quantile_disc's result: half-to-even
        out_v.append(int(np.rint(vals[i])))
    return pa.table({"p": pa.array(out_p, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})


def oracle_quantity_quantiles_sql() -> str:
    rows = [f"SELECT {q} AS p, "
            f"CAST(quantile_disc(l_quantity, {q}) AS BIGINT) AS value "
            f"FROM lineitem" for q in QUANTILE_PS]
    return "\nUNION ALL\n".join(rows)


# ---------------------------------------------------------------------------
# Facet sets (facet/facetset/*): multi-dim tuple matching counts

# matcher list: ("exact",) binds to doc 0's own (len, chars) tuple at
# runtime; ("range", lo1, hi1, lo2, hi2) bounds are inclusive like
# DimRange (facetset/DimRange.java:28)
FACETSET_MATCHERS = [("exact",),
                     ("range", 30, 60, 100, 400),
                     ("range", 0, 1 << 30, 0, 250)]


def facetset_match_counts(sets_per_doc, matchers) -> np.ndarray:
    """Core MatchingFacetSetsCounts rule
    (facetset/MatchingFacetSetsCounts.java:60-92): a doc increments a
    matcher's count ONCE if ANY of its stored facet-set tuples matches;
    Exact = all dims equal (ExactFacetSetMatcher.java:34), Range = every
    dim inside its inclusive [min, max] (RangeFacetSetMatcher.java:60).
    ``sets_per_doc``: (n_tuples, ndims+1) int64 array whose col 0 is the
    doc index — the decoded BinaryDocValues rows. Returns per-matcher
    doc counts (+ the total distinct docs as the last element, the
    reference's totCount)."""
    arr = np.asarray(sets_per_doc, np.int64)
    out = np.zeros(len(matchers) + 1, np.int64)
    if arr.size == 0:
        return out
    owner = arr[:, 0]
    dims = arr[:, 1:]
    for i, mt in enumerate(matchers):
        if mt[0] == "exact":
            vals = np.asarray(mt[1], np.int64)
            hit = np.all(dims == vals, axis=1)
        else:
            bounds = np.asarray(mt[1:], np.int64).reshape(-1, 2)
            hit = np.all((dims >= bounds[:, 0]) & (dims <= bounds[:, 1]),
                         axis=1)
        out[i] = len(np.unique(owner[hit]))
    out[-1] = len(np.unique(owner))
    return out


def agg_facetset_counts(sf_dir: str) -> pa.Table:
    """MatchingFacetSetsCounts over the documents table, facet set per
    doc = the 2-dim tuple (token length, n_chars): map-only per-batch
    matcher counts + one tiny combine (counts are additive because each
    doc's set lives in one row — the reference likewise scans each doc's
    BinaryDocValues entry exactly once). The exact matcher binds to doc
    0's own tuple (a one-row predicate read). Multi-tuple any-match
    semantics are exercised by the pytest corpus."""
    import pyarrow.parquet as pq_
    import ray.data
    from ray.data.aggregate import Sum

    d0 = pq_.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text", "n_chars"],
                        filters=[("doc_id", "==", 0)])
    t0 = d0.column("text")[0].as_py()
    exact_dims = (len(t0.split(" ")), int(d0.column("n_chars")[0].as_py()))
    matchers = [(("exact", exact_dims) if m[0] == "exact" else m)
                for m in FACETSET_MATCHERS]

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        lens = pc.list_value_length(
            pc.split_pattern(batch.column("text"), " ")).to_numpy()
        chars = batch.column("n_chars").to_numpy()
        rows = np.column_stack([np.arange(len(lens)), lens, chars])
        c = facetset_match_counts(rows, matchers)
        return pa.table({"m": pa.array(range(len(c)), pa.int64()),
                         "n": pa.array(c, pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("m").aggregate(Sum("n", alias_name="n")))
    t = agg.to_pandas().sort_values("m")
    labels = [f"matcher_{i}" for i in range(len(matchers))] + ["$total$"]
    return pa.table({
        "matcher": pa.array([labels[int(i)] for i in t["m"]], pa.string()),
        "count": pa.array(t["sum(n)" if "sum(n)" in t else "n"]
                          .to_numpy().astype(np.int64), pa.int64())})


def oracle_facetset_counts_sql() -> str:
    l1, h1, c1, c2 = FACETSET_MATCHERS[1][1:]
    l3, h3, c3, c4 = FACETSET_MATCHERS[2][1:]
    return f"""WITH dims AS (
  SELECT doc_id, len(string_split(text, ' ')) AS l, n_chars AS c
  FROM documents
),
d0 AS (SELECT l, c FROM dims WHERE doc_id = 0)
SELECT 'matcher_0' AS matcher, count(*) AS count
  FROM dims WHERE (l, c) = (SELECT (l, c) FROM d0)
UNION ALL
SELECT 'matcher_1', count(*) FROM dims
  WHERE l BETWEEN {l1} AND {h1} AND c BETWEEN {c1} AND {c2}
UNION ALL
SELECT 'matcher_2', count(*) FROM dims
  WHERE l BETWEEN {l3} AND {h3} AND c BETWEEN {c3} AND {c4}
UNION ALL
SELECT '$total$', count(*) FROM dims"""


HISTOGRAM_WIDTH = 7
HISTOGRAM_MAX_BUCKETS = 1024


def agg_histogram(sf_dir: str) -> pa.Table:
    """Plain numeric histogram
    (sandbox/facet/plain/histograms/HistogramCollector.java:41):
    bucket = floorDiv(value, bucketWidth), count per bucket, erroring
    past maxBuckets (checkMaxBuckets, :223-229).

    Scale shape: the reference's PointTreeBulkCollector fast path
    counts whole tree nodes whose [min, max] falls inside one bucket;
    here each batch reduces to a bounded bincount partial over its own
    bucket range (one row per OCCUPIED bucket leaves the task — the
    same bounded-exchange contract), then a <= maxBuckets groupby."""
    import ray.data
    from ray.data.aggregate import Sum

    width = HISTOGRAM_WIDTH
    ds = _read(sf_dir, "lineitem", ["l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        v = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        v = v.astype(np.int64)
        b = np.floor_divide(v, width)           # Math.floorDiv
        lo = int(b.min())
        cnt = np.bincount(b - lo)
        occ = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(occ + lo, pa.int64()),
                         "n": pa.array(cnt[occ].astype(np.int64))})

    from lucene_ray.pipelines.util import ensure_cols

    agg = ensure_cols(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket").aggregate(Sum("n", alias_name="n"))
        .to_pandas(), ["bucket", "n"])
    if len(agg) > HISTOGRAM_MAX_BUCKETS:
        raise ValueError(
            f"Can't compute histogram with more than "
            f"{HISTOGRAM_MAX_BUCKETS} buckets")
    agg = agg.sort_values("bucket").reset_index(drop=True)
    return pa.table({
        "bucket": pa.array(agg["bucket"].astype("int64")),
        "n": pa.array(agg["n"].astype("int64"))})


def oracle_histogram_sql() -> str:
    w = HISTOGRAM_WIDTH
    return f"""SELECT CAST(floor(CAST(l_quantity AS DOUBLE) / {w})
         AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY bucket ORDER BY bucket"""
