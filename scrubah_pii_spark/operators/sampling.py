"""Corpus-shaping operators a web-scale training-data pipeline needs and the
reference app (a per-user browser tool) never had to: per-host document caps
and cross-document duplicate-span removal. Both are first-class
quality-filter stages in public CC pipelines (CCNet, C4, RefinedWeb,
Gopher/MassiveText rules) and both are built to survive the two classic
100 TB failure modes: host skew and hot-n-gram fan-out.

host_cap_topn — keep the best N documents per host. A single
row_number() window over host is correct but funnels every document of a
mega-host (the exact skew the north rule calls out) through one task. The
production path is the standard two-phase top-N:
  phase 1: window over (host, salt) — salt = pmod(xxhash64(id), B) — keeps
           at most N rows per salt bucket, bounding any task at
           corpus/B-ish rows regardless of skew;
  phase 2: window over host on the <= N*B survivors per host.
Any global top-N row survives its salt bucket's local top-N (same total
order), so phase-2 output equals the single-window plan — the DuckDB oracle
IS the single-window form, re-proving the rewrite every round.

dup_span_strip — remove word n-gram spans that occur in >= min_df distinct
documents (the n-gram-granular form of exact-substring dedup, Lee et al.
2022 "Deduplicating Training Data Makes Language Models Better"). Shape:
explode n-gram starts -> doc-frequency per gram (map-side-combinable
distinct count) -> join back the frequent grams only -> per-doc covered-word
mask evaluated with array expressions (no second explode). The gram join
shuffles on the gram string; the frequent-gram side is tiny by construction
(df >= min_df collapses it) so AQE broadcasts it at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def host_cap_topn(
    df: DataFrame,
    host_col: str,
    order_cols: list,
    n: int,
    salt_buckets: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Skew-safe top-N per host. order_cols: list of Column expressions
    defining a TOTAL order (callers must include a unique tiebreaker so
    phase-2 ranks are deterministic). Adds a `rank` column (1..N within
    host in that order)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(host_col, "_salt").orderBy(*order_cols)
    local = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= n)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(host_col).orderBy(*order_cols)
    return (
        local.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= n)
    )


def dup_span_strip(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_df: int = 5,
) -> DataFrame:
    """Strip every word covered by an n-gram that appears in >= min_df
    distinct documents. Returns id_col plus cleaned_text / n_words_kept /
    n_words_dropped. Word = split on single space (corpus contract)."""
    words = df.select(
        id_col, F.split(F.col(text_col), " ").alias("ws")
    )
    n_grams = F.greatest(F.size("ws") - (n - 1), F.lit(0))
    # sequence(0, -1) would produce a DESCENDING [0, -1] for docs shorter
    # than n words — guard with when() so short docs yield zero grams.
    start_idx = F.when(
        n_grams > 0, F.sequence(F.lit(0), n_grams - 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = words.select(
        id_col,
        F.posexplode(
            F.transform(
                start_idx,
                lambda i: F.array_join(F.slice("ws", i + 1, n), " "),
            )
        ).alias("i", "gram"),
    )
    frequent = (
        grams.groupBy("gram")
        .agg(F.count_distinct(id_col).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("gram")
    )
    starts = (
        grams.join(frequent, "gram")
        .groupBy(id_col)
        .agg(F.collect_set("i").alias("starts"))
    )
    joined = words.join(starts, id_col, "left").withColumn(
        "starts", F.coalesce("starts", F.array().cast("array<int>"))
    )
    covered = lambda p: F.exists(  # noqa: E731
        "starts", lambda i: (i <= p) & (p <= i + (n - 1))
    )
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - 1),
            lambda p: F.struct(p.alias("p"), covered(p).alias("c")),
        ),
        lambda s: ~s["c"],
    )
    out = joined.select(
        id_col,
        F.array_join(
            F.transform(kept, lambda s: F.element_at("ws", s["p"] + 1)),
            " ",
        ).alias("cleaned_text"),
        F.size(kept).alias("n_words_kept"),
        (F.size("ws") - F.size(kept)).alias("n_words_dropped"),
    )
    return out
