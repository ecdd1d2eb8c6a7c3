"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the full webtext pipeline (extract -> langid ->
quality -> scrub -> relevance -> dedup -> leak-check) over sf0.001 documents
mapped into the input-hint shape.

queries()/oracle_sql() — one entry per implemented operator from SURVEY.md §2
plus the training-data ops (dedup family, ANN, text analysis, multimodal).
45 of 46 queries carry an exact DuckDB oracle (value arithmetic mirrored
down to IEEE addition order and JS int32/rounding semantics —
scrubah_pii_spark/oracles_sql.py); only pipeline_flagship (the composition
embedding the sequential scrub cascade) is rows-only by design, gated by the
JS-parity harness + committed sf0.01/sf0.1 goldens + fuzz suites + per-stage
oracles instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scrubah_pii_spark.entry_queries import QUERIES, oracle_map, q_pipeline_flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pipeline_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return oracle_map()
