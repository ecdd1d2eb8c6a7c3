"""Scrub + fingerprint + perplexity pandas UDFs.

The regex cascade is inherently sequential string rewriting per document —
the one part of the engine that cannot be a native expression. It runs as an
Arrow-batched Series->Series pandas UDF; all regexes are compiled once per
executor at module import (core.scrub module scope), never per row/batch
(north rule: no per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    DoubleType,
)

from ..core import hashing, perplexity, scrub
from ..core.extract import extract_text

SCRUB_RESULT_TYPE = StructType(
    [
        StructField("scrubbed_text", StringType()),
        StructField("replacements", MapType(StringType(), StringType())),
        StructField("pii_count", IntegerType()),
    ]
)


@F.pandas_udf(SCRUB_RESULT_TYPE)
def scrub_udf(texts: pd.Series) -> pd.DataFrame:
    outs = [scrub.scrub_text(t if t is not None else "") for t in texts]
    return pd.DataFrame(
        {
            "scrubbed_text": [o.text for o in outs],
            "replacements": [o.replacements for o in outs],
            "pii_count": [o.count for o in outs],
        }
    )


@F.pandas_udf(LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return pd.Series(
        [hashing.simhash_int(t if t is not None else "") for t in texts],
        dtype="int64",
    )


@F.pandas_udf(DoubleType())
def log_perplexity_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([perplexity.log_perplexity(t or "") for t in texts])


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return pd.Series([extract_text(h) for h in html])


@F.pandas_udf(StringType())
def fnv1a64_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([hashing.fnv1a64_hex(t or "") for t in texts])


def leak_check_expr(scrubbed: Column) -> Column:
    """mightContainPII (schemas/phi.ts:75-83) as a native rlike gate — runs
    before every sink; the pipeline asserts count == 0."""
    return (
        scrubbed.rlike(r"\b\d{3}[-.]?\d{3}[-.]?\d{4}\b")
        | scrubbed.rlike(r"\b\d{3}-\d{2}-\d{4}\b")
        | scrubbed.rlike(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b")
        | scrubbed.rlike(r"\b\d{5}(-\d{4})?\b")
    )
