import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from scrubah_pii_spark.session import build_session

    s = build_session(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def synth_rows():
    from scrubah_pii_spark.sources.synth import generate_rows

    return generate_rows(200)


@pytest.fixture(scope="session")
def webpages(spark, synth_rows):
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), True),
            StructField("text", StringType(), True),
            StructField("lang", StringType(), True),
            StructField("doc_class", StringType(), True),
        ]
    )
    return spark.createDataFrame(
        [
            (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"], r["doc_class"])
            for r in synth_rows
        ],
        schema,
    ).cache()
