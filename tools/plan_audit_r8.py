"""Round-8 plan audit: count Python-eval nodes and Exchanges per query and
flag duplicated UDF evaluation (guide §4.4) — the lab_trend_summary pattern
where a pushed-down filter re-evaluates the UDF below the _spread exchange."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrubah_pii_spark.entry_queries import QUERIES
from scrubah_pii_spark.session import build_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = sys.argv[2:] or None

spark = build_session(app_name="plan_audit", master="local[4]",
                      shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

for name, fn in QUERIES.items():
    if ONLY and name not in ONLY:
        continue
    try:
        df = fn(spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: ERROR {e}")
        continue
    n_arrow = txt.count("ArrowEvalPython")
    n_batch = txt.count("BatchEvalPython")
    n_exch = len(re.findall(r"\(\d+\) Exchange", txt))
    n_gmap = txt.count("FlatMapGroupsInPandas")
    n_mip = txt.count("MapInPandas")
    # each ArrowEvalPython argument names the udf: catch same-udf duplicates
    udfs = re.findall(r"Arguments: \[(\w+)\(", txt)
    dup = sorted({u for u in udfs if udfs.count(u) > 1})
    flag = f"  DUPLICATED: {dup}" if dup else ""
    print(f"{name}: arrow={n_arrow} batch={n_batch} exch={n_exch} "
          f"gmap={n_gmap} mip={n_mip}{flag}")

spark.stop()
