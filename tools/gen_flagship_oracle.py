"""(Re)generate the committed FULL-ROW flagship oracle table: a JSON array
of q_pipeline_flagship's projected rows at the driver's correctness sf
(0.01). oracles_sql.sql_pipeline_flagship() reads this file with DuckDB
read_json so the driver's rows+schema+hash gate covers the flagship too
(expected-output oracle — the same probe-driven technique pii_scrub uses;
the url-keyed hash goldens in tests/golden/flagship_sf*.json remain the
pytest change detector). Regenerate ONLY for deliberate semantic changes:

  python tools/gen_flagship_oracle.py /root/testdata/sf0.01 \
      tests/golden/flagship_oracle_sf001.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str, out_path: str):
    from scrubah_pii_spark.entry_queries import q_pipeline_flagship
    from scrubah_pii_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    df = q_pipeline_flagship(spark, sf_dir)
    print("schema:", df.schema.simpleString())
    rows = [r.asDict() for r in df.collect()]
    rows.sort(key=lambda d: d["url"])
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=0, sort_keys=True)
    print(f"wrote {out_path}: {len(rows)} rows")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
