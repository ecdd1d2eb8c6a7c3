"""(Re)generate the committed flagship goldens: url-keyed sha256 row hashes
of q_pipeline_flagship at a given sf dir. Run ONLY for deliberate semantic
changes (tests/test_flagship_golden.py is the change detector).

  python tools/gen_flagship_golden.py /root/testdata/sf0.01 tests/golden/flagship_sf001.json
  python tools/gen_flagship_golden.py /root/testdata/sf0.1  tests/golden/flagship_sf01.json
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str, out_path: str):
    from scrubah_pii_spark.entry_queries import q_pipeline_flagship
    from scrubah_pii_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    rows = q_pipeline_flagship(spark, sf_dir).collect()
    golden = {"n_rows": len(rows), "sf_dir": sf_dir, "rows": {}}
    for r in rows:
        d = r.asDict()
        url = d.pop("url")
        payload = "|".join(f"{k}={d[k]!r}" for k in sorted(d))
        golden["rows"][url] = hashlib.sha256(payload.encode()).hexdigest()
    with open(out_path, "w") as f:
        json.dump(golden, f, indent=0, sort_keys=True)
    print(f"wrote {out_path}: {len(rows)} rows")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
