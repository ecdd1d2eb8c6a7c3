"""Package scrubah_pii_spark as a --py-files zip (the spark-submit shipping
unit per the north rule). Used by the local-cluster scaling runs and usable
verbatim for a real cluster: spark-submit --py-files scrubah_pii_spark.zip."""

from __future__ import annotations

import os
import zipfile


def build_zip(out_path: str = "/tmp/scrubah_pii_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "scrubah_pii_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, root)
                z.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build_zip())
