#!/usr/bin/env python
"""Package the engine for ``spark-submit --py-files``.

Produces ``dist/mysql2es_spark.zip`` containing the package tree, so
executors can import the vectorized UDF modules (pandas UDFs pickle by
reference to module paths — the zip must be on every executor's
PYTHONPATH, which --py-files arranges)."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "mysql2es_spark.zip")
    pkg = os.path.join(ROOT, "mysql2es_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
