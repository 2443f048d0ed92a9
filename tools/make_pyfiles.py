#!/usr/bin/env python
"""Package the engine for ``spark-submit --py-files``.

Produces ``dist/cwds_jobs_spark.zip`` containing the package tree —
the cluster deployment artifact named by the north rule
("run via spark-submit --py-files on a multi-executor cluster").
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "cwds_jobs_spark.zip")
    pkg = os.path.join(ROOT, "cwds_jobs_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
