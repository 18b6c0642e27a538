"""Build dist/dexspark.zip for cluster submission.

The engine deploys to a real multi-executor cluster as a plain
--py-files archive (no native deps, no build step):

    python tools/package.py
    spark-submit --py-files dist/dexspark.zip \\
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
        your_job.py

or equivalently ``python -m dexspark replay ...`` locally. The zip
contains only the ``dexspark`` package (tests/tools excluded).
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "dexspark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(ROOT, "dexspark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in sorted(os.walk(pkg)):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    p = build()
    with zipfile.ZipFile(p) as zf:
        n = len(zf.namelist())
    print(f"{p}: {n} files")
