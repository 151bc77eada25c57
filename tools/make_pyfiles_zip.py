"""Package the engine for `spark-submit --py-files` (north-star deploy path):

  python tools/make_pyfiles_zip.py [out.zip]
  spark-submit --master <cluster> --py-files engine.zip tools/scaling_job.py ...

Zips distributed_search_engine_spark/ (source only) so executors can import
the package without a shared filesystem.
"""

from __future__ import annotations

import os
import sys
import zipfile


def make_zip(out: str = "engine.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "distributed_search_engine_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "engine.zip"
    print(make_zip(out))
