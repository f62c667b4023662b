"""Package the engine for `spark-submit --py-files` deployment.

    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files out.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str = "ocr_intern_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "ocr_intern_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "ocr_intern_spark.zip"))
