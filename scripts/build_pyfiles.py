"""Package the engine for spark-submit --py-files (north rule: ship via
spark-submit, no cluster-side pip).

Usage: python scripts/build_pyfiles.py [dist/pdftabextract_spark.zip]
Then:  spark-submit --py-files dist/pdftabextract_spark.zip job.py
"""

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path):
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "pdftabextract_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "pdftabextract_spark.zip")
    print(build(out))
