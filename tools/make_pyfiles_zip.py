"""Package the engine for `spark-submit --py-files` (north_rule launch mode).

Produces a zip of the biomedical_knowledge_graph_spark package that
executors unpack onto their PYTHONPATH — the standard way to ship a pure
Python Spark application to a multi-executor cluster without an install
step.

Usage: python tools/make_pyfiles_zip.py [out.zip]
Then:  spark-submit --master <cluster> --py-files bkg.zip \
           biomedical_knowledge_graph_spark/jobs/full_build_job.py \
           --obo go.obo --pages s3://corpus/pages --out s3://kg/out
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_path: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "biomedical_knowledge_graph_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, repo))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "bkg.zip"
    print(build(out))
