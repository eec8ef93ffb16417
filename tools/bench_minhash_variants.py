"""A/B bench: MinHash signature impls (jvm MIN-aggregates vs arrow numpy).

Measures wall time AND total shuffle write bytes for the full
minhash_dedup_pairs query per impl, each in its OWN SparkSession (clean
shuffle attribution via the app's REST status API).

Usage: python tools/bench_minhash_variants.py [sf_dir] [reps]
Prints one JSON line per impl.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from biomedical_knowledge_graph_spark.operators.dedup import (  # noqa: E402
    minhash_dedup_pairs,
)
from biomedical_knowledge_graph_spark.session import new_session  # noqa: E402
from biomedical_knowledge_graph_spark.sources.testdata import load  # noqa: E402


def _shuffle_write_bytes(spark) -> int:
    app_id = spark.sparkContext.applicationId
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
    url = f"http://localhost:{port}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def run(impl: str, sf_dir: str, reps: int) -> dict:
    spark = new_session(
        app_name=f"minhash-{impl}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    docs = load(spark, sf_dir, "documents")
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = minhash_dedup_pairs(docs, threshold=0.8, signature_impl=impl)
        n = out.count()
        walls.append(round(time.time() - t0, 3))
    bytes_total = _shuffle_write_bytes(spark)
    res = {
        "impl": impl,
        "pairs": n,
        "wall_s_min": min(walls),
        "walls": walls,
        "shuffle_write_bytes_total": bytes_total,
        "shuffle_write_mb_per_rep": round(bytes_total / reps / 1e6, 2),
    }
    spark.stop()
    return res


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    for impl in ("oph", "jvm", "arrow"):
        print(json.dumps(run(impl, sf_dir, reps)))


if __name__ == "__main__":
    main()
