"""Per-round benchmark: run the query catalog at $SPARK_GRAFT_SF_DIR
(default sf0.1) and print ONE JSON line with per-query seconds.

Protocol: each query is executed twice — one untimed warmup pass (JVM
JIT + codegen cache; first-run codegen costs 5-10× the steady state and
would swamp a 600k-row measurement) and one timed pass. Execution is
forced through the `noop` sink so the full plan runs (all columns
materialized) without driver-side collect overhead. The headline value
is the sum of timed seconds across queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sif_spark.session import get_session
from sif_spark.queries import QUERIES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_session("bench")

    def run(name: str) -> None:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in QUERIES:
        try:
            run(name)  # warmup: codegen + JIT, untimed
            t0 = time.time()
            run(name)
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # a failing query records -1, not a crash
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "query_catalog_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
