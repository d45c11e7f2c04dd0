"""Scale probe for span_dedup (q130) — measured evidence behind the
operator docstring's "linear in corpus tokens" claim.

Corpus construction mirrors tools/dedup_scale_probe.py: sf0.1
documents replicated R times with a per-replica token salt (replicas
are DISTINCT docs — zero shared grams across replicas), so entity
count scales 1×/10×/20× while the duplicated-span RATE stays fixed:
a shared 10-token boilerplate preamble is prepended to the 30% of
docs with doc_id % 10 < 3 (the preamble tokens are NOT salted — they
are the cross-document duplicated spans the operator must excise).
Output (removed tokens) is therefore input-proportional and the
honest scaling story is the wall-clock slope t(20×)/t(10×) ≈ 2.0.

A separate hot-key leg runs the 20× corpus with the preamble on 100%
of docs — the worst case for the doc-frequency aggregation (one gram
hash present in every document). The shuffle key there is
(gram_hash, doc_id) with map-side partials, uniform in doc_id, so the
hot gram must NOT produce a skewed tail; the leg records the ratio
vs the 30% run (expected ~flat: same token count, more dup flags).

Usage: python tools/span_dedup_probe.py [factors...]   (default 1 10 20)
Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from sif_spark.operators.dedup import span_dedup
from sif_spark.session import get_session
from sif_spark.sources.parquet import read_table

BASE = "/root/testdata/sf0.1"
SHIFT = 10_000_000
PRE = "terms of service apply to all users of this site"  # 10 tokens


def build_corpus(spark, factor: int, boiler_pct: int = 30) -> DataFrame:
    base = read_table(spark, BASE, "documents").select("doc_id", "text")
    parts = []
    for r in range(factor):
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit(f"_r{r}")),
            ),
            " ",
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(r * SHIFT)).alias("doc_id"),
                salted.alias("text"),
            )
        )
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    framed = F.when(
        F.col("doc_id") % 10 < boiler_pct // 10,
        F.concat(F.lit(PRE + " "), F.col("text")),
    ).otherwise(F.col("text"))
    return corpus.select("doc_id", framed.alias("text"))


def timed(fn, n: int = 2):
    agg = fn()  # warmup also yields the output aggregate
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2), agg


def run(spark, corpus: DataFrame):
    def one():
        out = span_dedup(corpus, k=4, min_dup_docs=2)
        row = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("toks"),
            F.sum(F.col("n_tokens") - F.col("n_kept")).alias("removed"),
        ).collect()[0]
        return {
            "docs": int(row["docs"]),
            "tokens": int(row["toks"]),
            "removed": int(row["removed"]),
        }

    return timed(one)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 20]
    spark = get_session("span_dedup_probe")
    out: dict = {"factors": {}}
    for f in factors:
        secs, agg = run(spark, build_corpus(spark, f))
        out["factors"][f] = {"sec": secs, **agg}
    if len(factors) >= 2:
        a, b = factors[-2], factors[-1]
        out["slope"] = round(
            out["factors"][b]["sec"] / max(out["factors"][a]["sec"], 1e-9), 2
        )
    # hot-key leg: every doc shares the preamble at the largest factor
    hot_f = factors[-1]
    secs, agg = run(spark, build_corpus(spark, hot_f, boiler_pct=100))
    out["hot_key_100pct"] = {"sec": secs, **agg}
    out["hot_vs_30pct"] = round(
        secs / max(out["factors"][hot_f]["sec"], 1e-9), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
