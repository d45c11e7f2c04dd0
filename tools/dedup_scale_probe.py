"""Controlled-duplication scale probe for the dedup tier (VERDICT r5
"Next round" #3).

SCALE.md's main tables exclude near-dup operators because naive table
replication makes their OUTPUT quadratic by construction (a 10×-
replicated corpus is 90% near-duplicates). This probe builds corpora
whose duplicate rate is FIXED (5% of docs have exactly one planted
near-dup) while entity count scales 1×/10×/20×, so the measured slope
is the honest scaling story:

- corpus at factor R: every sf0.1 document replicated R times with a
  per-replica token salt (every token suffixed `_r{r}` → zero shingle
  overlap across replicas: replicas are DISTINCT docs, not dups);
- plus, for the 5% of scaled docs with doc_id % 20 == 0, one planted
  near-dup (last 3 words dropped, one fresh token appended → Jaccard
  ≈ 0.9 on ~54-word docs) at doc_id + 500M. The planted pair set is
  exactly known, so recall is measured, not assumed.

Probed: minhash_dedup_pairs, ngram_jaccard_pairs (stop-shingle guard
on), line_dedup, and near_dup_clusters over the minhash pair graph.
For each, the slope t(20×)/t(10×) should sit near 2.0 (linear in
entities, since output is now input-proportional). At 20× the
max_shingle_freq lever is also measured OFF vs ON — the quadratic
candidate blowup the guard prevents.

Usage: python tools/dedup_scale_probe.py [factors...]  (default 1 10 20)
Prints one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from sif_spark.operators.dedup import (
    line_dedup,
    minhash_dedup_pairs,
    near_dup_clusters,
    ngram_jaccard_pairs,
)
from sif_spark.session import get_session
from sif_spark.sources.parquet import read_table

BASE = "/root/testdata/sf0.1"
SHIFT = 10_000_000
DUP_SHIFT = 500_000_000
LINE_WORDS = 12


def build_corpus(spark, factor: int) -> DataFrame:
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
    # planted near-dups: 5% of scaled docs, each perturbed (drop last
    # 3 tokens, append a doc-unique token)
    w = F.split(F.col("text"), " ")
    perturbed = F.array_join(
        F.concat(
            F.slice(w, 1, F.greatest(F.size(w) - 3, F.lit(1))),
            F.array(F.concat(F.lit("uniq"), F.col("doc_id"))),
        ),
        " ",
    )
    dups = corpus.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + F.lit(DUP_SHIFT)).alias("doc_id"),
        perturbed.alias("text"),
    )
    return corpus.unionByName(dups)


def lined(df: DataFrame) -> DataFrame:
    """Wrap each doc at 12 words/line so line_dedup has line structure
    (the corpus has no newlines — same synthesis as catalog q89)."""
    w = F.split(F.col("text"), " ")
    nl = F.greatest(F.ceil(F.size(w) / F.lit(float(LINE_WORDS))), F.lit(1)).cast("int")
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), nl - 1),
            lambda i: F.array_join(F.slice(w, i * LINE_WORDS + 1, LINE_WORDS), " "),
        ),
        "\n",
    )
    return df.select("doc_id", body.alias("text"))


def timed(fn, n: int = 2) -> tuple[float, int]:
    rows = fn()  # warmup run also yields the output size
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2), rows


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 20]
    spark = get_session("dedup_scale_probe")
    out: dict = {"factors": {}}

    for fac in factors:
        corpus = build_corpus(spark, fac).localCheckpoint(eager=True)
        n_docs = corpus.count()
        planted = corpus.filter(F.col("doc_id") >= DUP_SHIFT).count()
        rec: dict = {"n_docs": n_docs, "planted_pairs": planted}

        mh_pairs = None

        def run_minhash():
            nonlocal mh_pairs
            mh_pairs = minhash_dedup_pairs(
                corpus, num_hashes=64, num_bands=16, threshold=0.7
            ).localCheckpoint(eager=True)
            return mh_pairs.count()

        rec["minhash_pairs_sec"], rec["minhash_pairs_rows"] = timed(run_minhash)
        # recall against the planted truth (pair (x, x+DUP_SHIFT))
        hits = (
            mh_pairs.withColumn(
                "lo", F.least("id_a", "id_b") % DUP_SHIFT
            )
            .withColumn("hi", F.greatest("id_a", "id_b"))
            .filter(F.col("hi") - F.col("lo") == DUP_SHIFT)
            .select("lo")
            .distinct()
            .count()
        )
        rec["minhash_recall"] = round(hits / planted, 4) if planted else None

        def run_jaccard(max_freq):
            return ngram_jaccard_pairs(
                corpus, k=3, threshold=0.5, max_shingle_freq=max_freq
            ).count()

        rec["jaccard_sec"], rec["jaccard_rows"] = timed(lambda: run_jaccard(100))
        if fac == max(factors):
            t0 = time.time()
            rows_off = run_jaccard(None)
            rec["jaccard_noguard_sec"] = round(time.time() - t0, 2)
            rec["jaccard_noguard_rows"] = rows_off

        ln = lined(corpus).localCheckpoint(eager=True)
        rec["line_dedup_sec"], rec["line_dedup_rows"] = timed(
            lambda: line_dedup(ln, "text", "doc_id", mode="first").count()
        )

        rec["clusters_sec"], rec["clusters_rows"] = timed(
            lambda: near_dup_clusters(mh_pairs.select("id_a", "id_b")).count()
        )

        out["factors"][str(fac)] = rec
        for df in (corpus, mh_pairs, ln):
            df.unpersist()

    # Stop-shingle guard demo: the scaled corpora above have near-zero
    # shingle doc-frequency (salted tokens), so the guard is idle
    # there. Real corpora have BOILERPLATE — append a universal 9-word
    # footer to every 1×-corpus doc, making ~7 shingles appear in ALL
    # docs: unguarded, each contributes |docs|² candidate pairs to the
    # inverted-index join; guarded (max_shingle_freq=100) they are
    # dropped before the join. Output is near-identical either way
    # (~7 boilerplate shingles against a ~110-shingle union moves
    # Jaccard by ~0.06, far from the 0.5 threshold; both row counts
    # are reported so any drift is visible) — the guard buys the
    # runtime, not the answer.
    bp = build_corpus(spark, 1).select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" nav home about contact login terms privacy copyright notice")
        ).alias("text"),
    ).localCheckpoint(eager=True)

    def run_bp(max_freq):
        return ngram_jaccard_pairs(
            bp, k=3, threshold=0.5, max_shingle_freq=max_freq
        ).count()

    t0 = time.time()
    rows_guarded = run_bp(100)
    t_guarded = round(time.time() - t0, 2)
    t0 = time.time()
    rows_unguarded = run_bp(None)
    t_unguarded = round(time.time() - t0, 2)
    out["guard_demo"] = {
        "n_docs": bp.count(),
        "guarded_sec": t_guarded,
        "unguarded_sec": t_unguarded,
        "speedup": round(t_unguarded / max(t_guarded, 1e-9), 1),
        "rows_guarded": rows_guarded,
        "rows_unguarded": rows_unguarded,
    }

    fs = sorted(int(f) for f in out["factors"])
    if len(fs) >= 2:
        hi, lo = str(fs[-1]), str(fs[-2])
        out["slopes_hi_vs_prev"] = {
            k.replace("_sec", ""): round(
                out["factors"][hi][k] / max(out["factors"][lo][k], 1e-9), 2
            )
            for k in ("minhash_pairs_sec", "jaccard_sec", "line_dedup_sec", "clusters_sec")
        }
        out["ideal_slope"] = round(fs[-1] / fs[-2], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
