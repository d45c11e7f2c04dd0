"""Unit tests for the declarative CorpusPipeline builder. The full
composition is oracle-gated end-to-end by q98 (same oracle as q69);
these cover the builder mechanics: ordering, schema preservation,
stage parameterization, and the escape hatch."""

from __future__ import annotations

from pyspark.sql import functions as F

from sif_spark.pipeline import CorpusPipeline


def test_describe_lists_stages_in_order():
    p = (
        CorpusPipeline()
        .quality_filter(min_score=0.4)
        .language_filter(exclude=("und",))
        .exact_dedup()
        .near_dup_dedup(threshold=0.3, containment_threshold=0.8)
        .mixture({"a": 1})
    )
    names = p.describe()
    assert names[0].startswith("quality_filter")
    assert names[1].startswith("language_filter")
    assert names[2].startswith("exact_dedup")
    assert "containment=0.8" in names[3]
    assert names[4].startswith("mixture")


def test_run_applies_stages_in_order_and_preserves_schema(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "s0"),
            (2, "alpha beta gamma delta", "s0"),  # exact dup of 1
            (3, "other words entirely here", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    out = CorpusPipeline().exact_dedup().run(docs)
    assert set(out.columns) == {"doc_id", "text", "source"}
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_line_dedup_stage_keeps_extra_columns(spark):
    docs = spark.createDataFrame(
        [(1, "nav\nbody one", "s0"), (2, "nav\nbody two", "s1")],
        "doc_id long, text string, source string",
    )
    out = CorpusPipeline().line_dedup(mode="drop_common", min_docs=2).run(docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["text"] == "body one" and rows[1]["source"] == "s0"
    assert rows[2]["text"] == "body two" and rows[2]["source"] == "s1"


def test_custom_stage_and_gopher_filter(spark):
    long_doc = " ".join(["the", "and", "with"] * 20)
    docs = spark.createDataFrame(
        [(1, long_doc), (2, "too short")], "doc_id long, text string"
    )
    p = (
        CorpusPipeline()
        .gopher_filter(min_words=10)
        .custom("tag", lambda df: df.withColumn("tagged", F.lit(True)))
    )
    out = p.run(docs).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["tagged"] is True
    assert p.describe()[1] == "tag"


def test_mixture_stage_filters_by_rate(spark):
    rows = [(i, "s0" if i < 40 else "s1", "w " * 50) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = CorpusPipeline().mixture({"s0": 1, "s1": 1}).run(docs)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["s1"] == 20  # scarcer stratum kept fully
    assert 0 < by_src["s0"] < 40  # downsampled
