"""Query catalog: every operator exposed as a (spark, sf_dir) → DataFrame
callable plus a DuckDB-equivalent oracle SQL string.

This is the correctness gate (BASELINE.md): the driver runs each Spark
query AND its oracle at sf0.01 and hash-compares values. Two rules keep
the hashes stable across engines:

1. **Integer-exact money math.** The synthetic data's money/rate columns
   are 2-decimal doubles, so sums are computed in integer cents / basis
   points (``round(x*100)``) — exact in both engines, immune to
   floating-point summation order. Headline units are documented per
   query.
2. **Identical expression trees for doubles.** Where a double survives
   to the output (ratios, cosine), both engines evaluate the *same*
   IEEE-double formula over exact integer inputs, or the value is only
   used for deterministic ranking with an integer tie-break and the
   double itself is kept/excluded as noted.

Query keys are stable API: bench.py and __spark_entry__.py import them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from sif_spark.sources.parquet import read_table
from sif_spark.operators import text as sgtext
from sif_spark.operators import dedup as sgdedup
from sif_spark.operators import similarity as sgsim
from sif_spark.operators.asof import asof_join


def _cents(col: str) -> F.Column:
    """Exact integer cents from a 2-decimal double column."""
    return F.round(F.col(col) * 100).cast("long")


# ---------------------------------------------------------------------------
# Core relational surface (reference parity: scan→filter→project→reduce;
# reference-absent: joins/windows/set-ops/rollup — SURVEY.md §2.3-2.5)
# ---------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped grouped aggregation over lineitem.

    Exercises the full Sif batch lifecycle (scan → filter → project →
    shuffle-reduce, SURVEY.md §3.2) as one Catalyst plan: partial
    aggregation map-side, final after a 2-key shuffle. Money in integer
    cents; disc_price in 1e-4 units; charge in 1e-6 units.
    """
    l = read_table(spark, sf_dir, "lineitem")
    price_c = _cents("l_extendedprice")
    disc_bp = _cents("l_discount")  # basis points /100 == percent*100
    tax_bp = _cents("l_tax")
    qty = F.round(F.col("l_quantity")).cast("long")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price_c).alias("sum_base_cents"),
            F.sum(price_c * (100 - disc_bp)).alias("sum_disc_e4"),
            F.sum(price_c * (100 - disc_bp) * (100 + tax_bp)).alias("sum_charge_e6"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_Q01 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))
           * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + projection — must push down to the parquet scan
    (PushedFilters + 4-column ReadSchema in `.explain`)."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        _cents("l_extendedprice").alias("price_cents"),
    )


ORACLE_Q02 = """
SELECT l_orderkey, l_linenumber,
       CAST(round(l_quantity) AS BIGINT) AS qty,
       CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate < TIMESTAMP '1998-04-01'
  AND l_discount >= 0.05
"""


def q03_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join: lineitem ⋈ orders ⋈ customer ⋈ nation, revenue per
    nation. Dimension sides are broadcast (no shuffle of the fact
    table for the small joins); the lineitem↔orders join shuffles on
    orderkey — at 100 TB that is the one unavoidable shuffle, and AQE
    picks broadcast automatically when orders fits."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    revenue = F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
        "revenue_e4"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(revenue, F.count(F.lit(1)).alias("n_items"))
        .orderBy("n_name")
    )


ORACLE_Q03 = """
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


def q04_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: top-3 orders by totalprice per customer.
    Single shuffle on custkey; rank ties broken by orderkey."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            "rank",
            _cents("o_totalprice").alias("totalprice_cents"),
        )
    )


ORACLE_Q04 = """
SELECT o_custkey, o_orderkey, rank, CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 3
"""


def q05_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no high-value order
    (totalprice > 350k), counted per market segment. At scale the
    orders side reduces to distinct keys before the anti-join; Catalyst
    plans it as a broadcast anti-join here."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


ORACLE_Q05 = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 350000)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q06_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotals + grand total —
    grouping-set machinery the reference cannot express at all."""
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_Q06 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def q07_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlatMap/explode: tokenize documents, global top-20 tokens.
    The reference's FlatMap (1 row → N) as explode + reduce; partial
    aggregation makes the shuffle carry only (token, count)."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(sgtext.tokenize("text")).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(20)


ORACLE_Q07 = """
SELECT token, COUNT(*) AS cnt
FROM (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS token
  FROM documents
)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
"""


def q08_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized-text md5 fingerprint; survivor = min
    doc_id per fingerprint. One skew-free shuffle on the hash key."""
    d = read_table(spark, sf_dir, "documents")
    out = sgdedup.exact_dedup(d, "text", "doc_id", keep="min")
    return out.select("doc_id", "fingerprint")


ORACLE_Q08 = """
SELECT MIN(doc_id) AS doc_id, fingerprint
FROM (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
)
GROUP BY fingerprint
"""


def q09_text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: per-language doc counts, char and whitespace-token
    totals — pure scan + one tiny aggregation."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(sgtext.token_count("text")).alias("total_tokens"),
        )
        .orderBy("lang")
    )


ORACLE_Q09 = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY lang
ORDER BY lang
"""


def q10_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window (1h) event aggregation — the batch shape of the
    streaming rollup; value summed in exact cents."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents("value")).alias("value_cents"),
        )
        .orderBy("hour", "event_type")
    )


ORACLE_Q10 = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# LLM-pipeline extensions
# ---------------------------------------------------------------------------


def q11_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for query vectors vec_id < 5.
    Output is (qid, nid, rank) — integers only; ranking is by double
    cosine with id tie-break (similarity gaps ≫ float error)."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    knn = sgsim.brute_force_knn(emb, queries, k=5)
    return knn.select("qid", "nid", "rank")


ORACLE_Q11 = """
WITH qs AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
pairs AS (
  SELECT qid, e.vec_id AS nid, qe, e.embedding AS ne
  FROM qs, embeddings e WHERE e.vec_id <> qs.qid
),
comps AS (
  SELECT qid, nid, unnest(qe) AS qv, unnest(ne) AS nv FROM pairs
),
sims AS (
  SELECT qid, nid,
         SUM(CAST(qv AS DOUBLE)*CAST(nv AS DOUBLE))
         / (sqrt(SUM(CAST(qv AS DOUBLE)*CAST(qv AS DOUBLE)))
            * sqrt(SUM(CAST(nv AS DOUBLE)*CAST(nv AS DOUBLE)))) AS sim
  FROM comps GROUP BY qid, nid
)
SELECT qid, nid, rank FROM (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
  FROM sims
) WHERE rank <= 5
"""


def q12_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the same user's most
    recent click at-or-before it. Union+window strategy — one shuffle
    on user_id, no range cross-product (see operators/asof.py)."""
    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    joined = asof_join(
        purchases, clicks, on=["user_id"], left_time="ts", right_time="ts",
        right_cols=["click_id"],
    )
    return joined.select("event_id", "user_id", "click_id")


ORACLE_Q12 = """
SELECT p.event_id, p.user_id, c.click_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN
     (SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click') c
ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q13_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard similar pairs (≥ 0.2) via inverted-
    index self-join WITH the stop-shingle guard on (max doc-frequency
    100 — mirrored in the oracle's HAVING clause): a hot shingle shared
    by N docs would otherwise make the self-join quadratic in N at
    corpus scale. jaccard is a double but is a single division of exact
    ints — bit-identical across engines."""
    d = read_table(spark, sf_dir, "documents")
    pairs = sgdedup.ngram_jaccard_pairs(
        d, "text", "doc_id", k=3, threshold=0.2, max_shingle_freq=100
    )
    return pairs.select("id_a", "id_b", "inter", "jaccard")


ORACLE_Q13 = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(w) - 1, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
    FROM toks WHERE len(w) >= 3
  )
),
ok AS (SELECT gram FROM sh GROUP BY gram HAVING COUNT(*) <= 100),
shf AS (SELECT sh.doc_id, sh.gram FROM sh JOIN ok USING (gram)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM shf a JOIN shf b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter,
       inter / (sa.sz + sb.sz - inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE inter / (sa.sz + sb.sz - inter) >= 0.2
"""


def q14_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute-gap sessions per user via lag + cumsum
    windows (the standard Spark idiom); emits sessions-per-user."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap arithmetic (events carry microsecond ts) so
    # the 30-min boundary compare is integer-exact in both engines.
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    sessionized = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
    )
    return (
        sessionized.groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


ORACLE_Q14 = """
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) > 1800 * 1000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
GROUP BY user_id
ORDER BY user_id
"""


def q15_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregation pivot: per-day counts of each event type
    as columns (manual pivot — identical plans in any engine)."""
    e = read_table(spark, sf_dir, "events")
    day = F.to_date(F.col("ts")).alias("day")

    def n(t: str) -> F.Column:
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")

    return (
        e.groupBy(day)
        .agg(n("view"), n("click"), n("purchase"), n("signup"), n("error"))
        .orderBy("day")
    )


ORACLE_Q15 = """
SELECT CAST(ts AS DATE) AS day,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events
GROUP BY 1
ORDER BY 1
"""


def q16_active_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op (INTERSECT): users who both purchased and hit an error."""
    e = read_table(spark, sf_dir, "events")
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id")
    erroring = e.filter(F.col("event_type") == "error").select("user_id")
    return buyers.intersect(erroring).orderBy("user_id")


ORACLE_Q16 = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id
"""


def q17_quality_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score histogram per language: floor(score*20) buckets.
    The score is pure double arithmetic over integer counts with an
    identical expression tree in the oracle — bit-identical, so the
    floor() bucketing matches exactly."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("lang", F.floor(sgtext.quality_score("text") * 20).cast("int").alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "bucket")
    )


ORACLE_Q17 = """
WITH t AS (
  SELECT lang,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS DOUBLE) AS n_tok,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha
  FROM documents
), s AS (
  SELECT lang,
         CASE WHEN n_tok = 0 THEN 0.0 ELSE
           (CASE WHEN (CASE WHEN n_tok > 0 THEN n_alpha/n_tok ELSE 0.0 END) >= 3.0
                  AND (CASE WHEN n_tok > 0 THEN n_alpha/n_tok ELSE 0.0 END) <= 10.0
                 THEN 1.0 ELSE 0.5 END) * 0.4
           + (CASE WHEN n_chars > 0 THEN n_alpha/n_chars ELSE 0.0 END) * 0.4
           + least(n_chars/500.0, 1.0) * 0.2
         END AS q
  FROM t
)
SELECT lang, CAST(floor(q*20) AS INT) AS bucket, COUNT(*) AS n_docs
FROM s GROUP BY lang, bucket ORDER BY lang, bucket
"""


def q18_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID over documents: predicted-language counts
    vs the labeled lang column (confusion counts). Marker-word argmax,
    ties resolved to the lexicographically first code — replicated as a
    CASE chain in the oracle."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("lang", sgtext.language_id("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


ORACLE_Q18 = """
WITH toks AS (
  SELECT lang,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), scored AS (
  SELECT lang,
         len(list_filter(w, t -> t IN ('der','die','und','das','ist'))) AS s_de,
         len(list_filter(w, t -> t IN ('the','and','of','to','a'))) AS s_en,
         len(list_filter(w, t -> t IN ('el','la','los','que','de'))) AS s_es,
         len(list_filter(w, t -> t IN ('le','la','et','les','des'))) AS s_fr
  FROM toks
), pred AS (
  SELECT lang,
         CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
              WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
              WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
              WHEN s_fr > 0 THEN 'fr'
              ELSE 'und' END AS pred_lang
  FROM scored
)
SELECT lang, pred_lang, COUNT(*) AS n_docs
FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""


def q19_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (regex word/number/symbol pieces) summed
    per source — the token-budget accounting query of a training-data
    pipeline."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.sum(sgtext.bpe_token_count("text")).alias("total_bpe_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("source")
    )


ORACLE_Q19 = """
SELECT source,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS total_bpe_tokens,
       COUNT(*) AS n_docs
FROM documents
GROUP BY source ORDER BY source
"""


def q20_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine similar pairs (≥ 0.45 — the synthetic corpus
    has no true near-dups; threshold sits below its max pairwise
    cosine so the check exercises real rows). Output ids only; the
    double cosine never leaves the plan."""
    emb = read_table(spark, sf_dir, "embeddings")
    pairs = sgdedup.embedding_near_dup_pairs(emb, "embedding", "vec_id", threshold=0.45)
    return pairs.select("id_a", "id_b").orderBy("id_a", "id_b")


ORACLE_Q20 = """
WITH e AS (SELECT vec_id, embedding FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
  FROM e a JOIN e b ON a.vec_id < b.vec_id
),
c AS (SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM pairs),
s AS (
  SELECT id_a, id_b,
         SUM(CAST(x AS DOUBLE)*CAST(y AS DOUBLE))
         / (sqrt(SUM(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))
            * sqrt(SUM(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))) AS sim
  FROM c GROUP BY id_a, id_b
)
SELECT id_a, id_b FROM s WHERE sim >= 0.45 ORDER BY id_a, id_b
"""


def q21_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata path: treat document text bytes as blobs,
    emit content hash + byte size (the dedup/content-addressing key
    for binary corpora). sha256 hex matches across engines."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("content_sha256"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


ORACLE_Q21 = """
SELECT doc_id,
       sha256(text) AS content_sha256,
       octet_length(encode(text)) AS n_bytes
FROM documents
"""


def q22_global_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Accumulate terminator (Counter + Adder compose,
    accumulators/count.go + sum.go) as one global aggregation."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty_sum"),
        F.sum(_cents("l_extendedprice")).alias("price_cents_sum"),
    )


ORACLE_Q22 = """
SELECT COUNT(*) AS row_count,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty_sum,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents_sum
FROM lineitem
"""


MINHASH_NUM_HASHES = 32
MINHASH_NUM_BANDS = 8


def q23_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates (32 hashes, 8 bands, est
    jaccard ≥ 0.5), in the engine-portable hash60 mode so the DuckDB
    oracle replays signatures, banding, and the estimate exactly
    (candidate membership = band-slice equality, hash-independent)."""
    d = read_table(spark, sf_dir, "documents")
    pairs = sgdedup.minhash_dedup_pairs(
        d, "text", "doc_id",
        num_hashes=MINHASH_NUM_HASHES, num_bands=MINHASH_NUM_BANDS,
        threshold=0.5, hash_fn="md5",
    )
    return pairs.select("id_a", "id_b", "est_jaccard")


ORACLE_Q23 = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(w) - 1, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
    FROM toks WHERE len(w) >= 3
  )
),
based AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) % 2147483647 AS base
  FROM sh
),
sig AS (
  SELECT doc_id, j,
         MIN((((j * 2654435761 + 1) % 2147483647) * base
              + ((j * 40503 + 7) % 2147483647)) % 2147483647) AS h
  FROM based CROSS JOIN (SELECT unnest(range({MINHASH_NUM_HASHES})) AS j) js
  GROUP BY doc_id, j
),
bandsig AS (
  SELECT doc_id, CAST(j // {MINHASH_NUM_HASHES // MINHASH_NUM_BANDS} AS INT) AS band,
         list(h ORDER BY j) AS bsig
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandsig a
  JOIN bandsig b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
m AS (
  SELECT c.id_a, c.id_b, SUM(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS nm
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b AND sb.j = sa.j
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, nm / {MINHASH_NUM_HASHES} AS est_jaccard
FROM m WHERE nm / {MINHASH_NUM_HASHES} >= 0.5
"""


def q24_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 8, exact via 9-band
    pigeonhole), in the portable 60-bit hash60 mode — the oracle
    rebuilds the bit votes, the signature, the band layout, and the
    Hamming verify in DuckDB."""
    d = read_table(spark, sf_dir, "documents")
    pairs = sgdedup.simhash_near_dup_pairs(
        d, "text", "doc_id", max_hamming=8, hash_fn="md5"
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


def _simhash_oracle() -> str:
    from sif_spark.operators.dedup import simhash_band_layout, simhash_bits

    n_bits = simhash_bits("md5")
    layout = simhash_band_layout(n_bits, 9)
    band_values = ", ".join(f"({i}, {off}, {w})" for i, off, w in layout)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
  FROM documents
),
h AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks
),
lanes AS (SELECT doc_id, h, unnest(range({n_bits})) AS b FROM h),
votes AS (
  SELECT doc_id, b, COUNT(*) AS n, SUM((h >> CAST(b AS INT)) & 1) AS v
  FROM lanes GROUP BY doc_id, b
),
sig0 AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN 2 * v > n
                       THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS sig
  FROM votes GROUP BY doc_id
),
sig AS (
  SELECT d.doc_id, COALESCE(s.sig, 0) AS sig
  FROM documents d LEFT JOIN sig0 s USING (doc_id)
),
bands(band, off, w) AS (VALUES {band_values}),
chunks AS (
  SELECT doc_id, sig, band,
         (sig >> CAST(off AS INT)) & ((CAST(1 AS BIGINT) << CAST(w AS INT)) - 1) AS chunk
  FROM sig CROSS JOIN bands
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
  FROM chunks a
  JOIN chunks b ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 8
"""


ORACLE_Q24 = _simhash_oracle()


def q25_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN via SRP-LSH for query vectors vec_id < 5 —
    the scale path of q11, same (qid, nid, rank) contract. The catalog
    entry runs 16 tables × 2 bits: empirically perfect recall at both
    gate scales (verified against brute force), so the exact-kNN SQL is
    a true oracle — the gate literally measures recall-vs-exact.
    Production tunes tables/bits down for cost; the operator itself is
    approximate by construction."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return sgsim.lsh_knn(emb, queries, k=5, dim=64, bits=2, tables=16).select(
        "qid", "nid", "rank"
    )


def q26_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash document sketch in portable hash60
    mode: min over every 8-token-gram hash — the dedup blocking key for
    shift-tolerant near-dup detection. Frame-operator form (explode +
    lead window + min groupBy) keeps the hash a codegen'd scalar call."""
    d = read_table(spark, sf_dir, "documents")
    return sgtext.rolling_fingerprints(
        d, "text", "doc_id", window=8, hash_fn="md5"
    ).select("doc_id", "sketch")


ORACLE_Q26 = """
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
  FROM documents
),
pos AS (
  SELECT doc_id, w, unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
  FROM t WHERE len(w) > 0
),
g AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram FROM pos),
s AS (
  SELECT doc_id,
         MIN(CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT)) AS sketch
  FROM g GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.sketch, CAST(('0x' || substr(md5(''), 1, 15)) AS BIGINT)) AS sketch
FROM documents d LEFT JOIN s USING (doc_id)
"""


def q27_parts_below_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped 'small lots': lineitems with quantity below 20%
    of their part's average, grouped by brand. Exercises the SQL entry
    point (spark.sql over registered views); the correlated-subquery
    form is decorrelated into an explicit per-part aggregate join. The
    threshold compare is kept in integers (qty*n*5 < sum_qty) so no
    float average crosses an engine boundary."""
    from sif_spark.sources.parquet import register_views

    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(
        """
        WITH per_part AS (
          SELECT l_partkey, COUNT(*) AS n,
                 SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sq
          FROM lineitem GROUP BY l_partkey
        )
        SELECT p_brand,
               COUNT(*) AS n_small,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS price_cents
        FROM lineitem
        JOIN per_part USING (l_partkey)
        JOIN part ON p_partkey = l_partkey
        WHERE CAST(ROUND(l_quantity) AS BIGINT) * n * 5 < sq
        GROUP BY p_brand
        ORDER BY p_brand
        """
    )


ORACLE_Q27 = """
WITH per_part AS (
  SELECT l_partkey, COUNT(*) AS n,
         SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sq
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       COUNT(*) AS n_small,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents
FROM lineitem
JOIN per_part USING (l_partkey)
JOIN part ON p_partkey = l_partkey
WHERE CAST(ROUND(l_quantity) AS BIGINT) * n * 5 < sq
GROUP BY p_brand
ORDER BY p_brand
"""


def q28_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: top-10 BUILDING-segment orders by outstanding
    revenue (ordered before / shipped after a date). Fact-fact join on
    orderkey + broadcast dimension filter; deterministic top-10 via
    (revenue desc, orderkey) ordering."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("odate"))
        .agg(F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("revenue_e4"))
        .orderBy(F.col("revenue_e4").desc(), F.col("o_orderkey"))
        .limit(10)
    )


ORACLE_Q28 = """
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, odate
ORDER BY revenue_e4 DESC, o_orderkey
LIMIT 10
"""


def q29_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderpriority, orderstatus): every grouping-set
    combination in one pass."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents("o_totalprice")).alias("total_cents"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


ORACLE_Q29 = """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority, o_orderstatus
"""


def q30_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events props column — the Spark
    form of the reference's gjson dotted-path parsing
    (datasource/parser/jsonl/jsonl_utils.go:53-61): nested access as an
    expression over raw JSON."""
    e = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(k).alias("k_sum"),
            F.min(k).alias("k_min"),
            F.max(k).alias("k_max"),
        )
        .orderBy("event_type")
    )


ORACLE_Q30 = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q31_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving window over daily order revenue (window frame
    rowsBetween): emits the windowed sum and row count in exact cents —
    the moving average is their single deterministic division."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(_cents("o_totalprice")).alias("day_cents")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.withColumn("win_cents", F.sum("day_cents").over(w))
        .withColumn("win_days", F.count(F.lit(1)).over(w))
        .withColumn("moving_avg_cents", F.col("win_cents") / F.col("win_days"))
        .select("day", "day_cents", "win_cents", "win_days", "moving_avg_cents")
        .orderBy("day")
    )


ORACLE_Q31 = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS day_cents
  FROM orders GROUP BY day
)
SELECT day, day_cents,
       CAST(SUM(day_cents) OVER w AS BIGINT) AS win_cents,
       COUNT(*) OVER w AS win_days,
       CAST(SUM(day_cents) OVER w AS BIGINT) / (COUNT(*) OVER w) AS moving_avg_cents
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


def q32_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quartiles of customers by total spend (ties broken by
    custkey for engine determinism), with per-quartile rollups.

    Uses the distributed ntile (operators/ranking.py) — range-partitioned
    rank + closed-form tile assignment — instead of
    ``Window.orderBy(...)`` with no partitionBy, which would pull every
    customer into one task (round-1 VERDICT's scale-killer). Output is
    bit-identical to the window-function ntile; the oracle still uses
    DuckDB's native ntile."""
    from sif_spark.operators.ranking import ntile_distributed

    o = read_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum(_cents("o_totalprice")).alias("spend_cents"))
    tiled = ntile_distributed(
        spend, 4, [F.col("spend_cents").desc(), F.col("o_custkey")], tile_col="quartile"
    )
    return (
        tiled.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("spend_cents").alias("quartile_cents"),
        )
        .orderBy("quartile")
    )


ORACLE_Q32 = """
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS spend_cents
  FROM orders GROUP BY o_custkey
)
SELECT quartile, COUNT(*) AS n_customers, CAST(SUM(spend_cents) AS BIGINT) AS quartile_cents
FROM (
  SELECT spend_cents,
         ntile(4) OVER (ORDER BY spend_cents DESC, o_custkey) AS quartile
  FROM spend
)
GROUP BY quartile ORDER BY quartile
"""


def q33_churned_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op: customers who ordered in 1995 but not in the
    final two years (2000+) — lapsed buyers."""
    o = read_table(spark, sf_dir, "orders")
    # distinct() both sides first: SQL EXCEPT is set semantics, while
    # Spark's exceptAll subtracts per-occurrence on multisets.
    in_1995 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    later = o.filter(F.year("o_orderdate") >= 2000).select("o_custkey").distinct()
    return in_1995.exceptAll(later).orderBy("o_custkey")


ORACLE_Q33 = """
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) >= 2000
ORDER BY o_custkey
"""


def q34_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + approximate distinct counting per event type. The
    oracle checks the exact count; the HLL approximation is included
    as a sanity-bounded extra column in tests, not in the hash (its
    estimate is engine-specific)."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


ORACLE_Q34 = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q35_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means coarse quantizer) approximate kNN — the
    cell-partitioned scale tier of q11. The catalog entry probes ALL
    cells (n_probe = n_cells), where IVF is exact regardless of how
    k-means trained, so the exact-kNN SQL is a true oracle and the
    whole index path (train → assign → probe join → re-rank) is
    value-verified; production sets n_probe < n_cells for cost.
    max_iter trimmed to 2 — a coarse quantizer doesn't need
    convergence, and training dominated this query's round-1 bench."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return sgsim.ivf_knn(emb, queries, k=5, n_cells=16, n_probe=16, max_iter=2).select(
        "qid", "nid", "rank"
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_project": q02_filter_project,
    "q03_revenue_by_nation": q03_revenue_by_nation,
    "q04_topk_orders_per_customer": q04_topk_orders_per_customer,
    "q05_customers_without_orders": q05_customers_without_orders,
    "q06_rollup_returns": q06_rollup_returns,
    "q07_top_tokens": q07_top_tokens,
    "q08_exact_dedup": q08_exact_dedup,
    "q09_text_stats_by_lang": q09_text_stats_by_lang,
    "q10_events_hourly": q10_events_hourly,
    "q11_knn_bruteforce": q11_knn_bruteforce,
    "q12_asof_purchase_click": q12_asof_purchase_click,
    "q13_ngram_jaccard_pairs": q13_ngram_jaccard_pairs,
    "q14_sessionization": q14_sessionization,
    "q15_event_funnel": q15_event_funnel,
    "q16_active_buyers": q16_active_buyers,
    "q17_quality_histogram": q17_quality_histogram,
    "q18_language_id": q18_language_id,
    "q19_bpe_token_stats": q19_bpe_token_stats,
    "q20_embedding_near_dup": q20_embedding_near_dup,
    "q21_blob_metadata": q21_blob_metadata,
    "q22_global_accumulate": q22_global_accumulate,
    "q23_minhash_lsh": q23_minhash_lsh,
    "q24_simhash_pairs": q24_simhash_pairs,
    "q25_lsh_knn": q25_lsh_knn,
    "q26_rolling_fingerprint": q26_rolling_fingerprint,
    "q27_parts_below_avg": q27_parts_below_avg,
    "q28_shipping_priority": q28_shipping_priority,
    "q29_orders_cube": q29_orders_cube,
    "q30_json_props": q30_json_props,
    "q31_moving_avg": q31_moving_avg,
    "q32_customer_quartiles": q32_customer_quartiles,
    "q33_churned_buyers": q33_churned_buyers,
    "q34_distinct_users": q34_distinct_users,
    "q35_ivf_knn": q35_ivf_knn,
}

ORACLES: dict[str, str] = {
    "q01_pricing_summary": ORACLE_Q01,
    "q02_filter_project": ORACLE_Q02,
    "q03_revenue_by_nation": ORACLE_Q03,
    "q04_topk_orders_per_customer": ORACLE_Q04,
    "q05_customers_without_orders": ORACLE_Q05,
    "q06_rollup_returns": ORACLE_Q06,
    "q07_top_tokens": ORACLE_Q07,
    "q08_exact_dedup": ORACLE_Q08,
    "q09_text_stats_by_lang": ORACLE_Q09,
    "q10_events_hourly": ORACLE_Q10,
    "q11_knn_bruteforce": ORACLE_Q11,
    "q12_asof_purchase_click": ORACLE_Q12,
    "q13_ngram_jaccard_pairs": ORACLE_Q13,
    "q14_sessionization": ORACLE_Q14,
    "q15_event_funnel": ORACLE_Q15,
    "q16_active_buyers": ORACLE_Q16,
    "q17_quality_histogram": ORACLE_Q17,
    "q18_language_id": ORACLE_Q18,
    "q19_bpe_token_stats": ORACLE_Q19,
    "q20_embedding_near_dup": ORACLE_Q20,
    "q21_blob_metadata": ORACLE_Q21,
    "q22_global_accumulate": ORACLE_Q22,
    "q23_minhash_lsh": ORACLE_Q23,
    "q24_simhash_pairs": ORACLE_Q24,
    # q25/q35 emit approximate kNN whose catalog parameters achieve
    # perfect recall at gate scale (verified) — the exact-kNN SQL is the
    # oracle, so the gate measures recall-vs-exact directly.
    "q25_lsh_knn": ORACLE_Q11,
    "q26_rolling_fingerprint": ORACLE_Q26,
    "q27_parts_below_avg": ORACLE_Q27,
    "q28_shipping_priority": ORACLE_Q28,
    "q29_orders_cube": ORACLE_Q29,
    "q30_json_props": ORACLE_Q30,
    "q31_moving_avg": ORACLE_Q31,
    "q32_customer_quartiles": ORACLE_Q32,
    "q33_churned_buyers": ORACLE_Q33,
    "q34_distinct_users": ORACLE_Q34,
    "q35_ivf_knn": ORACLE_Q11,
}

# Extension catalog (q36+): sources/sinks/terminators/streaming/scenario
# entries — see sif_spark/queries_ext.py.
from sif_spark.queries_ext import EXT_ORACLES, EXT_QUERIES  # noqa: E402
from sif_spark.queries_ext2 import EXT2_ORACLES, EXT2_QUERIES  # noqa: E402
from sif_spark.queries_tpch import TPCH_ORACLES, TPCH_QUERIES  # noqa: E402

QUERIES.update(EXT_QUERIES)
ORACLES.update(EXT_ORACLES)
QUERIES.update(EXT2_QUERIES)
ORACLES.update(EXT2_ORACLES)
QUERIES.update(TPCH_QUERIES)
ORACLES.update(TPCH_ORACLES)
# q155 (the injected-codec demo) lives in queries_ext2 but registers
# here, after q144-q154, to keep the tail strictly q-number-ordered.
from sif_spark.queries_ext2 import ORACLE_Q155, q155_mpeg1_injected_codec  # noqa: E402

QUERIES["q155_mpeg1_injected_codec"] = q155_mpeg1_injected_codec
ORACLES["q155_mpeg1_injected_codec"] = ORACLE_Q155
# PQ prefilter + exact re-rank (q109) gates against the exact-kNN
# contract — the oracle lives here to keep queries_ext2 import-order
# independent
ORACLES["q109_pq_rerank_knn"] = ORACLE_Q11
# q156: the Avro OCF round-trip (gated on the same aggregate oracle as
# the q36/q88 format round-trips)
from sif_spark.queries_ext import _DSV_AGG_ORACLE as _DSV_AGG_ORACLE_Q156  # noqa: E402
from sif_spark.queries_tpch import q156_avro_roundtrip  # noqa: E402

QUERIES["q156_avro_roundtrip"] = q156_avro_roundtrip
ORACLES["q156_avro_roundtrip"] = _DSV_AGG_ORACLE_Q156
# q157: the full Avro type matrix (logical types + schema resolution)
from sif_spark.queries_tpch import ORACLE_Q157, q157_avro_type_matrix  # noqa: E402

QUERIES["q157_avro_type_matrix"] = q157_avro_type_matrix
ORACLES["q157_avro_type_matrix"] = ORACLE_Q157
# q158-q160: the snapshot table layer (time travel, schema evolution,
# compaction) — see sif_spark/queries_table.py
from sif_spark.queries_table import TABLE_ORACLES, TABLE_QUERIES  # noqa: E402

QUERIES.update(TABLE_QUERIES)
ORACLES.update(TABLE_ORACLES)
# q161-q166: the TPC-DS-shape sampler — see sif_spark/queries_tpcds.py
from sif_spark.queries_tpcds import TPCDS_ORACLES, TPCDS_QUERIES  # noqa: E402

QUERIES.update(TPCDS_QUERIES)
ORACLES.update(TPCDS_ORACLES)
# q167-q168: event-time-timer transformWithState ports — see
# sif_spark/queries_tws.py
from sif_spark.queries_tws import TWS_ORACLES, TWS_QUERIES  # noqa: E402

QUERIES.update(TWS_QUERIES)
ORACLES.update(TWS_ORACLES)
# q169: exactly-once streaming ingest into the snapshot table (the
# round-10 composition of streaming + SifTable) — queries_table.py
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q169,
    q169_stream_table_exactly_once,
)

QUERIES["q169_stream_table_exactly_once"] = q169_stream_table_exactly_once
ORACLES["q169_stream_table_exactly_once"] = ORACLE_Q169
# q170: bloom-indexed upsert file skipping on the snapshot table
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q170,
    q170_table_bloom_upsert,
)

QUERIES["q170_table_bloom_upsert"] = q170_table_bloom_upsert
ORACLES["q170_table_bloom_upsert"] = ORACLE_Q170
# q175: read-side data skipping (manifest min/max group pruning)
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q175,
    q175_table_data_skipping,
)

QUERIES["q175_table_data_skipping"] = q175_table_data_skipping
ORACLES["q175_table_data_skipping"] = ORACLE_Q175
# q176-q177: the table change feed and the sif_table streaming source
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q176,
    ORACLE_Q177,
    q176_table_change_feed,
    q177_table_stream_source,
)

QUERIES["q176_table_change_feed"] = q176_table_change_feed
ORACLES["q176_table_change_feed"] = ORACLE_Q176
QUERIES["q177_table_stream_source"] = q177_table_stream_source
ORACLES["q177_table_stream_source"] = ORACLE_Q177
# q178: incremental materialized view over the change feed
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q178,
    q178_incremental_mv,
)

QUERIES["q178_incremental_mv"] = q178_incremental_mv
ORACLES["q178_incremental_mv"] = ORACLE_Q178
# q179: CDC-mode incremental MV — the source upserts AND deletes; the
# signed fold over the change-data feed must equal a one-shot GROUP BY
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q179,
    q179_incremental_mv_cdf,
)

QUERIES["q179_incremental_mv_cdf"] = q179_incremental_mv_cdf
ORACLES["q179_incremental_mv_cdf"] = ORACLE_Q179
# q180: sif_table as a plain SQL source — batch DataSource reader with
# pushFilters-driven manifest-stats group pruning
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q180,
    q180_table_sql_pushdown,
)

QUERIES["q180_table_sql_pushdown"] = q180_table_sql_pushdown
ORACLES["q180_table_sql_pushdown"] = ORACLE_Q180
# q181: IVF index maintained incrementally from the table change feed
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q181,
    q181_incremental_ann_index,
)

QUERIES["q181_incremental_ann_index"] = q181_incremental_ann_index
ORACLES["q181_incremental_ann_index"] = ORACLE_Q181
# q182: df.write.format("sif_table") — the write half of the SQL surface
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q182,
    q182_table_sql_write,
)

QUERIES["q182_table_sql_write"] = q182_table_sql_write
ORACLES["q182_table_sql_write"] = ORACLE_Q182
# q183: the full IVF-PQ artifact (assigned AND encoded per batch)
# maintained incrementally; serves q109's ADC+rerank shape, and the
# oracle is q181's exact-kNN SQL over the same final corpus
from sif_spark.queries_table import (  # noqa: E402
    q183_incremental_pq_index,
)

QUERIES["q183_incremental_pq_index"] = q183_incremental_pq_index
ORACLES["q183_incremental_pq_index"] = ORACLE_Q181
# q184: the batch half of the CDC feed (changes(cdf=True) value-gated)
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q184,
    q184_table_cdf_batch,
)

QUERIES["q184_table_cdf_batch"] = q184_table_cdf_batch
ORACLES["q184_table_cdf_batch"] = ORACLE_Q184
# q185: conditional MERGE (update-subset / conditional-delete /
# insert) — ANSI MERGE semantics replayed closed-form by the oracle
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q185,
    q185_table_merge,
)

QUERIES["q185_table_merge"] = q185_table_merge
ORACLES["q185_table_merge"] = ORACLE_Q185
# q186: column rename/drop via stable ids across a three-era history
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q186,
    q186_table_column_evolution,
)

QUERIES["q186_table_column_evolution"] = q186_table_column_evolution
ORACLES["q186_table_column_evolution"] = ORACLE_Q186
# q187: ANN refresh lifecycle — staleness trigger + atomic swap
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q187,
    q187_ann_refresh_lifecycle,
)

QUERIES["q187_ann_refresh_lifecycle"] = q187_ann_refresh_lifecycle
ORACLES["q187_ann_refresh_lifecycle"] = ORACLE_Q187
# q188: first-class composite merge keys — CDC batch applied by the
# real (l_orderkey, l_linenumber) tuple, never a derived hash
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q188,
    q188_table_composite_key,
)

QUERIES["q188_table_composite_key"] = q188_table_composite_key
ORACLES["q188_table_composite_key"] = ORACLE_Q188
# q189: deletion vectors — scattered deletes rewrite zero group files
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q189,
    q189_table_deletion_vectors,
)

QUERIES["q189_table_deletion_vectors"] = q189_table_deletion_vectors
ORACLES["q189_table_deletion_vectors"] = ORACLE_Q189
# q190: streaming CDC-apply — stream -> merge per micro-batch,
# exactly-once via txn epochs, full-replay no-op pinned
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q190,
    q190_stream_cdc_apply,
)

QUERIES["q190_stream_cdc_apply"] = q190_stream_cdc_apply
ORACLES["q190_stream_cdc_apply"] = ORACLE_Q190
# q191: delete-only merge on a dv table — erasure without rewrites
from sif_spark.queries_table import (  # noqa: E402
    ORACLE_Q191,
    q191_dv_erasure_merge,
)

QUERIES["q191_dv_erasure_merge"] = q191_dv_erasure_merge
ORACLES["q191_dv_erasure_merge"] = ORACLE_Q191

# Keep the catalog strictly q-number-ordered regardless of module
# registration order — the driver's correctness gate is the FIRST 50
# dict entries, and the tail-order pin (tests/test_plans.py::
# test_catalog_driver_window_stable) guards both properties.
_ordered = sorted(QUERIES, key=lambda k: int(k.split("_", 1)[0][1:]))
QUERIES = {k: QUERIES[k] for k in _ordered}
ORACLES = {k: ORACLES[k] for k in _ordered if k in ORACLES}
del _ordered
