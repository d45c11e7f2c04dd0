"""Text-analysis operators for training-data pipelines.

All hot-path logic is built-in Spark expressions (split/regexp/aggregate
— JVM-side, codegen'd, no Python in the loop), which is what survives a
100 TB corpus: tokenization and scoring are embarrassingly parallel
scans with zero shuffle.

The reference has no function library at all (SURVEY.md §2.5) — its
README tokenizes by hand inside a Go Map closure (README.md:160-170);
these are the first-class equivalents.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A small multilingual stopword table for the heuristic language id.
# Deliberately tiny and deterministic — a real pipeline would swap in
# fastText/CLD3 via a Pandas UDF (see language_id docstring).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}

# BPE-ish word/punctuation splitter: word pieces, numbers, or single
# non-space symbols — approximates subword pre-tokenization.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization → array<string>; drops empty tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count as a long."""
    return F.size(tokenize(col)).cast("long")


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish regex tokens (words / numbers / symbols)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), 0)).cast("long")


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: mean-word-length sanity,
    alpha ratio, and length saturation. Pure double arithmetic over
    length() counts — deterministic and engine-portable."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_tok = token_count(c).cast("double")
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    mean_word_len = F.when(n_tok > 0, n_alpha / n_tok).otherwise(F.lit(0.0))
    word_len_ok = F.when((mean_word_len >= 3.0) & (mean_word_len <= 10.0), 1.0).otherwise(0.5)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    length_sat = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = word_len_ok * 0.4 + alpha_ratio * 0.4 + length_sat * 0.2
    return F.when(n_tok == 0, F.lit(0.0)).otherwise(score)


def language_id(col: Column | str) -> Column:
    """Heuristic n-gram/stopword language id → 2-letter code or 'und'.

    Counts marker-word hits per language over the token array and takes
    the argmax (ties → lexicographically first code, deterministically).
    Expression-only, so it runs JVM-side; a production pipeline would
    substitute a fastText Pandas UDF with the same column contract.
    """
    toks = tokenize(F.lower(F.col(col) if isinstance(col, str) else col))
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(_LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def hash60(col: Column | str) -> Column:
    """Engine-portable 60-bit hash: the big-endian integer value of the
    first 15 hex chars of md5. Both engines share md5 and hex→int
    conversion, and 60 bits stays clear of BIGINT-overflow in ANSI mode:

    - Spark:  ``CAST(conv(substr(md5(x),1,15), 16, 10) AS BIGINT)``
    - DuckDB: ``CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)``

    Used by the oracle-checkable variants of the sketch operators
    (minhash / simhash / rolling fingerprint) so the driver's DuckDB
    differential can verify them value-for-value. xxhash64 stays the
    default in production paths — it's one JVM intrinsic vs md5's
    digest+hex+parse chain."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def fingerprint_md5(col: Column | str) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized, lowercased
    text. The canonical exact-dedup key — identical in any engine."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return F.md5(normalized)


def rolling_hash_fingerprint(col: Column | str, window: int = 8) -> Column:
    """Winnowing-style document sketch: the minimum of xxhash64 over
    every ``window``-token gram. Shift-tolerant dedup blocking key —
    two documents sharing any w-token run share the minimum with high
    probability.

    One xxhash64 per window position (a w-gram string hash) rather
    than a per-element polynomial lambda: higher-order-function lambdas
    evaluate interpreted in Spark, so the per-window work must be a
    single built-in call to stay cheap."""
    toks = tokenize(col)
    n = F.size(toks)
    idxs = F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1)))
    window_hash = F.transform(
        idxs, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, window)))
    )
    return F.array_min(window_hash)


def rolling_fingerprints(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    hash_fn: str = "xxhash64",
):
    """Winnowing-style rolling-hash sketch as a frame operator:
    (id, sketch) with sketch = min hash over every ``window``-token
    gram. Shift-tolerant dedup blocking key.

    Shape: posexplode tokens → per-doc lead() window rebuilds each gram
    as a scalar column → hash (codegen'd builtin, unlike the
    interpreted per-element lambda of the column-expression form) →
    min-groupBy with map-side combine. One shuffle on the doc id, which
    the window and the groupBy share. Docs with no tokens get
    hash("") — same contract as the column form.

    ``hash_fn='md5'`` switches to the engine-portable
    :func:`hash60`, making the sketch DuckDB-verifiable.
    """
    from pyspark.sql import Window

    hasher = hash60 if hash_fn == "md5" else F.xxhash64
    toks = df.select(F.col(id_col), tokenize(text_col).alias("__t"))
    exploded = toks.select(
        F.col(id_col),
        F.size("__t").alias("__n"),
        F.posexplode("__t").alias("__pos", "__tok"),
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    gram = F.concat_ws(
        " ", F.col("__tok"), *[F.lead("__tok", j).over(w) for j in range(1, window)]
    )
    sketches = (
        exploded.withColumn("__gram", gram)
        # window start positions only: 0 .. max(n-window, 0); for docs
        # shorter than the window the single pos-0 gram is the whole doc
        .filter(F.col("__pos") <= F.greatest(F.col("__n") - window, F.lit(0)))
        .groupBy(id_col)
        .agg(F.min(hasher(F.col("__gram"))).alias("sketch"))
    )
    empty_hash = hasher(F.lit(""))
    return (
        df.select(id_col)
        .join(sketches, id_col, "left")
        .withColumn("sketch", F.coalesce(F.col("sketch"), empty_hash))
    )


def shingle_hash_rows(
    df,
    text_col: str,
    id_col: str,
    k: int = 3,
    gram_hasher: "Callable[[Column], Column] | None" = None,
):
    """Distinct (id, hashed k-gram shingle) rows — the inverted-index /
    signature input shared by Jaccard and MinHash.

    Frame-operator form: posexplode tokens → per-doc lead() window
    rebuilds each gram as a scalar column → hash → distinct. The
    column-expression form (``shingles``) builds grams inside
    ``F.transform``, whose lambda evaluates interpreted per element —
    measured 4.5× slower at sf0.1. The distinct runs on (id, 8-byte
    hash), so the shuffle never carries gram strings.

    ``gram_hasher`` maps the gram Column to its hash Column
    (default xxhash64)."""
    from pyspark.sql import Window

    hasher = gram_hasher or F.xxhash64
    toks = df.select(F.col(id_col), F.posexplode(tokenize(text_col)).alias("__p", "__t"))
    w = Window.partitionBy(id_col).orderBy("__p")
    leads = [F.lead("__t", j).over(w).alias(f"__t{j}") for j in range(1, k)]
    grammed = toks.select(F.col(id_col), F.col("__t"), *leads).filter(
        F.col(f"__t{k-1}").isNotNull() if k > 1 else F.lit(True)
    )
    gram = F.concat_ws(" ", "__t", *[f"__t{j}" for j in range(1, k)])
    return grammed.select(F.col(id_col), hasher(gram).alias("shingle")).distinct()


def chunk_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
):
    """Split documents into overlapping token-window chunks — the
    standard context-window packing pre-pass of an LLM training
    pipeline (HF ``return_overflowing_tokens`` semantics): chunk i
    covers tokens [1 + i·stride, 1 + i·stride + chunk_tokens); chunks
    keep coming until the previous chunk has reached the document's
    end, so every token is covered and trailing fully-contained
    windows are not emitted. Returns (id, chunk_idx, n_tokens,
    chunk_text).

    Pure expression plan: sequence() start positions → filter →
    posexplode → slice/concat — zero shuffle, zero Python; the scan
    parallelism IS the chunk parallelism, which is what survives a
    100 TB corpus. Empty docs yield no chunks."""
    toks = tokenize(text_col)
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(1), n, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    # keep a start if it's the first OR the previous chunk stopped
    # short of the document end (otherwise this window is fully
    # contained in the previous one)
    kept = F.filter(
        starts, lambda s: (s == 1) | (s - stride + chunk_tokens - 1 < n)
    )
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(kept).alias("chunk_idx", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start"), chunk_tokens)
    return base.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def stratified_hash_sample(
    df,
    strata_col: str,
    rates: dict[str, int],
    id_col: str = "doc_id",
    default_pct: int = 0,
):
    """Deterministic per-stratum downsampling: keep a row iff
    ``hash60(id) mod 100 < pct(stratum)`` — the reproducible,
    engine-portable alternative to ``sample()`` for corpus budget
    enforcement (e.g. cap low-resource languages at 100%, downsample
    English to 25%). Zero shuffle — a scan-local filter whose
    selectivity Catalyst can't misestimate into a bad plan, and the
    same rows survive on ANY cluster size or partitioning (rng-based
    sampling is partition-order-dependent; a resampled 100 TB corpus
    must be re-creatable bit-for-bit for training reproducibility).

    ``rates``: stratum value → integer percent 0..100."""
    pct = F.lit(default_pct)
    for key, p in sorted(rates.items()):
        pct = F.when(F.col(strata_col) == key, F.lit(p)).otherwise(pct)
    bucket = F.pmod(hash60(F.col(id_col).cast("string")), F.lit(100))
    return df.filter(bucket < pct)


def repetition_stats(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 2,
):
    """Per-doc k-gram repetition: (id, total_grams, distinct_grams,
    repetition) with repetition = 1 − distinct/total — the standard
    boilerplate/spam quality signal (highly repetitive docs repeat
    the same n-grams; prose doesn't). Docs with no k-grams score 0.

    Same shape as ``shingle_hash_rows``: posexplode + per-doc lead()
    window builds each gram as a scalar column (codegen'd), then ONE
    groupBy(id) computes count + approx-free exact distinct over the
    8-byte gram hashes. The window and the groupBy share the same
    doc-id partitioning, so the whole thing is one shuffle."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.posexplode(tokenize(text_col)).alias("__p", "__t")
    )
    w = Window.partitionBy(id_col).orderBy("__p")
    leads = [F.lead("__t", j).over(w).alias(f"__t{j}") for j in range(1, k)]
    grammed = toks.select(F.col(id_col), F.col("__t"), *leads).filter(
        F.col(f"__t{k-1}").isNotNull() if k > 1 else F.lit(True)
    )
    gram_hash = F.xxhash64(F.concat_ws(" ", "__t", *[f"__t{j}" for j in range(1, k)]))
    stats = grammed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("total_grams"),
        F.countDistinct(gram_hash).alias("distinct_grams"),
    )
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("total_grams", F.lit(0)).alias("total_grams"),
            F.coalesce("distinct_grams", F.lit(0)).alias("distinct_grams"),
            F.when(
                F.col("total_grams").isNull() | (F.col("total_grams") == 0),
                F.lit(0.0),
            )
            .otherwise(
                1.0 - F.col("distinct_grams") / F.col("total_grams")
            )
            .alias("repetition"),
        )
    )


def distinctive_terms(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "lang",
    top_k: int = 3,
    max_df_frac: float = 0.5,
    min_len: int = 4,
):
    """Per-stratum keyword extraction without floats: the ``top_k``
    most frequent terms in each stratum, EXCLUDING corpus-common terms
    (document frequency > ``max_df_frac`` of all docs — the integer
    df-filter stand-in for idf, so the whole ranking is exact integer
    arithmetic and replays bit-identically in any engine) and terms
    shorter than ``min_len``. Returns (stratum, term, n_docs, rank);
    ties rank by term ascending, deterministically.

    Plan: one token explode feeds BOTH the per-(stratum, term) counts
    and the global df counts (distinct doc per term), each a partial
    agg; the rank window partitions by stratum — never global."""
    from pyspark.sql import Window

    total_docs = df.count()
    toks = df.select(
        F.col(id_col),
        F.col(strata_col),
        F.explode_outer(
            F.array_distinct(tokenize(F.lower(F.col(text_col))))
        ).alias("term"),
    ).filter(F.length("term") >= min_len)
    per_stratum = toks.groupBy(strata_col, "term").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    df_global = toks.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    rare = df_global.filter(F.col("__df") <= int(max_df_frac * total_docs)).select(
        "term"
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.col("n_docs").desc(), F.col("term")
    )
    return (
        per_stratum.join(rare, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(F.col(strata_col), "term", "n_docs", "rank")
    )


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-gram word shingles as array<string> — the unit set for
    Jaccard similarity and MinHash. Expression-built: sequence() over
    start positions + slice + concat, no UDF."""
    toks = tokenize(col)
    n = F.size(toks)
    starts = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return F.array_distinct(grams)


# ---------------------------------------------------------------------------
# PII scrubbing + URL extraction
# ---------------------------------------------------------------------------

# Patterns restricted to the RE2 ∩ java.util.regex dialect (no
# backrefs/lookaround) so the SAME literal runs in Spark and in any
# SQL oracle engine.
PII_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4": "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone": "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",
}


def redact_pii(
    df,
    text_col: str = "text",
    patterns: "dict[str, str] | None" = None,
    out_col: str | None = None,
):
    """Scrub PII from a text column: for each (name, regex) in
    ``patterns`` (default emails / IPv4 / phone shapes), count the
    matches in the ORIGINAL text into ``n_<name>`` and replace every
    occurrence with ``<NAME>``. The mandatory compliance pre-pass of a
    training-data pipeline.

    Pure JVM expressions (``regexp_count`` + chained
    ``regexp_replace``) — zero Python, zero shuffle; runs at scan
    parallelism over 100 TB and pushes through whole-stage codegen.
    Patterns are applied in dict order; counts are independent
    (each taken against the pre-redaction text)."""
    pats = patterns or PII_PATTERNS
    out = out_col or text_col
    src = F.col(text_col)
    cols: dict[str, Column] = {}
    red = src
    for name, pat in pats.items():
        cols[f"n_{name}"] = F.regexp_count(src, F.lit(pat)).cast("long")
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    cols[out] = red
    return df.withColumns(cols)


URL_PATTERN = "https?://[^ \\t\\n]+"
DOMAIN_PATTERN = "^https?://([^/:?#]+)"


def extract_urls(df, text_col: str = "text", id_col: str = "doc_id"):
    """One row per URL occurrence: (id, url, domain). URL matching and
    domain parsing are regex expressions shared verbatim with the SQL
    oracle dialect; the explode runs at scan parallelism (no shuffle).
    Downstream blocklist filtering / per-domain stats are ordinary
    relational ops on the result."""
    exploded = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)).alias(
            "url"
        ),
    )
    return exploded.withColumn(
        "domain", F.regexp_extract(F.col("url"), DOMAIN_PATTERN, 1)
    )


def domain_stats(
    urls,
    id_col: str = "doc_id",
    blocklist: "list[str] | None" = None,
):
    """Per-domain document reach over an ``extract_urls`` result:
    (domain, n_docs, n_urls), excluding ``blocklist`` domains — the
    filter step of URL-based corpus curation. One uniform-keyed
    shuffle; a blocklist of realistic size (even millions of domains)
    broadcast-joins, but a plain ``isin`` literal suffices for the
    common handful."""
    out = urls
    if blocklist:
        out = out.filter(~F.col("domain").isin(blocklist))
    return out.groupBy("domain").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("n_urls"),
    )


def pack_sequences(
    chunks,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tok_col: str = "n_tokens",
    target_tokens: int = 512,
    buckets: int = 64,
):
    """Pack chunk rows (e.g. `chunk_documents` output) into
    fixed-budget training sequences: each chunk is assigned a
    (bucket, bin) so every bin holds a contiguous run of chunks whose
    cumulative token count spans one ``target_tokens`` window — offset
    packing, the deterministic relational form of greedy sequence
    packing (each bin covers a contiguous ``target_tokens`` span of
    its stream; realized fill deviates from the target by less than
    one chunk in either direction, since a boundary-straddling chunk
    stays with the lower bin).

    Greedy packing is inherently sequential, so the corpus is first
    split into ``buckets`` independent streams by a portable hash of
    the doc id — each stream packs under its own window partition.
    That keeps the ONLY window per-bucket (parallelism = ``buckets``,
    never a global sort) and makes the result partitioning-independent
    AND engine-replayable: same rows → same bins on any cluster.
    Returns chunks + (bucket, bin_id, bin_offset)."""
    from pyspark.sql import Window

    b = F.pmod(hash60(F.col(id_col).cast("string")), F.lit(buckets))
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col, idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tok_col).over(w)
    return (
        chunks.withColumn("bucket", b)
        .withColumn("__cum", cum)
        .withColumn(
            "bin_id",
            F.floor((F.col("__cum") - F.col(tok_col)) / target_tokens).cast("long"),
        )
        .withColumn(
            "bin_offset",
            (F.col("__cum") - F.col(tok_col) - F.col("bin_id") * target_tokens).cast(
                "long"
            ),
        )
        .drop("__cum")
    )


def weighted_sample(
    df,
    weight_col: str,
    n: int,
    group_cols: "list[str] | None" = None,
    id_col: str = "doc_id",
):
    """Deterministic weighted sampling without replacement: the
    Efraimidis–Spirakis A-ES scheme with the random draw replaced by a
    portable hash — each row gets priority ``-ln(u)/w`` where
    ``u = (hash60(id)+1) / 2^60`` in (0, 1], and the ``n`` SMALLEST
    priorities per group win. Inclusion probability is proportional to
    ``weight_col`` (exactly the A-ES guarantee), yet the winners are a
    pure function of the ids: the same sample re-materializes on any
    cluster size, partitioning, or engine — what corpus-curation needs
    (rng-based sampling is partition-order-dependent and
    unreproducible at 100 TB).

    The rank window partitions by ``group_cols`` (or a single global
    group ONLY if none are given — at scale always pass groups, e.g.
    language or domain, so no single task sorts the world). Ties
    break by id, deterministically.

    A-ES requires strictly positive weights: rows with NULL or
    non-positive weight are excluded up front (a NULL priority would
    otherwise sort FIRST under Spark's asc-nulls-first default and
    steal sample slots — review r5)."""
    from pyspark.sql import Window

    df = df.filter(F.col(weight_col) > 0)
    u = (hash60(F.col(id_col).cast("string")) + 1) / F.lit(float(2**60))
    prio = -F.log(u) / F.col(weight_col)
    parts = group_cols or []
    w = Window.partitionBy(*parts).orderBy(F.col("__prio"), F.col(id_col))
    return (
        df.withColumn("__prio", prio)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__prio", "__rk")
    )


def clean_text(col: Column | str) -> Column:
    """Normalization pre-pass shared by fingerprinting and display:
    control characters (C0 + DEL) become spaces, whitespace runs
    collapse to one space, and the result is trimmed. Pure codegen
    regexp chain in the RE2 ∩ Java dialect, so an oracle replays it
    byte-for-byte; run it BEFORE `fingerprint_md5`/shingling so docs
    differing only in control noise dedup together. (Unicode NFC is
    deliberately out of scope for the expression path — the JVM has no
    built-in normalizer; route through a Pandas UDF if needed.)"""
    c = F.col(col) if isinstance(col, str) else col
    no_ctrl = F.regexp_replace(c, "[\\x00-\\x1F\\x7F]", " ")
    return F.trim(F.regexp_replace(no_ctrl, "\\s+", " "))


# Gopher (Rae et al. 2021, arXiv:2112.11446) repetition-free quality
# heuristics — the standard pre-training document filter battery.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with", "a")


def gopher_signals(
    col: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> Column:
    """Gopher-rule quality signals as ONE struct column: word count,
    mean word length, alpha-word fraction, symbol-to-word ratio
    ('#' and '...'), distinct-stopword hits, and the combined
    ``passes`` verdict (Rae et al. 2021 §A1.1 bounds: 50..100k words,
    mean word length in [3,10], >80% words with an alphabetic char,
    symbol ratio <0.1, ≥2 distinct stopwords).

    Pure codegen expressions over the token array — zero shuffle, zero
    Python, evaluated in the scan stage. Divisions are int/int → double
    in a fixed order, so both engines produce bit-identical doubles.

    Reference parity: sif's quality surface is the user's own Map
    lambda; this ships the published rule set as a first-class column.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = tokenize(c)
    n_words = F.size(words).cast("long")
    total_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.when(
        n_words > 0, total_len.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    frac_alpha = F.when(
        n_words > 0, n_alpha_words.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = F.when(
        n_words > 0,
        (n_hash + n_ellipsis).cast("double") / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(words, F.array(*[F.lit(s) for s in stopwords]))
    ).cast("long")
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (frac_alpha > 0.8)
        & (symbol_ratio < 0.1)
        & (stop_hits >= 2)
    )
    return F.struct(
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        symbol_ratio.alias("symbol_ratio"),
        stop_hits.alias("stop_hits"),
        passes.alias("passes"),
    )


def mix_rates(
    token_totals: dict[str, int],
    weights: dict[str, int],
    budget_tokens: int | None = None,
    resolution: int = 10_000,
) -> tuple[int, dict[str, int]]:
    """Resolve per-stratum acceptance rates for a token-budget corpus
    mixture. ``weights`` are integer mixture PARTS (e.g. web:7,
    books:2, code:1 → 70/20/10%); ``budget_tokens`` defaults to the
    largest budget no stratum can't fill without oversampling
    (min over strata of T_g·W/w_g). Returns ``(budget, {stratum:
    rate})`` with rate in [0, resolution] — keep a doc iff
    ``hash60(id) mod resolution < rate``.

    Everything is exact integer arithmetic (floor division), so the
    rates are reproducible on any engine from the same totals — no
    float mixture math to drift between a Spark run and its audit.
    """
    w_sum = sum(weights.values())
    present = {
        g: w
        for g, w in weights.items()
        if w > 0 and token_totals.get(g, 0) > 0
    }
    if not present:
        return 0, {}
    if budget_tokens is None:
        budget_tokens = min(
            token_totals[g] * w_sum // w for g, w in present.items()
        )
    rates = {
        g: min(
            resolution,
            budget_tokens * w * resolution // (w_sum * token_totals[g]),
        )
        for g, w in present.items()
    }
    return budget_tokens, rates


def mix_corpus(
    df,
    weights: dict[str, int],
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    budget_tokens: int | None = None,
    resolution: int = 10_000,
    keep_rate_col: bool = False,
):
    """Token-budget corpus mixing (the pretraining data-mixture op):
    downsample each stratum so kept tokens approximate the target
    mixture ``weights``, deterministically. Two steps:

    1. one tiny partial-agg job collects per-stratum token totals
       (rows = |strata| — same driver-visible class as resample's
       2-value span);
    2. a scan-local filter keeps a doc iff its portable hash bucket
       falls under the stratum's integer rate from :func:`mix_rates`.

    Zero shuffle of the corpus itself; the same documents survive on
    any cluster size / partitioning (hash-gated, not rng-gated) — a
    100 TB mixture must be re-creatable bit-for-bit for training
    reproducibility. ``keep_rate_col=True`` attaches the applied
    ``mix_rate`` (out of ``resolution``) for audit output.
    """
    totals = {
        r["s"]: r["t"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.sum(token_count(text_col)).alias("t"))
        .collect()
    }
    _, rates = mix_rates(totals, weights, budget_tokens, resolution)
    rate_col = F.lit(0)
    for g, r in sorted(rates.items()):
        rate_col = F.when(F.col(strata_col) == g, F.lit(r)).otherwise(rate_col)
    bucket = F.pmod(hash60(F.col(id_col).cast("string")), F.lit(resolution))
    out = df.filter(bucket < rate_col)
    if keep_rate_col:
        out = out.withColumn("mix_rate", rate_col.cast("long"))
    return out


def gopher_repetition(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    gram_n: int = 2,
):
    """Gopher repetition signals (Rae et al. 2021 §A1.1, table A1's
    intra-document battery) per document:

    - ``n_lines``, ``frac_dup_lines`` — fraction of line positions
      whose line occurs more than once IN THIS DOC,
    - ``frac_chars_dup_lines`` — fraction of the doc's characters
      inside those duplicated lines,
    - ``frac_chars_top_gram`` — fraction of characters covered by the
      most frequent ``gram_n``-gram (count × gram length / doc chars).

    Complements the cross-document signals: `repetition_stats` (bigram
    diversity), `duplication_profile` (corpus-wide spans), and
    `line_dedup` (removal). These are the *filter* signals — a doc
    past the Gopher bounds is dropped whole.

    Scale design: per-doc line/gram counting runs as groupBys keyed by
    (doc id, content hash) — uniform composite keys with map-side
    partials, NOT per-doc higher-order array lambdas (interpreted, and
    quadratic in lines for the duplicate test). Ties for the top gram
    break deterministically by (count, gram) so results are
    engine-reproducible.
    """
    import re as _re

    spark_len = F.length
    total = df.select(
        F.col(id_col).alias("__id"),
        spark_len(text_col).cast("long").alias("__chars"),
    )
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.filter(F.split(F.col(text_col), _re.escape(sep)), lambda x: x != "")
        ).alias("__line"),
    )
    per_line = lines.groupBy("__id", "__line").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    line_stats = per_line.groupBy("__id").agg(
        F.sum("__cnt").cast("long").alias("n_lines"),
        F.sum(F.when(F.col("__cnt") > 1, F.col("__cnt")).otherwise(0))
        .cast("long")
        .alias("__dup_positions"),
        F.sum(
            F.when(
                F.col("__cnt") > 1, F.col("__cnt") * spark_len("__line")
            ).otherwise(0)
        )
        .cast("long")
        .alias("__dup_chars"),
    )
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokenize(text_col)).alias("__p", "__t"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__id").orderBy("__p")
    leads = [F.lead("__t", j).over(w).alias(f"__t{j}") for j in range(1, gram_n)]
    grammed = toks.select("__id", F.col("__t"), *leads).filter(
        F.col(f"__t{gram_n-1}").isNotNull() if gram_n > 1 else F.lit(True)
    )
    gram = F.concat_ws(" ", "__t", *[f"__t{j}" for j in range(1, gram_n)])
    top = (
        grammed.select("__id", gram.alias("__g"))
        .groupBy("__id", "__g")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .groupBy("__id")
        .agg(F.max(F.struct("__cnt", "__g")).alias("__top"))
        .select(
            "__id",
            (
                F.col("__top.__cnt") * spark_len("__top.__g")
            ).cast("long").alias("__top_chars"),
        )
    )
    return (
        total.join(line_stats, "__id", "left")
        .join(top, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.when(
                F.coalesce("n_lines", F.lit(0)) > 0,
                F.col("__dup_positions").cast("double")
                / F.col("n_lines").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("frac_dup_lines"),
            F.when(
                F.col("__chars") > 0,
                F.coalesce("__dup_chars", F.lit(0)).cast("double")
                / F.col("__chars").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("frac_chars_dup_lines"),
            F.when(
                F.col("__chars") > 0,
                F.coalesce("__top_chars", F.lit(0)).cast("double")
                / F.col("__chars").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("frac_chars_top_gram"),
        )
    )


def common_token_score(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    vocab_df=None,
):
    """Corpus-frequency quality signal (the classic common-token /
    OOV filter): score each document by how much of it is made of
    tokens the corpus itself uses at least ``min_count`` times.
    Returns ``(id, n_tokens, n_oov, oov_frac)`` — a high OOV fraction
    marks gibberish, boilerplate hashes, or wrong-language text
    relative to THIS corpus (no external model needed, which is why
    this filter appears in every from-scratch pipeline).

    Two passes: (1) one partial-agg token count builds the vocab —
    threshold by count, NOT top-K, so no global ordering is needed
    and the vocab derives deterministically; (2) the doc's tokens
    anti-check against the vocab on the uniform 8-byte token hash.
    Pass a precomputed ``vocab_df`` (from a previous run or a
    reference corpus) to skip pass 1 — scoring new data against a
    frozen vocabulary is the production shape.

    Scale: both shuffles key on xxhash64(token); the head word "the"
    is a hot COUNT key but partial aggregation absorbs it map-side,
    and the vocab join matches ≤1 row per hash. Linear in corpus
    tokens; no collect, no window.
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokenize(text_col)).alias("__t"),
    ).withColumn("__h", F.xxhash64("__t"))
    if vocab_df is None:
        vocab_df = (
            toks.groupBy("__h")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .filter(F.col("__cnt") >= min_count)
            .select("__h", F.lit(1).alias("__known"))
        )
    flagged = toks.join(vocab_df.select("__h", "__known"), "__h", "left")
    return (
        flagged.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__known").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            "n_oov",
            (
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")
            ).alias("oov_frac"),
        )
    )


def assign_split(
    df: DataFrame,
    key_col: str | Column,
    splits: dict[str, float] | None = None,
    salt: str = "split-v1",
    hash_fn: str = "xxhash64",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic, leak-proof train/val/test assignment: bucket =
    hash(salt ⊕ key) mod 10000, mapped to cumulative split boundaries
    in basis points. Because the bucket is a pure function of the KEY
    (pass the dedup content hash or canonical URL, never a row
    number), the same document lands in the same split across runs,
    machines, partitionings, and corpus versions — an append-only
    corpus never migrates documents between train and eval, which is
    the leakage property `rand()`-based splits lose on every re-run.
    The ``salt`` versions the assignment: bump it to re-deal all
    splits deliberately.

    ``splits`` maps name → fraction (insertion order = bucket order);
    fractions must be non-negative, sum to 1, and land on exact basis
    points (1/10000) so the boundary arithmetic is integer-exact.
    ``hash_fn="hash60"`` is the engine-portable oracle mode (md5-
    based, replayable in any SQL engine); xxhash64 is the production
    default (one JVM intrinsic).

    Scale notes: one expression per row — no shuffle, no state, no
    Python; whole-stage codegen end to end. Composes before
    `pack_sequences`/`stratified_sample` in a pipeline.
    """
    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    if hash_fn not in ("xxhash64", "hash60"):
        raise ValueError(f"hash_fn must be 'xxhash64' or 'hash60', got {hash_fn!r}")
    if not splits or any(v < 0 for v in splits.values()):
        raise ValueError("splits must be non-empty with non-negative fractions")
    bps = {name: round(frac * 10000) for name, frac in splits.items()}
    for name, frac in splits.items():
        if abs(bps[name] - frac * 10000) > 1e-6:
            raise ValueError(
                f"split {name!r} fraction {frac} is not an exact basis "
                f"point (multiple of 0.0001)"
            )
    if sum(bps.values()) != 10000:
        raise ValueError(
            f"split fractions must sum to 1.0, got {sum(bps.values())/10000}"
        )
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    salted = F.concat_ws("\x1f", F.lit(salt), key.cast("string"))
    h = F.xxhash64(salted) if hash_fn == "xxhash64" else hash60(salted)
    bucket = F.pmod(h, F.lit(10000))
    expr = None
    cum = 0
    names = list(bps)
    for name in names[:-1]:
        cum += bps[name]
        branch = F.when(bucket < cum, F.lit(name))
        expr = branch if expr is None else expr.when(bucket < cum, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


#: Tracking query parameters stripped by canonicalize_url — the
#: standard analytics/click-id junk that fragments URL identity.
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "msclkid", "mc_eid",
)

#: Anchored regex matching one tracking query parameter (with or
#: without a value) — shared VERBATIM with the SQL oracle.
TRACKING_PARAM_RE = "^(" + "|".join(TRACKING_PARAMS) + ")(=.*)?$"


def canonicalize_url(col: Column | str, strip_www: bool = False) -> Column:
    """Canonical URL identity for URL-level dedup (the crawl-pipeline
    companion to content dedup): strip the fragment, lowercase scheme
    and host, drop default ports (http:80 / https:443), drop tracking
    query parameters (TRACKING_PARAMS), SORT the surviving parameters
    (param order is transport noise, not identity), normalize an
    empty path to "/" and drop a trailing "/" on non-root paths, and
    optionally strip a leading "www.". Everything is regex/array
    expressions — the same algebra the DuckDB oracle replays — so two
    engines agree on every byte of the canonical form. Strings
    without a scheme://host shape pass through trimmed-and-
    defragmented rather than erroring (curation filters decide their
    fate, not the canonicalizer).

    Scale notes: one expression tree per row, zero shuffle, whole-
    stage codegen; feed the result to exact_dedup / assign_split as
    the identity key."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(F.trim(c), r"#.*$", "")  # fragment off first
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(rest, r"^[^/?]*(/[^?]*)?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qstr = F.array_join(params, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (host != ""), rebuilt).otherwise(F.trim(c))


#: Candidate payment-card shape: 13-19 digits, optionally broken by
#: single spaces or dashes (the layouts cards are actually typed in).
CARD_CANDIDATE_RE = r"\b\d(?:[ -]?\d){12,18}\b"


def luhn_check(digits: Column | str) -> Column:
    """Luhn mod-10 checksum over a digits-only string — TRUE iff the
    check digit validates. Pure array algebra (reverse → per-position
    double-every-second → digit sum → mod 10), integer-exact and
    shared with the SQL oracle: from the right, position 0 keeps d,
    odd positions contribute 2d − 9·(d>4)."""
    c = F.col(digits) if isinstance(digits, str) else digits
    chars = F.split(F.reverse(c), "")
    contrib = F.zip_with(
        chars,
        F.sequence(F.lit(0), F.greatest(F.size(chars) - 1, F.lit(0))),
        lambda ch, i: F.when(
            i % 2 == 0, ch.cast("int")
        ).otherwise(
            ch.cast("int") * 2 - F.when(ch.cast("int") > 4, 9).otherwise(0)
        ),
    )
    total = F.aggregate(contrib, F.lit(0), lambda acc, x: acc + F.coalesce(x, F.lit(0)))
    return (F.length(c) >= 1) & (total % 10 == 0)


def redact_card_numbers(
    df,
    text_col: str = "text",
    out_col: str | None = None,
) -> "DataFrame":
    """Checksum-VALIDATED payment-card redaction — the upgrade over
    shape-only regexes, which burn random 16-digit ids, order
    numbers, and hashes (a real corpus is full of them): every
    13-19-digit candidate run is extracted, Luhn-checked, and only
    validating numbers are replaced with ``<CARD>``; non-validating
    runs stay untouched. Adds ``n_card_candidates`` and ``n_cards``
    (validated) counts.

    Pure JVM expressions: regexp_extract_all → per-candidate Luhn
    via the same array algebra the oracle replays → targeted
    regexp_replace of only the validated literals. Zero Python, zero
    shuffle."""
    out = out_col or text_col
    src = F.col(text_col)
    cands = F.regexp_extract_all(src, F.lit(CARD_CANDIDATE_RE), 0)
    digits = F.transform(cands, lambda s: F.regexp_replace(s, "[ -]", ""))
    valid = F.filter(digits, lambda d: luhn_check(d))
    # replace each VALIDATED candidate literally: rewrite its digit
    # string into a per-character optional-separator regex
    red = F.aggregate(
        F.filter(cands, lambda s: luhn_check(F.regexp_replace(s, "[ -]", ""))),
        src,
        lambda acc, lit: F.replace(acc, lit, F.lit("<CARD>")),
    )
    return df.withColumns(
        {
            "n_card_candidates": F.size(cands).cast("long"),
            "n_cards": F.size(valid).cast("long"),
            out: red,
        }
    )
