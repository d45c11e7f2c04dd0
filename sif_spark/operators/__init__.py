"""Extension operators beyond the reference's surface.

The reference has no joins, windows, or function library (SURVEY.md
§2.5) — its users hand-write everything inside Go closures. These
modules provide the operators a large-scale training-data pipeline
needs, each built as DataFrame→DataFrame compositions of built-in
Spark ops (JVM-side, Catalyst-optimizable) with Pandas-UDF fallbacks
only where expressions genuinely cannot express the semantics.
"""

from sif_spark.operators.asof import asof_join
from sif_spark.operators.dedup import (
    duplication_profile,
    exact_dedup,
    exact_dedup_incremental,
    line_dedup,
    minhash_dedup_incremental,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_dedup_pairs,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
    embedding_near_dup_pairs,
)
from sif_spark.operators.joins import salted_join
from sif_spark.operators.layout import compact_parquet, write_zordered, zorder_key
from sif_spark.operators.ranking import global_rank, ntile_distributed
from sif_spark.operators.similarity import (
    IVFIndex,
    PQCodebook,
    extend_ivf_index,
    ivf_pq_knn,
    pq_encode,
    pq_knn,
    train_pq,
    brute_force_knn,
    build_ivf_index,
    cosine_all_pairs,
    ivf_knn,
    load_ivf_index,
    lsh_knn,
    lsh_similar_pairs,
    save_ivf_index,
)
from sif_spark.operators.timeseries import (
    mad_outliers,
    resample,
    session_stats,
    sessionize,
    zscore_outliers,
)
from sif_spark.operators.text import (
    common_token_score,
    gopher_repetition,
    gopher_signals,
    mix_corpus,
    mix_rates,
    tokenize,
    token_count,
    quality_score,
    language_id,
    fingerprint_md5,
    hash60,
    rolling_fingerprints,
    shingle_hash_rows,
    shingles,
)

__all__ = [
    "asof_join",
    "duplication_profile",
    "exact_dedup_incremental",
    "line_dedup",
    "minhash_dedup_incremental",
    "salted_join",
    "compact_parquet",
    "write_zordered",
    "zorder_key",
    "PQCodebook",
    "extend_ivf_index",
    "train_pq",
    "pq_encode",
    "pq_knn",
    "ivf_pq_knn",
    "resample",
    "sessionize",
    "session_stats",
    "zscore_outliers",
    "mad_outliers",
    "gopher_signals",
    "common_token_score",
    "gopher_repetition",
    "mix_rates",
    "mix_corpus",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_dedup_pairs",
    "near_dup_clusters",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_dup_pairs",
    "embedding_near_dup_pairs",
    "brute_force_knn",
    "cosine_all_pairs",
    "lsh_knn",
    "lsh_similar_pairs",
    "ivf_knn",
    "IVFIndex",
    "build_ivf_index",
    "save_ivf_index",
    "load_ivf_index",
    "global_rank",
    "ntile_distributed",
    "tokenize",
    "token_count",
    "quality_score",
    "language_id",
    "fingerprint_md5",
    "hash60",
    "rolling_fingerprints",
    "shingle_hash_rows",
    "shingles",
]
