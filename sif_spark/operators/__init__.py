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
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_dedup_pairs,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
    embedding_near_dup_pairs,
)
from sif_spark.operators.ranking import global_rank, ntile_distributed
from sif_spark.operators.similarity import (
    IVFIndex,
    brute_force_knn,
    build_ivf_index,
    cosine_all_pairs,
    ivf_knn,
    load_ivf_index,
    lsh_knn,
    lsh_similar_pairs,
    save_ivf_index,
)
from sif_spark.operators.text import (
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
