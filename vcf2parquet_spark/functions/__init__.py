"""Training-data pipeline operators over document/embedding tables.

Beyond the reference's encode capability, these are the operations a
100 TB training-data pipeline needs (deduplication, similarity search,
text analysis, multimodal plumbing) — each expressed with built-in
Catalyst operators wherever possible (JVM-side, whole-stage codegen),
dropping to vectorized Arrow UDFs only where semantics require it.
"""

from vcf2parquet_spark.functions.text import (
    language_id,
    quality_score,
    token_stats,
    fingerprint,
)
from vcf2parquet_spark.functions.dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_candidates,
    simhash,
    ngram_jaccard_pairs,
    embedding_near_dups,
    dedup_clusters,
)
from vcf2parquet_spark.functions.similarity import (
    cosine_topk,
    lsh_buckets,
    ivf_assign,
    ivf_train,
    ivf_topk,
)

__all__ = [
    "language_id", "quality_score", "token_stats", "fingerprint",
    "exact_dedup", "minhash_signatures", "lsh_candidates", "simhash",
    "ngram_jaccard_pairs", "embedding_near_dups", "dedup_clusters",
    "cosine_topk", "lsh_buckets",
    "ivf_assign", "ivf_train", "ivf_topk",
]
