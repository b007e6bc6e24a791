from anofox_forecast_spark.webtext.dedup import (
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_dups,
    simhash_signatures,
)
from anofox_forecast_spark.webtext.similarity import (
    brute_force_cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from anofox_forecast_spark.webtext.text_stats import (
    language_id,
    quality_scores,
    token_counts,
)

__all__ = [
    "embedding_near_dups",
    "exact_dedup",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_near_dups",
    "simhash_signatures",
    "brute_force_cosine_topk",
    "ivf_cosine_topk",
    "lsh_cosine_topk",
    "language_id",
    "quality_scores",
    "token_counts",
]
