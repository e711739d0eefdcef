from cdm_cbioportal_etl_spark.text.dedup import (
    connected_components,
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_fingerprint,
)
from cdm_cbioportal_etl_spark.text.analysis import (
    document_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from cdm_cbioportal_etl_spark.text.curation import (
    contamination_check,
    mixture_sample,
    pack_sequences,
    pii_mask,
    quality_percent_rank_filter,
    split_assign,
    vocab_top_terms,
)

__all__ = [
    "connected_components",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_fingerprint",
    "document_fingerprint",
    "language_id",
    "quality_score",
    "token_count",
    "contamination_check",
    "mixture_sample",
    "pack_sequences",
    "pii_mask",
    "quality_percent_rank_filter",
    "split_assign",
    "vocab_top_terms",
]
