from cdm_cbioportal_etl_spark.similarity.ann import (
    cosine_topk_bruteforce,
    ivfpq_ann,
    lsh_bucketed_ann,
    pq_ann,
    pq_codebooks,
    pq_encode,
)
from cdm_cbioportal_etl_spark.similarity.quantize import (
    dequantize_expr,
    quantized_embeddings,
)
from cdm_cbioportal_etl_spark.similarity.semdedup import semantic_dedup

__all__ = [
    "cosine_topk_bruteforce",
    "ivfpq_ann",
    "lsh_bucketed_ann",
    "pq_ann",
    "pq_codebooks",
    "pq_encode",
    "quantized_embeddings",
    "dequantize_expr",
    "semantic_dedup",
]
