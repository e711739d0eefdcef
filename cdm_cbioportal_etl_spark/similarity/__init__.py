from cdm_cbioportal_etl_spark.similarity.ann import (
    cosine_topk_bruteforce,
    lsh_bucketed_ann,
)

__all__ = ["cosine_topk_bruteforce", "lsh_bucketed_ann"]
