from hadoop_app_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    simhash_dup_groups,
)
from hadoop_app_spark.operators.joins import anti_join, asof_join, equi_join, range_join, semi_join
from hadoop_app_spark.operators.multimodal import (
    attach_media_meta,
    extract_image_features,
    frame_sample_plan,
)
from hadoop_app_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dups,
    lsh_bucket,
    lsh_topk,
)
from hadoop_app_spark.operators.topk import global_top_k, top_k_per_group

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "simhash",
    "simhash_dup_groups",
    "ngram_jaccard",
    "equi_join",
    "semi_join",
    "anti_join",
    "range_join",
    "asof_join",
    "attach_media_meta",
    "extract_image_features",
    "frame_sample_plan",
    "brute_force_topk",
    "lsh_topk",
    "lsh_bucket",
    "embedding_near_dups",
    "top_k_per_group",
    "global_top_k",
]
