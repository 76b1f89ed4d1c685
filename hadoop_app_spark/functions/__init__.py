from hadoop_app_spark.functions.dates import (
    date_str,
    day_end,
    day_start,
    epoch_millis,
    offset_days,
    offset_months,
    parse_ts,
)
from hadoop_app_spark.functions.normalize import min_max_score, safe_cast
from hadoop_app_spark.functions.text import (
    doc_fingerprint,
    language_id,
    ngrams,
    quality_score,
    token_count,
    tokenize,
)
from hadoop_app_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "parse_ts",
    "offset_days",
    "offset_months",
    "day_start",
    "day_end",
    "date_str",
    "epoch_millis",
    "min_max_score",
    "safe_cast",
    "tokenize",
    "token_count",
    "ngrams",
    "language_id",
    "quality_score",
    "doc_fingerprint",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
