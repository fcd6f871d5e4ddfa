from sum_spark.functions.vector import (
    cosine,
    cosine_range,
    cosine_sub,
    dot,
    dot_range,
    dot_sub,
    jaccard,
    jaccard_range,
    magnitude,
    vec_equal,
    vec_get,
    meta_get,
)

__all__ = [
    "cosine",
    "cosine_range",
    "cosine_sub",
    "dot",
    "dot_range",
    "dot_sub",
    "jaccard",
    "jaccard_range",
    "magnitude",
    "vec_equal",
    "vec_get",
    "meta_get",
]
