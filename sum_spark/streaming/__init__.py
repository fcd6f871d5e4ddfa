from sum_spark.streaming.ann import (
    read_embedding_stream,
    streaming_ann_rerank,
    streaming_ann_scores,
    streaming_index_vectors,
)
from sum_spark.streaming.search import streaming_index_documents
from sum_spark.streaming.joins import (
    enrich_stream,
    make_parquet_batch_sink,
    purchases_after_signup,
    write_foreach_batch_parquet,
)
from sum_spark.streaming.stateful import running_user_totals
from sum_spark.streaming.windows import (
    dedup_events,
    read_event_stream,
    run_to_memory,
    sessionized,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "dedup_events",
    "read_embedding_stream",
    "streaming_ann_rerank",
    "streaming_ann_scores",
    "streaming_index_documents",
    "streaming_index_vectors",
    "enrich_stream",
    "make_parquet_batch_sink",
    "purchases_after_signup",
    "read_event_stream",
    "run_to_memory",
    "running_user_totals",
    "sessionized",
    "sliding_counts",
    "tumbling_counts",
    "write_foreach_batch_parquet",
]
