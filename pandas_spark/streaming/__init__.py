from pandas_spark.streaming.core import (
    heavy_hitters_stream,
    read_stream_parquet,
    read_stream_json,
    resample_stream,
    running_agg_stream,
    enrich_join_stream,
    sliding_window_stream,
    session_window_stream,
    tolerance_join_stream,
    dedup_stream,
    exact_dedup_stream,
    run_to_memory,
)

__all__ = [
    "heavy_hitters_stream",
    "dedup_stream",
    "exact_dedup_stream",
    "read_stream_json",
    "read_stream_parquet",
    "resample_stream",
    "running_agg_stream",
    "run_to_memory",
    "session_window_stream",
    "enrich_join_stream",
    "sliding_window_stream",
    "tolerance_join_stream",
]
