from sif_spark.streaming.stream import (
    rate_stream,
    read_parquet_stream,
    run_sif_stream,
    windowed_agg,
    sessionized,
    running_reduce,
    interval_join,
    dedup_within_watermark,
)

__all__ = [
    "rate_stream",
    "read_parquet_stream",
    "run_sif_stream",
    "windowed_agg",
    "sessionized",
    "running_reduce",
    "interval_join",
    "dedup_within_watermark",
]
