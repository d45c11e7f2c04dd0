from sif_spark.streaming.stream import (
    rate_stream,
    read_parquet_stream,
    run_sif_stream,
    windowed_agg,
    sessionized,
    dedup_within_watermark,
)

__all__ = [
    "rate_stream",
    "read_parquet_stream",
    "run_sif_stream",
    "windowed_agg",
    "sessionized",
    "dedup_within_watermark",
]
