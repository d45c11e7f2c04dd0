"""Data sources — the reference's datasource/parser surface on Spark.

Reference (SURVEY.md §2.1): ``file.CreateDataFrame`` (glob → one
loader per file), ``memory.CreateDataFrame`` (static buffers),
``memorystream.CreateDataFrame`` (infinite generators), with DSV and
JSONL parsers. Spark's reader framework replaces loaders/parsers
wholesale; these modules keep the reference's configuration vocabulary
(PartitionSize, HeaderLines, Delimiter, NilValue, gjson paths) and
translate it to reader options.

The reference has NO sinks (results leave via Collect/Accumulate);
write paths live on SifFrame (write_parquet/csv/json) since practical
parity requires them.
"""

__all__ = [
    "read_dsv",
    "DSVConf",
    "read_jsonl",
    "JSONLConf",
    "from_rows",
    "from_pandas",
    "read_parquet",
    "read_table",
    "TABLES",
]

# Lazy re-exports (PEP 562) — same rationale as the package root: the
# cold per-query streaming source runner imports
# sif_spark.sources.table_stream, which triggers this __init__; the
# eager dsv/frame imports pulled pandas (~0.4 s) into a worker that
# never touches them.
_LAZY = {
    "read_dsv": ("sif_spark.sources.dsv", "read_dsv"),
    "DSVConf": ("sif_spark.sources.dsv", "DSVConf"),
    "read_jsonl": ("sif_spark.sources.jsonl", "read_jsonl"),
    "JSONLConf": ("sif_spark.sources.jsonl", "JSONLConf"),
    "from_rows": ("sif_spark.sources.memory", "from_rows"),
    "from_pandas": ("sif_spark.sources.memory", "from_pandas"),
    "read_parquet": ("sif_spark.sources.parquet", "read_parquet"),
    "read_table": ("sif_spark.sources.parquet", "read_table"),
    "TABLES": ("sif_spark.sources.parquet", "TABLES"),
}


def __getattr__(name: str):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
    import importlib

    value = getattr(importlib.import_module(mod_name), attr)
    globals()[name] = value
    return value
