"""sif_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of go-sif/sif, rebuilt Spark-first.

The reference (go-sif/sif, surveyed in SURVEY.md) is a Go map/reduce
dataframe library: fixed-width rows, opaque closures, a gRPC
coordinator/worker cluster. This package re-expresses its entire
user-facing surface — sources, parsers, schema ops, row transforms,
keyed reduction, accumulators, collect, streaming — as thin, typed
wrappers over the PySpark DataFrame API so Catalyst/Tungsten own all
physical execution, and extends it with the operator surface a
large-scale (100 TB) training-data pipeline needs: joins, windows,
SQL, dedup (exact/MinHash-LSH/SimHash), similarity search, text
analysis, and multimodal columns.

Design stance (SURVEY.md §7): declare logical plans with DataFrame/SQL
and never hand-schedule what the optimizer already does. Python touches
data only through Arrow-vectorized Pandas UDFs, and only where built-in
expressions genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

__all__ = [
    "get_session",
    "stop_session",
    "SifFrame",
    "sif_types",
    "Counter",
    "Adder",
    "Compose",
]

# Lazy re-exports (PEP 562). Eager package imports here were paid by
# every COLD sessionless Python worker Spark spawns for this package's
# DataSource — in particular the streaming source runner, which is a
# fresh `python -m pyspark.sql.streaming.python_streaming_source_runner`
# process per streaming QUERY (not daemon-forked, measured round 15):
# importing sif_spark.sources.table_stream there triggered this
# __init__, adding ~0.4-0.6 s of session/frame/accumulators imports per
# stream instance that the worker never uses (guide §4: control what
# crosses the Python boundary — including imports). `from sif_spark
# import get_session` etc. still work, one attribute access later.
_LAZY = {
    "get_session": ("sif_spark.session", "get_session"),
    "stop_session": ("sif_spark.session", "stop_session"),
    "SifFrame": ("sif_spark.frame", "SifFrame"),
    "sif_types": ("sif_spark.types", None),
    "Counter": ("sif_spark.accumulators", "Counter"),
    "Adder": ("sif_spark.accumulators", "Adder"),
    "Compose": ("sif_spark.accumulators", "Compose"),
}


def __getattr__(name: str):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
    import importlib

    mod = importlib.import_module(mod_name)
    value = mod if attr is None else getattr(mod, attr)
    globals()[name] = value  # cache: next access skips __getattr__
    return value
