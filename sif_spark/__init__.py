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

from sif_spark.session import get_session, stop_session
from sif_spark.frame import SifFrame
from sif_spark import types as sif_types
from sif_spark.accumulators import Counter, Adder, Compose

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
