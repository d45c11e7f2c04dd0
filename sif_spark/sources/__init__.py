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

from sif_spark.sources.dsv import read_dsv, DSVConf
from sif_spark.sources.jsonl import read_jsonl, JSONLConf
from sif_spark.sources.memory import from_rows, from_pandas
from sif_spark.sources.parquet import read_parquet, read_table, TABLES

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
