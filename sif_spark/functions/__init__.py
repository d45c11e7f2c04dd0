"""Scalar/aggregate function surface.

The reference ships NO function library — every projection, predicate
and key extractor is a hand-written Go closure (SURVEY.md §2.3), with
`KeyColumns` (operations/transform/reduce.go:112-128) as its single
helper: xxhash64 over the raw bytes of named columns. Here the library
is `pyspark.sql.functions` itself (JVM-side, codegen'd); this module
re-exports it plus the sif-specific helpers so user code has one
import surface:

    from sif_spark import functions as SF
    df.select(SF.key_columns("a", "b"), SF.lower("a"), ...)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as _F
from pyspark.sql.functions import *  # noqa: F401,F403 — the full Spark surface

from sif_spark.operators.text import (  # noqa: F401 — text helpers
    bpe_token_count,
    fingerprint_md5,
    language_id,
    quality_score,
    rolling_hash_fingerprint,
    shingles,
    token_count,
    tokenize,
)
from sif_spark.types import go_time_format_to_spark


def key_columns(*cols: str) -> Column:
    """Compound shuffle key from named columns — the reference's
    `KeyColumns` KeyingOperation (xxhash64 of the columns' bytes,
    operations/transform/reduce.go:112-128). Use for explicit
    key-hash partitioning/salting; plain groupBy(*cols) is preferred
    when Catalyst should see the real keys."""
    return _F.xxhash64(*[_F.col(c) for c in cols])


def key_columns_portable(*cols: str) -> Column:
    """Engine-portable variant of :func:`key_columns`: hash60 of the
    unit-separator-joined string forms of the columns. Same compound-
    key contract, but DuckDB can replay it exactly
    (``CAST('0x'||substr(md5(concat_ws(chr(31),
    coalesce(CAST(c AS VARCHAR), chr(0)), ...)),1,15) AS BIGINT)``) —
    used where a key must cross the oracle boundary.

    Null contract: each column is ``coalesce``d to a NUL (``\\x00``)
    sentinel BEFORE joining — ``concat_ws`` silently skips nulls, which
    would make ('a', NULL) collide with ('a',)-shifted keys and merge
    distinct compound keys over nullable columns. NULL therefore hashes
    distinctly from any real string that doesn't contain NUL (matching
    ``key_columns``, whose xxhash64 distinguishes null positions)."""
    from sif_spark.operators.text import hash60

    parts = [_F.coalesce(_F.col(c).cast("string"), _F.lit("\x00")) for c in cols]
    return hash60(_F.concat_ws("\x1f", *parts))


def salted_key(*cols: str, buckets: int = 16) -> Column:
    """Skew-salting helper: a 64-bit shuffle key that spreads each
    logical key over ``buckets`` distinct values (key hash combined
    with a uniform salt). Repartition/group by this, aggregate
    partially per salted key, then finally per real key. Kept as the
    full hash (not mod buckets) so different logical keys never
    collapse onto each other."""
    salt = _F.floor(_F.rand() * buckets).cast("long")
    return _F.xxhash64(*[_F.col(c) for c in cols], salt)


def cents(col: str | Column) -> Column:
    """Exact integer cents from a 2-decimal double column — the
    engine-portable money representation used across the catalog."""
    c = _F.col(col) if isinstance(col, str) else col
    return _F.round(c * 100).cast("long")


def to_timestamp_go(col: str | Column, go_format: str) -> Column:
    """Parse a timestamp using a Go reference-time layout — the
    reference's TimeColumnType{Format} (column_type.go:210-222)."""
    c = _F.col(col) if isinstance(col, str) else col
    return _F.to_timestamp(c, go_time_format_to_spark(go_format))
