"""Sif column-type surface mapped onto Spark SQL types.

The reference declares schemas explicitly with fixed-width column types
(reference: ``column_type.go:26-237``, ``column_type_variable.go:25-111``;
SURVEY.md §1.2). Spark/Tungsten owns physical layout, so the fixed
widths, little-endian encoding, row padding and nil-flag meta bytes all
disappear; what remains is the logical type mapping plus a schema
builder mirroring the reference's ``schema.CreateSchema()`` fluent API
(``schema/schema.go:44-60``).

Unsigned integers: Spark has no unsigned types. Following SURVEY.md
§1.2 we widen one level (u8→short, u16→int, u32→long, u64→decimal(20,0))
so every reference value is representable; overflow semantics therefore
differ from Go's wraparound — documented, not emulated.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Fixed-width types (reference: column_type.go)
# ---------------------------------------------------------------------------

BYTE = T.ByteType()                 # ByteColumnType (column_type.go:26-36)
BOOL = T.BooleanType()              # BoolColumnType (column_type.go:67-77)
INT8 = T.ByteType()                 # Int8ColumnType
INT16 = T.ShortType()               # Int16ColumnType
INT32 = T.IntegerType()             # Int32ColumnType
INT64 = T.LongType()                # Int64ColumnType (column_type.go:132-181)
UINT8 = T.ShortType()               # Uint8ColumnType — widened (no unsigned in Spark)
UINT16 = T.IntegerType()            # Uint16ColumnType — widened
UINT32 = T.LongType()               # Uint32ColumnType — widened
UINT64 = T.DecimalType(20, 0)       # Uint64ColumnType — widened (column_type.go:80-129)
FLOAT32 = T.FloatType()             # Float32ColumnType
FLOAT64 = T.DoubleType()            # Float64ColumnType (column_type.go:184-207)
TIME = T.TimestampType()            # TimeColumnType{Format} (column_type.go:210-222)
STRING = T.StringType()             # StringColumnType{Length} — fixed length is storage detail
BYTES = T.BinaryType()              # BytesColumnType{Length} (column_type.go:39-64)

# Variable-length types (reference: column_type_variable.go)
VARSTRING = T.StringType()          # VarStringColumnType (column_type_variable.go:25-60)
VARBYTES = T.BinaryType()           # VarBytesColumnType (column_type_variable.go:63-111)

_GO_TIME_TO_SPARK = {
    # Go reference-time layout fragments → Spark datetime pattern fragments.
    "2006": "yyyy", "01": "MM", "02": "dd",
    "15": "HH", "04": "mm", "05": "ss", ".000": ".SSS",
}


def go_time_format_to_spark(go_format: str) -> str:
    """Translate a Go time layout (e.g. ``2006-01-02 15:04:05``) to the
    Spark/Java pattern used by ``to_timestamp`` — supports the layouts the
    reference's ``TimeColumnType{Format}`` uses (column_type.go:210-222).
    """
    out = go_format
    for go_frag, spark_frag in _GO_TIME_TO_SPARK.items():
        out = out.replace(go_frag, spark_frag)
    return out


# ---------------------------------------------------------------------------
# Custom column types (reference: column_type.go:16-23, docs/custom-columntypes.md)
# ---------------------------------------------------------------------------
# The reference serializes arbitrary Go values to fixed-width bytes. In Spark
# the preferred mapping is a real nested type when the shape is known — e.g.
# the sparse-heatmap map[int]uint32 used by nyc_taxi_test.go:57-93:

HEATMAP = T.MapType(T.IntegerType(), T.LongType())

# Truly opaque payloads (multimodal blobs) stay BinaryType with a typed
# metadata struct alongside — see sif_spark.operators.multimodal.


def opaque(metadata_fields: dict[str, T.DataType] | None = None) -> T.StructType:
    """Typed envelope for an opaque custom column: raw bytes + metadata."""
    fields = [T.StructField("data", T.BinaryType(), True)]
    for name, dtype in (metadata_fields or {}).items():
        fields.append(T.StructField(name, dtype, True))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Schema builder (reference: schema/schema.go:44-60, 201-240)
# ---------------------------------------------------------------------------


@dataclass
class SchemaBuilder:
    """Fluent schema builder mirroring the reference's CreateSchema().

    ``create_column`` / ``rename_column`` / ``remove_column`` mirror
    ``schema/schema.go:201-240``; removal is immediate (Spark needs no
    deferred Repack — Tungsten manages layout).
    """

    _fields: list[T.StructField] = field(default_factory=list)

    def create_column(self, name: str, dtype: T.DataType, nullable: bool = True) -> "SchemaBuilder":
        if any(f.name == name for f in self._fields):
            raise ValueError(f"column {name!r} already exists")
        self._fields.append(T.StructField(name, dtype, nullable))
        return self

    def rename_column(self, old: str, new: str) -> "SchemaBuilder":
        for i, f in enumerate(self._fields):
            if f.name == old:
                self._fields[i] = T.StructField(new, f.dataType, f.nullable)
                return self
        raise KeyError(old)

    def remove_column(self, *names: str) -> "SchemaBuilder":
        self._fields = [f for f in self._fields if f.name not in names]
        return self

    def build(self) -> T.StructType:
        return T.StructType(list(self._fields))


def create_schema() -> SchemaBuilder:
    return SchemaBuilder()
