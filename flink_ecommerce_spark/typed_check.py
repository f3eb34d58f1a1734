"""Typed (Arrow-level) Spark↔DuckDB result-type comparison.

The external correctness driver hashes *typed* materializations of
both result sets, so a DuckDB oracle whose final projection types a
column differently from the Spark plan fails the value hash even when
every cell is numerically equal. The canonical trap (VERDICT r06):
DuckDB types ``SUM(BIGINT)`` as HUGEINT (int128), which Arrow renders
as ``decimal128(38, 0)`` while Spark emits int64 — Python
``fetchall()`` collapses both to ``int``, so a value-level local gate
is structurally blind to the divergence. This module closes that gap:
map the Spark schema and the DuckDB ``.arrow()`` schema to a shared
canonical vocabulary and report any column whose canonical types
differ.

Rule it enforces (COVERAGE.md "Oracle encoding rule"): every integer
aggregate in an oracle's FINAL projection must be explicitly
``CAST(... AS BIGINT)``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa
    from pyspark.sql.types import StructType


def canonical_spark(dtype) -> str:
    """Canonical tag for a Spark SQL data type."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.LongType):
        return "int64"
    if isinstance(dtype, T.IntegerType):
        return "int32"
    if isinstance(dtype, T.ShortType):
        return "int16"
    if isinstance(dtype, T.ByteType):
        return "int8"
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        # float32 vs float64 both normalize to Python float in the
        # driver's materialization; only width-crossing int/decimal
        # drift has ever hashed differently.
        return "float"
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, T.BooleanType):
        return "bool"
    if isinstance(dtype, T.DateType):
        return "date"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # The session is UTC-pinned (session.py), so tz-aware and NTZ
        # timestamps materialize identically in the driver's compare —
        # r02-certified ts-carrying queries (asof_last_click,
        # interval_join) prove the driver does not split on tz-ness.
        return "timestamp"
    if isinstance(dtype, T.DecimalType):
        return f"decimal({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.ArrayType):
        return f"list<{canonical_spark(dtype.elementType)}>"
    if isinstance(dtype, T.BinaryType):
        return "binary"
    return f"other:{dtype.simpleString()}"


def canonical_arrow(atype) -> str:
    """Canonical tag for a pyarrow type as produced by DuckDB."""
    import pyarrow as pa

    if pa.types.is_int64(atype):
        return "int64"
    if pa.types.is_int32(atype):
        return "int32"
    if pa.types.is_int16(atype):
        return "int16"
    if pa.types.is_int8(atype):
        return "int8"
    if pa.types.is_floating(atype):
        return "float"
    if pa.types.is_string(atype) or pa.types.is_large_string(atype):
        return "string"
    if pa.types.is_boolean(atype):
        return "bool"
    if pa.types.is_date(atype):
        return "date"
    if pa.types.is_timestamp(atype):
        return "timestamp"
    if pa.types.is_decimal(atype):
        # DuckDB HUGEINT arrives as decimal128(38, 0).
        return f"decimal({atype.precision},{atype.scale})"
    if pa.types.is_list(atype) or pa.types.is_large_list(atype):
        return f"list<{canonical_arrow(atype.value_type)}>"
    if pa.types.is_binary(atype) or pa.types.is_large_binary(atype):
        return "binary"
    return f"other:{atype}"


def typed_mismatches(
    spark_schema: "StructType", arrow_schema: "pa.Schema"
) -> list[str]:
    """Columns (matched by name) whose canonical types differ.

    Returns human-readable ``"col: spark=<t> oracle=<t>"`` strings;
    empty list means the typed materializations agree. Columns present
    on only one side are reported too (the schema-name gate usually
    catches those first).
    """
    s = {f.name: canonical_spark(f.dataType) for f in spark_schema.fields}
    a = {f.name: canonical_arrow(f.type) for f in arrow_schema}
    out = []
    for name in sorted(set(s) | set(a)):
        ts, ta = s.get(name), a.get(name)
        if ts != ta:
            out.append(f"{name}: spark={ts} oracle={ta}")
    return out
