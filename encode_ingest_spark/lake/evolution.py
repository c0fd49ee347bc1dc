"""Schema evolution: merge and align.

The reference relies on BigQuery's ``ignore_unknown_values`` + TDR's
append/merge update strategy and rebuilds schemas out-of-band (reference:
hack/README.md:91-103,141-152). Here evolution is a first-class,
metadata-only operation: adding a column or widening a type commits a new
schema version; data files written under older versions are *aligned* at
read time (missing column → typed null, widened type → cast). Nothing is
rewritten — at 100 TB a schema change must never touch data files.

Permitted widenings (the FIXTURES.md §2 upcast scenarios and their safe
closure): byte/short/int → long, float → double, any integral → double.
Narrowing or unrelated type changes raise ``SchemaEvolutionError``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaEvolutionError(ValueError):
    pass


_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_RANK = {
    "byte": 0,
    "short": 1,
    "integer": 2,
    "long": 3,
    "float": 10,
    "double": 11,
}


def _widened(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """The common widened type of a and b, or None if incompatible."""
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    if an in _RANK and bn in _RANK:
        ints = {"byte", "short", "integer", "long"}
        floats = {"float", "double"}
        if an in ints and bn in ints:
            return a if _RANK[an] >= _RANK[bn] else b
        if an in floats and bn in floats:
            return a if _RANK[an] >= _RANK[bn] else b
        # integral + floating → double (lossless for <=52-bit ints; the
        # FIXTURES stars float→double case routes through here)
        return T.DoubleType()
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        elem = _widened(a.elementType, b.elementType)
        if elem is not None:
            return T.ArrayType(elem, a.containsNull or b.containsNull)
    return None


def merge_schemas(
    current: T.StructType,
    incoming: T.StructType,
    protected: tuple[str, ...] = (),
) -> T.StructType:
    """current ∪ incoming with widening; column order = current then new."""
    cur = {f.name: f for f in current.fields}
    out: list[T.StructField] = []
    for f in current.fields:
        inc = next((g for g in incoming.fields if g.name == f.name), None)
        if inc is None or f.name in protected:
            out.append(f)
            continue
        w = _widened(f.dataType, inc.dataType)
        if w is None:
            raise SchemaEvolutionError(
                f"column {f.name}: cannot evolve {f.dataType.simpleString()} "
                f"-> {inc.dataType.simpleString()}"
            )
        out.append(T.StructField(f.name, w, f.nullable or inc.nullable))
    for g in incoming.fields:
        if g.name not in cur and g.name not in protected:
            # new columns join as nullable — old rows have no value for them
            out.append(T.StructField(g.name, g.dataType, True))
    return T.StructType(out)


def _relax_nullability(dt: T.DataType) -> T.DataType:
    """The same type with every nested nullability flag relaxed to
    true. Spark refuses to CAST e.g. array<string(nullable)> to
    array<string(non-null)> even though the representations are
    identical — and nullability is metadata, not layout, so casting to
    the relaxed shape is always safe."""
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_relax_nullability(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _relax_nullability(dt.keyType),
            _relax_nullability(dt.valueType),
            True,
        )
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _relax_nullability(f.dataType), True)
                for f in dt.fields
            ]
        )
    return dt


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project df onto target: missing columns become typed nulls, present
    columns are cast (widening only, guaranteed by merge_schemas). Columns
    whose type differs only in (nested) nullability are passed through
    untouched — same layout, and Spark rejects such casts. Pure column
    expressions — stays inside whole-stage codegen."""
    fields = df.schema.fields
    if len(fields) == len(target.fields) and all(
        a.name == b.name
        and a.dataType.simpleString() == b.dataType.simpleString()
        for a, b in zip(fields, target.fields)
    ):
        # already aligned (the steady-state no-evolution case): skip the
        # per-column re-projection — it is N py4j calls + a select per
        # scan group, pure driver fixed cost at micro-batch scale
        return df
    have = {f.name: f.dataType for f in fields}
    cols = []
    for f in target.fields:
        src = have.get(f.name)
        if src is None:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif src.simpleString() == f.dataType.simpleString():
            cols.append(F.col(f.name))  # equal up to nullability: no cast
        else:
            cols.append(
                F.col(f.name)
                .cast(_relax_nullability(f.dataType))
                .alias(f.name)
            )
    return df.select(*cols)
