"""Flatten / explode operators — the reference's signature moves
(SURVEY.md §2.4).

Scale note: ``explode`` is a narrow transformation (no shuffle); the
row multiplication happens partition-locally. ``flatten_struct`` is a
pure projection. Arrays-of-struct explode into child tables exactly
like the reference's expansion tables (transformation.py:321-389)
but without ever leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def flatten_struct(df: DataFrame, sep: str = "_") -> DataFrame:
    """E2 — recursive struct flatten: nested struct fields become
    top-level columns with ``sep``-joined names, matching
    flatten_json's dict naming (cleansing.py:32-33: flatten(d) →
    'a_b_c' keys). Arrays are kept as columns; see
    :func:`flatten_rows` for the array policy.

    Pure projection — no shuffle, stays in whole-stage codegen.
    """
    while True:
        struct_fields = [f for f in df.schema.fields if isinstance(f.dataType, StructType)]
        if not struct_fields:
            return df
        cols: list[Column] = []
        for f in df.schema.fields:
            if isinstance(f.dataType, StructType):
                for sub in f.dataType.fieldNames():
                    cols.append(F.col(f"`{f.name}`.`{sub}`").alias(f"{f.name}{sep}{sub}"))
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)


def flatten_rows(df: DataFrame, sep: str = "_") -> DataFrame:
    """E2 (arrays) — fully flatten: structs by name, arrays by
    posexploding to rows with a ``<name>{sep}pos`` index column.

    Deliberate deviation from flatten_json, which spreads list
    elements across columns ('a_0_b', 'a_1_b', …): a data-dependent
    column set is hostile to columnar storage and to 100 TB scans, so
    the engine normalizes list elements to rows instead — the index
    column preserves the information flatten_json keeps in the name.
    ``explode_outer`` keeps empty/null arrays as a NULL row so no
    parent record is lost during flattening (the reference's
    cleansing stage preserves all records; drop-empty semantics
    belong to the child-table explode, see :func:`explode_child`).
    """
    while True:
        df = flatten_struct(df, sep=sep)
        arrays = [f.name for f in df.schema.fields if isinstance(f.dataType, ArrayType)]
        if not arrays:
            return df
        name = arrays[0]
        others = [c for c in df.columns if c != name]
        df = df.select(
            *others,
            F.posexplode_outer(F.col(f"`{name}`")).alias(f"{name}{sep}pos", name),
        )


def deep_get(df: DataFrame, path: str, default: Column | None = None) -> Column:
    """P4 — dotted deep path with default (transformation.py:243-244:
    deep_get(x, 'geoTargeting', 'targetedLocations') → [] on miss).
    Spark struct access already yields NULL for null intermediates;
    this adds the schema-absent case and the caller's default."""
    parts = path.split(".")
    cur = df.schema
    for p in parts:
        if not isinstance(cur, StructType) or p not in cur.fieldNames():
            return default if default is not None else F.lit(None)
        cur = cur[p].dataType
    col = F.col(path)
    return F.coalesce(col, default) if default is not None else col


def explode_child(
    df: DataFrame,
    array_path: str,
    parent_keys: list[str],
    element_fields: dict[str, str] | None = None,
    keep_empty: bool = False,
) -> DataFrame:
    """E1/E4 — array-of-struct → child table.

    Reference: extend_columns_in_rows (transformation.py:45-56)
    np.repeats parent rows per array element and DROPS parents with
    empty arrays — plain ``explode`` has exactly those semantics;
    ``keep_empty=True`` switches to ``explode_outer``.

    ``element_fields`` maps element struct field → output name
    (transformation.py:329-336: x.get('id') → location_id etc.);
    absent fields surface as NULL like dict.get defaults.
    """
    ex = F.explode_outer if keep_empty else F.explode
    out = df.select(*parent_keys, ex(F.col(array_path)).alias("__elem"))
    if element_fields is None:
        return out.withColumnRenamed("__elem", "elem")
    elem_type = out.schema["__elem"].dataType
    cols: list[Column] = [F.col(k) for k in parent_keys]
    for src, dst in element_fields.items():
        if isinstance(elem_type, StructType) and src in elem_type.fieldNames():
            cols.append(F.col(f"__elem.{src}").alias(dst))
        else:
            cols.append(F.lit(None).alias(dst))
    return out.select(*cols)


def first_element(col: Column | str) -> Column:
    """P16 — first array element or NULL (transformation.py:392-393:
    label type = types[0]). try_element_at yields NULL on empty —
    plain element_at raises under Spark 4's default ANSI mode."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_element_at(c, F.lit(1))
