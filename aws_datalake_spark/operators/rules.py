"""Config-driven projection compiler.

Reference semantics (/root/reference/transformation.py:259-283): each
transformation rule maps an input column to a final column; rules of
``type == 'dict'`` parse a serialized JSON column, flatten one level
(json_normalize with an ``old_`` prefix) and pick one nested field;
missing fields materialize as NULL.

Spark-first re-expression: the whole rule list compiles into ONE
``select`` — a single narrow projection that Catalyst prunes columns
through, instead of the reference's per-rule pandas column copies.
For nested access Spark returns NULL for absent struct fields
natively, matching the reference's ``only_dict``/``deep_get``
defaults (transformation.py:36-42, 243-244).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class Rule:
    """One projection rule.

    ``old``: source column; may be a dotted path into a struct
    (``startDateTime.date.year``) for nested rules.
    ``final``: output column name.
    ``kind``: 'plain' (column copy / rename), 'nested' (struct path
    extraction), or 'json' (parse a JSON-string column with
    ``json_schema`` then extract ``old``'s dotted path).
    """

    old: str
    final: str
    kind: str = "plain"
    json_schema: str | StructType | None = None

    def to_column(self, df: DataFrame) -> Column:
        if self.kind == "plain":
            return F.col(self.old).alias(self.final)
        if self.kind == "nested":
            return _nested_path(df, self.old).alias(self.final)
        if self.kind == "json":
            root, _, rest = self.old.partition(".")
            parsed = F.from_json(F.coalesce(F.col(root), F.lit("{}")), self.json_schema)
            col = parsed
            for part in rest.split(".") if rest else []:
                col = col.getField(part)
            return col.alias(self.final)
        raise ValueError(f"unknown rule kind: {self.kind}")


def _nested_path(df: DataFrame, path: str) -> Column:
    """Dotted-path struct access that yields NULL (not an error) when
    an intermediate field does not exist in the schema at all —
    matching json_normalize's behavior for absent keys
    (transformation.py:275-280: missing mapping column → NaN)."""
    parts = path.split(".")
    schema = df.schema
    cur: StructType | None = schema
    for p in parts:
        if cur is None or not isinstance(cur, StructType) or p not in cur.fieldNames():
            return F.lit(None)
        field = cur[p].dataType
        cur = field if isinstance(field, StructType) else None
    return F.col(path)


def compile_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Apply a rule list as a single projection."""
    return df.select(*[r.to_column(df) for r in rules])


def rules_from_config(config: list[dict]) -> list[Rule]:
    """Build rules from reference-shaped config dicts
    ({'old_column_name', 'final_column_name', 'type',
    'mapping_column_name'} — transformation.py:259-283)."""
    out: list[Rule] = []
    for c in config:
        if c.get("type") == "dict":
            out.append(
                Rule(
                    old=f"{c['old_column_name']}.{c['mapping_column_name']}",
                    final=c["final_column_name"],
                    kind="nested",
                )
            )
        else:
            out.append(Rule(old=c["old_column_name"], final=c["final_column_name"]))
    return out
