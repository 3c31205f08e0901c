"""First-class ENUM attribute surface: int codes + a symbol table.

The reference models enums as a schema-level concept — a column whose
values are small ints with an attached number<->name table
(reference: supersonic/base/infrastructure/tuple_schema.h:42-74,
EnumDefinition). Storage-wise the dict codec already covers low-cardinality
strings; this module adds the user-facing API: derive the symbol table,
swap symbols for dense codes (and back) with pure-codegen literal maps —
no shuffle, no UDF, broadcast-free (the map is a plan literal, fine for
enum-sized tables by contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# enums are "small by contract" (the reference keeps them in the schema);
# guard so nobody silently plans a million-entry literal map
_MAX_ENUM_SYMBOLS = 10_000


def enum_definition(df: DataFrame, col: str) -> list[str]:
    """The column's symbol table: sorted distinct non-null values. Codes
    are the sorted positions (0-based), deterministic on any engine."""
    rows = (df.select(col).filter(F.col(col).isNotNull())
              .distinct().orderBy(col).limit(_MAX_ENUM_SYMBOLS + 1).collect())
    if len(rows) > _MAX_ENUM_SYMBOLS:
        raise ValueError(f"{col} has >{_MAX_ENUM_SYMBOLS} symbols: not an enum")
    return [r[0] for r in rows]


def to_enum(df: DataFrame, col: str, symbols: list[str] | None = None,
            code_col: str | None = None) -> tuple[DataFrame, list[str]]:
    """Replace `col`'s symbols with int codes in `code_col` (default
    `<col>_code`). Returns (coded df, symbol table). Unknown/null symbols
    code as NULL. The map is a literal expression — whole-stage codegen,
    no join."""
    symbols = symbols if symbols is not None else enum_definition(df, col)
    code_col = code_col or f"{col}_code"
    kv = []
    for i, s in enumerate(symbols):
        kv += [F.lit(s), F.lit(i)]
    mapping = F.create_map(*kv)
    return df.withColumn(code_col,
                         mapping[F.col(col)].cast("int")), symbols


def from_enum(df: DataFrame, code_col: str, symbols: list[str],
              out_col: str) -> DataFrame:
    """Inverse of to_enum: codes back to symbols via a literal map."""
    kv = []
    for i, s in enumerate(symbols):
        kv += [F.lit(i), F.lit(s)]
    mapping = F.create_map(*kv)
    return df.withColumn(out_col, mapping[F.col(code_col)])
