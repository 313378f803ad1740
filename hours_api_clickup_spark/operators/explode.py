"""Row-multiplying / denormalizing operators (E1-E3).

- ``split_explode_with_empty`` (E1): the accounts M:N bridge fan-out
  (``fetch_clickup_data.py:552-558,600-611``). Comma-separated text →
  trimmed, empty-dropped tokens; one output row per token; **an empty
  token set emits exactly one row with ''** (the reference emits '', not
  null — plain ``explode_outer`` would be wrong).
- ``joined_ids_from_links`` (E2): array-of-structs → ', '-joined id text
  (``fetch_clickup_data.py:742-748``).
- ``joined_usernames`` (E3): assignee structs → ', '-joined usernames
  (``fetch_clickup_data.py:596-598``).

All pure Catalyst higher-order functions — no UDFs, fully codegen'd, and
``explode`` parallelizes per input partition with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_tokens_with_empty(col: Column | str, sep: str = ",") -> Column:
    """CSV text → array of trimmed non-empty tokens; [''] when none."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(
        F.transform(F.split(F.coalesce(c, F.lit("")), sep), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return F.when(F.size(toks) > 0, toks).otherwise(F.array(F.lit("")))


def split_explode_with_empty(
    df: DataFrame, src_col: str, out_col: str, sep: str = ","
) -> DataFrame:
    """One row per token of ``src_col``; exactly one ''-row when empty."""
    return df.withColumn(
        out_col, F.explode(split_tokens_with_empty(src_col, sep))
    ).drop(src_col)


def joined_ids_from_links(col: Column | str) -> Column:
    """array<struct(id,...)> → ', '-joined id string; '' when null/empty."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.array_join(F.transform(c, lambda x: x["id"].cast("string")), ", "),
        F.lit(""),
    )


def joined_usernames(col: Column | str) -> Column:
    """array<struct(username,...)> → ', '-joined username string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.array_join(F.transform(c, lambda x: x["username"]), ", "), F.lit("")
    )
