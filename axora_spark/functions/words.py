"""THE whitespace-word tokenization — single definition (code-review
r5: three identical copies lived in queries.py, operators/neardup.py
and operators/decontam.py; every DuckDB oracle mirrors this exact idiom
as list_filter(string_split_regex(trim(text),'\\s+'), w -> w <> ''), so
a drift in any one copy silently breaks oracle parity)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORDS_SQL = ("list_filter(string_split_regex(trim(text), '\\s+'), "
             "w -> w <> '')")


def words_col(text: Column) -> Column:
    """Whitespace words, empties dropped — MUST match WORDS_SQL."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")
