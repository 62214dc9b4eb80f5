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


def shingles_of_words(w: Column) -> Column:
    """Word 3-gram shingles from a WORDS column; < 3 words → empty array
    (the minhash family's shingle unit; SQL mirror: queries._SHINGLES_SQL).

    Formulated as zip_with over three slices (NOT element_at inside a
    transform lambda): lambda bodies that reference an outer *expression*
    make Catalyst re-evaluate that expression per array element — with the
    words-split inlined that was O(n_shingles) regex splits per row. All
    array expressions here sit in argument position → evaluated once per
    row. Pass a column ATTRIBUTE (words materialized in its own
    projection), not the split expression: `w` appears 6× below and HOF
    argument trees are interpreted, so repeated expressions re-evaluate
    (no codegen CSE inside CodegenFallback — confirmed via PLANS.md)."""
    n = F.greatest(F.size(w) - 2, F.lit(0))
    s1 = F.slice(w, F.lit(1), n)
    s2 = F.slice(w, F.lit(2), n)
    s3 = F.slice(w, F.lit(3), n)
    pair = F.zip_with(s1, s2, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.zip_with(pair, s3, lambda ab, c: F.concat(ab, F.lit(" "), c))
