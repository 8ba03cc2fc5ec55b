"""Text-analysis column expressions with DuckDB oracle twins.

All pure expression work (split/filter/transform on arrays) — JVM-side,
codegen'd, no shuffle, no Python. Each Spark helper has a ``*_sql`` twin
emitting the equivalent DuckDB expression so corpus queries stay
differential-testable. At 100 TB these run entirely inside the scan stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (documents.text is single-space separated)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def tokens_sql(expr: str) -> str:
    return f"string_split({expr}, ' ')"


def distinct_tokens(col: Column | str) -> Column:
    return F.array_distinct(tokens(col))


def distinct_tokens_sql(expr: str) -> str:
    return f"list_distinct({tokens_sql(expr)})"


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles of a text column (n-gram set for jaccard /
    minhash). Empty array when the doc has < k tokens.

    NOTE: re-splits the text inside the per-element lambda (interpreted
    HOFs get no CSE), so this is O(tokens^2) per document — fine for
    one-off use; bulk pipelines should pre-split once and use
    :func:`shingles_of_tokens` on the array column."""
    name = col if isinstance(col, str) else None
    assert name is not None, "shingles() takes a column name (uses F.expr)"
    # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]) instead of being
    # empty, so short texts must short-circuit to an empty array
    return F.expr(
        f"CASE WHEN size(split({name}, ' ')) < {k} THEN array()"
        f" ELSE array_distinct(transform(sequence(1, size(split({name}, ' ')) - {k - 1}),"
        f" i -> concat_ws(' ', slice(split({name}, ' '), i, {k})))) END"
    )


def shingles_of_tokens(arr_col: str, k: int = 3) -> Column:
    """Distinct k-shingles over an ALREADY-SPLIT token array column —
    the linear-cost form for bulk shingling (the lambda only slices the
    bound array, no re-split per element). Short arrays (< k tokens)
    yield an empty set (see :func:`shingles` re sequence(1,0))."""
    return F.expr(
        f"CASE WHEN size({arr_col}) < {k} THEN array()"
        f" ELSE array_distinct(transform(sequence(1, size({arr_col}) - {k - 1}),"
        f" i -> concat_ws(' ', slice({arr_col}, i, {k})))) END"
    )


def shingles_sql(expr: str, k: int = 3) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len(string_split({expr}, ' ')) - {k - 1}, 0) + 1),"
        f" i -> array_to_string(list_slice(string_split({expr}, ' '), i, i + {k - 1}), ' ')))"
    )


def stopword_count(col: Column | str, stopwords: Sequence[str]) -> Column:
    """Number of tokens that are stopwords (with multiplicity)."""
    return F.size(F.filter(tokens(col), lambda t: t.isin(*stopwords)))


def stopword_count_sql(expr: str, stopwords: Sequence[str]) -> str:
    lst = ", ".join(f"'{s}'" for s in stopwords)
    return f"len(list_filter({tokens_sql(expr)}, t -> t IN ({lst})))"


def canonical_text(col: Column | str) -> Column:
    """Order-insensitive canonical form: sorted distinct tokens re-joined.
    Basis for token-set fingerprint dedup."""
    return F.concat_ws(" ", F.array_sort(distinct_tokens(col)))


def canonical_text_sql(expr: str) -> str:
    return f"array_to_string(list_sort({distinct_tokens_sql(expr)}), ' ')"
