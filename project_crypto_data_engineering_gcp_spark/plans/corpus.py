"""Registry of oracle-checked queries.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
with (optionally) an ANSI-SQL oracle string that DuckDB runs on the same
parquet tables. The driver's verify (and our own tests/test_corpus_parity)
compares row count + schema + order-insensitive value hash, so:

  - every computed column is aliased identically in both,
  - float aggregates go through exact decimal math (functions/numeric.py),
  - hashes use the cross-engine md5 scheme (functions/hashing.py),
  - all selections/rankings carry explicit tiebreakers.

Queries without an oracle (genuinely non-SQL-expressible ops) get the
driver's weaker rows-only check and a pytest-level semantic test instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CorpusQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    bench: bool = False  # include in bench.py headline set

    def __post_init__(self) -> None:
        object.__setattr__(self, "doc", self.doc or (self.fn.__doc__ or ""))


_REGISTRY: dict[str, CorpusQuery] = {}


def corpus_query(
    name: str, oracle: str | None = None, *, bench: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a corpus query with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate corpus query {name!r}")
        _REGISTRY[name] = CorpusQuery(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def all_queries() -> dict[str, CorpusQuery]:
    return dict(_REGISTRY)


def get_query(name: str) -> CorpusQuery:
    return _REGISTRY[name]
