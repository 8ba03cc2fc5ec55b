"""Custom PySpark DataSource for the snapshot landing directory.

The modern (Spark 4) idiomatic form of the reference's ingestion surface:
instead of driver-side JSON plumbing, the landing directory becomes a
first-class ``spark.read.format("crypto_snapshots")`` source — one input
partition PER SNAPSHOT FILE, each parsed on an executor, emitting
bronze-fidelity rows (one per asset, every numeric still the API's
decimal string) with the envelope timestamp and source file attached.

Scale: partitions() lists files (driver metadata work); parsing runs
where the data is. A million snapshot files = a million independent
partitions with no driver involvement beyond the listing — the same
contract as Spark's own file sources. Filter pushdown on the file name
(time-ranged replays) happens naturally by pointing `path` at a narrower
glob.

The DataSource classes are built inside a factory so cloudpickle ships
them BY VALUE to Python workers — registration must not require this
package on the executors' import path (same rule as the numpy kernels in
operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# bronze-fidelity field order (ASSET_SCHEMA in json_source.py) + envelope
SNAPSHOT_DDL = (
    "id string, rank string, symbol string, name string, supply string, "
    "maxSupply string, marketCapUsd string, volumeUsd24Hr string, "
    "priceUsd string, changePercent24Hr string, vwap24Hr string, "
    "explorer string, tokens map<string, array<string>>, "
    "timestamp bigint, _source_file string"
)
ASSET_FIELDS = (
    "id",
    "rank",
    "symbol",
    "name",
    "supply",
    "maxSupply",
    "marketCapUsd",
    "volumeUsd24Hr",
    "priceUsd",
    "changePercent24Hr",
    "vwap24Hr",
    "explorer",
    "tokens",
)


def make_snapshot_datasource():
    """Build the DataSource class (locally defined -> pickled by value)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    ddl = SNAPSHOT_DDL
    fields = ASSET_FIELDS

    def list_files(root):
        import glob as globmod
        import os

        if os.path.isdir(root):
            root = os.path.join(root, "coincap_data_*.json")
        return sorted(globmod.glob(root))

    def parse_file(path):
        import json

        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
        ts = int(doc["timestamp"])
        for asset in doc.get("data", []):
            yield tuple(asset.get(k) for k in fields) + (ts, path)

    class SnapshotPartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class SnapshotReader(DataSourceReader):
        """Batch reader with FILE-LEVEL filter pushdown: the landing
        names encode the payload timestamp (quirk Q8, second precision),
        so comparisons on the ``timestamp`` column prune whole files at
        listing time. Pruning is conservative (the name floors the
        epoch-ms value to seconds, so bounds widen by 999 ms) and every
        filter is returned to Spark for exact re-evaluation — partial
        pushdown, never a correctness dependency."""

        def __init__(self, options):
            self.options = options
            self._lo = None  # inclusive lower bound on epoch-ms
            self._hi = None  # inclusive upper bound on epoch-ms

        def pushFilters(self, filters):
            from pyspark.sql.datasource import (
                EqualTo,
                GreaterThan,
                GreaterThanOrEqual,
                LessThan,
                LessThanOrEqual,
            )

            comparisons = (
                EqualTo,
                GreaterThan,
                GreaterThanOrEqual,
                LessThan,
                LessThanOrEqual,
            )
            for f in filters:
                if not isinstance(f, comparisons):
                    continue  # IsNotNull etc: Spark evaluates, no pruning
                if getattr(f, "attribute", None) != ("timestamp",):
                    continue
                v = f.value
                if not isinstance(v, int):
                    continue
                if isinstance(f, EqualTo):
                    self._lo = max(self._lo or v, v)
                    self._hi = min(self._hi if self._hi is not None else v, v)
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    self._lo = max(self._lo or v, v)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    self._hi = min(self._hi if self._hi is not None else v, v)
            return filters  # Spark re-evaluates everything exactly

        def _name_ms(self, path):
            import os
            import re
            from datetime import datetime, timezone

            m = re.search(r"coincap_data_(\d{8})_(\d{6})\.json$", os.path.basename(path))
            if not m:
                return None
            dt = datetime.strptime(
                m.group(1) + m.group(2), "%Y%m%d%H%M%S"
            ).replace(tzinfo=timezone.utc)
            return int(dt.timestamp() * 1000)

        def partitions(self):
            files = list_files(self.options["path"])
            kept = []
            for p in files:
                ms = self._name_ms(p)
                if ms is not None:
                    # name floors payload ms to the second: widen by 999
                    if self._lo is not None and ms + 999 < self._lo:
                        continue
                    if self._hi is not None and ms > self._hi:
                        continue
                kept.append(p)
            return [SnapshotPartition(p) for p in kept]

        def read(self, partition):
            yield from parse_file(partition.path)

    class SnapshotStreamReader(SimpleDataSourceStreamReader):
        """Incremental snapshot drain: the OFFSET is the set of file
        names already emitted (landing files are replay-stable-named and
        immutable — quirk Q8 — so name-set membership is exact-once).
        Each micro-batch emits every not-yet-seen snapshot; the
        checkpoint persists the offset dict, giving the same
        exactly-once contract as the built-in file source."""

        def __init__(self, options):
            self.options = options

        def initialOffset(self) -> dict:
            return {"seen": ""}

        def _emit(self, seen: set):
            import os

            new = [
                p for p in list_files(self.options["path"])
                if os.path.basename(p) not in seen
            ]
            for p in new:
                yield from parse_file(p)

        def read(self, start: dict):
            import os

            seen = set(filter(None, start.get("seen", "").split(",")))
            rows = list(self._emit(seen))
            names = sorted(
                seen | {os.path.basename(p) for p in list_files(self.options["path"])}
            )
            return iter(rows), {"seen": ",".join(names)}

        def readBetweenOffsets(self, start: dict, end: dict):
            # replay for recovery: emit files in end but not in start
            seen = set(filter(None, start.get("seen", "").split(",")))
            target = set(filter(None, end.get("seen", "").split(",")))
            import os

            for p in list_files(self.options["path"]):
                name = os.path.basename(p)
                if name in target and name not in seen:
                    yield from parse_file(p)

        def commit(self, end: dict) -> None:
            pass  # landing files are immutable; nothing to acknowledge

    class SnapshotDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "crypto_snapshots"

        def schema(self) -> str:
            return ddl

        def reader(self, schema):
            return SnapshotReader(self.options)

        def simpleStreamReader(self, schema):
            return SnapshotStreamReader(self.options)

    return SnapshotDataSource


def register_snapshot_source(spark: SparkSession) -> None:
    """Register ``crypto_snapshots`` for ``spark.read.format(...)``.
    Python-data-source filter pushdown is opt-in session-wide; the reader
    implements ``pushFilters`` (file-level timestamp pruning), and Spark
    ERRORS on a pushFilters-implementing source while the flag is off —
    so registration enables it."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(make_snapshot_datasource())
