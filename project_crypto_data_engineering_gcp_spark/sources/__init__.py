from .tables import load_table, TESTDATA_TABLES
from .json_source import (
    RAW_ENVELOPE_SCHEMA,
    read_corrupt_json,
    read_raw_json,
    snapshot_filename,
    write_raw_snapshot,
)
from .http_source import default_fetcher, fixture_fetcher, ingest_snapshot
from .ledger import filter_new_files, read_ledger, record_ingested
from .sinks import (
    formatted,
    history_format,
    read_history,
    read_table,
    table_format,
    write_history,
)

__all__ = [
    "load_table",
    "TESTDATA_TABLES",
    "RAW_ENVELOPE_SCHEMA",
    "read_raw_json",
    "read_corrupt_json",
    "snapshot_filename",
    "write_raw_snapshot",
    "default_fetcher",
    "fixture_fetcher",
    "ingest_snapshot",
    "filter_new_files",
    "read_ledger",
    "record_ingested",
    "formatted",
    "history_format",
    "read_history",
    "read_table",
    "table_format",
    "write_history",
]
