from .tables import load_table, TESTDATA_TABLES

__all__ = ["load_table", "TESTDATA_TABLES"]
