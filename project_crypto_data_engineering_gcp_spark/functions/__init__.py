from .numeric import dec, dsum, dsum_expr_sql
from .hashing import md5_long, md5_long_sql

__all__ = ["dec", "dsum", "dsum_expr_sql", "md5_long", "md5_long_sql"]
