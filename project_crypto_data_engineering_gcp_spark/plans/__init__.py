from .corpus import CorpusQuery, corpus_query, all_queries, get_query

# importing the query modules populates the registry
from . import queries_reference  # noqa: F401
from . import queries_text  # noqa: F401
from . import queries_dedup  # noqa: F401
from . import queries_similarity  # noqa: F401
from . import queries_multimodal  # noqa: F401
from . import queries_relational  # noqa: F401
from . import queries_olap  # noqa: F401
from . import queries_olap_deep  # noqa: F401
from . import queries_crypto  # noqa: F401
from . import queries_pandas  # noqa: F401
from . import queries_curation  # noqa: F401
from . import queries_graph  # noqa: F401

__all__ = ["CorpusQuery", "corpus_query", "all_queries", "get_query"]
