from .latest import latest_snapshot
from .topk import top_k, top_bottom_union
from .share import with_share_of_total
from .classify import when_chain
from .asof import asof_join

__all__ = [
    "latest_snapshot",
    "top_k",
    "top_bottom_union",
    "with_share_of_total",
    "when_chain",
    "asof_join",
]
