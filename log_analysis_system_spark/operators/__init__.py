from .sessionize import sessionize, session_aggregate
from .topn import grouped_topn, global_topn
from .funnel import page_splits, funnel_counts
from .sampling import stratified_sample_exact
from .aggregates import bin_ratio_aggregate, explode_count

__all__ = [
    "sessionize",
    "session_aggregate",
    "grouped_topn",
    "global_topn",
    "page_splits",
    "funnel_counts",
    "stratified_sample_exact",
    "bin_ratio_aggregate",
    "explode_count",
]
