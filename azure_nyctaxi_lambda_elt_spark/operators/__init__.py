from .clean import typed_cast, split_good_bad, Rule
from .dedupe import latest_wins
from .dims import build_dim, resolve_fk, build_dim_date, build_dim_time
from .upsert import merge_latest, write_partition_overwrite
from .dq import check_counts, dq_gate, run_metrics

__all__ = [
    "typed_cast",
    "split_good_bad",
    "Rule",
    "latest_wins",
    "build_dim",
    "resolve_fk",
    "build_dim_date",
    "build_dim_time",
    "merge_latest",
    "write_partition_overwrite",
    "check_counts",
    "dq_gate",
    "run_metrics",
]
