from .dedup import latest_wins, natural_key_dedup, priority_dedup
from .pivot import pivot_first
from .upsert import insert_if_absent, upsert_latest_wins

__all__ = [
    "latest_wins",
    "natural_key_dedup",
    "priority_dedup",
    "pivot_first",
    "insert_if_absent",
    "upsert_latest_wins",
]
