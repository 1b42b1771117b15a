"""Round-5 registry additions (kept separate so queries.py's r4-frozen
ordering stays byte-stable above the splice point).

Every entry registered here is new in round 5 and therefore never
driver-verified — ``queries.py`` splices them into the head of the
50-slot driver window, right behind the staged r4 queue.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def register(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
    oracle_sql: dict[str, str],
) -> None:
    """Populate the round-5 query/oracle dicts (called from queries.py)."""
    # Entries are appended below as round-5 operators land.
