"""Small shared column utilities.

Engine analog of the reference's ``geobeam/util.py`` (schema helpers): here
the helpers are Catalyst column expressions shared across plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Timestamp (tz'd or NTZ) -> epoch seconds as BIGINT, timezone-free.

    Sessions run with ``spark.sql.session.timeZone=UTC`` (session.py), so an
    NTZ value cast through TIMESTAMP lands on the same integer DuckDB's
    ``epoch()`` produces — the cross-engine hash contract for window starts.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")
