"""Shared pieces of the batch/stream twin discipline.

``NoState`` is the stateless GroupState stand-in every batch shim uses
(one group call per key, empty initial state, updates discarded) —
one definition so a future behavior change cannot silently diverge the
three parity shims.

``epoch_micros`` is THE tz-invariant event-time ordering key: every
streaming twin is pinned bit-for-bit against a batch/driver query that
uses the identical expression, so all four sites (compaction, funnel,
latest_event_per_user, funnel_conversion) must share one definition —
a fix landing in only one copy would break the parity laws, or worse,
pass the tests while production orderings differ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(col: str = "ts") -> Column:
    """Timestamp column -> tz-invariant epoch microseconds (long).

    ``unix_timestamp`` floors to the second; the fractional second is
    recovered via ``date_part('SECOND') % 1`` so sub-second event
    ordering survives, independent of the session time zone."""
    return (
        F.unix_timestamp(col) * F.lit(1_000_000)
        + (F.date_part(F.lit("SECOND"), F.col(col)) % 1 * 1_000_000).cast(
            "long"
        )
    )


class NoState:
    """Empty GroupState stand-in for the batch shims (never persists)."""

    exists = False
    get = None

    def update(self, value):
        pass

    def remove(self):
        pass
