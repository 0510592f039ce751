"""SQL UDTFs over partitioned TABLE arguments (Spark 4).

`text.register_sql_udtfs` covers the scalar-argument UDTF (LATERAL
join); this module covers the TABLE-argument form with PARTITION BY /
ORDER BY — the SQL-surface twin of ``applyInPandas``: the engine
shuffles on the partition keys, orders rows within each partition, and
feeds each group through its own UDTF instance (``eval`` per row,
``terminate`` at group end). That makes arbitrary per-entity sequential
logic — sessionization, pattern detection, state machines — callable
from PURE SQL, no DataFrame code:

    SELECT * FROM session_count_udtf(
      TABLE(SELECT user_id, ts FROM events)
      PARTITION BY user_id ORDER BY ts)

Scale posture: identical to any keyed shuffle — one exchange on the
partition keys; group state is one entity's scalars, not its rows, so
memory is O(1) per group (unlike grouped-map pandas, which materializes
the whole group).
"""

from __future__ import annotations


def register_table_udtfs(spark) -> None:
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_sessions int, n_events int")
    class SessionCountUdtf:
        """30-minute-gap session counter. With a TABLE argument, ``eval``
        receives each input row as a single Row object (not unpacked
        columns); one UDTF instance serves one partition, so instance
        attributes ARE the per-entity state."""

        def __init__(self) -> None:
            self.user = None
            self.prev = None
            self.sessions = 0
            self.events = 0

        def eval(self, row):
            self.user = row["user_id"]
            self.events += 1
            ts = row["ts"]
            if (
                self.prev is None
                or (ts - self.prev).total_seconds() > 1800
            ):
                self.sessions += 1
            self.prev = ts

        def terminate(self):
            if self.user is not None:
                yield self.user, self.sessions, self.events

    spark.udtf.register("session_count_udtf", SessionCountUdtf)
