"""Sequential conversion funnel as a one-shuffle array fold.

The reference has no event analytics at all (SURVEY.md §2.G); this is the
Spark-first formulation: instead of one shuffled self-join per funnel step
(the textbook SQL), group each user's events once, sort in-memory, and run
the step state machine as an `F.aggregate` fold — N-step funnels cost ONE
shuffle regardless of N, and the fold stays inside whole-stage codegen
(no Python, no UDF).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(events: DataFrame, steps: Sequence[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Per user: the earliest timestamp of step[0], then the earliest
    step[1] STRICTLY AFTER it, and so on.  A step that never completes is
    null (and so are all later steps).

    Output: one row per user with a ``{step}_ts`` timestamp column per
    step.  Ties: an event at exactly the prior step's timestamp does NOT
    advance the funnel (strict ``>``), which makes the result independent
    of how same-timestamp events are ordered.
    """
    n = len(steps)
    if n == 0:
        raise ValueError("funnel needs at least one step")
    arr = F.sort_array(F.collect_list(F.struct(
        F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))))
    init = F.struct(*[F.lit(None).cast("timestamp_ntz").alias(f"s{i}")
                      for i in range(n)])

    def fold(acc: Column, x: Column) -> Column:
        outs: list[Column] = []
        prev: Column | None = None
        for i, s in enumerate(steps):
            cond = x["et"] == F.lit(s)
            if prev is not None:
                cond = cond & prev.isNotNull() & (x["ts"] > prev)
            cur = F.coalesce(acc[f"s{i}"], F.when(cond, x["ts"]))
            outs.append(cur.alias(f"s{i}"))
            prev = cur
        return F.struct(*outs)

    folded = (events.groupBy(user_col)
                    .agg(F.aggregate(arr, init, fold).alias("_f")))
    return folded.select(
        user_col,
        *[F.col(f"_f.s{i}").alias(f"{s}_ts") for i, s in enumerate(steps)])
