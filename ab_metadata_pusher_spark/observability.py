"""Plan observability for iterative operators.

``localCheckpoint`` truncates lineage, which is exactly why the
checkpointed loops scale — but it also means an EXPLAIN of the final
frame shows only the post-checkpoint tail, under-counting the shuffles
the loop actually executed (the round-2 audit reported
``graph_bfs_distance shuffles=0``).  Iterative operators therefore call
``capture_plan_segment(df)`` on each frame *immediately before*
checkpointing it; when an audit has capture enabled, the formatted plan
of every truncated segment is recorded so the auditor can sum true
cumulative counts.  When capture is off (always, outside
scripts/explain_audit.py) the hook is a single ``is None`` check — no
explain is compiled, zero cost in production paths.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

__all__ = ["capture_plan_segment", "start_plan_capture",
           "stop_plan_capture"]

_segments: list[str] | None = None


def start_plan_capture() -> None:
    """Begin recording pre-checkpoint plan segments (audit use only)."""
    global _segments
    _segments = []


def stop_plan_capture() -> list[str]:
    """Stop recording and return the captured formatted-plan segments."""
    global _segments
    out, _segments = _segments or [], None
    return out


def capture_plan_segment(df: DataFrame) -> None:
    """Record ``df``'s formatted physical plan if capture is enabled.

    Called by iterative loops on the frame whose lineage is about to be
    truncated by ``localCheckpoint``; no-op (one ``is None`` check) when
    no audit is running.
    """
    if _segments is None:
        return
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    _segments.append(buf.getvalue())
