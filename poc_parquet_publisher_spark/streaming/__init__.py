"""Structured Streaming analog of the reference's SQS leg
(SURVEY.md section 2.3).
"""

from .dedup import dedup_stream
from .publisher import stream_publish
from .stateful import running_event_totals, sessionize_stateful
from .windows import (
    session_event_counts,
    streaming_hourly_counts,
    streaming_session_counts,
    windowed_event_counts,
)

__all__ = [
    "dedup_stream",
    "running_event_totals",
    "session_event_counts",
    "sessionize_stateful",
    "stream_publish",
    "streaming_hourly_counts",
    "streaming_session_counts",
    "windowed_event_counts",
]
