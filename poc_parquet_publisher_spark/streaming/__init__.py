"""Structured Streaming analog of the reference's SQS leg
(SURVEY.md section 2.3).
"""

from .publisher import stream_publish
from .windows import streaming_hourly_counts, windowed_event_counts

__all__ = [
    "stream_publish",
    "streaming_hourly_counts",
    "windowed_event_counts",
]
