"""JSON logging (S33): one parseable object per line, extra kv surfaced."""

from __future__ import annotations

import io
import json

from poc_parquet_publisher_spark.logging_utils import json_logger


def test_json_logger_emits_parseable_lines():
    buf = io.StringIO()
    log = json_logger("test.json.logger", stream=buf)
    log.info("received request", extra={"bucket": "b", "paths": ["a", "b"]})
    log.error("failed to send", extra={"batch_index": 3})

    lines = [json.loads(x) for x in buf.getvalue().splitlines()]
    assert lines[0]["msg"] == "received request"
    assert lines[0]["level"] == "INFO"
    assert lines[0]["bucket"] == "b"
    assert lines[0]["paths"] == ["a", "b"]
    assert lines[1]["level"] == "ERROR"
    assert lines[1]["batch_index"] == 3


def test_json_logger_reuse_does_not_duplicate_handlers():
    buf = io.StringIO()
    log1 = json_logger("test.json.reuse", stream=buf)
    log2 = json_logger("test.json.reuse", stream=buf)
    assert log1 is log2
    log1.info("once")
    assert len(buf.getvalue().splitlines()) == 1
