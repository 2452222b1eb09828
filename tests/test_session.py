"""Session lifecycle: the S34 graceful-shutdown analog.

The reference registers db.Close on SIGTERM
(cmd/duckdb-record-processor/main.go:51-55); build_session registers an
atexit hook that stops the active SparkSession at interpreter exit.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from poc_parquet_publisher_spark import session as sess


def test_build_session_registers_shutdown_hook(spark):
    # build_session ran via the fixture; the hook must be registered
    # exactly once (idempotent across repeated build_session calls).
    assert sess._shutdown_registered
    sess._register_shutdown_hook()
    assert sess._shutdown_registered


def test_stop_active_session_stops_and_tolerates_absence(monkeypatch):
    class FakeSession:
        def __init__(self):
            self.stopped = 0

        def stop(self):
            self.stopped += 1

    fake = FakeSession()
    monkeypatch.setattr(
        SparkSession, "getActiveSession", classmethod(lambda cls: fake)
    )
    sess._stop_active_session()
    assert fake.stopped == 1

    # no active session -> no-op, no raise
    monkeypatch.setattr(
        SparkSession, "getActiveSession", classmethod(lambda cls: None)
    )
    sess._stop_active_session()

    # a session whose stop() raises must not propagate out of atexit
    class Broken:
        def stop(self):
            raise RuntimeError("JVM already gone")

    monkeypatch.setattr(
        SparkSession, "getActiveSession", classmethod(lambda cls: Broken())
    )
    sess._stop_active_session()
