"""Property tests for the Record generator (SURVEY.md section 5.2 item 5):
value domains match the reference's literal pools
(cmd/create-test-data/main.go:24-34), formats match, array bounds hold.
"""

from __future__ import annotations

import re

import pytest

from poc_parquet_publisher_spark.generate import (
    RECORD_SCHEMA,
    generate_records,
    rows_for_target_bytes,
    write_sized_parquet,
)
from poc_parquet_publisher_spark.generate import records as R

N = 500


@pytest.fixture(scope="module")
def sample(spark):
    return generate_records(spark, N).collect()


def test_schema_matches_record_struct(spark):
    df = generate_records(spark, 1)
    assert [f.name for f in df.schema.fields] == [
        f.name for f in RECORD_SCHEMA.fields
    ]
    for field in RECORD_SCHEMA.fields:
        # simpleString ignores nullability flags (generator columns are
        # provably non-null; the declared schema leaves them open)
        assert (
            df.schema[field.name].dataType.simpleString()
            == field.dataType.simpleString()
        ), field.name


def test_row_count_and_uuid_uniqueness(sample):
    assert len(sample) == N
    uuid_re = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    ids = {r.id for r in sample}
    assert len(ids) == N
    assert all(uuid_re.match(i) for i in ids)


def test_value_domains(sample):
    for r in sample:
        assert r.first_name in R.FIRST_NAMES
        assert r.last_name in R.LAST_NAMES
        assert r.account_type in R.ACCOUNT_TYPES
        assert r.account_status in R.ACCOUNT_STATUSES
        assert r.language in R.LANGUAGES
        assert r.address.city in R.CITIES
        assert r.address.state in R.STATES
        assert r.address.country in R.COUNTRIES
        assert r.address.street.split(" ", 1)[1] in R.STREETS


def test_formats(sample):
    phone_re = re.compile(r"^\+1-\d{3}-\d{3}-\d{4}$")
    dob_re = re.compile(r"^\d{4}-\d{2}-\d{2}$")
    email_re = re.compile(r"^[a-z]+\.[a-z]+@(gmail|yahoo|hotmail|outlook)\.com$")
    postal_re = re.compile(r"^\d{5}$")
    for r in sample:
        assert phone_re.match(r.phone_number)
        assert dob_re.match(r.date_of_birth)
        assert email_re.match(r.email)
        assert postal_re.match(r.address.postal_code)
        y, m, d = map(int, r.date_of_birth.split("-"))
        assert 1950 <= y <= 1999 and 1 <= m <= 12 and 1 <= d <= 28


def test_numeric_and_array_bounds(sample):
    for r in sample:
        assert 0.0 <= r.account_balance < 10000.0
        assert 1 <= len(r.communication_preferences) <= len(R.COMM_PREFS)
        assert set(r.communication_preferences) <= set(R.COMM_PREFS)
        assert 0 <= len(r.tags) <= 3
        assert set(r.tags) <= set(R.TAGS)
        assert len(r.body) == R.BODY_LENGTH
        assert set(r.body) <= set(R.BODY_CHARSET)
        assert r.created_at <= r.updated_at
        assert isinstance(r.newsletter_subscribed, bool)


def test_write_sized_parquet(spark, tmp_path):
    out = str(tmp_path / "sized.parquet")
    target = 2 << 20  # 2 MiB keeps the test fast; the math is scale-free
    n = write_sized_parquet(
        spark, out, target_bytes=target, sample_rows=500
    )
    back = spark.read.parquet(out)
    assert back.count() == n
    import os

    size = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _d, fs in os.walk(out)
        for f in fs
        if not f.startswith((".", "_"))
    )
    # within 30% of target (compression noise on a small sample)
    assert 0.7 * target <= size <= 1.3 * target


def test_rows_for_target_scales_linearly(spark):
    small = rows_for_target_bytes(spark, 1 << 20, sample_rows=500)
    big = rows_for_target_bytes(spark, 4 << 20, sample_rows=500)
    assert 3.5 <= big / small <= 4.5
