"""Adversarial-skew gate (round-4 verdict task #3): every oracle test in
this repo runs on clean, near-uniform driver fixtures, so the skew
machinery (composite-key distinct, salted joins, windowed session ops)
was only ever exercised on synthetic micro-inputs. This module builds a
ZIPFIAN twin of the fixture tables -- one user owns ~20% of all events,
one event type ~60% of rows, one supplier ~30% of lineitem -- at the
same row count as a uniform twin, then drives the ~10 skew-sensitive
registry entries against it with three gates per entry:

  1. hash gate  -- Spark result still matches the DuckDB oracle on the
                   skewed tables (skew must not change ANSWERS);
  2. plan gate  -- no CartesianProduct / BroadcastNestedLoopJoin sneaks
                   in when the stats change;
  3. time gate  -- the entry runs within 3x its uniform-twin wall time
                   at the same row count (a straggler reducer eating a
                   hot key shows up as 10-30x, not 3x).

Fixtures are generated deterministically (pure hash-of-row-id
transforms, no random()) into a session tmp dir -- /root/testdata is
read-only by contract.
"""

from __future__ import annotations

import shutil
import time

import duckdb
import pytest

from poc_parquet_publisher_spark.queries import REGISTRY, all_queries
from tests.oracle_harness import compare, duckdb_connection

all_queries()

N_EVENTS = 60_000
N_LINEITEM = 60_000
N_DOCS = 20_000

# These entries attach a broadcast 1-row aggregate (a global total /
# state count) or a FIXED few-row VALUES dim via crossJoin: that
# correctly plans as a BroadcastNestedLoopJoin against a side of
# constant, tiny cardinality -- scalar glue, not a data-sized nested
# loop. Everything else must stay equi-join.
ALLOW_SCALAR_BNLJ = {
    "x110_conversion_latency",
    "x139_session_length_dist",
    "x140_markov_stationary",
    "x234_seq_predictability",
    "x283_multi_gap_sessions",  # broadcast 3-row threshold dim
    "x330_window_funnel",  # broadcast 1-row level-total
    "x354_watermark_lateness",  # broadcast 3-row delay dim
}

SKEW_ENTRIES = [
    "x21_sessionize",
    "x54_salted_join_agg",
    "x57_topk_per_source",
    "x72_session_funnel",
    "x80_top_event_per_user",
    "x96_event_transitions",
    "x107_event_trigrams",
    "x110_conversion_latency",
    "x113_scd2_intervals",
    "x118_salted_distinct",
    "x131_retention_cohorts",
    "x139_session_length_dist",
    "x140_markov_stationary",
    # round-5 additions: the hot supplier serializes x149's one window
    # partition (per-key parallelism contract), the hot user funnels
    # ~20% of events through x157's one collect_list task -- both must
    # still answer correctly and inside the straggler gate
    "x149_interval_islands",
    "x157_user_history",
    # round-5 batch additions: the hot user owns ~20% of events, so
    # x170's whole-journey collect_list, x180's step-duration window,
    # x212's rolling-60s RANGE frame, x234's lag windows, and x240's
    # debounce lag all funnel through ONE window partition -- per-key
    # parallelism is the documented contract, but answers and the 3x
    # straggler bound must hold; x203's ledger meets the hot supplier
    # only through top-20 filtering (the gate proves the filter holds)
    "x170_top_paths",
    "x180_time_weighted_avg",
    "x203_stock_ledger",
    "x212_burst_detection",
    "x234_seq_predictability",
    "x240_debounce",
    # round-5 final additions: x245's per-user interval build + the
    # range-residual enrichment join both concentrate on the hot user
    # (interval list stays purchase-count bounded -- the gate proves
    # it); x247's two stacked windows funnel ~20% of events through one
    # partition; x251's cogroup hands the hot user's ENTIRE history to
    # one Arrow group (the per-group-state contract, stress-tested
    # here); x266 partitions by event_type, so the 60% 'view' type is
    # one window partition; x283 shares x247's hot-user window
    "x245_pit_enrichment",
    "x247_event_rle",
    "x251_cogroup_reconcile",
    "x266_rank_nulls",
    "x283_multi_gap_sessions",
    # round-6 additions (the two round-5 key-partitioned-window shapes
    # not yet gated): x268's global lead() runs inside key-range
    # buckets -- a dense hot bucket must stay inside the straggler
    # bound and the bounded seam window must stay aggregate-sized;
    # x294's per-(part, dir) cumulative windows and part-local
    # interval self-join meet whatever part the skewed lineitem
    # concentrates -- answers, plan, and the 3x bound must hold
    "x268_id_gaps",
    "x294_fifo_matching",
    # round-6 near-dup additions: the skewed documents table funnels
    # ~70% of docs through one source and shares a 50-word vocab, so
    # shingle bands get HOT -- x295's index probe must hold behind its
    # hot-band cap (cap applied to the index side, pairs re-surface
    # through non-hot bands), x296's 12-char prefix blocks meet the
    # dense shared-vocab prefixes, x297 rides the shared banded pair
    # stage; answers, plan, and the 3x straggler bound must hold
    "x295_incremental_neardup",
    "x296_editdist_neardup",
    "x297_split_leakage",
    # round-6 batch-2 additions: x330's three chained min-aggregates
    # and joins all key on the hot user (20% of events -> one hash
    # partition per stage, but each stage's input is type-filtered and
    # partially aggregated); x334's per-user type self-join meets the
    # hot user with a <=4-types-per-user fan-out bound -- answers,
    # plan, and the 3x straggler bound must hold for both
    "x330_window_funnel",
    "x334_precedence_matrix",
    # x347's test-start min-agg and train join both key on the hot user
    "x347_time_leakage",
    # x353's session_window grouping and x354's running-max window both
    # funnel the hot user's ~20% of events through one partition --
    # the per-key-parallelism contract under the 3x straggler bound
    "x353_native_session_window",
    "x354_watermark_lateness",
    # round-6 batch-5 addition: x366's purchase->touch interval join
    # keys on user, so the hot user's purchases meet the hot user's
    # views/clicks -- the trailing-24h interval bounds the per-purchase
    # fan-out (state never goes quadratic in the hot key's row count);
    # answers, plan, and the 3x straggler bound must hold
    "x366_multitouch_attribution",
    # x374's 30-gram explode meets the skewed docs' shared 50-word
    # vocab: repeated grams become the COMMON case (dense hit lists,
    # long islands) instead of the rare one -- the audit must stay
    # corpus-positions-bounded (never pairwise in repeated-gram
    # count) and inside the straggler bound
    "x374_substring_dedup_spans",
]


def _gen(dir_path: str, skewed: bool) -> None:
    """Write events / lineitem / supplier parquet twins. ``skewed=True``
    concentrates: user 1 ~20% of events, 'view' ~60% of types, supplier
    7 ~30% of lineitem. The uniform twin spreads the same row counts
    evenly. All values are pure functions of the row id (deterministic
    across runs and engines)."""
    con = duckdb.connect()
    if skewed:
        user = "CASE WHEN (hash(i) % 5) = 0 THEN 1 ELSE 2 + CAST(hash(i * 31) % 2000 AS BIGINT) END"
        etype = ("CASE WHEN (hash(i * 7) % 10) < 6 THEN 'view' "
                 "WHEN (hash(i * 7) % 10) < 8 THEN 'click' "
                 "WHEN (hash(i * 7) % 10) = 8 THEN 'purchase' "
                 "ELSE 'signup' END")
        supp = "CASE WHEN (hash(i * 3) % 10) < 3 THEN 7 ELSE 1 + CAST(hash(i * 11) % 100 AS BIGINT) END"
    else:
        user = "1 + CAST(hash(i * 31) % 2000 AS BIGINT)"
        etype = ("CASE hash(i * 7) % 4 WHEN 0 THEN 'view' WHEN 1 THEN 'click' "
                 "WHEN 2 THEN 'purchase' ELSE 'signup' END")
        supp = "1 + CAST(hash(i * 11) % 100 AS BIGINT)"
    con.execute(f"""
        COPY (
          SELECT CAST(i AS BIGINT) AS event_id,
                 TIMESTAMP '2024-01-01 00:00:00'
                   + to_seconds(CAST(hash(i * 13) % 2592000 AS BIGINT)) AS ts,
                 CAST({user} AS BIGINT) AS user_id,
                 {etype} AS event_type,
                 ROUND(CAST(hash(i * 17) % 100000 AS BIGINT) / 100.0, 2)
                     AS value,
                 '{{"k": ' || CAST(hash(i * 19) % 100 AS BIGINT) || '}}'
                     AS props
          FROM range({N_EVENTS}) t(i)
        ) TO '{dir_path}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT CAST(1 + i // 4 AS BIGINT) AS l_orderkey,
                 CAST(1 + hash(i * 23) % 500 AS BIGINT) AS l_partkey,
                 CAST({supp} AS BIGINT) AS l_suppkey,
                 CAST(1 + i % 4 AS INTEGER) AS l_linenumber,
                 CAST(1 + hash(i * 29) % 50 AS DOUBLE) AS l_quantity,
                 ROUND(CAST(hash(i * 37) % 9000000 AS BIGINT) / 100.0 + 1.0, 2)
                     AS l_extendedprice,
                 ROUND(CAST(hash(i * 41) % 11 AS BIGINT) / 100.0, 2)
                     AS l_discount,
                 ROUND(CAST(hash(i * 43) % 9 AS BIGINT) / 100.0, 2) AS l_tax,
                 CASE hash(i * 47) % 3 WHEN 0 THEN 'A' WHEN 1 THEN 'N'
                      ELSE 'R' END AS l_returnflag,
                 CASE hash(i * 53) % 2 WHEN 0 THEN 'O' ELSE 'F' END
                     AS l_linestatus,
                 TIMESTAMP '2024-01-01 00:00:00'
                   + to_seconds(CAST(hash(i * 59) % 31536000 AS BIGINT))
                     AS l_shipdate
          FROM range({N_LINEITEM}) t(i)
        ) TO '{dir_path}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT CAST(1 + i AS BIGINT) AS o_orderkey,
                 CAST(1 + hash(i * 89) % 3000 AS BIGINT) AS o_custkey,
                 CASE hash(i * 97) % 3 WHEN 0 THEN 'F' WHEN 1 THEN 'O'
                      ELSE 'P' END AS o_orderstatus,
                 ROUND(CAST(hash(i * 101) % 50000000 AS BIGINT) / 100.0
                       + 1.0, 2) AS o_totalprice,
                 TIMESTAMP '2024-01-01 00:00:00'
                   + to_seconds(CAST(hash(i * 83) % 31536000 AS BIGINT))
                     AS o_orderdate,
                 CASE hash(i * 103) % 5 WHEN 0 THEN '1-URGENT'
                      WHEN 1 THEN '2-HIGH' WHEN 2 THEN '3-MEDIUM'
                      WHEN 3 THEN '4-NOT SPECIFIED' ELSE '5-LOW' END
                     AS o_orderpriority
          FROM range({N_LINEITEM} // 4 + 1) t(i)
        ) TO '{dir_path}/orders.parquet' (FORMAT PARQUET)
    """)
    if skewed:
        src = ("CASE WHEN (hash(i * 73) % 10) < 7 THEN 'web' "
               "ELSE 'src_' || CAST(hash(i * 79) % 5 AS BIGINT) END")
    else:
        src = "'src_' || CAST(hash(i * 79) % 6 AS BIGINT)"
    vocab = ", ".join(f"'w{j}'" for j in range(50))
    con.execute(f"""
        COPY (
          SELECT doc_id, text, lang, source,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM (
            SELECT CAST(i AS BIGINT) AS doc_id,
                   array_to_string(
                     list_transform(
                       range(1, 6 + CAST(hash(i * 3) % 30 AS BIGINT)),
                       j -> ([{vocab}])[CAST(1 + hash(i * 131 + j) % 50 AS BIGINT)]
                     ), ' ') AS text,
                   CASE hash(i * 71) % 3 WHEN 0 THEN 'en'
                        WHEN 1 THEN 'de' ELSE 'fr' END AS lang,
                   {src} AS source
            FROM range({N_DOCS}) t(i)
          )
        ) TO '{dir_path}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT CAST(1 + i AS BIGINT) AS s_suppkey,
                 'Supplier#' || LPAD(CAST(1 + i AS VARCHAR), 6, '0')
                     AS s_name,
                 CAST(hash(i * 61) % 25 AS INTEGER) AS s_nationkey,
                 ROUND(CAST(hash(i * 67) % 1000000 AS BIGINT) / 100.0, 2)
                     AS s_acctbal
          FROM range(100) t(i)
        ) TO '{dir_path}/supplier.parquet' (FORMAT PARQUET)
    """)
    con.close()


@pytest.fixture(scope="module")
def skew_dirs(tmp_path_factory):
    skew = tmp_path_factory.mktemp("skew_fixture")
    uni = tmp_path_factory.mktemp("uniform_fixture")
    _gen(str(skew), skewed=True)
    _gen(str(uni), skewed=False)
    yield str(skew), str(uni)
    shutil.rmtree(str(skew), ignore_errors=True)
    shutil.rmtree(str(uni), ignore_errors=True)


@pytest.fixture(scope="module")
def skew_duck(skew_dirs):
    con = duckdb_connection(skew_dirs[0])
    yield con
    con.close()


def test_fixture_is_actually_skewed(skew_dirs):
    skew, uni = skew_dirs
    con = duckdb.connect()
    hot_user = con.execute(
        f"SELECT count(*) FROM read_parquet('{skew}/events.parquet') "
        "WHERE user_id = 1"
    ).fetchone()[0]
    assert hot_user > 0.15 * N_EVENTS  # one user ~20% of all events
    hot_supp = con.execute(
        f"SELECT count(*) FROM read_parquet('{skew}/lineitem.parquet') "
        "WHERE l_suppkey = 7"
    ).fetchone()[0]
    assert hot_supp > 0.25 * N_LINEITEM
    uni_top = con.execute(
        f"SELECT max(c) FROM (SELECT count(*) c FROM "
        f"read_parquet('{uni}/events.parquet') GROUP BY user_id)"
    ).fetchone()[0]
    assert uni_top < 0.01 * N_EVENTS  # the twin really is uniform
    con.close()


@pytest.mark.parametrize("name", SKEW_ENTRIES)
def test_skew_hash_plan_and_time(name, spark, skew_dirs, skew_duck):
    skew, uni = skew_dirs
    spec = REGISTRY[name]

    # warm both paths once so JIT/scan caching doesn't skew the timing
    t0 = time.time()
    df_uni = spec.spark(spark, uni)
    df_uni.collect()
    t_uni = time.time() - t0

    # Time the Spark side SYMMETRICALLY with the uniform twin (a bare
    # collect); the DuckDB oracle compare runs untimed afterwards --
    # counting oracle+hash time only on the skew side made the 3x gate
    # flake under full-suite load (x366: 16 s "skew" of which ~13 s was
    # the comparison harness, passes in isolation).
    t0 = time.time()
    df = spec.spark(spark, skew)
    df.collect()
    t_skew = time.time() - t0

    result = compare(spec.spark(spark, skew), skew_duck, spec.oracle)
    assert result["match"], f"{name} diverges from oracle under skew: {result}"

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if name not in ALLOW_SCALAR_BNLJ:
        assert "BroadcastNestedLoopJoin" not in plan, name

    # 3x wall-time gate vs the uniform twin at identical row count, with
    # a 1 s noise floor (sub-second entries jitter more than they run)
    assert t_skew <= 3.0 * max(t_uni, 1.0), (
        f"{name}: skew {t_skew:.2f}s vs uniform {t_uni:.2f}s -- "
        "hot key is serializing through one task"
    )
