#!/usr/bin/env python
"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q01_count": sec, ...}, "sf": 0.1}

Each query is timed to a terminal action. Queries returning full tables are
counted (the driver-side collect cost is not the engine's scan/agg cost);
LIMIT-ed queries are collected.

The full per-entry map is persisted to $BENCH_OUT (default
BENCH_LOCAL.json). ``python bench.py --medians [N]`` instead runs N
(default 3) COLD subprocess runs (fresh JVM each -- iterative plans are
warm-cache sensitive, see .claude/skills/verify) and writes the
per-entry MEDIAN map to BENCH_MEDIANS.json, so round-over-round diffs
compare medians instead of single-run noise (sub-2 s entries drift
1.5-3x run-to-run with byte-identical code).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Host calibration (VERDICT r07 #1): identical code measured 1.43x slower
# across two sessions on an uncontrolled host, costing a manual re-measure.
# Every ledger now carries a CALIBRATION block -- a pinned pure-CPU md5
# loop, a pinned synthetic Spark probe (touches no bench data), and
# os.getloadavg() -- timed FIRST, so cross-session medians can be compared
# after dividing by the probe reading. REF_SPARK_PROBE_S pins the probe's
# reading on the session that introduced it; "normalized" times are
# raw * (REF_SPARK_PROBE_S / measured_probe_s), i.e. seconds-at-the-
# reference-host.
REF_SPARK_PROBE_S = 1.99  # pinned: round-8 session-1 median of 3 warm runs
REF_CPU_MD5_S = 0.77  # same session, informational

# Round-9 finding (SURVEY 4.4d): the single COLD spark probe is JIT/
# codegen-warmup dominated and injected an 18% normalization
# disagreement between two same-session ledgers whose raw sums agreed
# at 1.4%. The WARM probe and cpu_md5 are the stable readings. Round-10
# refinement: for median ledgers the estimator is the FLOOR (min) of
# the per-run readings, not their median -- the same contention
# rejection the per-entry medians already apply. A median-of-3
# calibration instants keeps one contended sample's inflation (round-10
# measured per-run warm probes 1.83/0.79/1.17 in a ledger whose
# per-entry medians had already discarded that run's inflation), while
# the floor is the uncontended host speed: the two round-10 ledgers'
# raw sums disagree 5.2% (real contention) but their FLOOR-normalized
# sums agree at 0.15%. References pinned as the floors of the round-9
# closing ledger's per-run readings.
REF_SPARK_PROBE_WARM_S = 0.864  # round-9 per-run warm floor
REF_CPU_MD5_WARM_ANCHOR_S = 0.728  # round-9 per-run cpu_md5 floor


def _pinned_host_factor(calibration: dict) -> float | None:
    """Combined warm host factor: sqrt((warm/ref_warm) * (cpu/ref_cpu)),
    preferring the per-run FLOOR readings when present (median ledgers).
    >1 means this session is slower than the reference session."""
    warm = calibration.get("spark_probe_warm_floor_s") or calibration.get(
        "spark_probe_warm_s"
    )
    cpu = calibration.get("cpu_md5_floor_s") or calibration.get(
        "cpu_md5_s"
    )
    if not warm or not cpu:
        return None
    return round(
        (
            (warm / REF_SPARK_PROBE_WARM_S)
            * (cpu / REF_CPU_MD5_WARM_ANCHOR_S)
        )
        ** 0.5,
        3,
    )

CAL_CPU_ITERS = 300_000


def _calibrate_cpu() -> float:
    import hashlib

    buf = b"\x5a" * 1024
    t0 = time.perf_counter()
    h = hashlib.md5()
    for _ in range(CAL_CPU_ITERS):
        h = hashlib.md5(buf + h.digest())
    return round(time.perf_counter() - t0, 3)


def _calibrate_spark(spark) -> tuple[float, float]:
    # Pinned synthetic probe: range -> md5 expr -> distinct-mod count.
    # Exercises codegen + one shuffle at the session's parallelism;
    # deterministic, zero data dependency, ~1-2 s on the reference
    # host. Returns (cold_s, warm_median_s): the FIRST run pays JIT/
    # codegen warmup -- that is the reading every round-7/8 ledger
    # recorded, so host_factor stays on it for cross-round
    # continuity -- while the median of the two follow-up runs is the
    # steady-state host speed (round-9 measured cold 3.2-4.4 s vs
    # warm ~1.4 s on the same session: the single-cold-probe
    # host_factor is warmup-dominated, so normalized cross-SESSION
    # comparisons should quote the warm factor going forward).
    import statistics

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(8_000_000, numPartitions=32).selectExpr(
            "count(distinct crc32(md5(cast(id % 1000000 as string))))"
            " as c"
        ).collect()
        times.append(time.perf_counter() - t0)
    return round(times[0], 3), round(statistics.median(times[1:]), 3)


def calibration_block(spark) -> dict:
    cpu = _calibrate_cpu()
    probe, probe_warm = _calibrate_spark(spark)
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    return {
        "cpu_md5_s": cpu,
        "spark_probe_s": probe,
        "spark_probe_warm_s": probe_warm,
        "ref_spark_probe_s": REF_SPARK_PROBE_S,
        "ref_cpu_md5_s": REF_CPU_MD5_S,
        "host_factor": round(probe / REF_SPARK_PROBE_S, 3),
        "host_factor_warm": round(probe_warm / REF_SPARK_PROBE_S, 3),
        "loadavg": load,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from poc_parquet_publisher_spark.queries import all_queries
    from poc_parquet_publisher_spark.session import build_session

    # explicit heap: the 1g default intermittently OOMs the 3x
    # calibration probe (32 concurrent partial-distinct hash aggs);
    # scale_probe.py sets the same knob for the same reason
    spark = build_session(
        app_name="bench",
        extra_conf={"spark.driver.memory": "4g"},
    )
    queries = all_queries()
    # BENCH_ONLY=x430_foo,x431_bar: time just those entries and merge
    # into the existing ledger (per-entry patch path; the full run
    # still regenerates everything at the end of a batch).
    only = [n for n in os.environ.get("BENCH_ONLY", "").split(",") if n]
    if only:
        unknown = sorted(set(only) - set(queries))
        if unknown:
            sys.exit(f"BENCH_ONLY names not in registry: {unknown}")
        queries = {n: queries[n] for n in only}

    # Warm the JVM/session so q01 doesn't absorb the startup cost.
    spark.range(1000).selectExpr("sum(id)").collect()

    # Warm the Python worker pool the same way: spawn all workers and
    # pre-import the Arrow-UDF dependencies, so the FIRST pandas-UDF
    # query isn't charged ~30 process spawns + numpy/pandas imports
    # (measured ~4 s at local[32] -- that cost is process startup, not
    # engine cost, exactly like the JVM warmup above).
    def _warm_workers(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from it

    spark.range(256, numPartitions=int(spark.sparkContext.defaultParallelism)) \
        .mapInPandas(_warm_workers, "id long").count()

    # Warm the parquet datasource and streaming machinery the same way
    # (class loading + codec init are session costs, not query costs):
    # a 10-row parquet round-trip and a one-batch memory-sink drain over
    # a temp table that shares NOTHING with the bench tables -- no bench
    # data is touched, so per-query timings still include their own IO.
    import tempfile as _tf

    with _tf.TemporaryDirectory() as _wtmp:
        spark.range(10).write.mode("overwrite").parquet(f"{_wtmp}/w.parquet")
        warm_df = spark.read.parquet(f"{_wtmp}/w.parquet")
        warm_df.count()
        (
            spark.readStream.schema(warm_df.schema)
            .parquet(f"{_wtmp}/w.parquet")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("__warm_stream")
            .option("checkpointLocation", f"{_wtmp}/ckpt")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    calibration = calibration_block(spark)
    print(f"# calibration: {json.dumps(calibration)}", file=sys.stderr)

    timings: dict[str, float] = {}

    # Amortized-graph contract for x104: a deployment derives the
    # co-purchase edge list once (a warehouse table) and every rank run
    # reads it warm. Build the bucketed sf-keyed table here and time the
    # derivation SEPARATELY so x104's entry measures the iterative rank,
    # not the one-time graph build.
    if "x104_pagerank" in queries:
        from poc_parquet_publisher_spark.catalog import load_table
        from poc_parquet_publisher_spark.ops import graph

        t0 = time.perf_counter()
        graph.persist_copurchase_edges(
            spark,
            load_table(spark, sf_dir, "lineitem"),
            graph.copurchase_edge_table_name(sf_dir),
        )
        timings["x104_edge_derivation"] = round(time.perf_counter() - t0, 3)
        print(
            f"# x104_edge_derivation: {timings['x104_edge_derivation']:.3f}s",
            file=sys.stderr,
        )

    for name, fn in sorted(queries.items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # count() forces the full plan; collect() only for bounded outputs
        df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    if only:
        _write_result(timings, sf, calibration, merge=True)
        spark.stop()
        return

    # Pipeline throughput (BASELINE.md "read -> to_json -> sink"): full
    # publish path against a success-returning client, so the number is
    # engine cost (scan + serialize + chunk), not fake-queue filesystem IO.
    import tempfile

    from poc_parquet_publisher_spark.catalog import table_path
    from poc_parquet_publisher_spark.pipeline import publish

    class _NullQueue:
        def send_message_batch(self, QueueUrl="", Entries=None):
            return {"Failed": []}

    orders = spark.read.parquet(table_path(sf_dir, "orders"))
    n_rows = orders.count()
    t0 = time.perf_counter()
    assert publish(orders, _NullQueue).published == n_rows
    dt = time.perf_counter() - t0
    timings["pipeline_publish"] = round(dt, 3)
    pipeline_rows_s = round(n_rows / dt)
    print(
        f"# pipeline_publish: {dt:.3f}s ({pipeline_rows_s} rows/s)",
        file=sys.stderr,
    )

    # Streaming publish throughput (streaming/publisher.py): file
    # readStream -> foreachBatch -> the same batch publisher, drained
    # with availableNow. Timed against the null client so the number is
    # engine cost (stream planning + scan + serialize + chunk).
    from poc_parquet_publisher_spark.streaming.publisher import stream_publish

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/orders_stream"
        orders.repartition(8).write.mode("overwrite").parquet(src)
        stream_src = spark.read.parquet(src)
        t0 = time.perf_counter()
        q = stream_publish(
            spark,
            src,
            stream_src.schema,
            _NullQueue,
            checkpoint_dir=f"{tmp}/ckpt",
        )
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
    timings["stream_publish"] = round(dt, 3)
    print(
        f"# stream_publish: {dt:.3f}s ({round(n_rows / dt)} rows/s)",
        file=sys.stderr,
    )

    # Multimodal kernels (ops/multimodal.py): Arrow-batched decode /
    # resize / frame-sample over binary payloads (deterministic fake
    # codecs; the plumbing cost -- binary transfer + mapInPandas -- is
    # what's being measured).
    from poc_parquet_publisher_spark.ops import multimodal

    # synthetic_media durations grow linearly with the row index, so the
    # frame budget is quadratic in n: keep every_ms coarse enough that
    # the bench measures kernel/plumbing cost, not an exploding fixture.
    media_n = 10_000
    media = multimodal.synthetic_media(
        spark, n=media_n, payload_bytes=1024
    ).localCheckpoint()
    t0 = time.perf_counter()
    n_feat = multimodal.decode_features(media, dim=8).count()
    n_resized = multimodal.resize_images(media).count()
    n_frames = multimodal.sample_frames(media, every_ms=60_000).count()
    dt = time.perf_counter() - t0
    assert n_feat == media_n and n_resized > 0 and n_frames > 0
    timings["multimodal_kernels"] = round(dt, 3)
    print(
        f"# multimodal_kernels: {dt:.3f}s "
        f"({round(media_n / dt)} media rows/s through 3 kernels)",
        file=sys.stderr,
    )

    # Generator throughput (BASELINE.md "rows/s to Parquet").
    from poc_parquet_publisher_spark.generate import generate_records

    gen_n = 100_000
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        generate_records(spark, gen_n).write.mode("overwrite").parquet(
            f"{tmp}/gen.parquet"
        )
        dt = time.perf_counter() - t0
    timings["generator_write"] = round(dt, 3)
    generator_rows_s = round(gen_n / dt)
    print(
        f"# generator_write: {dt:.3f}s ({generator_rows_s} rows/s)",
        file=sys.stderr,
    )

    _write_result(timings, sf, calibration)
    spark.stop()


def _write_result(
    timings: dict, sf, calibration: dict | None = None, merge: bool = False
) -> None:
    # The driver captures only the TAIL of stdout, so a single giant
    # JSON line truncates FRONT-first and parses as null every round
    # (BENCH_r03..r05 all have "parsed": null). Persist the FULL map to
    # BENCH_LOCAL.json, print it to stdout for humans scrolling up, then
    # print a COMPACT final line (total + top-20 slowest entries) that
    # always fits inside the tail window -- that last line is what the
    # driver records as BENCH_r{N}.json.
    local_path = os.environ.get("BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    if merge and os.path.exists(local_path):
        with open(local_path) as f:
            prior = json.load(f)
        merged = dict(prior.get("queries", {}))
        merged.update(timings)
        timings = merged
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "registry_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if calibration is not None:
        scale = REF_SPARK_PROBE_S / calibration["spark_probe_s"]
        result["calibration"] = calibration
        result["value_normalized"] = round(total * scale, 3)
        result["queries_normalized"] = {
            k: round(v * scale, 3) for k, v in timings.items()
        }
        # primary (round-10 on): warm-pinned normalization -- the cold
        # probe's 18% warmup noise does not enter this number. FLOOR
        # readings exist only on median ledgers (min over the session's
        # runs); a single run's point-in-time reading is >= the floor
        # by construction, so normalizing with it systematically reads
        # FAST and is not comparable to median-ledger values (round-10
        # advice) -- tag it apart instead of publishing it as the same
        # metric.
        pinned = _pinned_host_factor(calibration)
        if pinned:
            result["host_factor_pinned"] = pinned
            if "spark_probe_warm_floor_s" in calibration:
                result["value_normalized_warm"] = round(total / pinned, 3)
            else:
                result["value_normalized_warm_single_run"] = round(
                    total / pinned, 3
                )
                result["value_normalized_warm_single_run_note"] = (
                    "point-in-time calibration (no per-run floor): "
                    "biased vs floor-pinned median ledgers; compare "
                    "only value_normalized_warm across median ledgers"
                )
    with open(local_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(result))
    top20 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:20]
    )
    compact = {
        "metric": "registry_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": top20,
        "sf": sf,
        "n_entries": len(timings),
        "full_map": "BENCH_LOCAL.json",
    }
    if calibration is not None:
        compact["calibration"] = calibration
        compact["value_normalized"] = result["value_normalized"]
    print(json.dumps(compact))


def medians(n_runs: int = 3) -> None:
    """Run ``n_runs`` cold bench subprocesses and write the per-entry
    median map to BENCH_MEDIANS.json (same shape as BENCH_LOCAL.json,
    plus per-entry spread so >1.5x single-run drift is visible as
    measurement noise instead of needing manual code-diff exoneration).
    The LAST run's BENCH_LOCAL.json is left in place, so the two
    committed ledgers come from the same session."""
    import statistics
    import subprocess
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    runs: list[dict] = []
    with tempfile.TemporaryDirectory() as tmp:
        for i in range(n_runs):
            out = (
                os.path.join(here, "BENCH_LOCAL.json")
                if i == n_runs - 1
                else f"{tmp}/run{i}.json"
            )
            env = dict(os.environ, BENCH_OUT=out)
            print(f"# medians: cold run {i + 1}/{n_runs}", file=sys.stderr)
            subprocess.run(
                [sys.executable, os.path.join(here, "bench.py")],
                env=env,
                check=True,
                stdout=subprocess.DEVNULL,
            )
            with open(out) as f:
                runs.append(json.load(f))
    names = sorted(set().union(*(r["queries"] for r in runs)))
    med = {}
    spread = {}
    for name in names:
        vals = sorted(
            r["queries"][name] for r in runs if name in r["queries"]
        )
        med[name] = round(statistics.median(vals), 3)
        spread[name] = [vals[0], vals[-1]]
    result = {
        "metric": "registry_queries_total_wall_clock_median",
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "queries": med,
        "spread_min_max": spread,
        "runs": n_runs,
        "sf": runs[-1].get("sf"),
    }
    cals = [r["calibration"] for r in runs if r.get("calibration")]
    if cals:
        med_cal = {
            k: round(statistics.median(c[k] for c in cals), 3)
            for k in (
                "cpu_md5_s",
                "spark_probe_s",
                "host_factor",
            )
        }
        for k in ("spark_probe_warm_s", "host_factor_warm"):
            vals = [c[k] for c in cals if k in c]
            if vals:
                med_cal[k] = round(statistics.median(vals), 3)
        med_cal["ref_spark_probe_s"] = REF_SPARK_PROBE_S
        # contention-rejecting floors across the cold runs (see the
        # REF_* comment block): these drive host_factor_pinned
        warm_vals = [
            c["spark_probe_warm_s"] for c in cals if "spark_probe_warm_s" in c
        ]
        if warm_vals:
            med_cal["spark_probe_warm_floor_s"] = min(warm_vals)
        med_cal["cpu_md5_floor_s"] = min(c["cpu_md5_s"] for c in cals)
        med_cal["per_run"] = [
            {
                k: c[k]
                for k in (
                    "cpu_md5_s",
                    "spark_probe_s",
                    "spark_probe_warm_s",
                    "loadavg",
                )
                if k in c
            }
            for c in cals
        ]
        scale = REF_SPARK_PROBE_S / med_cal["spark_probe_s"]
        result["calibration"] = med_cal
        result["value_normalized"] = round(result["value"] * scale, 3)
        result["queries_normalized"] = {
            k: round(v * scale, 3) for k, v in med.items()
        }
        pinned = _pinned_host_factor(med_cal)
        if pinned:
            result["host_factor_pinned"] = pinned
            result["value_normalized_warm"] = round(
                result["value"] / pinned, 3
            )
    with open(os.path.join(here, "BENCH_MEDIANS.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    # print raw AND host-normalized side by side (round-8 verdict task:
    # cross-session closing comparisons are stated in normalized terms)
    summary = {
        k: result[k] for k in ("metric", "value", "unit", "runs", "sf")
    }
    if "value_normalized" in result:
        summary["value_normalized"] = result["value_normalized"]
        summary["host_factor"] = result["calibration"]["host_factor"]
    if "value_normalized_warm" in result:
        summary["value_normalized_warm"] = result["value_normalized_warm"]
        summary["host_factor_pinned"] = result["host_factor_pinned"]
    print(json.dumps(summary))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--medians":
        medians(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    else:
        main()
