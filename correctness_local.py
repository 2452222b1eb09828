#!/usr/bin/env python
"""Local full-registry replica of the driver's correctness artifact.

The external driver hash-checks only the first 50 registry entries per
round (CORRECTNESS_r{N}.json); this harness runs the SAME comparison --
Spark result vs DuckDB oracle at sf0.01, row count + sorted column names
+ ordered-row value hash (tests/oracle_harness.py:56-106; an unordered
multiset pass is reported only as a diagnostic label) -- over EVERY
registry entry and
writes the result to CORRECTNESS_LOCAL.json in the driver's row format:

    {"<name>": {"rows_match": bool, "schema_match": bool,
                "hash_match": bool, "spark_rows": int,
                "oracle_rows": int, "err": null | str}, ...}

Rows-only entries (oracle=None by design: approximate / Python-only ops)
get ``"mode": "rows_only"`` with their quality-gate pytest node recorded
and executed; ``gate_pass`` carries the outcome, so the artifact is a
complete audit of the registry, not just the hashed window.

Run:  python correctness_local.py            (sf0.01, driver parity)
      ORACLE_SF_DIR=/root/testdata/sf0.1 python correctness_local.py
      ONLY=x430_foo,x431_bar python correctness_local.py
          (run just those entries and MERGE their rows into the
          existing artifact -- the per-entry patch path; the full
          from-scratch sweep still regenerates everything at the end
          of a batch)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Quality-gate pytest nodes for the rows-only entries (no DuckDB oracle
# can express them; each carries a recall / error-bound / invariant gate).
GATES: dict[str, list[str]] = {
    "x04_dedup_minhash": [
        "tests/test_ops_quality.py::test_minhash_recovers_exact_jaccard_pairs",
        "tests/test_ops_quality.py::test_minhash_deterministic_candidates_cover_high_jaccard",
    ],
    "x08_sim_ann_lsh": [
        "tests/test_ops_quality.py::test_lsh_topk_recall_vs_brute_force",
    ],
    "x15_sim_ann_ivf": [
        "tests/test_ops_quality.py::test_ivf_topk_recall_vs_brute_force",
    ],
    "x28_embedding_neardup_lsh": [
        "tests/test_ops_quality.py::test_lsh_neardup_recall_and_exactness_vs_exact_scan",
    ],
    "x16_sketch_distinct": [
        "tests/test_ops_quality.py::test_sketch_distinct_within_error_bound",
    ],
    "x17_sketch_quantiles": [
        "tests/test_ops_quality.py::test_sketch_quantiles_within_rank_error",
    ],
    "x32_pack_sequences": ["tests/test_packing.py"],
    "x35_semantic_dedup": [
        "tests/test_ops_quality.py::test_semantic_dedup_precision_and_coverage",
    ],
    "x65_compression_ratio": [
        "tests/test_ops_quality.py::test_compression_ratio_quality_gate",
    ],
    "x112_wau_sketch": [
        "tests/test_ops_quality.py::test_wau_sketch_tracks_exact_rolling_actives",
    ],
    "x261_hll_native": [
        "tests/test_ops_quality.py::test_hll_native_within_error",
    ],
    "x272_approx_top_k": [
        "tests/test_ops_quality.py::test_approx_top_k_matches_exact_heavy_hitters",
    ],
    "x285_freq_items": [
        "tests/test_ops_quality.py::test_freq_items_never_misses_frequent_values",
    ],
}


def main() -> None:
    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")

    from poc_parquet_publisher_spark.queries import REGISTRY, all_queries
    from poc_parquet_publisher_spark.session import build_session
    from tests.oracle_harness import compare, duckdb_connection

    all_queries()
    only = [n for n in os.environ.get("ONLY", "").split(",") if n]
    unknown = sorted(set(only) - set(REGISTRY))
    if unknown:
        sys.exit(f"ONLY names not in registry: {unknown}")
    spark = build_session(app_name="correctness_local")
    con = duckdb_connection(sf_dir)

    t0 = time.time()
    out: dict[str, dict] = {}
    todo = (
        {n: REGISTRY[n] for n in only} if only else REGISTRY
    )
    for name, spec in todo.items():
        row: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            df = spec.spark(spark, sf_dir)
            if spec.oracle is not None:
                r = compare(df, con, spec.oracle)
                row.update(
                    rows_match=r["rowcount_match"],
                    schema_match=r["cols_match"],
                    hash_match=r["values_match"],
                    spark_rows=r["spark_rows"],
                    oracle_rows=r["duck_rows"],
                )
                if not r["match"] and "first_diffs" in r:
                    row["err"] = f"value diff: {r['first_diffs'][:1]!r}"
            else:
                rows = df.collect()
                row.update(mode="rows_only", spark_rows=len(rows))
                row["gate_tests"] = GATES.get(name, [])
        except Exception as e:  # noqa: BLE001 -- artifact records the error
            row["err"] = f"{type(e).__name__}: {e}"[:500]
        out[name] = row
        status = "ok" if row["err"] is None else "ERR"
        print(f"  {name}: {status}", file=sys.stderr)

    # Run the rows-only quality gates once (deduplicated node list;
    # restricted to the ONLY set when patching).
    nodes = sorted(
        {
            n
            for entry, ns in GATES.items()
            for n in ns
            if not only or entry in only
        }
    )
    gates_pass = True
    gate_tail: list[str] = []
    if nodes:
        gate = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *nodes],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True,
            text=True,
        )
        gates_pass = gate.returncode == 0
        gate_tail = (
            gate.stdout.strip().splitlines()[-1:] if gate.stdout else []
        )
    for name, ns in GATES.items():
        if name in out and out[name].get("mode") == "rows_only":
            out[name]["gate_pass"] = gates_pass

    path = os.environ.get(
        "CORRECTNESS_OUT",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "CORRECTNESS_LOCAL.json",
        ),
    )
    if only and os.path.exists(path):
        # merge the patched rows into the existing artifact
        with open(path) as f:
            prior = json.load(f)
        prior.pop("_summary", None)
        prior.update(out)
        out = prior

    n_ok = sum(1 for r in out.values() if r["err"] is None)
    n_hash = sum(1 for r in out.values() if r["hash_match"])
    summary = {
        "sf_dir": sf_dir,
        "entries": len(out),
        "ok": n_ok,
        "hash_verified": n_hash,
        "rows_only": sum(
            1 for r in out.values() if r.get("mode") == "rows_only"
        ),
        "gates_pass": gates_pass,
        "gate_tail": gate_tail,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    if only:
        summary["patched"] = sorted(only)
    out["_summary"] = summary
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    if n_ok != len(out) - 1 or not gates_pass:
        sys.exit(1)


if __name__ == "__main__":
    main()
