"""LLM-data-pipeline extension queries (SURVEY.md section 2.4, BASELINE.json
north star): dedup, similarity search, text analysis, multimodal metadata.

Where the computation is SQL-expressible, each entry carries a DuckDB
oracle (dialect-mapped: split<->string_split, size<->len, instr<->strpos,
sha2<->sha256, regexp_replace needs the 'g' flag in DuckDB). Approximate
operators (MinHash LSH, hyperplane ANN, simhash banding) are rows-only for
the driver; their quality is validated against exact baselines in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..scale import zorder_key_sql
from ..ops import dedup, graph, sampling, similarity, text
from . import register

_STOP_EN = ", ".join(f"'{w}'" for w in text.LANG_STOPWORDS["en"])


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "x01_dedup_exact",
    """SELECT md5(lower(text)) AS h, MIN(doc_id) AS keep_id,
              count(*) AS dup_cnt
       FROM documents GROUP BY md5(lower(text)) ORDER BY h""",
    doc="exact dedup = one hash-groupBy (map-side partial agg); md5 keys "
        "cannot skew",
)
def x01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "doc_id", "text").orderBy("h")


@register(
    "x02_dedup_fingerprint",
    """SELECT md5(array_to_string(list_sort(list_distinct(
                string_split(lower(text), ' '))), ' ')) AS fingerprint,
              MIN(doc_id) AS keep_id, count(*) AS dup_cnt
       FROM documents
       GROUP BY 1 ORDER BY fingerprint""",
    doc="key-collision fingerprint (sorted distinct token bag) catches "
        "token reorderings exact dedup misses",
)
def x02_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.fingerprint_dedup(docs, "doc_id", "text").orderBy("fingerprint")


# x03's UNSCORED shingle-blocked pair-count stage, shared by
# x03/x24/x44/x68/x70 (Jaccard and containment both score from it --
# pairs-sized arithmetic, trivial). Each registry entry stays
# standalone (any one derives the counts on first use), but when
# several run in one session -- the bench and the driver's correctness
# sweep both do -- the shingle self-join runs ONCE and the consumers
# read the lazily-localCheckpoint'ed counts (near-dup-count-sized,
# tiny next to the corpus). Keyed by applicationId so a restarted
# session never sees a stale RDD handle.
_PAIRS_CACHE: dict[tuple, DataFrame] = {}


def _shared_pair_counts(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, k)
    counts = _PAIRS_CACHE.get(key)
    if counts is None:
        docs = load_table(spark, sf_dir, "documents")
        counts = dedup.shingle_pair_counts(
            docs, "doc_id", "text", k=k
        ).localCheckpoint(eager=False)
        _PAIRS_CACHE[key] = counts
    return counts


def _shared_jaccard_pairs(
    spark: SparkSession, sf_dir: str, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    return dedup.score_pair_counts_jaccard(
        _shared_pair_counts(spark, sf_dir, k), threshold
    )


# x03's pair derivation, shared verbatim by the x24 cluster oracle.
_X03_PAIRS_CTE = """t AS (
         SELECT doc_id,
                list_distinct(list_transform(
                  range(1, len(string_split(lower(text), ' ')) - 1),
                  i -> array_to_string(
                         (string_split(lower(text), ' '))[i:i+2], ' ')
                )) AS sh
         FROM documents
         WHERE len(string_split(lower(text), ' ')) >= 3
       ), e AS (
         SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM t
       ), p AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS inter
         FROM e a JOIN e b USING (shingle)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2, 3, 4
       ), pairs AS (
         SELECT id_a, id_b
         FROM p
         WHERE ROUND(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 4) >= 0.5
       )"""


@register(
    "x24_dedup_clusters",
    f"""WITH RECURSIVE {_X03_PAIRS_CTE},
       edges AS (
         SELECT id_a AS u, id_b AS v FROM pairs
         UNION
         SELECT id_b, id_a FROM pairs
       ),
       walk (node, lbl) AS (
         SELECT u, u FROM edges
         UNION
         SELECT e.u, w.lbl FROM edges e JOIN walk w ON w.node = e.v
       )
       SELECT node, MIN(lbl) AS rep FROM walk GROUP BY node
       ORDER BY node""",
    doc="transitive duplicate clusters over x03's near-dup pairs: "
        "min-label propagation (O(diameter) rounds, each one edge-sized "
        "join + min-groupBy; corpus rows never move); keep node == rep "
        "to dedup transitively. Oracle: recursive CTE min reachable id",
)
def x24_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _shared_jaccard_pairs(spark, sf_dir)
    return dedup.duplicate_clusters(pairs).orderBy("node")


@register(
    "x03_dedup_ngram_jaccard",
    """WITH t AS (
         SELECT doc_id,
                list_distinct(list_transform(
                  range(1, len(string_split(lower(text), ' ')) - 1),
                  i -> array_to_string(
                         (string_split(lower(text), ' '))[i:i+2], ' ')
                )) AS sh
         FROM documents
         WHERE len(string_split(lower(text), ' ')) >= 3
       ), e AS (
         SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM t
       ), p AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS inter
         FROM e a JOIN e b USING (shingle)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2, 3, 4
       )
       SELECT id_a, id_b,
              ROUND(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 4) AS jaccard
       FROM p
       WHERE ROUND(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 4) >= 0.5
       ORDER BY id_a, id_b""",
    doc="near-dup via 3-gram shingle blocking: candidates come from a "
        "shingle equi-join, never an O(n^2) cross join; hot-shingle cap "
        "guards quadratic blocks at scale (no-op on this corpus)",
)
def x03_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared_jaccard_pairs(spark, sf_dir).orderBy("id_a", "id_b")


@register(
    "x05_dedup_simhash",
    dedup.simhash_sql("duckdb", source="documents"),
    doc="64-bit SimHash as a pure expression pipeline (explode -> 64 "
        "conditional sums -> sign bits); oracle is the same SQL generated "
        "in the DuckDB dialect",
)
def x05_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_BRUTE_TOPK_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS raw_sim
  FROM (SELECT * FROM n WHERE vec_id < 20) q
  JOIN n c ON q.vec_id != c.vec_id
), r AS (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY raw_sim DESC, neighbor_id)
              AS BIGINT) AS rnk,
         ROUND(raw_sim, 4) AS sim
  FROM s
)
SELECT query_id, neighbor_id, rnk, sim FROM r
WHERE rnk <= 3 ORDER BY query_id, rnk
"""


@register(
    "x07_sim_bruteforce_topk",
    _BRUTE_TOPK_ORACLE,
    doc="exact cosine top-3 for 20 query vectors: query side broadcast as "
        "a numpy matrix, corpus streams through mapInPandas in Arrow "
        "batches (one BLAS matmul per batch, partial top-k per batch)",
)
def x07_sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return (
        similarity.brute_force_topk(emb, q, "vec_id", "embedding", k=3)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk")
    )


_NEARDUP_ORACLE_TMPL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS sim
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) >= {thr}
ORDER BY id_a, id_b
"""


@register(
    "x09_embedding_neardup",
    _NEARDUP_ORACLE_TMPL.format(thr=0.4),
    doc="embedding-cosine near-dup pairs; correctness tier is the exact "
        "pair scan, scale tier is x28 (LSH-banded candidates). The "
        "fixture embeddings are near-random (max pairwise cosine ~0.51), "
        "so the threshold sits at 0.4 to exercise non-empty output",
)
def x09_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.4
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "x10_text_tokens",
    f"""SELECT doc_id,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(lower(text),
                    '{text.TOKEN_REGEX}')) AS BIGINT) AS n_re_tokens,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents ORDER BY doc_id""",
    doc="token counting: whitespace + BPE-ish regex, expression-only",
)
def x10_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.token_stats(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "x11_text_quality",
    f"""SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_m,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_toks,
               ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / len(string_split(lower(text), ' ')), 4) AS avg_tok_len,
               ROUND(CAST(len(list_filter(string_split(lower(text), ' '),
                         t -> t IN ({_STOP_EN}))) AS DOUBLE)
                     / len(string_split(lower(text), ' ')), 4) AS stop_ratio,
               ROUND(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                          AS DOUBLE)
                     / CAST(length(text) AS DOUBLE), 4) AS alpha_ratio
        FROM documents ORDER BY doc_id""",
    doc="quality scoring: length/stopword/alpha ratios (DuckDB "
        "regexp_replace needs the 'g' flag to match Spark's replace-all)",
)
def x11_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.quality_scores(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "x12_text_langid",
    text.lang_id_oracle_sql("documents", "doc_id"),
    doc="stopword-vote language ID; tie-break ladder reproduced verbatim "
        "in the generated oracle SQL",
)
def x12_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.lang_id(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "x14_text_rolling_fingerprint",
    text.rolling_fingerprint_oracle_sql("documents", "doc_id", window=8),
    doc="winnowing-style rolling fingerprint: min md5 over 8-token "
        "shingles, expression-only (narrow, codegen); oracle generated "
        "in the DuckDB dialect from the same spec",
)
def x14_text_rolling_fingerprint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.rolling_fingerprint(docs, "doc_id", "text", window=8).orderBy(
        "doc_id"
    )


@register(
    "x19_tfidf",
    text.tf_idf_oracle_sql("documents", "doc_id", min_df=2,
                           top_terms_per_doc=5),
    doc="top-5 TF-IDF terms per document: two groupBys sharing the term "
        "shuffle key + a hash join back on the small aggregated term "
        "table; widest intermediate is one row per distinct (doc, term)",
)
def x19_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        text.tf_idf(docs, "doc_id", "text", min_df=2, top_terms_per_doc=5)
        .select("doc", "term", "tf", "df_cnt", "tfidf")
        .orderBy("doc", "rnk")
        .drop("rnk")
    )


@register(
    "x20_text_scrub",
    text.scrub_oracle_sql("documents", "doc_id"),
    doc="PII/URL scrubbing: chained regexp_replace to typed placeholders "
        "(<URL>/<EMAIL>/<PHONE>), codegen-only; DuckDB oracle needs the "
        "'g' flag for replace-all parity",
)
def x20_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.scrub(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "x18_deterministic_split",
    sampling.split_sql("duckdb", "documents", "doc_id", 0.25),
    doc="content-keyed train/test assignment: md5-bucket thresholding, a "
        "pure function of the key -- stable under retries, repartitioning, "
        "and engines (unlike df.sample), hash-verified row by row",
)
def x18_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        sampling.deterministic_split(docs, "doc_id", test_fraction=0.25)
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


@register(
    "x27_streaming_window",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
              count(*) AS n_events,
              ROUND(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE), 4)
                  AS sum_value
       FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="Q27's STREAMING variant run to completion: file readStream -> "
        "watermarked tumbling window -> complete-mode memory sink "
        "(availableNow drain). Hash-matched against the same batch SQL "
        "-- stream == batch is the exactly-once/window-correctness "
        "contract. Events re-materialize as micros parquet first (the "
        "nanos physical type can't stream through a fixed schema)",
)
def x27_streaming_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import uuid

    from ..streaming.windows import streaming_hourly_counts

    batch = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="x27_stream_")
    sink = f"x27_sink_{uuid.uuid4().hex[:8]}"
    try:
        src = os.path.join(tmp, "events")
        batch.repartition(4).write.mode("overwrite").parquet(src)
        rebatch = spark.read.parquet(src)
        q = streaming_hourly_counts(
            spark,
            src,
            rebatch.schema,
            os.path.join(tmp, "ckpt"),
            sink_table=sink,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "stream drain did not finish within 300 s; "
                "refusing to return a partially-filled sink"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return (
        spark.table(sink)
        .select(
            F.col("window_start").cast("timestamp_ntz").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "x26_boilerplate_ngrams",
    text.boilerplate_ngrams_oracle_sql("documents", "doc_id", k=3,
                                       min_docs=3),
    doc="boilerplate profile: 3-gram shingles shared by >= 3 documents "
        "(headers/templates curation strips). Per-doc distinct shingles "
        "make count(*) the document frequency -- one partial+final "
        "hash-groupBy, no distinct aggregate",
)
def x26_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.boilerplate_ngrams(docs, "doc_id", "text", k=3, min_docs=3)


_MIX_FRACTIONS = {"es": 0.75, "zh": 0.25}


@register(
    "x25_stratified_sample",
    sampling.stratified_sample_sql(
        "duckdb", "documents", "doc_id", "lang", _MIX_FRACTIONS,
        default_fraction=0.5,
    ).replace("SELECT *", "SELECT doc_id, lang, source")
    + " ORDER BY doc_id",
    doc="per-stratum deterministic sampling (data mixing): each language "
        "keeps its target rate via key-hash thresholding -- a pure "
        "narrow filter (per-stratum threshold folds into one CASE), "
        "stable under retries/rescale, no RNG state, no shuffle",
)
def x25_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        sampling.stratified_sample(
            docs, "doc_id", "lang", _MIX_FRACTIONS, default_fraction=0.5
        )
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@register(
    "x13_multimodal_meta",
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
              sha256(text) AS sha_hex
       FROM documents ORDER BY doc_id""",
    doc="typed metadata over opaque payloads (byte length + content hash); "
        "the binary decode path itself is ops/multimodal.py (mapInPandas), "
        "exercised in tests -- no codec libs in this container",
)
def x13_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("byte_len"),
        F.sha2(F.col("text"), 256).alias("sha_hex"),
    ).orderBy("doc_id")


@register(
    "x21_sessionize",
    """WITH ordered AS (
         SELECT user_id, event_id, ts,
                lag(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev_ts
         FROM events
       ), flagged AS (
         SELECT user_id, event_id, ts,
                CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_session
         FROM ordered
       ), sessions AS (
         SELECT user_id, event_id, ts,
                CAST(SUM(new_session) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS session_id
         FROM flagged
       )
       SELECT user_id, session_id, count(*) AS n_events,
              min(ts) AS session_start, max(ts) AS session_end
       FROM sessions GROUP BY user_id, session_id
       ORDER BY user_id, session_id""",
    doc="gap-based sessionization (30 min idle closes a session): lag to "
        "detect gaps, running sum of gap flags as the session id, then a "
        "per-session rollup -- the batch analog of a session window, one "
        "shuffle on user_id reused by both window and groupBy",
)
def x21_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # NTZ won't cast to long directly; timestamp->long = epoch seconds
    # (value-preserving under the pinned UTC session zone)
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0).alias(
            "new_session"
        ),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(run).cast("long")
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "x22_histogram",
    """SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
              count(*) AS n,
              ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS sum_value
       FROM events GROUP BY bucket ORDER BY bucket""",
    doc="fixed-width histogram via floor-division bucketing (portable; "
        "DuckDB has no width_bucket): one hash aggregate, the constant-"
        "memory distribution profile",
)
def x22_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.floor(F.col("value") / 10.0).cast("long").alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
            ).alias("sum_value"),
        )
        .orderBy("bucket")
    )


@register(
    "x29_asof_join",
    """SELECT p.event_id AS purchase_id, p.user_id,
              p.ts AS purchase_ts,
              c.click_id, c.click_ts, c.click_value
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       LEFT JOIN LATERAL (
         SELECT event_id AS click_id, ts AS click_ts,
                ROUND(value, 4) AS click_value
         FROM events c
         WHERE c.user_id = p.user_id AND c.event_type = 'click'
           AND (c.ts < p.ts
                OR (c.ts = p.ts AND c.event_id < p.event_id))
         ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
       ) c ON TRUE
       ORDER BY purchase_id""",
    doc="as-of join: each purchase picks the user's most recent strictly-"
        "prior click. Spark side is the union+window form (ONE user_id "
        "shuffle, O(1) running state -- ops/temporal.py asof_join); the "
        "oracle is an independent LATERAL argmax formulation, so the "
        "hash match checks semantics, not a shared plan",
)
def x29_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import temporal

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    joined = temporal.asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="ts",
        right_values={
            "event_id": "click_id",
            "ts": "click_ts",
            "value": "click_value",
        },
        left_order="purchase_id",
        right_order="event_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        F.round("click_value", 4).alias("click_value"),
    ).orderBy("purchase_id")


@register(
    "x30_range_join",
    """WITH e AS (SELECT event_id AS error_id, ts AS error_ts
                  FROM events WHERE event_type = 'error'),
            c AS (SELECT event_id, ts, value
                  FROM events WHERE event_type = 'click')
       SELECT e.error_id,
              count(c.event_id) AS n_clicks,
              ROUND(CAST(COALESCE(
                    SUM(CAST(c.value AS DECIMAL(18,4))), 0) AS DOUBLE), 4)
                  AS sum_click_value
       FROM e LEFT JOIN c
         ON c.ts >= e.error_ts - INTERVAL 5 MINUTE
        AND c.ts <= e.error_ts + INTERVAL 5 MINUTE
       GROUP BY e.error_id
       ORDER BY e.error_id""",
    doc="tolerance range join: clicks within +/-5 minutes of each error "
        "event (any user). Spark side blocks on tolerance-width time "
        "buckets -- the smaller (error) side probes its 3 covering "
        "buckets, the join is a bucket equi-join + exact residual "
        "filter (ops/temporal.py range_join_pairs), never a nested "
        "loop; the oracle states the raw inequality predicate",
)
def x30_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import temporal

    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("error_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    pairs = temporal.range_join_pairs(
        errors, clicks, "error_ts", "click_ts", tolerance_seconds=300
    )
    per_error = pairs.groupBy("error_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(
            F.sum(F.col("click_value").cast("decimal(18,4)")).cast("double"),
            4,
        ).alias("sum_click_value"),
    )
    return (
        errors.select("error_id")
        .join(per_error, "error_id", "left")
        .select(
            "error_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("sum_click_value", F.lit(0.0)).alias(
                "sum_click_value"
            ),
        )
        .orderBy("error_id")
    )


@register(
    "x31_repetition_scores",
    text.repetition_scores_oracle_sql("documents", "doc_id"),
    doc="within-document repetition (Gopher-style gates): duplicate-"
        "token ratio (narrow, scan-speed) + modal-bigram mass (explode "
        "-> two hash-groupBys on the doc key -> join back to the narrow "
        "base; widest intermediate is one row per distinct (doc, "
        "bigram), never corpus-quadratic)",
)
def x31_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.repetition_scores(docs, "doc_id", "text").orderBy("doc_id")


_TOKEN_BUDGETS = {"es": 5000, "zh": 2000}


@register(
    "x33_token_budget_sample",
    sampling.token_budget_sample_sql(
        "documents",
        "doc_id",
        "lang",
        "len(string_split(lower(text), ' '))",
        _TOKEN_BUDGETS,
        default_budget=1000,
    ),
    doc="token-budget data mixing: each language keeps rows in "
        "deterministic md5(key) order until its TOKEN cap (not row "
        "fraction) is hit -- the mixture primitive when recipe targets "
        "are token counts. One shuffle on the stratum key; running-sum "
        "window, inclusive cap",
)
def x33_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.lower(F.col("text")), " "))
        .cast("long")
        .alias("n_toks"),
    )
    return (
        sampling.token_budget_sample(
            with_toks, "doc_id", "lang", "n_toks", _TOKEN_BUDGETS,
            default_budget=1000,
        )
        .select("doc_id", "lang", "n_toks", "cum_tokens")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Rows-only approximate operators (oracle=None). Registered LAST so the
# driver's fixed-size correctness window is filled entirely by
# oracle-hashed entries; these are validated against exact baselines in
# tests/ instead (recall / error-bound / invariant gates).
# ---------------------------------------------------------------------------


@register(
    "x04_dedup_minhash",
    None,  # approximate: validated against exact Jaccard in tests
    doc="MinHash+LSH banded near-dup join (pyspark.ml), the sub-quadratic "
        "scale path; rows-only driver check",
)
def x04_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hash_tables=8,
        jaccard_distance_threshold=0.5,
    ).orderBy("id_a", "id_b")


@register(
    "x06_simhash_neardup",
    dedup.simhash_pairs_oracle_sql("documents", max_hamming=3),
    doc="simhash near-dup pairs via 16-bit banding (pigeonhole: hamming<=3 "
        "pairs share a band) -- equi-join, no cross join. Oracle: the "
        "x05 simhash SQL + band self-join + per-bit Hamming, all plain "
        "SQL, so the full pair set is hash-verified (plus the exactness "
        "tests)",
)
def x06_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sim = dedup.simhash(docs, "doc_id", "text")
    return dedup.simhash_hamming_pairs(sim, max_hamming=3).orderBy(
        "id_a", "id_b"
    )


@register(
    "x08_sim_ann_lsh",
    None,  # approximate; recall vs brute force asserted in tests
    doc="random-hyperplane LSH ANN: deterministic md5-derived hyperplanes, "
        "banded signature equi-join for candidates, scoring via a "
        "candidate->corpus-vector equi-join (only the query matrix is "
        "broadcast) -- the 100 TB path: the corpus is hash-partitioned "
        "by bucket, never cross-joined, never collected",
)
def x08_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return (
        similarity.lsh_topk(
            emb, q, "vec_id", "embedding", dim=64, k=3, n_planes=16, n_bands=4
        )
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk")
    )


@register(
    "x15_sim_ann_ivf",
    None,  # approximate candidate set; recall vs brute force in tests
    doc="IVF-flat ANN: k-means coarse quantizer, queries probe n_probe "
        "nearest centroids, candidates from an equi-join on centroid id "
        "(corpus hash-partitioned by cluster; ~n_probe/n_centroids of it "
        "scanned per query), exact cosine scoring via the same "
        "candidate->vector equi-join as x08",
)
def x15_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return (
        similarity.ivf_topk(
            emb, q, "vec_id", "embedding", k=3, n_centroids=16, n_probe=4
        )
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk")
    )


@register(
    "x28_embedding_neardup_lsh",
    None,  # approximate candidate set; recall vs the exact x09 scan in tests
    doc="scale-tier embedding near-dup: hyperplane-LSH banded self-join "
        "for candidate pairs, then exact cosine on the pair (vectors "
        "attached via two equi-joins back to the corpus). Sub-quadratic "
        "and fully distributed -- x09's exact all-pairs scan stays as "
        "the oracle/correctness tier only",
)
def x28_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_neardup_pairs(
        emb, "vec_id", "embedding", dim=64, threshold=0.4,
        n_planes=16, n_bands=8,
    ).orderBy("id_a", "id_b")


@register(
    "x16_sketch_distinct",
    None,  # HLL++ sketch is engine-specific; error bound gated in tests
    doc="approximate distinct counts (HyperLogLog++, rsd=0.02): the "
        "constant-memory path for cardinality at 100 TB where exact "
        "count(DISTINCT) would shuffle every key",
)
def x16_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
        F.approx_count_distinct("o_orderkey", rsd=0.02).alias("approx_orders"),
    )


@register(
    "x17_sketch_quantiles",
    None,  # sketch-based quantiles differ per engine; tolerance in tests
    doc="approximate quantiles (Greenwald-Khanna, accuracy 1e4) over "
        "order totals: single-pass, mergeable per partition -- the "
        "bounded-memory alternative to a full sort",
)
def x17_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.percentile_approx(
            "o_totalprice", [0.5, 0.9, 0.99], 10000
        ).alias("pcts")
    ).select(
        F.round(F.element_at("pcts", 1), 4).alias("p50"),
        F.round(F.element_at("pcts", 2), 4).alias("p90"),
        F.round(F.element_at("pcts", 3), 4).alias("p99"),
    )


@register(
    "x32_pack_sequences",
    None,  # greedy bin packing is not SQL-expressible; invariants
    # (every doc assigned once, budget respected, determinism under
    # repartitioning) gated in tests/test_packing.py
    doc="sequence packing for training batches: docs hash into packing "
        "buckets (one shuffle), a first-fit-decreasing packer runs per "
        "bucket in applyInPandas (only (id, n_tokens) crosses the "
        "Python boundary), sequence ids are (bucket << 32) | local -- "
        "globally unique with zero coordination",
)
def x32_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import packing

    docs = load_table(spark, sf_dir, "documents")
    with_toks = docs.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), " "))
        .cast("long")
        .alias("n_toks"),
    )
    return packing.pack_sequences(
        with_toks, "doc_id", "n_toks", budget=512, n_buckets=16
    ).orderBy("doc_id")


@register(
    "x23_curate_pipeline",
    __import__(
        "poc_parquet_publisher_spark.ops.curate", fromlist=["curate"]
    ).curate_oracle_sql("documents", "doc_id"),
    doc="end-to-end corpus curation: scrub -> quality/language gates -> "
        "exact dedup -> near-dup removal -> deterministic split, narrow "
        "filters first so the only expensive stage (the shingle join) "
        "sees the already-shrunk corpus. Oracle: ONE DuckDB query "
        "composing the already-verified stage oracles (x20 scrub, x12 "
        "lang ladder, x01 dedup, x03 pairs, x24 recursive CC, x18 "
        "split) -- the composition itself is hash-checked, plus "
        "invariants in tests",
)
def x23_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import curate

    docs = load_table(spark, sf_dir, "documents")
    return curate.curate(docs, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Round-3 additions: contamination, semantic dedup, weighted sampling,
# unigram-LM quality, mixture reporting
# ---------------------------------------------------------------------------

# x34's oracle mirrors x03's k=3 shingle CTE; the benchmark is the
# deterministic doc_id % 25 == 0 slice (a stand-in eval set -- ~4% of
# docs, small enough that the Spark side broadcasts it by contract).
_X34_CONTAMINATION_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(string_split(lower(text), ' ')) - 1),
           i -> array_to_string(
                  (string_split(lower(text), ' '))[i:i+2], ' ')
         )) AS sh
  FROM documents
  WHERE len(string_split(lower(text), ' ')) >= 3
), e AS (
  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM t
), bench AS (
  SELECT DISTINCT shingle FROM e WHERE doc_id % 25 = 0
), ov AS (
  SELECT e.doc_id, count(*) AS n_overlap
  FROM e JOIN bench USING (shingle) GROUP BY e.doc_id
), per AS (
  SELECT DISTINCT doc_id, n_sh FROM e
)
SELECT per.doc_id AS doc, per.n_sh,
       CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       ROUND(CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / per.n_sh, 4)
           AS contamination
FROM per LEFT JOIN ov USING (doc_id)
ORDER BY doc
"""


@register(
    "x34_contamination",
    _X34_CONTAMINATION_ORACLE,
    doc="benchmark-contamination scores: fraction of each doc's distinct "
        "3-gram shingles that occur in the eval set (doc_id % 25 == 0 "
        "slice). Benchmark shingles ride a broadcast join; the corpus "
        "side is one explode + one groupBy(doc) -- decontamination is "
        "a threshold filter on the score",
)
def x34_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    return dedup.contamination_scores(
        docs, bench, "doc_id", "text", k=3
    ).orderBy("doc")


@register(
    "x35_semantic_dedup",
    None,  # k-means clustering is not SQL-expressible; precision /
    # co-clustered-recall / determinism gated in tests/test_ops_quality.py
    doc="SemDeDup-style semantic dedup: coarse k-means clusters (trained "
        "on a bounded sample), within-cluster cosine >= threshold drops "
        "the higher id. Never all-pairs; cross-cluster dups are the "
        "documented recall trade (Abbas et al. 2023)",
)
def x35_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.4, n_centroids=8
    ).orderBy("id")


@register(
    "x36_weighted_sample",
    "SELECT * FROM ("
    + sampling.weighted_sample_sql("documents", "doc_id", "n_chars", n=100)
    + ") ORDER BY doc_id",
    doc="deterministic weighted priority sample: 100 docs by priority "
        "u/w (u = md5-derived 32-bit uniform, w = n_chars) -- "
        "division-only keys are IEEE-exact cross-engine, one "
        "TakeOrdered, no shuffle, stable under retries",
)
def x36_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        sampling.weighted_sample(docs, "doc_id", "n_chars", n=100)
        .select("doc_id", "n_chars", "priority")
        .orderBy("doc_id")
    )


@register(
    "x37_unigram_logprob",
    text.unigram_logprob_oracle_sql("documents", "doc_id"),
    doc="per-doc mean unigram log10-prob under the corpus's own unigram "
        "LM (cheap fluency proxy, ancestor of perplexity filtering): "
        "two groupBys + a join on the aggregated term table, DECIMAL-"
        "accumulated so shuffle order never changes the hash",
)
def x37_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.unigram_logprob(docs, "doc_id", "text").orderBy("doc")


@register(
    "x38_source_mix",
    text.source_mix_stats_oracle_sql("documents", "source"),
    doc="mixture report per source: doc/token counts, token share, and "
        "the uniform-target reweight factor -- the bookkeeping half of "
        "data mixing (enforcement = stratified/token-budget samplers); "
        "one hash-groupBy + broadcast totals",
)
def x38_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.source_mix_stats(docs, "source", "text").orderBy("stratum")


@register(
    "x39_chunk_documents",
    __import__(
        "poc_parquet_publisher_spark.ops.packing", fromlist=["packing"]
    ).chunk_documents_oracle_sql("documents", "doc_id", 64, 48),
    doc="overlapping token-window chunking (RAG / long-doc context "
        "prep): chunk i = tokens [i*48, i*48+64); narrow explode of "
        "integer-arithmetic windows, no shuffle, no Python, "
        "bit-identical cross-engine",
)
def x39_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import packing

    docs = load_table(spark, sf_dir, "documents")
    return packing.chunk_documents(
        docs, "doc_id", "text", chunk_tokens=64, stride=48
    ).orderBy("doc_id", "chunk_idx")


@register(
    "x40_minhash_deterministic",
    dedup.minhash_banded_pairs_oracle_sql("documents", "doc_id"),
    doc="deterministic MinHash-LSH: 8 md5-sliced minhash components "
        "(2 digests/shingle), 4 bands of 2, candidates = docs sharing "
        "a band -- unlike pyspark.ml's x04 the hashes are "
        "engine-independent, so the full pair set is oracle-verified, "
        "not just rows-counted. Signatures fold over the shingle array "
        "(no corpus explode); one groupBy(band) shuffle",
)
def x40_minhash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_banded_pairs(docs, "doc_id", "text", k=3).orderBy(
        "id_a", "id_b"
    )


@register(
    "x41_heavy_hitters",
    """WITH c AS (
         SELECT l_suppkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1
       ), t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM c)
       SELECT key, cnt, ROUND(cnt / total, 4) AS share
       FROM c, t ORDER BY cnt DESC, key LIMIT 20""",
    doc="skew diagnostic: exact top-20 heaviest join keys with counts "
        "and share -- decides salted_join / AQE skew handling. One "
        "hash-groupBy + TakeOrdered, never a full sort",
)
def x41_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import scale

    li = load_table(spark, sf_dir, "lineitem")
    return scale.heavy_hitters(li, "l_suppkey", n=20)


@register(
    "x42_shard_shuffle",
    sampling.shard_shuffle_sql("documents", "doc_id", n_shards=8),
    doc="deterministic pre-training shard shuffle: (shard, pos) from "
        "two independent md5 draws -- a reproducible global order with "
        "no RNG state; one shuffle on the shard key, windows run per "
        "shard in parallel (never a single global sort)",
)
def x42_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        sampling.shard_shuffle(docs, "doc_id", n_shards=8)
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")
    )


@register(
    "x43_profile_numeric",
    __import__(
        "poc_parquet_publisher_spark.ops.profile", fromlist=["profile"]
    ).profile_numeric_oracle_sql(
        "orders", ["o_custkey", "o_orderkey", "o_totalprice"]
    ),
    doc="column profiling (the ANALYZE/Deequ pass): nulls, exact "
        "distinct, min/max/mean per numeric column, all from ONE scan "
        "(single agg row unpivoted via stack); mean is DECIMAL-"
        "accumulated. At 100 TB swap exact distinct for x16's HLL++",
)
def x43_profile_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import profile

    orders = load_table(spark, sf_dir, "orders")
    return profile.profile_numeric(
        orders, ["o_custkey", "o_orderkey", "o_totalprice"]
    ).orderBy("col")


@register(
    "x44_containment_pairs",
    """WITH t AS (
         SELECT doc_id,
                list_distinct(list_transform(
                  range(1, len(string_split(lower(text), ' ')) - 1),
                  i -> array_to_string(
                         (string_split(lower(text), ' '))[i:i+2], ' ')
                )) AS sh
         FROM documents
         WHERE len(string_split(lower(text), ' ')) >= 3
       ), e AS (
         SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM t
       ), p AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS inter
         FROM e a JOIN e b USING (shingle)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2, 3, 4
       )
       SELECT id_a, id_b,
              ROUND(CAST(inter AS DOUBLE) / least(n_a, n_b), 4)
                  AS containment
       FROM p
       WHERE ROUND(CAST(inter AS DOUBLE) / least(n_a, n_b), 4) >= 0.8
       ORDER BY id_a, id_b""",
    doc="shingle containment pairs (inter / min set size): the "
        "asymmetric pass that catches a short doc quoted inside a long "
        "one, which symmetric Jaccard under-scores; scores the SAME "
        "shared pair-count stage as x03 (derived once per session)",
)
def x44_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.score_pair_counts_containment(
        _shared_pair_counts(spark, sf_dir), threshold=0.8
    ).orderBy("id_a", "id_b")


@register(
    "x45_duplicate_spans",
    dedup.duplicate_spans_oracle_sql("documents", "doc_id", "text", k=5),
    doc="exact duplicate-span detection (Lee et al. 2022 substring-dedup "
        "signal): per-doc fraction of token positions covered by a "
        "5-token window occurring >= 2 times corpus-wide; positional "
        "windows exploded once, duplicate hashes via hash-groupBy + "
        "LeftSemi probe (hot-key-safe: partial agg + AQE-splittable, "
        "unlike an analytic window), positions exploded x k -- "
        "O(total_tokens * k), never pairwise",
)
def x45_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.duplicate_spans(docs, "doc_id", "text", k=5).orderBy(
        "doc_id"
    )


@register(
    "x46_temperature_mixture",
    sampling.temperature_mixture_sql("documents", "source", "text"),
    doc="temperature-scaled mixture schedule at T=2 (w_i ~ sqrt(share)): "
        "the multilingual/multi-source upweight-the-tail sampling plan; "
        "alpha=1/2 keeps it oracle-hash-exact (IEEE sqrt is correctly "
        "rounded, pow is not); sqrt floor-scaled to ints before summing "
        "so the denominator is order-independent",
)
def x46_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sampling.temperature_mixture(docs, "source", "text").orderBy(
        "stratum"
    )


@register(
    "x47_vocab_coverage",
    text.vocab_coverage_sql("documents", "text", top_n=100),
    doc="vocabulary coverage curve: top-100 tokens with cumulative "
        "corpus-coverage fraction (tokenizer/vocab construction); "
        "explode + hash-groupBy + TakeOrdered; the only window runs "
        "over the already-limited 100 rows",
)
def x47_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.vocab_coverage(docs, "text", top_n=100)


@register(
    "x48_session_window",
    """WITH ordered AS (
         SELECT user_id, event_id, ts,
                lag(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev_ts
         FROM events
       ), flagged AS (
         SELECT user_id, event_id, ts,
                CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_session
         FROM ordered
       ), sessions AS (
         SELECT user_id, ts,
                SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)
                    AS session_id
         FROM flagged
       )
       SELECT user_id, MIN(ts) AS session_start,
              MAX(ts) + INTERVAL 30 MINUTE AS session_end,
              count(*) AS n_events
       FROM sessions GROUP BY user_id, session_id
       ORDER BY user_id, session_start""",
    doc="native dynamic session windows (F.session_window, gap 30 min): "
        "the operator x21's lag/gap method emulates relationally; "
        "streaming-capable with watermark-evicted state. Oracle is the "
        "relational mirror -- note the >= split: a gap exactly equal to "
        "the gap duration starts a NEW session (window ends exclusive)",
)
def x48_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import session_event_counts

    events = load_table(spark, sf_dir, "events")
    return session_event_counts(
        events, key_col="user_id", ts_col="ts", gap="30 minutes"
    ).orderBy("user_id", "session_start")


@register(
    "x49_pii_stats",
    text.pii_stats_sql("documents", "doc_id", "text"),
    doc="per-doc PII counts by type (the audit half of the privacy "
        "pass; x20 scrub is the enforcement half): counts mirror the "
        "scrub's progressive masking order so n_pii == n_redactions "
        "exactly; pure regexp_count chain, codegen, scan-speed",
)
def x49_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.pii_stats(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "x50_snapshot_diff",
    """WITH old AS (
         SELECT doc_id, text FROM documents WHERE doc_id % 10 != 3
       ), new AS (
         SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END
                    AS text
         FROM documents WHERE doc_id % 10 != 6
       ), oh AS (SELECT doc_id, md5(text) AS old_h FROM old),
       nh AS (SELECT doc_id, md5(text) AS new_h FROM new)
       SELECT COALESCE(oh.doc_id, nh.doc_id) AS doc_id,
              CASE WHEN old_h IS NULL THEN 'added'
                   WHEN new_h IS NULL THEN 'removed'
                   WHEN old_h = new_h THEN 'unchanged'
                   ELSE 'changed' END AS status
       FROM oh FULL OUTER JOIN nh USING (doc_id)
       ORDER BY doc_id""",
    doc="corpus snapshot diff (dataset-versioning audit): added/removed/"
        "changed/unchanged by content hash across two corpus versions "
        "derived deterministically from the fixture (doc_id%10=3 "
        "missing from old, doc_id%10=6 dropped from new, doc_id%7=0 "
        "edited); one full-outer equi-join of two narrow (id, md5) "
        "projections -- content never shuffles",
)
def x50_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import incremental

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 3).select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % 10 != 6)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" v2"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    return incremental.snapshot_diff(old, new, "doc_id", "text").orderBy(
        "doc_id"
    )


@register(
    "x51_oov_ratio",
    text.oov_ratio_sql("documents", "doc_id", "text", top_n=100),
    doc="per-doc out-of-vocabulary ratio vs the corpus's own top-100 "
        "vocab (OOV filtering; the measurement side of x47's coverage "
        "curve): vocab is a TakeOrdered broadcast, the token stream "
        "explodes once and never shuffles beyond the doc-key groupBy",
)
def x51_oov_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.oov_ratio(docs, "doc_id", "text", top_n=100).orderBy(
        "doc_id"
    )


@register(
    "x52_bigram_logprob",
    text.bigram_logprob_oracle_sql("documents", "doc_id", "text"),
    doc="per-doc mean bigram conditional log10-prob under the corpus's "
        "own bigram model (one order above x37's unigram proxy: junk "
        "SEQUENCES of individually-common tokens score low); context "
        "counts derived from the bigram table so the conditional "
        "normalizes exactly; x37's round-then-DECIMAL determinism",
)
def x52_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.bigram_logprob(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "x53_json_quarantine",
    """WITH src AS (
         SELECT event_id,
                CASE WHEN event_id % 13 = 0 THEN '{bad json'
                     WHEN event_id % 17 = 0 THEN '{}'
                     ELSE props END AS props
         FROM events
       )
       SELECT event_id,
              CASE WHEN (CASE WHEN props IS NOT NULL AND json_valid(props)
                              THEN json_extract_string(props, '$.k')
                              ELSE NULL END) IS NOT NULL
                   THEN 'ok' ELSE 'quarantined' END AS status,
              CASE WHEN props IS NOT NULL AND json_valid(props)
                   THEN json_extract_string(props, '$.k')
                   ELSE NULL END AS k
       FROM src ORDER BY event_id""",
    doc="ingest quarantine for serialized-JSON columns: rows whose "
        "required JSON path fails to extract (malformed payload or "
        "missing key) are flagged instead of poisoning the pipeline -- "
        "the validation the reference's blind-marshal wire path lacks; "
        "corruption injected deterministically (event_id%13 malformed, "
        "%17 key-missing); row-local expressions, scan-speed. DuckDB "
        "json_extract errors on bad JSON so the oracle guards with "
        "json_valid -- Spark's get_json_object is NULL-on-bad for free",
)
def x53_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.ingest import json_quarantine

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 13 == 0, F.lit("{bad json"))
        .when(F.col("event_id") % 17 == 0, F.lit("{}"))
        .otherwise(F.col("props"))
        .alias("props"),
    )
    return json_quarantine(ev, "event_id", "props").orderBy("event_id")


@register(
    "x54_salted_join_agg",
    """SELECT l.l_suppkey, s.s_name,
              ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,8))
                    * (1 - CAST(l.l_discount AS DECIMAL(30,8))))
                    AS DOUBLE), 4) AS revenue
       FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
       GROUP BY l.l_suppkey, s.s_name
       ORDER BY l.l_suppkey""",
    doc="skew-salted join under the hash gate: per-supplier revenue via "
        "scale.salted_join (big side salted into 16 sub-keys, dim side "
        "replicated per salt) must be row-identical to the plain join "
        "the oracle runs -- the salting is pure partitioning, zero "
        "semantics; DECIMAL-accumulated revenue",
)
def x54_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import scale

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    j = scale.salted_join(li, sup, "l_suppkey", n_salts=16)
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(30,8)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(30,8)"))
    )
    return (
        j.groupBy("l_suppkey", "s_name")
        .agg(F.round(rev.cast("double"), 4).alias("revenue"))
        .orderBy("l_suppkey")
    )


@register(
    "x55_referential_integrity",
    """WITH e1 AS (
         SELECT 'orders->customer' AS edge,
                CAST(count(*) AS BIGINT) AS n_child,
                CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_orphans
         FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
       ), e2 AS (
         SELECT 'lineitem->orders' AS edge,
                CAST(count(*) AS BIGINT) AS n_child,
                CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_orphans
         FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
       ), e3 AS (
         SELECT 'lineitem->supplier' AS edge,
                CAST(count(*) AS BIGINT) AS n_child,
                CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_orphans
         FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
       ), u AS (
         SELECT * FROM e1 UNION ALL SELECT * FROM e2
         UNION ALL SELECT * FROM e3
       )
       SELECT edge, n_child, n_orphans,
              ROUND(CAST(n_orphans AS DOUBLE) / n_child, 4) AS orphan_rate
       FROM u ORDER BY edge""",
    doc="referential-integrity audit (Deequ-style DQ): orphan counts and "
        "rates for three FK edges of the fixture schema; each edge is "
        "one LEFT ANTI equi-join (broadcast for dim parents) feeding a "
        "1-row count -- the check a 100 TB ingest runs before joins "
        "silently drop rows",
)
def x55_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import profile

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    return profile.referential_integrity(
        [
            ("orders->customer", orders, "o_custkey", customer, "c_custkey"),
            ("lineitem->orders", lineitem, "l_orderkey", orders, "o_orderkey"),
            (
                "lineitem->supplier",
                lineitem,
                "l_suppkey",
                supplier,
                "s_suppkey",
            ),
        ]
    ).orderBy("edge")


@register(
    "x56_decile_report",
    __import__(
        "poc_parquet_publisher_spark.ops.profile", fromlist=["profile"]
    ).decile_report_oracle_sql("documents", "n_chars"),
    doc="distribution calibration report: bucket docs by the EXACT "
        "interpolated decile thresholds of n_chars (Spark percentile == "
        "DuckDB quantile_cont bit-for-bit, the q30 precedent), report "
        "per-bucket counts and ranges -- the table behind 'drop the "
        "bottom quality decile'; thresholds ride a broadcast 1-row "
        "array, assignment is a narrow fold, report is one hash agg. "
        "At 100 TB swap percentile_approx (x17) for the exact agg",
)
def x56_decile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import profile

    docs = load_table(spark, sf_dir, "documents")
    return profile.decile_report(docs, "n_chars").orderBy("bucket")


@register(
    "x57_topk_per_source",
    """WITH ranked AS (
         SELECT source, doc_id, n_chars,
                CAST(row_number() OVER (PARTITION BY source
                                        ORDER BY n_chars DESC, doc_id)
                     AS BIGINT) AS rnk
         FROM documents
       )
       SELECT source, doc_id, n_chars, rnk
       FROM ranked WHERE rnk <= 3
       ORDER BY source, rnk""",
    doc="take-best-N-per-domain curation selection: top-3 docs per "
        "source by length with a total tiebreak; ONE shuffle on the "
        "stratum key, per-key windows run in parallel (never a global "
        "sort), the rnk<=3 filter prunes window output early",
)
def x57_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), "doc_id"
    )
    return (
        docs.select(
            "source",
            "doc_id",
            "n_chars",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("source", "rnk")
    )


@register(
    "x58_sliding_window",
    """WITH t AS (
         SELECT event_type,
                make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800
                                    AS BIGINT) * 1000000) AS s1
         FROM events
       ), e AS (
         SELECT event_type,
                unnest([s1 - INTERVAL 30 MINUTE, s1]) AS window_start
         FROM t
       )
       SELECT window_start, event_type,
              CAST(count(*) AS BIGINT) AS n_events
       FROM e GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="sliding (hopping) windows -- 1-hour windows every 30 minutes, "
        "the overlap tumbling x27 cannot express: Spark's native "
        "window(ts, dur, slide) assigns each event to dur/slide "
        "windows; the oracle is the relational mirror (each event "
        "unnests to its two epoch-aligned window starts). Streaming-"
        "capable with the same watermark semantics as x27",
)
def x58_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "x59_curation_funnel",
    __import__(
        "poc_parquet_publisher_spark.ops.curate", fromlist=["curate"]
    ).curation_funnel_oracle_sql("documents"),
    doc="curation funnel: docs surviving each successive gate (input -> "
        "length -> +alpha -> +language -> +exact-dedup) -- the "
        "observability table behind x23's pipeline; gate booleans fold "
        "into ONE aggregate pass (conjunction sums + one conditional "
        "count-distinct), the 5-row funnel is a stack() unpivot",
)
def x59_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import curate

    docs = load_table(spark, sf_dir, "documents")
    return curate.curation_funnel(docs).orderBy("stage")


@register(
    "x60_dup_rate_by_source",
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT md5(lower(text))) AS BIGINT)
                  AS n_distinct,
              ROUND(1.0 - CAST(count(DISTINCT md5(lower(text)))
                    AS DOUBLE) / count(*), 4) AS dup_rate
       FROM documents GROUP BY source ORDER BY source""",
    doc="duplication-rate triage per source: which feed floods the "
        "corpus with duplicates (and where to point the heavier "
        "near-dup passes); one groupBy with exact count-distinct on "
        "the content hash, two-phase partial agg, no joins",
)
def x60_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dup_rate_by_group(
        docs, "source", "doc_id", "text"
    ).orderBy("source")


@register(
    "x61_hourly_dup_rate",
    """WITH h AS (
         SELECT date_trunc('hour', ts) AS hour,
                md5(concat(
                  COALESCE(CAST(user_id AS VARCHAR), '<null>'), '|',
                  COALESCE(event_type, '<null>'), '|',
                  COALESCE(props, '<null>'))) AS payload_h
         FROM events
       )
       SELECT hour, CAST(count(*) AS BIGINT) AS n_events,
              CAST(count(DISTINCT payload_h) AS BIGINT) AS n_distinct,
              ROUND(1.0 - CAST(count(DISTINCT payload_h) AS DOUBLE)
                    / count(*), 4) AS dup_rate
       FROM h GROUP BY hour ORDER BY hour""",
    doc="dedup rate over TIME (the crawler-health signal x60 gives per "
        "source): per-hour event payload duplication via one groupBy "
        "with exact count-distinct on the payload hash -- a sudden "
        "dup-rate spike in one window is a stuck feed, invisible in "
        "whole-corpus rates. Payload fields are null-coalesced to a "
        "sentinel on BOTH engines before hashing: Spark's concat is "
        "NULL-on-any-NULL while DuckDB's skips NULLs, so un-guarded "
        "nulls would silently diverge the distinct counts",
)
def x61_hourly_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def _nn(c):
        return F.coalesce(c.cast("string"), F.lit("<null>"))

    payload_h = F.md5(
        F.concat(
            _nn(F.col("user_id")),
            F.lit("|"),
            _nn(F.col("event_type")),
            F.lit("|"),
            _nn(F.col("props")),
        )
    )
    return (
        ev.select(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            payload_h.alias("payload_h"),
        )
        .groupBy("hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("payload_h").cast("long").alias("n_distinct"),
        )
        .select(
            "hour",
            "n_events",
            "n_distinct",
            F.round(
                F.lit(1.0) - F.col("n_distinct") / F.col("n_events"), 4
            ).alias("dup_rate"),
        )
        .orderBy("hour")
    )


@register(
    "x62_hourly_value_percentiles",
    """SELECT date_trunc('hour', ts) AS hour,
              CAST(count(*) AS BIGINT) AS n_events,
              ROUND(quantile_cont(value, 0.5), 4) AS p50,
              ROUND(quantile_cont(value, 0.95), 4) AS p95
       FROM events GROUP BY 1 ORDER BY hour""",
    doc="grouped exact percentiles over time (p50/p95 of event value "
        "per hour -- the latency-style SLO readout): one groupBy with "
        "a sort-based percentile agg per group; Spark percentile == "
        "DuckDB quantile_cont (q30/x56 precedent). At 100 TB swap "
        "percentile_approx per group (x17's GK sketch)",
)
def x62_hourly_value_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.percentile(F.col("value"), F.lit(0.5)), 4).alias(
                "p50"
            ),
            F.round(F.percentile(F.col("value"), F.lit(0.95)), 4).alias(
                "p95"
            ),
        )
        .orderBy("hour")
    )


@register(
    "x63_embedding_norm_audit",
    """WITH n AS (
         SELECT vec_id,
                sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[]))) AS nrm,
                len(embedding) AS dim
       FROM embeddings
       )
       SELECT CAST(count(*) AS BIGINT) AS n_vecs,
              CAST(count(DISTINCT dim) AS BIGINT) AS n_dims,
              CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_zero,
              CAST(SUM(CASE WHEN isnan(nrm) THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_nan,
              ROUND(quantile_cont(nrm, 0.5), 4) AS p50_norm,
              ROUND(MIN(nrm), 4) AS min_norm,
              ROUND(MAX(nrm), 4) AS max_norm
       FROM n""",
    doc="embedding-table DQ audit before any ANN/dedup pass: vector "
        "count, dimension cardinality (a ragged table breaks every "
        "matmul), zero-norm and NaN counts (broken encoder rows crash "
        "cosine), norm range and median; one narrow fold per row (the "
        "dot product via F.aggregate, no Python) + one global aggregate",
)
def x63_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    n = emb.select(
        nrm.alias("nrm"), F.size("embedding").alias("dim")
    )
    return n.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.count_distinct("dim").cast("long").alias("n_dims"),
        F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0)).cast("long").alias(
            "n_zero"
        ),
        F.sum(F.when(F.isnan("nrm"), 1).otherwise(0)).cast("long").alias(
            "n_nan"
        ),
        F.round(F.percentile(F.col("nrm"), F.lit(0.5)), 4).alias(
            "p50_norm"
        ),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
    )


@register(
    "x64_dataset_card",
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
                  AS n_tokens,
              CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
              CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
              CAST(count(DISTINCT md5(lower(text))) AS BIGINT)
                  AS n_distinct_texts,
              ROUND(1.0 - CAST(count(DISTINCT md5(lower(text)))
                    AS DOUBLE) / count(*), 4) AS dup_rate,
              ROUND(CAST(SUM(len(string_split(lower(text), ' ')))
                    AS DOUBLE) / count(*), 4) AS mean_tokens_per_doc
       FROM documents""",
    doc="dataset-card headline row (datasheet summary): doc/token "
        "counts, language and source cardinality, exact dup rate, mean "
        "doc length -- ONE aggregate pass, two-phase count-distincts, "
        "no joins",
)
def x64_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.dataset_card(docs, "text")


@register(
    "x65_compression_ratio",
    None,  # zlib has no SQL-engine equivalent; rows-only, gated in tests
    doc="per-doc zlib compression ratio (compressed/raw): the classic "
        "repetitive-junk detector token gates miss; Arrow-batched "
        "pandas UDF (zlib in C), narrow, no shuffle; quality-gated in "
        "tests/test_ops_quality.py (repeated text compresses far below "
        "high-entropy text, deterministic across partitionings)",
)
def x65_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.compression_ratio(docs, "doc_id", "text").orderBy(
        "doc_id"
    )


@register(
    "x66_embedding_pooling",
    """WITH raw AS (
         SELECT vec_id % 50 AS grp,
                unnest(range(1, len(embedding) + 1)) AS pos,
                unnest(CAST(embedding AS DOUBLE[])) AS dval
         FROM embeddings
       ), e AS (
         SELECT grp, pos,
                CAST(ROUND(dval, 7) AS DECIMAL(28,7)) AS val
         FROM raw
       ), per AS (
         SELECT grp, pos,
                ROUND(CAST(SUM(val) AS DOUBLE) / count(*), 6)
                    AS mean_val,
                count(*) AS n
         FROM e GROUP BY grp, pos
       )
       SELECT grp AS vec_group, CAST(MAX(n) AS BIGINT) AS n_vecs,
              array_to_string(list_transform(
                  list(mean_val ORDER BY pos),
                  v -> CAST(CAST(v AS DECIMAL(18,6)) AS VARCHAR)
              ), ',') AS pooled
       FROM per GROUP BY grp ORDER BY vec_group""",
    doc="chunk->document mean pooling of embeddings (grouped by "
        "vec_id%50 as the chunk->doc relation): posexplode -> one "
        "(group,pos) hash-groupBy with DECIMAL-accumulated component "
        "sums (partition-order independent) -> sorted regroup to "
        "arrays; component rows stay narrow, full vectors never "
        "transit one unsplittable group. The pooled vector is "
        "string-serialized via DECIMAL(18,6) on both engines (q33 "
        "precedent) so the entry is driver-window safe",
)
def x66_embedding_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 50).alias("vec_group"), "embedding"
    )
    pooled = similarity.mean_pool_embeddings(
        emb, "vec_group", "embedding"
    )
    return pooled.select(
        "vec_group",
        "n_vecs",
        F.array_join(
            F.transform(
                F.col("pooled"),
                lambda v: v.cast("decimal(18,6)").cast("string"),
            ),
            ",",
        ).alias("pooled"),
    ).orderBy("vec_group")


@register(
    "x67_inverted_index",
    """WITH tok AS (
         SELECT DISTINCT doc_id,
                unnest(string_split(lower(text), ' ')) AS term
         FROM documents
       ), idx AS (
         SELECT term, CAST(count(*) AS BIGINT) AS df,
                list_sort(list(doc_id)) AS postings
         FROM tok GROUP BY term
       )
       SELECT term, df,
              array_to_string(postings[1:100], ',') AS first_postings
       FROM idx ORDER BY df DESC, term LIMIT 200""",
    doc="inverted-index build (search/contamination-lookup side "
        "structure): per-term document frequency + sorted posting "
        "lists, capped at the first 100 ids per term and top-200 terms "
        "(stop-term postings are unbounded at corpus scale -- cap or "
        "shard them); per-doc DISTINCT terms first so df == document "
        "frequency; one explode + one groupBy(term). Postings are "
        "string-serialized on both engines (q33 precedent) so the "
        "entry is driver-window safe",
)
def x67_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.col("text")), " "))
        ).alias("term"),
    )
    idx = tok.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.array_sort(F.collect_list("doc_id")).alias("postings"),
    )
    return (
        idx.select(
            "term",
            "df",
            F.array_join(
                F.transform(
                    F.slice(F.col("postings"), 1, 100),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("first_postings"),
        )
        .orderBy(F.desc("df"), "term")
        .limit(200)
    )


@register(
    "x68_dupgraph_degree",
    """WITH t AS (
         SELECT doc_id,
                list_distinct(list_transform(
                  range(1, len(string_split(lower(text), ' ')) - 1),
                  i -> array_to_string(
                         (string_split(lower(text), ' '))[i:i+2], ' ')
                )) AS sh
         FROM documents
         WHERE len(string_split(lower(text), ' ')) >= 3
       ), e AS (
         SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM t
       ), p AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS inter
         FROM e a JOIN e b USING (shingle)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2, 3, 4
       ), pairs AS (
         SELECT id_a, id_b FROM p
         WHERE ROUND(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 4)
               >= 0.5
       ), deg AS (
         SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
           SELECT id_a AS node FROM pairs
           UNION ALL SELECT id_b FROM pairs
         ) GROUP BY node
       )
       SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
       FROM deg GROUP BY degree ORDER BY degree""",
    doc="near-dup graph degree distribution (the hub-document "
        "diagnostic: a high-degree node is a template spamming the "
        "pair stage, the thing hot-shingle caps and containment "
        "passes exist for); x03's blocked pair derivation + two "
        "hash-groupBys over the edge list -- pairs-sized, never "
        "corpus-sized",
)
def x68_dupgraph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _shared_jaccard_pairs(spark, sf_dir)
    deg = (
        pairs.select(F.col("id_a").alias("node"))
        .unionAll(pairs.select(F.col("id_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("degree")
    )


@register(
    "x69_lang_margin",
    """WITH scored AS (
         SELECT doc_id,
                list_sort([
                  CAST(len(list_filter(string_split(lower(text), ' '),
                       t -> t IN ('the','a','of','and','to','in','is')))
                       AS BIGINT),
                  CAST(len(list_filter(string_split(lower(text), ' '),
                       t -> t IN ('el','la','de','que','y','en','un')))
                       AS BIGINT),
                  CAST(len(list_filter(string_split(lower(text), ' '),
                       t -> t IN ('le','les','des','et','une','pour',
                                  'dans'))) AS BIGINT),
                  CAST(len(list_filter(string_split(lower(text), ' '),
                       t -> t IN ('der','die','das','und','ist','von',
                                  'nicht'))) AS BIGINT)
                ]) AS s
         FROM documents
       )
       SELECT doc_id, s[-1] AS top_score,
              (s[-1] - s[-2]) AS margin,
              (s[-1] - s[-2]) >= 2 AS confident
       FROM scored ORDER BY doc_id""",
    doc="language-ID confidence margin (top stopword vote minus "
        "runner-up): the routing gate that sends low-margin docs to a "
        "heavier language model instead of trusting the cheap vote; "
        "pure expression pipeline over x12's scores, scan-speed",
)
def x69_lang_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")
        for words in text.LANG_STOPWORDS.values()
    ]
    s = F.array_sort(F.array(*scores))
    top = F.element_at(s, -1)
    margin = top - F.element_at(s, -2)
    return docs.select(
        "doc_id",
        top.alias("top_score"),
        margin.alias("margin"),
        (margin >= 2).alias("confident"),
    ).orderBy("doc_id")


@register(
    "x70_cross_source_dups",
    """WITH t AS (
         SELECT doc_id, source,
                list_distinct(list_transform(
                  range(1, len(string_split(lower(text), ' ')) - 1),
                  i -> array_to_string(
                         (string_split(lower(text), ' '))[i:i+2], ' ')
                )) AS sh
         FROM documents
         WHERE len(string_split(lower(text), ' ')) >= 3
       ), e AS (
         SELECT doc_id, source, len(sh) AS n_sh, unnest(sh) AS shingle
         FROM t
       ), p AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                a.source AS src_a, b.source AS src_b,
                a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS inter
         FROM e a JOIN e b USING (shingle)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2, 3, 4, 5, 6
       )
       SELECT id_a, id_b, src_a, src_b,
              ROUND(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 4)
                  AS jaccard
       FROM p
       WHERE src_a != src_b
         AND ROUND(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 4) >= 0.5
       ORDER BY id_a, id_b""",
    doc="CROSS-SOURCE near-duplicates (syndication/mirror detection -- "
        "the same article arriving via two feeds, which per-source "
        "dedup never sees): x03's blocked pair derivation carrying the "
        "source label, filtered to src_a != src_b; same shingle-block "
        "scale shape",
)
def x70_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = _shared_jaccard_pairs(spark, sf_dir)
    src = docs.select("doc_id", "source")
    return (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"),
                F.col("source").alias("src_a"),
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"),
                F.col("source").alias("src_b"),
            ),
            "id_b",
        )
        .filter(F.col("src_a") != F.col("src_b"))
        .select("id_a", "id_b", "src_a", "src_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


@register(
    "x71_recency_weights",
    """WITH mx AS (
         SELECT MAX(CAST(ts AS DATE)) AS max_d FROM events
       ), w AS (
         SELECT event_type,
                CAST(2 AS BIGINT) ** (30 - LEAST(
                  (max_d - CAST(ts AS DATE)) // 7, 30)) AS w_scaled
         FROM events, mx
       )
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(SUM(w_scaled) AS BIGINT) AS w_sum_scaled,
              ROUND(CAST(SUM(w_scaled) AS DOUBLE) /
                    (SELECT CAST(SUM(w_scaled) AS DOUBLE) FROM w), 4)
                  AS weight_share
       FROM w GROUP BY event_type ORDER BY event_type""",
    doc="recency-decayed sampling weights (freshness-weighted mixture): "
        "per-event weight halves every 7 days, computed as EXACT scaled "
        "integers 2^(30-age_weeks) so sums are integer-exact and "
        "engine-identical (pow/exp on doubles is not correctly rounded "
        "cross-engine -- same trick as x46's sqrt scaling); one "
        "groupBy, totals via broadcast aggregate",
)
def x71_recency_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("max_d"))
    # pyspark's F.shiftleft only takes a literal bit count; the SQL
    # function accepts a column
    w = (
        ev.crossJoin(F.broadcast(mx))
        .withColumn(
            "age_weeks",
            F.floor(
                F.datediff(F.col("max_d"), F.col("ts").cast("date")) / 7
            ),
        )
        .select(
            "event_type",
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                "CAST(30 - LEAST(age_weeks, 30) AS INT))"
            ).alias("w_scaled"),
        )
    )
    tot = w.agg(F.sum("w_scaled").cast("double").alias("__t"))
    return (
        w.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("w_scaled").cast("long").alias("w_sum_scaled"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_events",
            "w_sum_scaled",
            F.round(F.col("w_sum_scaled") / F.col("__t"), 4).alias(
                "weight_share"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "x72_session_funnel",
    """WITH ordered AS (
         SELECT user_id, event_id, event_type, ts,
                lag(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev_ts
         FROM events
       ), flagged AS (
         SELECT user_id, event_id, event_type, ts,
                CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_session
         FROM ordered
       ), sessions AS (
         SELECT user_id, event_type,
                SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)
                    AS session_id
         FROM flagged
       ), per AS (
         SELECT user_id, session_id,
                MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS has_view,
                MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS has_click,
                MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS has_purchase
         FROM sessions GROUP BY user_id, session_id
       )
       SELECT CAST(count(*) AS BIGINT) AS n_sessions,
              CAST(SUM(has_view) AS BIGINT) AS with_view,
              CAST(SUM(CASE WHEN has_view = 1 AND has_click = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS view_click,
              CAST(SUM(CASE WHEN has_view = 1 AND has_click = 1
                            AND has_purchase = 1
                       THEN 1 ELSE 0 END) AS BIGINT)
                  AS view_click_purchase
       FROM per""",
    doc="session conversion funnel (view -> click -> purchase "
        "CONTAINMENT within x21's gap-based sessions): per-session "
        "boolean rollup (MAX of CASE) then one funnel aggregate -- the "
        "product-analytics shape; one user_id shuffle shared by the "
        "session window and the rollup",
)
def x72_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    flagged = events.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0).alias(
            "new_session"
        ),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(run)
    )
    has = lambda t: F.max(  # noqa: E731
        F.when(F.col("event_type") == t, 1).otherwise(0)
    )
    per = sessions.groupBy("user_id", "session_id").agg(
        has("view").alias("has_view"),
        has("click").alias("has_click"),
        has("purchase").alias("has_purchase"),
    )
    both = (F.col("has_view") == 1) & (F.col("has_click") == 1)
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("has_view").cast("long").alias("with_view"),
        F.sum(F.when(both, 1).otherwise(0)).cast("long").alias(
            "view_click"
        ),
        F.sum(
            F.when(both & (F.col("has_purchase") == 1), 1).otherwise(0)
        ).cast("long").alias("view_click_purchase"),
    )


@register(
    "x73_retention_cohorts",
    """WITH first_seen AS (
         SELECT user_id, MIN(CAST(ts AS DATE)) AS first_d
         FROM events GROUP BY user_id
       ), j AS (
         SELECT e.user_id,
                f.first_d,
                (CAST(e.ts AS DATE) - f.first_d) // 7 AS weeks_since
         FROM events e JOIN first_seen f USING (user_id)
       )
       SELECT first_d AS cohort_start, weeks_since,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
       FROM j
       GROUP BY first_d, weeks_since
       ORDER BY cohort_start, weeks_since
       LIMIT 500""",
    doc="retention cohorts (the product-analytics activity matrix): "
        "each user's cohort is their first active day; activity buckets "
        "by whole weeks since; count-distinct users per (cohort, week). "
        "One groupBy(user) for first-seen + one user equi-join + one "
        "grouped count-distinct -- all partial-aggregating shuffles on "
        "user/cohort keys",
)
def x73_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_d")
    )
    j = ev.join(first_seen, "user_id").select(
        "user_id",
        F.col("first_d").alias("cohort_start"),
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.col("first_d")) / 7
        ).alias("weeks_since"),
    )
    return (
        j.groupBy("cohort_start", "weeks_since")
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
        .orderBy("cohort_start", "weeks_since")
        .limit(500)
    )


@register(
    "x74_rolling_active_users",
    """WITH ud AS (
         SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
       ), win AS (
         SELECT user_id, unnest(range(0, 7)) AS k, d FROM ud
       ), cover AS (
         SELECT user_id, d + CAST(k AS INTEGER) AS day FROM win
       ), bounds AS (
         SELECT MIN(CAST(ts AS DATE)) AS min_d, MAX(CAST(ts AS DATE))
                    AS max_d
         FROM events
       )
       SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
       FROM cover, bounds
       WHERE day BETWEEN min_d AND max_d
       GROUP BY day ORDER BY day LIMIT 400""",
    doc="trailing-7-day active users per day (the WAU half of DAU/WAU "
        "stickiness): each distinct (user, day) explodes to the 7 days "
        "it keeps the user active (factor 7, linear), then one grouped "
        "count-distinct -- the standard exact formulation; at 100 TB "
        "swap the count-distinct for merged HLL sketches (x16) per day",
)
def x74_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    cover = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
        "d",
    ).select("user_id", F.date_add(F.col("d"), F.col("k")).alias("day"))
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("min_d"),
        F.max(F.col("ts").cast("date")).alias("max_d"),
    )
    return (
        cover.crossJoin(F.broadcast(bounds))
        .filter(F.col("day").between(F.col("min_d"), F.col("max_d")))
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
        .orderBy("day")
        .limit(400)
    )


@register(
    "x75_lsh_verified_pairs",
    dedup.lsh_verified_pairs_oracle_sql("documents", "doc_id", 0.5),
    doc="the complete LSH-then-verify pipeline in one entry: x40's "
        "deterministic banded candidates rescored with EXACT per-pair "
        "Jaccard via shingle-array intersection (two id equi-joins, no "
        "posting explode) -- banding false positives die at the verify "
        "step, false negatives bounded by the S-curve",
)
def x75_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.lsh_verified_pairs(
        docs, "doc_id", "text", k=3, threshold=0.5
    ).orderBy("id_a", "id_b")


@register(
    "x76_copurchase_pairs",
    """WITH items AS (
         SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
       ), p AS (
         SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                count(*) AS n_orders
         FROM items a JOIN items b USING (l_orderkey)
         WHERE a.l_partkey < b.l_partkey
         GROUP BY 1, 2
       )
       SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders
       FROM p
       ORDER BY n_orders DESC, part_a, part_b
       LIMIT 50""",
    doc="market-basket co-occurrence (parts co-ordered in the same "
        "order): pairs expand INSIDE each order's item list with the "
        "same sorted-array HOF as the shingle buckets (one groupBy on "
        "the order key, ~4 items/order so in-bucket expansion is tiny), "
        "then a pair-count groupBy + TakeOrdered top-50 -- never a "
        "corpus-level self-join",
)
def x76_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    buckets = items.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    ps = F.col("parts")
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    ps,
                    lambda x, i: F.transform(
                        F.slice(ps, i + F.lit(2), F.size(ps)),
                        lambda y: F.struct(
                            x.alias("part_a"), y.alias("part_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(50)
    )


@register(
    "x77_hourly_anomalies",
    """WITH c AS (
         SELECT date_trunc('hour', ts) AS hour,
                CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1
       ), m AS (
         SELECT CAST(SUM(n) AS BIGINT) AS s1,
                CAST(SUM(n * n) AS BIGINT) AS s2,
                CAST(count(*) AS BIGINT) AS cnt
         FROM c
       )
       SELECT hour, n,
              ROUND((n - CAST(s1 AS DOUBLE) / cnt) /
                    sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / cnt)
                         / (cnt - 1)), 4) AS z,
              ABS((n - CAST(s1 AS DOUBLE) / cnt) /
                  sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / cnt)
                       / (cnt - 1))) > 3 AS anomaly
       FROM c, m ORDER BY hour""",
    doc="hourly volume anomaly flags (crawler/feed spike detection): "
        "z-score of per-hour event counts against the series' own "
        "moments; mean/variance from EXACT integer sums (SUM(n), "
        "SUM(n*n) as BIGINT) so only division/sqrt touch doubles -- "
        "both correctly rounded, engine-identical; per-hour counts are "
        "one grouped agg, moments a broadcast 1-row aggregate",
)
def x77_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    m = c.agg(
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    mean = F.col("s1").cast("double") / F.col("cnt")
    var = (
        F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("cnt")
    ) / (F.col("cnt") - 1)
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        c.crossJoin(F.broadcast(m))
        .select(
            "hour",
            "n",
            F.round(z, 4).alias("z"),
            (F.abs(z) > 3).alias("anomaly"),
        )
        .orderBy("hour")
    )


@register(
    "x78_revenue_share_in_region",
    """WITH rev AS (
         SELECT r.r_name AS region, n.n_name AS nation,
                CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,8)))
                     AS DECIMAL(38,8)) AS rev
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY 1, 2
       )
       SELECT region, nation,
              ROUND(CAST(rev AS DOUBLE), 4) AS revenue,
              ROUND(CAST(rev AS DOUBLE) /
                    CAST(SUM(rev) OVER (PARTITION BY region)
                         AS DOUBLE), 4) AS share_in_region
       FROM rev ORDER BY region, nation""",
    doc="percent-of-total within group (the ratio_to_report shape): "
        "nation revenue share within its region -- aggregate first, "
        "then a window over the ALREADY-AGGREGATED rows (nation-"
        "cardinality, not order-cardinality); DECIMAL-accumulated "
        "revenue, window SUM over exact decimals",
)
def x78_revenue_share_in_region(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("decimal(38,8)")
            .alias("rev")
        )
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        F.round(F.col("rev").cast("double"), 4).alias("revenue"),
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(w).cast("double"),
            4,
        ).alias("share_in_region"),
    ).orderBy("region", "nation")


@register(
    "x79_first_digit_audit",
    """WITH d AS (
         SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                       AS VARCHAR), 1, 1) AS first_digit
         FROM orders WHERE o_totalprice >= 1
       )
       SELECT first_digit, CAST(count(*) AS BIGINT) AS n,
              ROUND(CAST(count(*) AS DOUBLE) /
                    (SELECT count(*) FROM d), 4) AS share
       FROM d GROUP BY first_digit ORDER BY first_digit""",
    doc="first-significant-digit distribution of order totals (the "
        "Benford-style forensic audit for generated/fabricated "
        "numerics): FLOOR before the BIGINT cast because Spark "
        "truncates and DuckDB rounds on double->int casts; one grouped "
        "count + broadcast total",
)
def x79_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    fd = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"),
            1,
            1,
        ).alias("first_digit")
    )
    tot = fd.agg(F.count(F.lit(1)).cast("double").alias("__t"))
    return (
        fd.groupBy("first_digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "first_digit",
            "n",
            F.round(F.col("n") / F.col("__t"), 4).alias("share"),
        )
        .orderBy("first_digit")
    )


@register(
    "x80_top_event_per_user",
    """WITH c AS (
         SELECT user_id, event_type, count(*) AS cnt
         FROM events GROUP BY 1, 2
       ), r AS (
         SELECT user_id, event_type, cnt,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY cnt DESC, event_type) AS rn
         FROM c
       )
       SELECT user_id, event_type AS top_event,
              CAST(cnt AS BIGINT) AS cnt
       FROM r WHERE rn = 1 ORDER BY user_id""",
    doc="grouped argmax / per-key mode (each user's most frequent event "
        "type): aggregate first, then a row_number window over the "
        "ALREADY-AGGREGATED (user, type) rows with a total tiebreak -- "
        "deterministic where a bare mode()/max_by() is tie-ambiguous "
        "across engines; the window partition is user-cardinality",
)
def x80_top_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("cnt"), "event_type"
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("top_event"),
            F.col("cnt").cast("long").alias("cnt"),
        )
        .orderBy("user_id")
    )


@register(
    "x81_weekly_growth",
    """WITH w AS (
         SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
                CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1
       )
       SELECT week, n,
              lag(n) OVER (ORDER BY week) AS prev_n,
              ROUND(CAST(n AS DOUBLE) / lag(n) OVER (ORDER BY week) - 1,
                    4) AS wow_growth
       FROM w ORDER BY week""",
    doc="week-over-week growth (lag over the AGGREGATED weekly series): "
        "the trend readout; the global window runs over week-"
        "cardinality rows (driver-scale after aggregation), never the "
        "raw events; first week's growth is NULL by construction",
)
def x81_weekly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    wk = ev.groupBy(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.orderBy("week")
    prev = F.lag("n").over(w)
    return wk.select(
        "week",
        "n",
        prev.alias("prev_n"),
        F.round(F.col("n").cast("double") / prev - 1, 4).alias(
            "wow_growth"
        ),
    ).orderBy("week")


@register(
    "x82_lead_time_histogram",
    """WITH lt AS (
         SELECT (CAST(l.l_shipdate AS DATE) -
                 CAST(o.o_orderdate AS DATE)) AS lead_days
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       )
       SELECT CAST(FLOOR(lead_days / 7) AS BIGINT) AS week_bucket,
              CAST(count(*) AS BIGINT) AS n,
              CAST(MIN(lead_days) AS BIGINT) AS min_days,
              CAST(MAX(lead_days) AS BIGINT) AS max_days
       FROM lt GROUP BY 1 ORDER BY week_bucket""",
    doc="order->ship lead-time distribution in week buckets (the "
        "fulfillment-latency readout): one fact-dim equi-join on the "
        "order key + integer date arithmetic + one hash aggregate; "
        "DuckDB DATE subtraction yields integer days, Spark uses "
        "datediff -- same integers",
)
def x82_lead_time_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lt = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("lead_days")
    )
    return (
        lt.groupBy(
            F.floor(F.col("lead_days") / 7).cast("long").alias(
                "week_bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("lead_days").cast("long").alias("min_days"),
            F.max("lead_days").cast("long").alias("max_days"),
        )
        .orderBy("week_bucket")
    )


@register(
    "x83_dimension_coverage",
    """WITH e1 AS (
         SELECT 'part<-lineitem' AS edge,
                CAST(count(*) AS BIGINT) AS n_parent,
                CAST(SUM(CASE WHEN l.l_partkey IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_unreferenced
         FROM part p LEFT JOIN (SELECT DISTINCT l_partkey FROM lineitem) l
           ON p.p_partkey = l.l_partkey
       ), e2 AS (
         SELECT 'supplier<-lineitem' AS edge,
                CAST(count(*) AS BIGINT) AS n_parent,
                CAST(SUM(CASE WHEN l.l_suppkey IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_unreferenced
         FROM supplier s
         LEFT JOIN (SELECT DISTINCT l_suppkey FROM lineitem) l
           ON s.s_suppkey = l.l_suppkey
       ), e3 AS (
         SELECT 'customer<-orders' AS edge,
                CAST(count(*) AS BIGINT) AS n_parent,
                CAST(SUM(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_unreferenced
         FROM customer c
         LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
           ON c.c_custkey = o.o_custkey
       ), u AS (
         SELECT * FROM e1 UNION ALL SELECT * FROM e2
         UNION ALL SELECT * FROM e3
       )
       SELECT edge, n_parent, n_unreferenced,
              ROUND(CAST(n_unreferenced AS DOUBLE) / n_parent, 4)
                  AS unreferenced_rate
       FROM u ORDER BY edge""",
    doc="dimension coverage -- the REVERSE of x55's orphan audit: "
        "parents no fact row references (unsold parts, unused "
        "suppliers, customers with no orders); each edge is one LEFT "
        "join against the distinct child keys (child side pre-distinct "
        "so the join is key-sized)",
)
def x83_dimension_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")

    def edge(name, parent, pk, child_keys, ck):
        j = parent.select(F.col(pk).alias("__p")).join(
            child_keys.select(F.col(ck).alias("__p"), F.lit(1).alias("__hit")),
            "__p",
            "left",
        )
        return j.agg(
            F.lit(name).alias("edge"),
            F.count(F.lit(1)).cast("long").alias("n_parent"),
            F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unreferenced"),
        )

    parts = edge(
        "part<-lineitem", part, "p_partkey",
        li.select("l_partkey").distinct(), "l_partkey",
    )
    sups = edge(
        "supplier<-lineitem", supplier, "s_suppkey",
        li.select("l_suppkey").distinct(), "l_suppkey",
    )
    custs = edge(
        "customer<-orders", customer, "c_custkey",
        orders.select("o_custkey").distinct(), "o_custkey",
    )
    u = parts.unionByName(sups).unionByName(custs)
    return u.select(
        "edge",
        "n_parent",
        "n_unreferenced",
        F.round(
            F.col("n_unreferenced") / F.col("n_parent"), 4
        ).alias("unreferenced_rate"),
    ).orderBy("edge")


@register(
    "x84_ltv_deciles",
    __import__(
        "poc_parquet_publisher_spark.ops.profile", fromlist=["profile"]
    ).decile_report_oracle_sql(
        "(SELECT o_custkey, ROUND(CAST(SUM(CAST(o_totalprice AS "
        "DECIMAL(30,8))) AS DOUBLE), 4) AS ltv FROM orders "
        "GROUP BY o_custkey) AS t",
        "ltv",
    ),
    doc="customer-lifetime-value deciles: x56's decile operator REUSED "
        "on a derived aggregate (per-customer DECIMAL-summed spend) -- "
        "operators compose over any DataFrame, not just base tables; "
        "the aggregate runs once, thresholds broadcast",
)
def x84_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import profile

    orders = load_table(spark, sf_dir, "orders")
    ltv = orders.groupBy("o_custkey").agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(30,8)")).cast(
                "double"
            ),
            4,
        ).alias("ltv")
    )
    return profile.decile_report(ltv, "ltv").orderBy("bucket")


@register(
    "x85_grouped_iqr_udaf",
    """SELECT event_type,
              ROUND(quantile_cont(value, 0.75)
                    - quantile_cont(value, 0.25), 4) AS iqr
       FROM events GROUP BY event_type ORDER BY event_type""",
    doc="grouped-aggregate pandas UDAF (Series -> scalar in "
        "groupBy().agg()): per-type interquartile range of event "
        "value; numpy's linear-interpolation percentile is the same "
        "formula as quantile_cont so the UDAF is oracle-hash-exact; "
        "rounding outside the UDAF (python round is banker's). "
        "Completes the custom-function surface: scalar pandas UDF, "
        "mapInPandas, applyInPandas, applyInPandasWithState, UDAF",
)
def x85_grouped_iqr_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import profile

    ev = load_table(spark, sf_dir, "events")
    iqr = profile.iqr_udaf()
    return (
        ev.groupBy("event_type")
        .agg(F.round(iqr("value"), 4).alias("iqr"))
        .orderBy("event_type")
    )


@register(
    "x86_vocab_growth",
    """WITH first_seen AS (
         SELECT term, MIN(doc_id) AS first_doc FROM (
           SELECT doc_id,
                  unnest(list_distinct(string_split(lower(text), ' ')))
                      AS term
           FROM documents
         ) GROUP BY term
       ), per_doc AS (
         SELECT d.doc_id,
                len(list_distinct(string_split(lower(d.text), ' ')))
                    AS n_terms,
                COALESCE(f.n_new, 0) AS n_new
         FROM documents d LEFT JOIN (
           SELECT first_doc AS doc_id, count(*) AS n_new
           FROM first_seen GROUP BY 1
         ) f USING (doc_id)
       )
       SELECT doc_id,
              CAST(SUM(n_new) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
       FROM per_doc ORDER BY doc_id""",
    doc="vocabulary growth curve (Heaps' law; tokenizer-budget "
        "planning): each term attributes to the doc where it FIRST "
        "appears (one term groupBy + min), per-doc new-term counts "
        "running-sum into the curve. The running sum is scale.prefix_sum "
        "-- the two-pass partition prefix-sum (range partition -> "
        "per-partition totals broadcast as exclusive offsets -> "
        "shuffle-free local cumsum), NEVER a global single-partition "
        "window (plan-gated in tests/test_plans.py)",
)
def x86_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import scale

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.col("text")), " "))
        ).alias("term"),
    )
    first_seen = terms.groupBy("term").agg(
        F.min("doc_id").alias("first_doc")
    )
    n_new = first_seen.groupBy(
        F.col("first_doc").alias("doc_id")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    per_doc = docs.select("doc_id").join(n_new, "doc_id", "left").select(
        "doc_id", F.coalesce("n_new", F.lit(0)).alias("n_new")
    )
    return (
        scale.prefix_sum(per_doc, "doc_id", "n_new", "vocab_size")
        .select("doc_id", F.col("vocab_size").cast("long"))
        .orderBy("doc_id")
    )


@register(
    "x87_frequency_spectrum",
    """WITH c AS (
         SELECT term, count(*) AS freq FROM (
           SELECT unnest(string_split(lower(text), ' ')) AS term
           FROM documents
         ) GROUP BY term
       )
       SELECT freq, CAST(count(*) AS BIGINT) AS n_terms
       FROM c GROUP BY freq ORDER BY freq""",
    doc="term frequency-of-frequencies spectrum (the Good-Turing "
        "smoothing input / Zipf diagnostic: how many terms occur "
        "exactly k times -- the N_1/N ratio estimates unseen-mass): "
        "two chained hash-groupBys, both partial-aggregating; the "
        "second groups freq values so its cardinality is tiny",
)
def x87_frequency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        c.groupBy("freq")
        .agg(F.count(F.lit(1)).cast("long").alias("n_terms"))
        .orderBy("freq")
    )


@register(
    "x88_bigram_entropy",
    """WITH bg AS (
         SELECT unnest(list_transform(
                  range(1, len(toks)),
                  i -> array_to_string(toks[i:i+1], ' ')
                )) AS bg
         FROM (
           SELECT string_split(lower(text), ' ') AS toks
           FROM documents
           WHERE len(string_split(lower(text), ' ')) >= 2
         )
       ), big AS (
         SELECT bg, count(*) AS c12,
                string_split(bg, ' ')[1] AS w1
         FROM bg GROUP BY bg
       ), ctx AS (
         SELECT w1, SUM(c12) AS c1 FROM big GROUP BY w1
       ), terms AS (
         SELECT CAST(c12 AS DECIMAL(18,0)) *
                CAST(ROUND(log2(CAST(c12 AS DOUBLE) / c1), 6)
                     AS DECIMAL(18,6)) AS contrib,
                c12
         FROM big JOIN ctx USING (w1)
       )
       SELECT CAST(SUM(c12) AS BIGINT) AS n_bigrams,
              ROUND(-CAST(SUM(contrib) AS DOUBLE) /
                    CAST(SUM(c12) AS BIGINT), 4) AS entropy_bits
       FROM terms""",
    doc="corpus bigram conditional entropy in bits/token (the "
        "predictability summary behind perplexity: 2^H is the corpus "
        "perplexity under its own bigram model; repetitive/templated "
        "corpora score low): x52's model CTEs rolled into ONE corpus "
        "row with the round-log-then-DECIMAL accumulation",
)
def x88_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        F.split(F.lower(F.col("text")), " ").alias("__toks")
    ).filter(F.size("__toks") >= 2)
    toks = F.col("__toks")
    bg = t.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                ),
            )
        ).alias("bg")
    )
    big = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    big = big.withColumn("w1", F.split(F.col("bg"), " ")[0])
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    contrib = (
        F.col("c12").cast("decimal(18,0)")
        * F.round(F.log2(F.col("c12") / F.col("c1")), 6).cast(
            "decimal(18,6)"
        )
    ).alias("contrib")
    terms = big.join(ctx, "w1").select(contrib, "c12")
    return terms.agg(
        F.sum("c12").cast("long").alias("n_bigrams"),
        F.round(
            -F.sum("contrib").cast("double")
            / F.sum("c12").cast("long"),
            4,
        ).alias("entropy_bits"),
    )


@register(
    "x89_normalize_text",
    text.normalize_text_sql(
        """(SELECT doc_id,
              CASE WHEN doc_id % 5 = 0
                   THEN '  ' || replace(text, ' ', '   ') || chr(9)
                   ELSE text END AS text
            FROM documents) AS src"""
    ),
    doc="whitespace/control-char normalization -- the cleanup that MUST "
        "precede content-hash dedup (tab/double-space variants of "
        "identical visible text otherwise survive x01 as distinct): "
        "chained regexp_replace, codegen; dirt injected "
        "deterministically (doc_id%5: leading spaces, tripled "
        "separators, trailing tab) since the fixture is clean",
)
def x89_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("  "),
                F.regexp_replace(F.col("text"), " ", "   "),
                F.lit("\t"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return text.normalize_text(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "x90_global_rank",
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_chars,
              CAST(row_number() OVER (
                ORDER BY strlen(text) DESC, doc_id) AS BIGINT) AS rank
       FROM documents ORDER BY rank""",
    doc="global document ranking (longest-first with unique tiebreak) "
        "WITHOUT a global sort: scale.global_row_number -- per-range-"
        "partition row counts fold into broadcast offsets and each task "
        "numbers its own rows (prefix_sum of 1) -- where the naive "
        "ROW_NUMBER() OVER (ORDER BY ...) plans an Exchange "
        "SinglePartition and funnels the corpus through one task; "
        "plan-gated alongside x86",
)
def x90_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import scale

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    return (
        scale.global_row_number(
            docs,
            [F.col("n_chars").desc(), F.col("doc_id")],
            out_col="rank",
        )
        .select("doc_id", "n_chars", F.col("rank").cast("long"))
        .orderBy("rank")
    )


@register(
    "x91_per_source_cap",
    sampling.per_group_cap_sql(
        "(SELECT doc_id, source FROM documents) AS t",
        "doc_id",
        "source",
        5,
    )
    + " ORDER BY source, cap_rank, doc_id",
    doc="anti-domination cap: at most 5 docs per source, chosen in "
        "md5(doc_id:salt) order (deterministic unbiased within-group "
        "sample -- the guard that stops one crawl host flooding the "
        "mixture); one group-key shuffle, per-source row_number windows "
        "run in parallel, no global sort (sampling.per_group_cap)",
)
def x91_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    return sampling.per_group_cap(docs, "doc_id", "source", 5).orderBy(
        "source", "cap_rank", "doc_id"
    )


@register(
    "x92_source_calibrated_rank",
    """SELECT doc_id, source,
              ROUND(percent_rank() OVER (
                PARTITION BY source
                ORDER BY strlen(text), doc_id), 4) AS pr
       FROM documents ORDER BY doc_id""",
    doc="per-source score calibration: percent_rank of a quality proxy "
        "(doc length) WITHIN each source -- 'drop the bottom decile per "
        "domain' needs per-domain ranks because raw score distributions "
        "differ wildly across sources; unique doc_id tiebreak makes the "
        "rank (and hash) deterministic; one source-key shuffle, windows "
        "parallel per source, never a global sort",
)
def x92_source_calibrated_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.length("text"), F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.round(F.percent_rank().over(w), 4).alias("pr"),
        )
        .orderBy("doc_id")
    )


@register(
    "x93_stream_enrichment",
    """SELECT date_trunc('hour', e.ts) AS window_start,
              COALESCE(c.c_mktsegment, 'unknown') AS segment,
              CAST(count(*) AS BIGINT) AS n_events,
              ROUND(CAST(SUM(CAST(e.value AS DECIMAL(30,8))) AS DOUBLE), 4)
                  AS sum_value
       FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
       GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="STREAM-STATIC enrichment join run to completion: events file-"
        "stream LEFT-joins a broadcast customer dim (no join state -- "
        "each micro-batch probes the broadcast table) then tumbles into "
        "per-(hour, market-segment) counts; hash-matched against the "
        "plain batch SQL join, so stream == batch is the verified "
        "contract (the x27 drain recipe: complete mode + availableNow)",
)
def x93_stream_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import uuid

    from ..streaming.windows import streaming_segment_counts

    batch = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    tmp = tempfile.mkdtemp(prefix="x93_stream_")
    sink = f"x93_sink_{uuid.uuid4().hex[:8]}"
    try:
        src = os.path.join(tmp, "events")
        batch.repartition(4).write.mode("overwrite").parquet(src)
        rebatch = spark.read.parquet(src)
        q = streaming_segment_counts(
            spark,
            src,
            rebatch.schema,
            customer,
            os.path.join(tmp, "ckpt"),
            sink_table=sink,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "stream drain did not finish within 300 s; "
                "refusing to return a partially-filled sink"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return (
        spark.table(sink)
        .select(
            F.col("window_start").cast("timestamp_ntz").alias(
                "window_start"
            ),
            "segment",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "segment")
    )


@register(
    "x94_embedding_quantization",
    similarity.quantize_embeddings_int8_oracle_sql(
        "embeddings", "vec_id", "embedding"
    ),
    doc="per-vector symmetric int8 quantization (the 4x memory/IO "
        "shrink before storing/shipping an ANN index): floor-based "
        "code formula and floor-scaled integer scale make every step "
        "IEEE-exact cross-engine (no round() -- HALF_UP vs HALF_EVEN "
        "never triggers); narrow HOF pipeline, no shuffle, scan speed; "
        "dequantization error bound gated in tests "
        "(similarity.quantize_embeddings_int8)",
)
def x94_embedding_quantization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.quantize_embeddings_int8(
        emb, "vec_id", "embedding"
    ).orderBy("vec_id")


@register(
    "x95_line_dedup",
    text.line_dedup_stats_sql("documents", "doc_id", "text", 8, 3),
    doc="C4-style line deduplication stats: fixed 8-token lines "
        "occurring in >= 3 DISTINCT docs are boilerplate (the rule "
        "that strips headers/banners doc-level dedup never sees); "
        "per-doc survival counts + md5 of the kept text in order. One "
        "line explode, one distinct-count groupBy, one equi-join back "
        "(frequent lines are broadcast-sized at scale), one per-doc "
        "regroup -- never pairwise (text.line_dedup_stats)",
)
def x95_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.line_dedup_stats(
        docs, "doc_id", "text", line_tokens=8, min_docs=3
    ).orderBy("doc_id")


@register(
    "x96_event_transitions",
    """WITH o AS (
         SELECT user_id, event_type, ts, event_id FROM events
       ), s AS (
         SELECT user_id, event_type,
                lead(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                ) AS next_type
         FROM o
       ), p AS (
         SELECT event_type, next_type, count(*) AS n
         FROM s WHERE next_type IS NOT NULL
         GROUP BY 1, 2
       ), tot AS (
         SELECT event_type, SUM(n) AS t FROM p GROUP BY 1
       )
       SELECT p.event_type, p.next_type, CAST(p.n AS BIGINT) AS n,
              ROUND(CAST(p.n AS DOUBLE) / tot.t, 4) AS p_next
       FROM p JOIN tot USING (event_type)
       ORDER BY p.event_type, p.next_type""",
    doc="behavioral transition matrix (the event-sequence 'bigram "
        "model': P(next event type | current) per user journey) -- the "
        "session-flow diagnostic behind funnel design; one user-key "
        "shuffle for the lead() window (parallel per user, event_id "
        "tiebreak for same-ts determinism), then two tiny groupBys "
        "over type-pair cardinality",
)
def x96_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    p = s.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = p.groupBy("event_type").agg(F.sum("n").alias("t"))
    return (
        p.join(tot, "event_type")
        .select(
            "event_type",
            "next_type",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("t"), 4).alias("p_next"),
        )
        .orderBy("event_type", "next_type")
    )


@register(
    "x97_blocklist_filter",
    text.blocklist_stats_sql("documents", "source", "text"),
    doc="C4-style bad-words document gate, reported per source: docs "
        "containing >= 1 blocked term would be dropped; drop rate + "
        "total hits isolate which feed carries the junk. Inline term "
        "list (a production list rides a broadcast join against the "
        "same token stream); narrow expressions + one small groupBy, "
        "parquet-scan speed (text.blocklist_stats)",
)
def x97_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.blocklist_stats(docs, "source", "text").orderBy("source")


@register(
    "x98_bpe_pair_counts",
    text.bpe_pair_counts_sql("documents", "text", 50),
    doc="BPE tokenizer training, iteration one: corpus-frequency-"
        "weighted adjacent character-pair counts (the argmax pair "
        "becomes the first merge rule). Token counts collapse the "
        "corpus to vocab cardinality FIRST, pairs expand inside each "
        "distinct word weighted by its count -- the pair table is "
        "alphabet^2-sized, only the first groupBy touches corpus scale "
        "(text.bpe_pair_counts)",
)
def x98_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.bpe_pair_counts(docs, "text", top_k=50)


@register(
    "x99_charset_audit",
    text.charset_audit_sql("documents", "source", "text"),
    doc="per-source encoding-health audit: non-ASCII / C0-control / "
        "U+FFFD-replacement character counts and whitespace ratio -- "
        "the mojibake detector that catches a broken decoder feed "
        "before it poisons tokenizer training. regexp_count chain "
        "(codegen, scan-speed) + one small groupBy; fixture is clean "
        "ASCII so synthetic dirt exercises the nonzero paths in tests "
        "(text.charset_audit)",
)
def x99_charset_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.charset_audit(docs, "source", "text").orderBy("source")


@register(
    "x100_zipf_fit",
    text.zipf_fit_sql("documents", "text", 100),
    doc="Zipf log-log least-squares fit over the top-100 term "
        "frequency curve (natural corpora: slope ~= -1; templated or "
        "synthetic corpora flatten) -- the one-row corpus-health "
        "summary of x47's coverage curve. One partial-aggregating "
        "token groupBy + TakeOrdered(100); window and regression run "
        "over exactly 100 rows; x88's round-log-then-DECIMAL "
        "determinism (text.zipf_fit)",
)
def x100_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.zipf_fit(docs, "text", top_k=100)


@register(
    "x101_label_coherence",
    similarity.label_centroid_coherence_sql(
        "embeddings", "label", "embedding"
    ),
    doc="per-label embedding coherence audit: cosine of every vector "
        "to its label's mean centroid (mean + min per label) -- low "
        "mean = incoherent class, low min = outlier rows; the "
        "embedding-space complement of x55's relational DQ. Centroids "
        "via x66's pooling (label cardinality broadcasts), one "
        "broadcast join back, row-local zip_with dot-product fold "
        "(x63), round-6-then-DECIMAL cosine accumulation "
        "(similarity.label_centroid_coherence)",
)
def x101_label_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.label_centroid_coherence(
        emb, "label", "embedding"
    ).orderBy("label")


@register(
    "x102_source_overlap",
    dedup.source_shingle_overlap_sql("documents", "source", "text", 3),
    doc="source-level shingle-set Jaccard matrix (mirror/syndication "
        "feed detection BEFORE mixing weights are set -- the corpus "
        "complement of x70's per-doc cross-source pairs): distinct "
        "(source, shingle) postings, shingle equi-join with fanout "
        "bounded by source cardinality (tens), partial-aggregated to "
        "source-pair rows; per-source set sizes broadcast back "
        "(dedup.source_shingle_overlap)",
)
def x102_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.source_shingle_overlap(docs, "source", "text", 3).orderBy(
        "src_a", "src_b"
    )


@register(
    "x103_stream_attribution",
    """SELECT c.event_id AS click_id, v.event_id AS view_id,
              CAST(c.user_id AS BIGINT) AS user_id,
              CAST(date_diff('second', v.ts, c.ts) AS BIGINT) AS gap_sec
       FROM events c JOIN events v ON c.user_id = v.user_id
       WHERE c.event_type = 'click' AND v.event_type = 'view'
         AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 24 HOUR
       ORDER BY click_id, view_id""",
    doc="STREAM-STREAM interval join run to completion: one events "
        "file-stream forked into view/click branches (streaming "
        "self-join), each click attributed to same-user views within "
        "a trailing 24 h window; state held on BOTH sides and evicted "
        "past watermark + window (flat memory on a continuous stream "
        "-- without the interval bound the view side buffers forever); "
        "inner joins emit on match so append mode drains completely; "
        "hash-matched against the plain interval-join SQL, stream == "
        "batch is the verified contract "
        "(streaming/windows.py view_click_attribution)",
)
def x103_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import uuid

    from ..streaming.windows import streaming_attribution

    batch = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="x103_stream_")
    sink = f"x103_sink_{uuid.uuid4().hex[:8]}"
    try:
        src = os.path.join(tmp, "events")
        batch.repartition(4).write.mode("overwrite").parquet(src)
        rebatch = spark.read.parquet(src)
        q = streaming_attribution(
            spark,
            src,
            rebatch.schema,
            os.path.join(tmp, "ckpt"),
            sink_table=sink,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "x103 stream drain did not finish within 300 s; "
                "refusing to return a partially-filled sink"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(sink).orderBy("click_id", "view_id")


@register(
    "x104_pagerank",
    graph.pagerank_copurchase_sql(iterations=3, damping=0.85, top_k=20),
    doc="fixed-depth PageRank (3 power iterations, d=0.85) over the "
        "symmetric co-purchase part graph -- the iterative-algorithm "
        "shape (GraphX/Pregel) as a declarative plan: per iteration ONE "
        "edge-sized equi-join + one partial-aggregating groupBy(dst); "
        "node count rides a broadcast 1-row aggregate, nothing "
        "collects. Determinism: round-12 contributions DECIMAL-summed, "
        "damping update in DOUBLE, rank re-rounded per round so both "
        "engines enter each iteration bit-identical; oracle replays "
        "the loop as chained CTEs (ops/graph.py pagerank)",
)
def x104_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Warm path: if the bench (or a deployment job) has persisted the
    # edge list for THIS fixture dir (graph.persist_copurchase_edges,
    # bucketed+sorted on u), read it instead of re-deriving -- ~60% of
    # x104's cold cost is the one-time graph derivation. The table name
    # is sf-keyed, so a table built at another scale is never used.
    tbl = graph.copurchase_edge_table_name(sf_dir)
    if spark.catalog.tableExists(tbl):
        edges = spark.table(tbl)
    else:
        li = load_table(spark, sf_dir, "lineitem")
        edges = graph.symmetric_copurchase_edges(li)
    pr = graph.pagerank(
        edges, iterations=3, damping=0.85, materialize=False
    )
    return (
        pr.select(
            F.col("node").cast("long").alias("node"),
            F.round(F.col("rank"), 8).alias("rank"),
        )
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


@register(
    "x105_zorder_key",
    f"""WITH z AS (
         SELECT l_orderkey, l_linenumber,
                l_orderkey % 256 AS px, l_partkey % 256 AS sx,
                {zorder_key_sql(['(l_orderkey % 256)', '(l_partkey % 256)'], 8)} AS zkey
         FROM lineitem
       )
       SELECT CAST(zkey AS BIGINT) AS zkey,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(MIN(px) AS BIGINT) AS min_px,
              CAST(MAX(px) AS BIGINT) AS max_px,
              CAST(MIN(sx) AS BIGINT) AS min_sx,
              CAST(MAX(sx) AS BIGINT) AS max_sx
       FROM z GROUP BY zkey ORDER BY zkey LIMIT 100""",
    doc="Morton/Z-order clustering key (the OPTIMIZE ZORDER BY "
        "primitive): bit-interleave of two bucketed dimensions so a "
        "range-sort on the key gives every file a tight min/max "
        "envelope on BOTH columns -- parquet stats then prune scans "
        "filtering on either dimension, where a single-column sort "
        "prunes only its leading column. Pure shift/and/or expression, "
        "codegen; the span-tightening effect is measured against a "
        "lexicographic sort in tests/test_layout.py "
        "(scale.zorder_key)",
)
def x105_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import scale

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey") % 256).alias("px"),
        (F.col("l_partkey") % 256).alias("sx"),
    )
    z = li.withColumn("zkey", scale.zorder_key(["px", "sx"], 8))
    return (
        z.groupBy("zkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("px").cast("long").alias("min_px"),
            F.max("px").cast("long").alias("max_px"),
            F.min("sx").cast("long").alias("min_sx"),
            F.max("sx").cast("long").alias("max_sx"),
        )
        .select(F.col("zkey").cast("long").alias("zkey"), "n_rows",
                "min_px", "max_px", "min_sx", "max_sx")
        .orderBy("zkey")
        .limit(100)
    )


@register(
    "x106_bm25_topk",
    text.bm25_topk_sql("documents", "doc_id", "text"),
    doc="Okapi BM25 top-20 for a fixed lexical query (k1=1.2, b=0.75) "
        "-- the retrieval baseline every RAG pipeline starts from and "
        "the hard-negative miner for embedding training. Postings "
        "materialize only for the QUERY's terms (filter before the "
        "(doc,term) groupBy -- never the full vocab); df/idf and "
        "corpus stats ride broadcast aggregates; idf ln rounds to 6, "
        "per-term contributions round to 8 and accumulate in DECIMAL "
        "(text.bm25_topk)",
)
def x106_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.bm25_topk(docs, "doc_id", "text", top_k=20)


@register(
    "x107_event_trigrams",
    """WITH s AS (
         SELECT user_id, event_type,
                lead(event_type) OVER w AS t2,
                lead(event_type, 2) OVER w AS t3
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       )
       SELECT event_type AS t1, t2, t3, CAST(count(*) AS BIGINT) AS n
       FROM s WHERE t3 IS NOT NULL
       GROUP BY 1, 2, 3
       ORDER BY n DESC, t1, t2, t3 LIMIT 25""",
    doc="top-25 three-step user journeys (the path-mining extension of "
        "x96's transition bigrams: funnel hypotheses come from frequent "
        "trigrams, not single transitions); one user-key shuffle "
        "shared by BOTH lead() windows (parallel per user, event_id "
        "tiebreak), then a type-trigram-cardinality groupBy + "
        "TakeOrdered",
)
def x107_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type").over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        s.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(25)
    )


@register(
    "x108_key_skew_gini",
    """WITH f AS (
         SELECT l_partkey AS k, count(*) AS f FROM lineitem GROUP BY 1
       ), r AS (
         SELECT k, f,
                row_number() OVER (ORDER BY f, k) AS rn
         FROM f
       )
       SELECT CAST(count(*) AS BIGINT) AS n_keys,
              CAST(SUM(f) AS BIGINT) AS n_rows,
              CAST(MAX(f) AS BIGINT) AS max_f,
              ROUND((CAST(2.0 AS DOUBLE) * SUM(rn * f)) /
                    (CAST(count(*) AS BIGINT) * SUM(f)) -
                    (CAST(count(*) + 1 AS DOUBLE) / count(*)), 6)
                  AS gini
       FROM r""",
    doc="Gini coefficient of the join-key frequency distribution -- "
        "the ONE-NUMBER skew diagnostic behind the salt/AQE decision "
        "(x41's top-20 shows the head; Gini summarizes the whole "
        "curve: 0 = uniform keys, ->1 = one hot key). The global rank "
        "the formula needs comes from scale.global_row_number (x90's "
        "two-pass prefix-sum over the aggregated KEY-cardinality "
        "table) -- the oracle's window is the semantic mirror, the "
        "rebuild's plan has no Exchange SinglePartition; rank*freq "
        "products sum as exact BIGINTs, only the final two divisions "
        "touch doubles",
)
def x108_key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import scale

    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("f")
    )
    ranked = scale.global_row_number(freq, [F.col("f"), F.col("k")], "rn")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("f").cast("long").alias("n_rows"),
        F.max("f").cast("long").alias("max_f"),
        F.round(
            (F.lit(2.0) * F.sum(F.col("rn") * F.col("f")))
            / (F.count(F.lit(1)).cast("long") * F.sum("f"))
            - (
                (F.count(F.lit(1)) + F.lit(1)).cast("double")
                / F.count(F.lit(1))
            ),
            6,
        ).alias("gini"),
    )


@register(
    "x109_bpe_learn",
    text.bpe_learn_merges_sql("documents", "text", 3),
    doc="BPE tokenizer training, iterations 1-3 (x98 run to its "
        "logical conclusion): per round, argmax adjacent-symbol pair "
        "(lexicographic tiebreak) then every word REWRITTEN with the "
        "merge before the next count -- the x104 fixed-depth iterative "
        "shape, on text. Angle-bracket symbol wrapping makes the "
        "rewrite a plain left-to-right replace() that cannot match "
        "inside a symbol and reproduces BPE's greedy leftmost order "
        "identically in both engines. One corpus-scale groupBy up "
        "front; every iteration is vocab-sized; argmax rides a 1-row "
        "broadcast (text.bpe_learn_merges)",
)
def x109_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.bpe_learn_merges(docs, "text", iterations=3).orderBy("it")


@register(
    "x110_conversion_latency",
    """WITH v AS (
         SELECT user_id, MIN(ts) AS v_ts FROM events
         WHERE event_type = 'view' GROUP BY 1
       ), p AS (
         SELECT e.user_id,
                CAST(date_diff('second', v.v_ts, MIN(e.ts)) AS BIGINT)
                    AS gap_sec
         FROM events e JOIN v USING (user_id)
         WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
         GROUP BY e.user_id, v.v_ts
       )
       SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewers,
              CAST(count(*) AS BIGINT) AS n_converted,
              ROUND(count(*) /
                    CAST((SELECT count(*) FROM v) AS DOUBLE), 4)
                  AS conversion_rate,
              ROUND(quantile_cont(gap_sec, 0.5), 4) AS p50_gap_sec,
              ROUND(quantile_cont(gap_sec, 0.9), 4) AS p90_gap_sec
       FROM p""",
    doc="view->purchase conversion latency: per user, first view to "
        "first subsequent purchase; conversion rate + exact p50/p90 of "
        "the gap (quantile_cont == Spark percentile bit-for-bit, the "
        "q30 precedent). Two user-key groupBys sharing one shuffle "
        "key + one equi-join -- the product-funnel KPI row; at 100 TB "
        "swap percentile_approx (x17)",
)
def x110_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id", "v_ts")
        .agg(
            (
                F.unix_timestamp(F.min("ts").cast("timestamp"))
                - F.unix_timestamp(F.col("v_ts").cast("timestamp"))
            )
            .cast("long")
            .alias("gap_sec")
        )
    )
    nv = v.agg(F.count(F.lit(1)).cast("long").alias("n_viewers"))
    # Aggregate p FIRST (a global agg over an empty input still yields one
    # row, matching the oracle's aggregate-over-FROM-p), THEN attach the
    # 1-row viewer count -- a crossJoin before the agg would return zero
    # rows on the no-purchases input while the oracle's scalar subquery
    # still reports the true viewer count with n_converted = 0.
    pa = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.percentile(F.col("gap_sec"), F.lit(0.5)).alias("_p50"),
        F.percentile(F.col("gap_sec"), F.lit(0.9)).alias("_p90"),
    )
    return pa.crossJoin(F.broadcast(nv)).select(
        F.col("n_viewers"),
        F.col("n_converted"),
        F.round(
            F.col("n_converted") / F.col("n_viewers").cast("double"), 4
        ).alias("conversion_rate"),
        F.round(F.col("_p50"), 4).alias("p50_gap_sec"),
        F.round(F.col("_p90"), 4).alias("p90_gap_sec"),
    )


@register(
    "x111_centroid_confusion",
    """WITH raw AS (
         SELECT label AS lbl,
                unnest(range(1, len(embedding) + 1)) AS pos,
                unnest(CAST(embedding AS DOUBLE[])) AS dval
         FROM embeddings
       ), e AS (
         SELECT lbl, pos, CAST(ROUND(dval, 7) AS DECIMAL(28,7)) AS val
         FROM raw
       ), per AS (
         SELECT lbl, pos,
                ROUND(CAST(SUM(val) AS DOUBLE) / count(*), 6) AS mean_val
         FROM e GROUP BY lbl, pos
       ), cent AS (
         SELECT lbl, list(mean_val ORDER BY pos) AS c
         FROM per GROUP BY lbl
       )
       SELECT a.lbl AS label_a, b.lbl AS label_b,
              ROUND(list_dot_product(a.c, b.c) /
                    NULLIF(sqrt(list_dot_product(a.c, a.c)) *
                           sqrt(list_dot_product(b.c, b.c)), 0), 4)
                  AS cos
       FROM cent a JOIN cent b ON a.lbl < b.lbl
       ORDER BY label_a, label_b""",
    doc="label-centroid confusion matrix: pairwise cosine between the "
        "per-label mean embeddings (x101's centroids) -- which classes "
        "COLLIDE in embedding space, the class-level complement of "
        "x101's within-class coherence. Pooling is x66's recipe; the "
        "pair join runs over label-cardinality rows (tens), trivially "
        "broadcast; cosine is the x63 row-local fold",
)
def x111_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent = similarity.mean_pool_embeddings(emb, "label", "embedding").select(
        F.col("label").alias("lbl"), F.col("pooled").alias("c")
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    a = cent.select(F.col("lbl").alias("label_a"), F.col("c").alias("ca"))
    b = cent.select(F.col("lbl").alias("label_b"), F.col("c").alias("cb"))
    den = F.sqrt(dot(F.col("ca"), F.col("ca"))) * F.sqrt(
        dot(F.col("cb"), F.col("cb"))
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(
                F.when(den != 0, dot(F.col("ca"), F.col("cb")) / den), 4
            ).alias("cos"),
        )
        .orderBy("label_a", "label_b")
    )


@register(
    "x112_wau_sketch",
    None,  # approximate (Datasketches HLL) -- rows-only; error gated
           # vs the exact x74 in tests/test_ops_quality.py
    doc="x74's promised 100 TB formulation, delivered: trailing-7-day "
        "actives via MERGEABLE per-day HLL sketches -- one sketch per "
        "(user-day grain) day, each day's sketch exploded to the 7 "
        "cover days it serves, then hll_union_agg + estimate. The "
        "shuffle carries DAY-cardinality sketch rows (constant size "
        "each), not user-day rows; the exact x74 shuffles the full "
        "user-day cross product into a grouped count-distinct. "
        "Relative error <= ~2% at lgConfigK=12, gated in tests",
)
def x112_wau_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_day = (
        ev.select("user_id", F.col("ts").cast("date").alias("d"))
        .groupBy("d")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    cover = per_day.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"), "d", "sk"
    ).select(F.date_add(F.col("d"), F.col("k")).alias("day"), "sk")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("min_d"),
        F.max(F.col("ts").cast("date")).alias("max_d"),
    )
    return (
        cover.crossJoin(F.broadcast(bounds))
        .filter(F.col("day").between(F.col("min_d"), F.col("max_d")))
        .groupBy("day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("long")
            .alias("wau_est")
        )
        .orderBy("day")
        .limit(400)
    )


@register(
    "x113_scd2_intervals",
    """WITH o AS (
         SELECT user_id, event_type, ts, event_id,
                lag(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                ) AS prev_state
         FROM events
       ), changes AS (
         SELECT user_id, event_type AS state, ts, event_id
         FROM o
         WHERE prev_state IS NULL OR prev_state <> event_type
       )
       SELECT user_id, state, ts AS valid_from,
              lead(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
              ) AS valid_to
       FROM changes
       ORDER BY user_id, valid_from, state""",
    doc="SCD2 dimension build from an event stream: collapse "
        "consecutive same-state events per user, emit "
        "(state, valid_from, valid_to) validity intervals with the "
        "open current interval as NULL valid_to -- the "
        "slowly-changing-dimension snapshot every warehouse join "
        "needs. Both windows (change detect + interval close) share "
        "ONE user-key shuffle, event_id tiebreak for same-ts "
        "determinism",
)
def x113_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            F.col("event_type").alias("state"),
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_state"),
        )
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("state"))
        )
    )
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    ).orderBy("user_id", "valid_from", "state")


@register(
    "x114_jsonl_roundtrip_dedup",
    """SELECT md5(lower(text)) AS h, MIN(doc_id) AS keep_id,
              count(*) AS dup_cnt
       FROM documents GROUP BY md5(lower(text)) ORDER BY h""",
    doc="format-abstraction contract: export the corpus as JSON-Lines "
        "shards (pipeline/layout.py export_jsonl, the tokenizer/"
        "training interchange leg), read the shards back with the "
        "ORIGINAL schema, and run x01's exact dedup on the round-"
        "tripped corpus -- hash-matching x01's parquet-sourced oracle "
        "proves the export leg is byte-lossless THROUGH the "
        "correctness gate, not just a row-count test. Shards write/"
        "read in parallel (text sink, no collect)",
)
def x114_jsonl_roundtrip_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..pipeline.layout import export_jsonl

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="x114_jsonl_")
    try:
        export_jsonl(docs, tmp, max_records_per_file=5000)
        back = spark.read.schema(docs.schema).json(tmp)
        out = dedup.exact_dedup(back, "doc_id", "text").orderBy("h")
        # materialize before the temp dir disappears
        out = out.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@register(
    "x115_cluster_survivorship",
    f"""WITH RECURSIVE {_X03_PAIRS_CTE},
       edges AS (
         SELECT id_a AS u, id_b AS v FROM pairs
         UNION
         SELECT id_b, id_a FROM pairs
       ),
       walk (node, lbl) AS (
         SELECT u, u FROM edges
         UNION
         SELECT e.u, w.lbl FROM edges e JOIN walk w ON w.node = e.v
       ),
       comp AS (
         SELECT node, MIN(lbl) AS rep FROM walk GROUP BY node
       ),
       scored AS (
         SELECT c.rep, c.node, len(d.text) AS n_chars,
                row_number() OVER (
                  PARTITION BY c.rep
                  ORDER BY len(d.text) DESC, c.node
                ) AS rnk
         FROM comp c JOIN documents d ON d.doc_id = c.node
       )
       SELECT rep,
              CAST(MAX(CASE WHEN rnk = 1 THEN node END) AS BIGINT)
                  AS kept_id,
              CAST(MAX(CASE WHEN rnk = 1 THEN n_chars END) AS BIGINT)
                  AS kept_chars,
              CAST(count(*) AS BIGINT) AS n_members
       FROM scored GROUP BY rep
       ORDER BY rep""",
    doc="dedup survivorship POLICY: within each near-dup cluster "
        "(x24's components over x03's pairs) keep the highest-quality "
        "member (longest text, id tiebreak) instead of x24's min-id "
        "default -- the canonical-document selection step real "
        "curation runs, and a three-operator composition (blocked "
        "pairs -> components -> per-cluster argmax) in one entry; the "
        "argmax window runs per cluster (parallel), never global",
)
def x115_cluster_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    pairs = _shared_jaccard_pairs(spark, sf_dir)
    comp = dedup.duplicate_clusters(pairs)
    scored = comp.join(
        docs.select(
            F.col("doc_id").alias("node"),
            F.length("text").cast("long").alias("n_chars"),
        ),
        "node",
    )
    w = Window.partitionBy("rep").orderBy(F.desc("n_chars"), "node")
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    return (
        ranked.groupBy("rep")
        .agg(
            F.max(F.when(F.col("rnk") == 1, F.col("node")))
            .cast("long")
            .alias("kept_id"),
            F.max(F.when(F.col("rnk") == 1, F.col("n_chars")))
            .cast("long")
            .alias("kept_chars"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
        .orderBy("rep")
    )


@register(
    "x116_winsorized_stats",
    """WITH b AS (
         -- round-6 thresholds before the clip comparison (the x119
         -- 1-ulp interpolation hazard)
         SELECT o_orderpriority,
                ROUND(quantile_cont(o_totalprice, 0.05), 6) AS p05,
                ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95
         FROM orders GROUP BY 1
       ), c AS (
         SELECT o.o_orderpriority,
                CAST(ROUND(
                  CASE WHEN o.o_totalprice < b.p05 THEN b.p05
                       WHEN o.o_totalprice > b.p95 THEN b.p95
                       ELSE o.o_totalprice END, 4)
                  AS DECIMAL(30,4)) AS w
         FROM orders o JOIN b USING (o_orderpriority)
       )
       SELECT o_orderpriority,
              CAST(count(*) AS BIGINT) AS n,
              ROUND(CAST(SUM(w) AS DOUBLE) / count(*), 4)
                  AS winsorized_mean
       FROM c GROUP BY 1 ORDER BY 1""",
    doc="winsorized (outlier-clipped) mean of order totals per "
        "priority: values clipped to the group's exact [p05, p95] "
        "before averaging -- the robust-statistics pass that stops a "
        "fat-tailed feed from dragging calibration metrics (x56's "
        "decile machinery applied as a CLIP, not a bucket). Exact "
        "percentiles via the q30 equivalence; thresholds are a tiny "
        "per-group broadcast; clipped values round-then-DECIMAL "
        "accumulate; at 100 TB swap percentile_approx (x17)",
)
def x116_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    b = orders.groupBy("o_orderpriority").agg(
        F.round(
            F.percentile(F.col("o_totalprice"), F.lit(0.05)), 6
        ).alias("p05"),
        F.round(
            F.percentile(F.col("o_totalprice"), F.lit(0.95)), 6
        ).alias("p95"),
    )
    w = (
        F.when(F.col("o_totalprice") < F.col("p05"), F.col("p05"))
        .when(F.col("o_totalprice") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("o_totalprice"))
    )
    c = orders.join(F.broadcast(b), "o_orderpriority").select(
        "o_orderpriority",
        F.round(w, 4).cast("decimal(30,4)").alias("w"),
    )
    return (
        c.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum("w").cast("double") / F.count(F.lit(1)), 4
            ).alias("winsorized_mean"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "x117_user_entropy",
    """WITH ut AS (
         SELECT user_id, event_type, count(*) AS c
         FROM events GROUP BY 1, 2
       ), tot AS (
         SELECT user_id, SUM(c) AS t, count(*) AS n_types FROM ut
         GROUP BY 1
       ), terms AS (
         SELECT ut.user_id, tot.t, tot.n_types,
                CAST(ut.c AS DECIMAL(18,0)) *
                CAST(ROUND(log2(CAST(ut.c AS DOUBLE) / tot.t), 6)
                     AS DECIMAL(18,6)) AS contrib
         FROM ut JOIN tot USING (user_id)
       )
       SELECT user_id, CAST(MAX(t) AS BIGINT) AS n_events,
              CAST(MAX(n_types) AS BIGINT) AS n_types,
              ROUND(-CAST(SUM(contrib) AS DOUBLE) / MAX(t), 4)
                  AS entropy_bits
       FROM terms GROUP BY user_id
       ORDER BY user_id""",
    doc="per-user behavioral entropy (bits over the event-type "
        "distribution): the engagement-diversity score separating "
        "single-action bots (0 bits) from organic users -- x88's "
        "corpus entropy recipe applied per key; two user-key groupBys "
        "sharing one shuffle, round-log-then-DECIMAL accumulation",
)
def x117_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = ut.groupBy("user_id").agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("n_types")
    )
    contrib = (
        F.col("c").cast("decimal(18,0)")
        * F.round(F.log2(F.col("c") / F.col("t")), 6).cast("decimal(18,6)")
    ).alias("contrib")
    terms = ut.join(tot, "user_id").select(
        "user_id", "t", "n_types", contrib
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.max("t").cast("long").alias("n_events"),
            F.max("n_types").cast("long").alias("n_types"),
            F.round(
                -F.sum("contrib").cast("double") / F.max("t"), 4
            ).alias("entropy_bits"),
        )
        .orderBy("user_id")
    )


@register(
    "x118_salted_distinct",
    """SELECT event_type,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM events GROUP BY 1 ORDER BY 1""",
    doc="skew-immune exact count-distinct: decomposed as groupBy("
        "type, user) -> groupBy(type), so the first shuffle hashes on "
        "the COMPOSITE key (a hot event type spreads across every "
        "partition) and the second counts already-distinct rows with "
        "map-side combine. The naive count_distinct shuffles raw rows "
        "by type alone -- one reducer per hot type at 100 TB. Same "
        "answer, different physical posture; the x54 salting principle "
        "applied to aggregation",
)
def x118_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.groupBy("event_type", "user_id").agg(F.lit(1).alias("__1"))
    return (
        pairs.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("event_type")
    )


@register(
    "x119_quality_ensemble",
    """WITH m AS (
         SELECT doc_id,
                CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                    AS n_toks,
                ROUND(len(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                      / CAST(len(text) AS DOUBLE), 4) AS alpha_ratio,
                ROUND(len(list_filter(string_split(lower(text), ' '),
                          t -> t IN ('the','a','of','and','to','in','is')))
                      / CAST(len(string_split(lower(text), ' '))
                             AS DOUBLE), 4) AS stop_ratio
         FROM documents
       ), th AS (
         -- thresholds ROUND to 6 before any comparison: the two
         -- engines' interpolation formulas (a+(b-a)*g vs (1-g)a+g*b)
         -- can differ by 1 ulp, which flips v >= t exactly where a
         -- round-4 metric value IS the threshold (hit at sf0.1)
         SELECT list_transform(
                  quantile_cont(n_toks,
                    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                  t -> ROUND(t, 6)) AS t_tok,
                list_transform(
                  quantile_cont(alpha_ratio,
                    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                  t -> ROUND(t, 6)) AS t_alpha,
                list_transform(
                  quantile_cont(stop_ratio,
                    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                  t -> ROUND(t, 6)) AS t_stop
         FROM m
       )
       SELECT doc_id,
              CAST(1 + len(list_filter(t_tok, t -> n_toks >= t))
                   AS BIGINT) AS d_tok,
              CAST(1 + len(list_filter(t_alpha, t -> alpha_ratio >= t))
                   AS BIGINT) AS d_alpha,
              CAST(1 + len(list_filter(t_stop, t -> stop_ratio >= t))
                   AS BIGINT) AS d_stop,
              ROUND(((1 + len(list_filter(t_tok, t -> n_toks >= t))) +
                     (1 + len(list_filter(t_alpha, t -> alpha_ratio >= t))) +
                     (1 + len(list_filter(t_stop, t -> stop_ratio >= t)))) /
                    CAST(3 AS DOUBLE), 4) AS ensemble
       FROM m, th ORDER BY doc_id""",
    doc="FineWeb-style quality ENSEMBLE: three per-doc signals (token "
        "count, alpha ratio, stopword ratio) each rank-normalized to "
        "its corpus decile via exact interpolated thresholds (x56's "
        "machinery per metric), averaged into one calibrated score -- "
        "rank normalization is what lets incommensurable signals "
        "blend. Thresholds ride ONE broadcast row (three 9-element "
        "arrays); decile assignment is a row-local array fold; no "
        "global window anywhere; at 100 TB swap percentile_approx",
)
def x119_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*text.LANG_STOPWORDS["en"]))
    )
    m = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.round(
            F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
            / F.length("text").cast("double"),
            4,
        ).alias("alpha_ratio"),
        F.round(stop / F.size(toks).cast("double"), 4).alias("stop_ratio"),
    )
    qs = F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    # round-6 thresholds BEFORE comparison (see the oracle comment: the
    # engines' interpolation differs by 1 ulp, flipping >= at sf0.1)
    r6 = lambda c: F.transform(c, lambda t: F.round(t, 6))
    th = m.agg(
        r6(F.percentile(F.col("n_toks"), qs)).alias("t_tok"),
        r6(F.percentile(F.col("alpha_ratio"), qs)).alias("t_alpha"),
        r6(F.percentile(F.col("stop_ratio"), qs)).alias("t_stop"),
    )

    def decile(v, tcol):
        return (
            F.lit(1)
            + F.size(F.filter(tcol, lambda t: F.col(v) >= t))
        ).cast("long")

    d_tok = decile("n_toks", F.col("t_tok"))
    d_alpha = decile("alpha_ratio", F.col("t_alpha"))
    d_stop = decile("stop_ratio", F.col("t_stop"))
    return (
        m.crossJoin(F.broadcast(th))
        .select(
            "doc_id",
            d_tok.alias("d_tok"),
            d_alpha.alias("d_alpha"),
            d_stop.alias("d_stop"),
            F.round(
                (d_tok + d_alpha + d_stop) / F.lit(3).cast("double"), 4
            ).alias("ensemble"),
        )
        .orderBy("doc_id")
    )


@register(
    "x120_dedup_datasheet",
    f"""WITH RECURSIVE {_X03_PAIRS_CTE},
       edges AS (
         SELECT id_a AS u, id_b AS v FROM pairs
         UNION
         SELECT id_b, id_a FROM pairs
       ),
       walk (node, lbl) AS (
         SELECT u, u FROM edges
         UNION
         SELECT e.u, w.lbl FROM edges e JOIN walk w ON w.node = e.v
       ),
       comp AS (
         SELECT node, MIN(lbl) AS rep FROM walk GROUP BY node
       ),
       ex AS (
         SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(count(DISTINCT md5(lower(text))) AS BIGINT)
                    AS n_unique
         FROM documents
       ),
       nr AS (
         SELECT CAST(count(DISTINCT rep) AS BIGINT) AS n_clusters,
                CAST(count(*) AS BIGINT) AS n_clustered
         FROM comp
       )
       SELECT n_docs, n_unique,
              CAST(n_docs - n_unique AS BIGINT) AS n_exact_dups,
              ROUND((n_docs - n_unique) / CAST(n_docs AS DOUBLE), 4)
                  AS exact_dup_rate,
              n_clusters, n_clustered,
              CAST(n_clustered - n_clusters AS BIGINT) AS n_near_losses,
              ROUND((n_clustered - n_clusters) /
                    CAST(n_docs AS DOUBLE), 4) AS near_dup_rate
       FROM ex, nr""",
    doc="the dedup DATASHEET row (x64's dataset card, duplication "
        "chapter): corpus size, exact-unique count and dup rate, "
        "near-dup cluster count / clustered docs / docs a transitive "
        "near-dedup would drop -- the headline numbers a datasheet or "
        "data-card publishes. Composes x01 (hash distinct) + x03/x24 "
        "(blocked pairs -> components) into two 1-row aggregates "
        "cross-joined as broadcasts",
)
def x120_dedup_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = _shared_jaccard_pairs(spark, sf_dir)
    comp = dedup.duplicate_clusters(pairs)
    ex = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct(F.md5(F.lower(F.col("text"))))
        .cast("long")
        .alias("n_unique"),
    )
    nr = comp.agg(
        F.count_distinct("rep").cast("long").alias("n_clusters"),
        F.count(F.lit(1)).cast("long").alias("n_clustered"),
    )
    return ex.crossJoin(F.broadcast(nr)).select(
        "n_docs",
        "n_unique",
        (F.col("n_docs") - F.col("n_unique"))
        .cast("long")
        .alias("n_exact_dups"),
        F.round(
            (F.col("n_docs") - F.col("n_unique"))
            / F.col("n_docs").cast("double"),
            4,
        ).alias("exact_dup_rate"),
        "n_clusters",
        "n_clustered",
        (F.col("n_clustered") - F.col("n_clusters"))
        .cast("long")
        .alias("n_near_losses"),
        F.round(
            (F.col("n_clustered") - F.col("n_clusters"))
            / F.col("n_docs").cast("double"),
            4,
        ).alias("near_dup_rate"),
    )


@register(
    "x121_contrastive_pairs",
    """WITH t AS (
         SELECT doc_id,
                list_distinct(list_transform(
                  range(1, len(string_split(lower(text), ' ')) - 1),
                  i -> array_to_string(
                         (string_split(lower(text), ' '))[i:i+2], ' ')
                )) AS sh
         FROM documents
         WHERE len(string_split(lower(text), ' ')) >= 3
       ), e AS (
         SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM t
       ), p AS (
         SELECT a.doc_id AS anchor, b.doc_id AS other,
                a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS inter
         FROM e a JOIN e b USING (shingle)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2, 3, 4
       ), j AS (
         SELECT anchor, other,
                ROUND(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 4)
                    AS jaccard
         FROM p
       ), pos AS (
         SELECT anchor, other, jaccard, 'positive' AS label
         FROM j WHERE jaccard >= 0.5
       ), neg AS (
         SELECT anchor, other, jaccard, 'hard_negative' AS label
         FROM (
           SELECT anchor, other, jaccard,
                  row_number() OVER (
                    PARTITION BY anchor
                    ORDER BY jaccard DESC, other
                  ) AS rnk
           FROM j WHERE jaccard >= 0.01 AND jaccard < 0.3
         ) WHERE rnk <= 2
       )
       SELECT anchor, other, jaccard, label FROM pos
       UNION ALL
       SELECT anchor, other, jaccard, label FROM neg
       ORDER BY anchor, other, label""",
    doc="contrastive training-pair mining for embedding models, riding "
        "the SAME blocked pair stage as x03: positives = near-dup "
        "pairs (jaccard >= 0.5), hard negatives = pairs that SHARE a "
        "shingle block but score 0.01-0.3 (lexically adjacent, "
        "semantically distinct -- the negatives random sampling never "
        "finds), capped at top-2 per anchor by a per-anchor window "
        "(parallel per key). One derivation serves dedup AND training-"
        "data mining; oracle mirrors x03's CTE (hot-shingle cap un-hit "
        "on the fixture, the x40 assumption)",
)
def x121_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    counts = _shared_pair_counts(spark, sf_dir)
    j = counts.select(
        F.col("id_a").alias("anchor"),
        F.col("id_b").alias("other"),
        F.round(
            F.col("inter")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")),
            4,
        ).alias("jaccard"),
    )
    pos = j.filter(F.col("jaccard") >= 0.5).withColumn(
        "label", F.lit("positive")
    )
    w = Window.partitionBy("anchor").orderBy(F.desc("jaccard"), "other")
    neg = (
        j.filter((F.col("jaccard") >= 0.01) & (F.col("jaccard") < 0.3))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .drop("rnk")
        .withColumn("label", F.lit("hard_negative"))
    )
    return pos.unionAll(neg).orderBy("anchor", "other", "label")


@register(
    "x122_padding_waste",
    """WITH d AS (
         SELECT len(string_split(lower(text), ' ')) AS n_toks
         FROM documents
       ), b AS (
         SELECT n_toks,
                CAST(FLOOR(n_toks / 32) * 32 AS BIGINT) AS bucket
         FROM d
       )
       SELECT bucket,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_toks) AS BIGINT) AS real_tokens,
              CAST(count(*) * MAX(n_toks) AS BIGINT) AS padded_tokens,
              ROUND(1.0 - SUM(n_toks) /
                    CAST(count(*) * MAX(n_toks) AS DOUBLE), 4)
                  AS waste_rate
       FROM b GROUP BY bucket ORDER BY bucket""",
    doc="inference/training batching efficiency report: docs bucketed "
        "by length/32, per-bucket real vs padded token counts and the "
        "padding-waste rate if each bucket batches together (pad to "
        "the bucket max) -- the measurement that justifies x32's "
        "packing over naive length-sorted batching; one narrow "
        "projection + one hash aggregate, scan speed",
)
def x122_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.lower(F.col("text")), " "))
    b = docs.select(
        n.alias("n_toks"),
        (F.floor(n / 32) * 32).cast("long").alias("bucket"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("real_tokens"),
            (F.count(F.lit(1)) * F.max("n_toks"))
            .cast("long")
            .alias("padded_tokens"),
            F.round(
                F.lit(1.0)
                - F.sum("n_toks")
                / (F.count(F.lit(1)) * F.max("n_toks")).cast("double"),
                4,
            ).alias("waste_rate"),
        )
        .orderBy("bucket")
    )


@register(
    "x123_fuzzy_match",
    """WITH c AS (
         SELECT c_custkey, c_name,
                substr(c_name, 1, len(c_name) - 2) AS blk
         FROM customer
       ), p AS (
         SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                levenshtein(a.c_name, b.c_name) AS dist
         FROM c a JOIN c b USING (blk)
         WHERE a.c_custkey < b.c_custkey
       )
       SELECT CAST(dist AS BIGINT) AS dist,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(MIN(id_a) AS BIGINT) AS example_a,
              CAST(MIN(id_b) AS BIGINT) AS example_b
       FROM p WHERE dist <= 2
       GROUP BY dist ORDER BY dist""",
    doc="blocked fuzzy entity resolution: candidate pairs share a "
        "prefix BLOCK (name minus its last 2 chars -- the standard "
        "blocking-key trade: recall limited to in-block variants, "
        "never an all-pairs O(n^2) edit-distance), then exact "
        "levenshtein verifies within the block; per-distance pair "
        "counts + deterministic examples. levenshtein() is "
        "cross-engine identical on ASCII; the ER shape behind "
        "user/merchant/address matching at 100 TB (block -> verify, "
        "exactly the LSH-then-verify pattern of x75, on strings)",
)
def x123_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    # the dim parquet is a single file = one input split; the in-block
    # pair expansion multiplies rows ~100x, so spread the probe side
    # BEFORE the broadcast join or every levenshtein runs in one task
    # (measured 4.1 s -> ~0.6 s at sf0.1). Width follows the session's
    # shuffle-partition conf, not a literal, so it scales with the
    # cluster (the prefix_sum precedent, scale.py).
    n_spread = int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    c = cust.repartition(n_spread).select(
        "c_custkey",
        "c_name",
        F.expr("substr(c_name, 1, length(c_name) - 2)").alias("blk"),
    )
    a = c.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        "blk",
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        "blk",
    )
    p = (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .filter(F.col("dist") <= 2)
    )
    return (
        p.groupBy("dist")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("id_a").cast("long").alias("example_a"),
            F.min("id_b").cast("long").alias("example_b"),
        )
        .select(F.col("dist").cast("long").alias("dist"), "n_pairs",
                "example_a", "example_b")
        .orderBy("dist")
    )


@register(
    "x124_mad_outliers",
    """WITH med AS (
         -- medians ROUND to 6 before any downstream arithmetic or
         -- comparison (the x119 1-ulp interpolation hazard): ad and
         -- the fence both inherit med/mad bit-exactly on both engines
         SELECT o_orderpriority,
                ROUND(quantile_cont(o_totalprice, 0.5), 6) AS med
         FROM orders GROUP BY 1
       ), dev AS (
         SELECT o.o_orderpriority, med.med,
                ABS(o.o_totalprice - med.med) AS ad
         FROM orders o JOIN med USING (o_orderpriority)
       ), mad AS (
         SELECT o_orderpriority, MAX(med) AS med,
                ROUND(quantile_cont(ad, 0.5), 6) AS mad
         FROM dev GROUP BY 1
       )
       SELECT d.o_orderpriority,
              ROUND(mad.med, 4) AS median_price,
              ROUND(mad.mad, 4) AS mad,
              CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(CASE WHEN d.ad > CAST(4.4478 AS DOUBLE) * mad.mad
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM dev d JOIN mad USING (o_orderpriority)
       GROUP BY 1, 2, 3 ORDER BY 1""",
    doc="robust outlier detection via median absolute deviation: per "
        "priority, median price, MAD, and rows beyond the 3-sigma-"
        "equivalent (3 * 1.4826 * MAD) robust fence -- unlike "
        "mean/stddev fences, one fat-tailed feed cannot drag the "
        "threshold (the robust complement of x77's z-scores). Two "
        "grouped exact medians (q30 equivalence) + broadcast "
        "thresholds; at 100 TB swap percentile_approx",
)
def x124_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.round(
            F.percentile(F.col("o_totalprice"), F.lit(0.5)), 6
        ).alias("med")
    )
    dev = orders.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("ad"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.max("med").alias("med"),
        F.round(F.percentile(F.col("ad"), F.lit(0.5)), 6).alias("mad"),
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "o_orderpriority")
        .groupBy(
            "o_orderpriority",
            F.round(F.col("med"), 4).alias("median_price"),
            F.round(F.col("mad"), 4).alias("mad"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (
                    # 3 * 1.4826 pre-folded to ONE literal: computing it
                    # as int*double on one engine and DECIMAL-exact on the
                    # other can differ by 1 ulp at the fence
                    F.col("ad") > F.lit(4.4478) * F.col("mad")
                ).cast("long")
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "x125_ab_lift",
    """WITH arm AS (
         SELECT user_id,
                CASE WHEN CAST(('0x' || substr(md5(
                         'ab1:' || CAST(user_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 2 = 0
                     THEN 'A' ELSE 'B' END AS arm
         FROM (SELECT DISTINCT user_id FROM events)
       ), m AS (
         SELECT a.arm,
                count(DISTINCT e.user_id) AS n_users,
                count(DISTINCT CASE WHEN e.event_type = 'purchase'
                                    THEN e.user_id END) AS n_converted
         FROM events e JOIN arm a USING (user_id)
         GROUP BY a.arm
       )
       SELECT arm, CAST(n_users AS BIGINT) AS n_users,
              CAST(n_converted AS BIGINT) AS n_converted,
              ROUND(n_converted / CAST(n_users AS DOUBLE), 4) AS cvr,
              ROUND(n_converted / CAST(n_users AS DOUBLE) -
                    (SELECT SUM(n_converted) / CAST(SUM(n_users) AS DOUBLE)
                     FROM m), 4) AS lift_vs_pooled
       FROM m ORDER BY arm""",
    doc="deterministic A/B experiment readout: users hash into arms "
        "via the x18 md5-bucket split (pure function of user_id + "
        "experiment salt -- reruns and backfills never reassign), "
        "per-arm conversion rate and lift vs the pooled rate. One "
        "distinct-user pass + one grouped count-distinct; the arm "
        "table is user-cardinality and joins on the user key",
)
def x125_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    arm = users.select(
        "user_id",
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            "A",
        )
        .otherwise("B")
        .alias("arm"),
    )
    m = (
        ev.join(arm, "user_id")
        .groupBy("arm")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count_distinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id"))
            ).alias("n_converted"),
        )
    )
    pooled = m.agg(
        (
            F.sum("n_converted") / F.sum("n_users").cast("double")
        ).alias("pooled_cvr")
    )
    return (
        m.crossJoin(F.broadcast(pooled))
        .select(
            "arm",
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_converted").cast("long").alias("n_converted"),
            F.round(
                F.col("n_converted") / F.col("n_users").cast("double"), 4
            ).alias("cvr"),
            F.round(
                F.col("n_converted") / F.col("n_users").cast("double")
                - F.col("pooled_cvr"),
                4,
            ).alias("lift_vs_pooled"),
        )
        .orderBy("arm")
    )


@register(
    "x126_freshness",
    """WITH mx AS (SELECT MAX(ts) AS corpus_max FROM events)
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_events,
              MAX(ts) AS last_seen,
              -- floor-of-epoch on each side THEN floor-divide, matching
              -- Spark's unix_timestamp arithmetic; date_diff('minute')
              -- would count boundary CROSSINGS (off by one around :00)
              CAST(FLOOR((FLOOR(date_part('epoch',
                                (SELECT corpus_max FROM mx))) -
                          FLOOR(date_part('epoch', MAX(ts)))) / 60.0)
                   AS BIGINT) AS lag_minutes
       FROM events GROUP BY event_type ORDER BY event_type""",
    doc="feed-freshness SLA report: per event type, last event seen "
        "and its lag behind the corpus max -- the stuck-feed monitor "
        "(a type whose lag grows is a dead producer). Lag is measured "
        "against the corpus max, NOT wall clock, so the report is "
        "deterministic and backfill-safe; one grouped MAX + a "
        "broadcast 1-row reference",
)
def x126_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("corpus_max"))
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("ts").alias("last_seen"),
    )
    return (
        per.crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            "n_events",
            "last_seen",
            (
                (
                    F.unix_timestamp(F.col("corpus_max").cast("timestamp"))
                    - F.unix_timestamp(F.col("last_seen").cast("timestamp"))
                )
                / 60
            )
            .cast("long")
            .alias("lag_minutes"),
        )
        .orderBy("event_type")
    )


@register(
    "x127_repetition_ratio",
    """WITH d AS (
         SELECT source,
                list_transform(
                  range(1, len(toks) - 1),
                  i -> array_to_string((toks)[i:i+2], ' ')
                ) AS tri
         FROM (SELECT source, string_split(lower(text), ' ') AS toks
               FROM documents)
         WHERE len(toks) >= 3
       ), r AS (
         SELECT source,
                ROUND(1 - len(list_distinct(tri))
                          / CAST(len(tri) AS DOUBLE), 4) AS ratio
         FROM d
       )
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              ROUND(CAST(SUM(CAST(ratio AS DECIMAL(18,4))) AS DOUBLE)
                    / count(*), 4) AS mean_ratio,
              ROUND(MAX(ratio), 4) AS max_ratio,
              CAST(SUM(CASE WHEN ratio > 0.2 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_repetitive
       FROM r GROUP BY source ORDER BY source""",
    doc="within-document repetition (the Gopher/MassiveText quality "
        "signal): per doc, the fraction of positional trigrams that "
        "are duplicates of an earlier one -- boilerplate and "
        "keyword-stuffed pages score high and get filtered before "
        "training. Trigram sets stay INSIDE each row (x03's HOF "
        "shingle shape, never exploded); the only shuffle is the "
        "per-source rollup. Per-doc ratios round-4 then DECIMAL-sum "
        "(x37's mean recipe); docs under 3 tokens are filtered before "
        "the transform so sequence() never runs descending",
)
def x127_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source", F.split(F.lower(F.col("text")), " ").alias("__toks")
    ).filter(F.size("__toks") >= 3)
    toks = F.col("__toks")
    tri = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    r = d.select(
        "source",
        F.round(
            F.lit(1)
            - F.size(F.array_distinct(tri))
            / F.size(tri).cast("double"),
            4,
        ).alias("ratio"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("ratio").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mean_ratio"),
            F.round(F.max("ratio"), 4).alias("max_ratio"),
            F.sum((F.col("ratio") > 0.2).cast("long"))
            .cast("long")
            .alias("n_repetitive"),
        )
        .orderBy("source")
    )


@register(
    "x128_source_mix_kl",
    """WITH s AS (SELECT source, count(*) AS n FROM documents
                  GROUP BY source),
         t AS (SELECT SUM(n) AS total, count(*) AS k FROM s)
       SELECT source, CAST(n AS BIGINT) AS n_docs,
              ROUND(n / CAST(total AS DOUBLE), 6) AS p,
              ROUND((n / CAST(total AS DOUBLE))
                    * ln((n * k) / CAST(total AS DOUBLE)), 6) AS kl_term,
              ROUND(POWER(n - total / CAST(k AS DOUBLE), 2)
                    / (total / CAST(k AS DOUBLE)), 4) AS chi2_term
       FROM s, t ORDER BY source""",
    doc="training-mix drift vs the uniform target: per-source share p, "
        "its KL-divergence term p*ln(p/q) against q=1/k, and the "
        "chi-square term -- the mixture monitor that catches one "
        "source silently flooding the corpus before a training run "
        "locks in the wrong distribution. One source-keyed groupBy + "
        "a broadcast 1-row (total, k) aggregate; every term is a "
        "row-local double op on exact integer counts",
)
def x128_source_mix_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = s.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("k")
    )
    tot = F.col("total").cast("double")
    exp = F.col("total") / F.col("k").cast("double")
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "source",
            F.col("n").cast("long").alias("n_docs"),
            F.round(F.col("n") / tot, 6).alias("p"),
            F.round(
                (F.col("n") / tot)
                * F.log((F.col("n") * F.col("k")) / tot),
                6,
            ).alias("kl_term"),
            F.round(F.pow(F.col("n") - exp, 2) / exp, 4).alias(
                "chi2_term"
            ),
        )
        .orderBy("source")
    )


@register(
    "x129_token_fertility",
    """SELECT lang,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
                  AS n_words,
              CAST(SUM(len(regexp_extract_all(lower(text),
                       '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
                  AS n_subwords,
              ROUND(SUM(len(regexp_extract_all(lower(text),
                        '[a-z]+|[0-9]+|[^a-z0-9 ]')))
                    / CAST(SUM(len(string_split(lower(text), ' ')))
                           AS DOUBLE), 4) AS fertility
       FROM documents GROUP BY lang ORDER BY lang""",
    doc="tokenizer fertility by language: subword-proxy tokens (the "
        "x14-style BPE-ish regex: letter runs, digit runs, isolated "
        "punctuation) per whitespace word -- the metric that exposes "
        "how much more context budget a language burns per word, the "
        "standard multi-lingual tokenizer-audit number. Pure "
        "expression work folded into one lang-keyed groupBy; counts "
        "are exact longs, the ratio is the only double",
)
def x129_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    n_words = F.size(F.split(low, " "))
    n_sub = F.size(
        F.regexp_extract_all(low, F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0))
    )
    return (
        docs.select("lang", n_words.alias("w"), n_sub.alias("s"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("n_words"),
            F.sum("s").cast("long").alias("n_subwords"),
            F.round(
                F.sum("s") / F.sum("w").cast("double"), 4
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


@register(
    "x130_embedding_outliers",
    """WITH n AS (
         SELECT label,
                ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[]))),
                      7) AS nrm
         FROM embeddings
       ), m AS (
         SELECT label,
                count(*) AS n_vecs,
                ROUND(CAST(SUM(CAST(nrm AS DECIMAL(28,7))) AS DOUBLE)
                      / count(*), 6) AS mean_norm
         FROM n GROUP BY label
       )
       SELECT n.label, CAST(m.n_vecs AS BIGINT) AS n_vecs,
              m.mean_norm,
              CAST(SUM(CASE WHEN ABS(n.nrm - m.mean_norm)
                                 > 0.1 * m.mean_norm
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM n JOIN m USING (label)
       GROUP BY n.label, m.n_vecs, m.mean_norm
       ORDER BY n.label""",
    doc="embedding-norm outlier audit: per label, vectors whose L2 "
        "norm sits >10% off the label mean -- broken encoders, "
        "zero-padded rows, and mis-normalized batches all show up as "
        "norm outliers before they poison ANN recall. Norm is the "
        "x63 row-local zip_with/aggregate fold (identical "
        "left-to-right order to DuckDB's list_dot_product), round-7 "
        "then DECIMAL-meaned (x111's recipe); the label-mean table "
        "broadcasts back for the row-local fence test",
)
def x130_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nrm = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(v, v, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        7,
    )
    n = emb.select("label", nrm.alias("nrm"))
    m = n.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(
            F.sum(F.col("nrm").cast("decimal(28,7)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_norm"),
    )
    return (
        n.join(F.broadcast(m), "label")
        .groupBy("label", "n_vecs", "mean_norm")
        .agg(
            F.sum(
                (
                    F.abs(F.col("nrm") - F.col("mean_norm"))
                    > 0.1 * F.col("mean_norm")
                ).cast("long")
            )
            .cast("long")
            .alias("n_outliers")
        )
        .orderBy("label")
    )


@register(
    "x131_retention_cohorts",
    """WITH w AS (
         SELECT user_id,
                CAST(FLOOR((FLOOR(date_part('epoch', ts)) - 1704067200)
                           / 604800.0) AS BIGINT) AS wk
         FROM events
       ), c AS (
         SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY user_id
       ), a AS (
         SELECT DISTINCT user_id, wk FROM w
       )
       SELECT c.cohort AS cohort_week,
              CAST(a.wk - c.cohort AS BIGINT) AS week_offset,
              CAST(count(*) AS BIGINT) AS n_users
       FROM a JOIN c USING (user_id)
       GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="weekly retention cohort matrix: users grouped by first-seen "
        "week (vs the 2024-01-01 epoch anchor), counted per week "
        "offset they return in -- the activation/retention triangle "
        "every growth dashboard starts from. Cohort assignment, "
        "active-week distinct, and the join all share the user key, "
        "so AQE can plan one user-hash exchange reused across stages; "
        "the final matrix groupBy is cohort-cardinality. Week index "
        "is floor-of-epoch arithmetic (x126's recipe), deterministic "
        "and timezone-free",
)
def x131_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wk = F.floor(
        (
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            - F.lit(1704067200)
        )
        / F.lit(604800.0)
    ).cast("long")
    w = ev.select("user_id", wk.alias("wk"))
    c = w.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    a = w.distinct()
    return (
        a.join(c, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_week"),
            (F.col("wk") - F.col("cohort")).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "x132_idf_drift",
    """WITH d AS (
         SELECT CASE WHEN CAST(('0x' || substr(md5(
                          'idf:' || CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 2 = 0
                     THEN 'A' ELSE 'B' END AS half,
                list_distinct(string_split(lower(text), ' ')) AS terms
         FROM documents
       ), n AS (
         SELECT SUM(CASE WHEN half = 'A' THEN 1 ELSE 0 END) AS n_a,
                SUM(CASE WHEN half = 'B' THEN 1 ELSE 0 END) AS n_b
         FROM d
       ), t AS (
         SELECT term,
                SUM(CASE WHEN half = 'A' THEN 1 ELSE 0 END) AS df_a,
                SUM(CASE WHEN half = 'B' THEN 1 ELSE 0 END) AS df_b
         FROM (SELECT half, unnest(terms) AS term FROM d)
         GROUP BY term
       )
       SELECT term, CAST(df_a AS BIGINT) AS df_a,
              CAST(df_b AS BIGINT) AS df_b,
              ROUND(ABS(ln((n_a + 1) / CAST(df_a + 1 AS DOUBLE))
                        - ln((n_b + 1) / CAST(df_b + 1 AS DOUBLE))),
                    6) AS drift
       FROM t, n
       ORDER BY drift DESC, term LIMIT 50""",
    doc="train/validation vocabulary drift: documents hash-split into "
        "deterministic halves (the x18 md5 split -- reruns never "
        "reassign), per-term smoothed IDF computed in each, top 50 "
        "terms by |IDF_A - IDF_B| -- the distribution-shift probe "
        "that catches a temporally- or source-biased split before "
        "eval numbers lie. Distinct terms stay in-row until ONE "
        "explode->groupBy(term) with both halves' document "
        "frequencies as conditional sums (no per-half passes); the "
        "half sizes ride a broadcast 1-row aggregate; top-k plans as "
        "TakeOrderedAndProject, never a global sort",
)
def x132_idf_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    half = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("idf:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    d = docs.select(
        half.alias("half"),
        F.array_distinct(F.split(F.lower(F.col("text")), " ")).alias("terms"),
    )
    n = d.groupBy().agg(
        F.sum((F.col("half") == "A").cast("long")).alias("n_a"),
        F.sum((F.col("half") == "B").cast("long")).alias("n_b"),
    )
    t = (
        d.select("half", F.explode("terms").alias("term"))
        .groupBy("term")
        .agg(
            F.sum((F.col("half") == "A").cast("long")).alias("df_a"),
            F.sum((F.col("half") == "B").cast("long")).alias("df_b"),
        )
    )
    idf = lambda nn, df: F.log(
        (nn + F.lit(1)) / (df + F.lit(1)).cast("double")
    )
    return (
        t.crossJoin(F.broadcast(n))
        .select(
            "term",
            F.col("df_a").cast("long").alias("df_a"),
            F.col("df_b").cast("long").alias("df_b"),
            F.round(
                F.abs(
                    idf(F.col("n_a"), F.col("df_a"))
                    - idf(F.col("n_b"), F.col("df_b"))
                ),
                6,
            ).alias("drift"),
        )
        .orderBy(F.desc("drift"), "term")
        .limit(50)
    )


@register(
    "x133_prefix_dup",
    """WITH f AS (
         SELECT doc_id, source,
                md5(array_to_string(
                    (string_split(lower(text), ' '))[1:8], ' ')) AS fp
         FROM documents
       )
       SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
              CAST(MIN(doc_id) AS BIGINT) AS exemplar_doc
       FROM f GROUP BY fp HAVING count(*) > 1
       ORDER BY n_docs DESC, fp""",
    doc="templated-document detection: docs fingerprinted by their "
        "first 8 tokens (md5), groups >1 reported with source spread "
        "and a deterministic exemplar -- boilerplate mirrors and "
        "form-letter spam share prefixes long before full-text "
        "near-dup fires, and the prefix hash is ONE narrow groupBy "
        "(no shingles, no pairs) so it runs as a cheap first-pass "
        "filter at any scale. md5 is bit-identical cross-engine; "
        "short docs truncate the slice identically on both",
)
def x133_prefix_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(
            " ", F.slice(F.split(F.lower(F.col("text")), " "), 1, 8)
        )
    )
    return (
        docs.select("doc_id", "source", fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").cast("long").alias("exemplar_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), "fp")
    )


@register(
    "x134_rfm_segments",
    """WITH mx AS (SELECT MAX(o_orderdate) AS dmax FROM orders),
       cust AS (
         SELECT o_custkey,
                CAST(FLOOR((FLOOR(date_part('epoch',
                                  (SELECT dmax FROM mx))) -
                            FLOOR(date_part('epoch', MAX(o_orderdate))))
                           / 86400.0) AS BIGINT) AS recency_days,
                CAST(count(*) AS BIGINT) AS frequency,
                CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                                AS DOUBLE), 2) AS DOUBLE) AS monetary
         FROM orders GROUP BY o_custkey
       ), th AS (
         -- round-6 thresholds before comparison (the x119 1-ulp
         -- interpolation hazard)
         SELECT list_transform(quantile_cont(recency_days,
                  [0.25, 0.5, 0.75]), t -> ROUND(t, 6)) AS t_r,
                list_transform(quantile_cont(frequency,
                  [0.25, 0.5, 0.75]), t -> ROUND(t, 6)) AS t_f,
                list_transform(quantile_cont(monetary,
                  [0.25, 0.5, 0.75]), t -> ROUND(t, 6)) AS t_m
         FROM cust
       )
       SELECT CAST(4 - len(list_filter(t_r, t -> recency_days >= t))
                   AS BIGINT) AS r_score,
              CAST(1 + len(list_filter(t_f, t -> frequency >= t))
                   AS BIGINT) AS f_score,
              CAST(1 + len(list_filter(t_m, t -> monetary >= t))
                   AS BIGINT) AS m_score,
              CAST(count(*) AS BIGINT) AS n_customers,
              -- total, not average: the DECIMAL sum is exact and its
              -- double cast correctly rounded; a sum/count division
              -- can land on a .xx5 tie and round differently per engine
              ROUND(CAST(SUM(CAST(monetary AS DECIMAL(30,2)))
                         AS DOUBLE), 2) AS total_monetary
       FROM cust, th
       GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    doc="RFM customer segmentation: per-customer recency (days behind "
        "the corpus max order date -- deterministic, never wall "
        "clock), frequency, and DECIMAL-exact monetary, each scored "
        "1-4 against broadcast quartile thresholds (x119's "
        "rank-against-quantile-array pattern; recency scores "
        "INVERTED so fresher = higher), segments counted. One "
        "customer-keyed groupBy + a 1-row threshold broadcast + a "
        "segment-cardinality rollup; quantile_cont == percentile "
        "bit-for-bit (q30)",
)
def x134_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("dmax"))
    cust = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.floor(
                (
                    F.unix_timestamp(F.max("dmax").cast("timestamp"))
                    - F.unix_timestamp(
                        F.max("o_orderdate").cast("timestamp")
                    )
                )
                / F.lit(86400.0)
            )
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast(
                    "double"
                ),
                2,
            ).alias("monetary"),
        )
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    r6 = lambda c: F.transform(c, lambda t: F.round(t, 6))
    th = cust.agg(
        r6(F.percentile(F.col("recency_days"), qs)).alias("t_r"),
        r6(F.percentile(F.col("frequency"), qs)).alias("t_f"),
        r6(F.percentile(F.col("monetary"), qs)).alias("t_m"),
    )
    rank = lambda v, t: F.size(
        F.filter(t, lambda x: v >= x)
    )
    return (
        cust.crossJoin(F.broadcast(th))
        .select(
            (F.lit(4) - rank(F.col("recency_days"), F.col("t_r")))
            .cast("long")
            .alias("r_score"),
            (F.lit(1) + rank(F.col("frequency"), F.col("t_f")))
            .cast("long")
            .alias("f_score"),
            (F.lit(1) + rank(F.col("monetary"), F.col("t_m")))
            .cast("long")
            .alias("m_score"),
            "monetary",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(
                F.sum(F.col("monetary").cast("decimal(30,2)")).cast(
                    "double"
                ),
                2,
            ).alias("total_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "x135_load_profile",
    """WITH e AS (
         SELECT CAST((FLOOR(FLOOR(date_part('epoch', ts)) / 86400) + 4)
                     % 7 AS BIGINT) AS dow,
                CAST(FLOOR((FLOOR(date_part('epoch', ts)) % 86400)
                           / 3600) AS BIGINT) AS hour
         FROM events
       ), t AS (SELECT count(*) AS total FROM e)
       SELECT dow, hour, CAST(count(*) AS BIGINT) AS n_events,
              ROUND(count(*) / CAST(total AS DOUBLE), 6) AS share
       FROM e, t GROUP BY dow, hour, total ORDER BY dow, hour""",
    doc="traffic load profile: events bucketed into day-of-week x "
        "hour-of-day cells with share-of-total -- the capacity-"
        "planning heatmap. Day-of-week comes from pure epoch "
        "arithmetic ((days + 4) % 7, 0=Sunday, anchored on 1970-01-01 "
        "= Thursday) instead of engine dayofweek() functions, whose "
        "0- vs 1-based conventions differ; one 168-cell groupBy with "
        "a broadcast total",
)
def x135_load_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    e = ev.select(
        ((F.floor(epoch / 86400) + 4) % 7).cast("long").alias("dow"),
        F.floor((epoch % 86400) / 3600).cast("long").alias("hour"),
    )
    t = e.agg(F.count(F.lit(1)).alias("total"))
    return (
        e.groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .crossJoin(F.broadcast(t))
        .select(
            "dow",
            "hour",
            "n_events",
            F.round(
                F.col("n_events") / F.col("total").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("dow", "hour")
    )


@register(
    "x136_token_entropy",
    """WITH tc AS (
         SELECT source, tok, count(*) AS c
         FROM (SELECT source,
                      unnest(string_split(lower(text), ' ')) AS tok
               FROM documents)
         GROUP BY source, tok
       ), tot AS (
         SELECT source, SUM(c) AS total, count(*) AS n_distinct
         FROM tc GROUP BY source
       )
       SELECT tc.source,
              CAST(tot.total AS BIGINT) AS n_tokens,
              CAST(tot.n_distinct AS BIGINT) AS n_distinct,
              ROUND(CAST(SUM(CAST(ROUND(
                       -(tc.c / CAST(tot.total AS DOUBLE))
                        * ln(tc.c / CAST(tot.total AS DOUBLE)), 8)
                     AS DECIMAL(28,8))) AS DOUBLE), 4) AS entropy,
              ROUND(CAST(SUM(CAST(ROUND(
                       -(tc.c / CAST(tot.total AS DOUBLE))
                        * ln(tc.c / CAST(tot.total AS DOUBLE)), 8)
                     AS DECIMAL(28,8))) AS DOUBLE)
                    / NULLIF(ln(CAST(tot.n_distinct AS DOUBLE)), 0), 4)
                  AS norm_entropy
       FROM tc JOIN tot USING (source)
       GROUP BY tc.source, tot.total, tot.n_distinct
       ORDER BY tc.source""",
    doc="per-source token Shannon entropy (+ normalized by "
        "ln(vocab)): low-entropy sources are templated/spun content, "
        "high-entropy ones are noise -- the corpus-diversity dial "
        "used when setting mixture weights. Two partial-aggregating "
        "groupBys (source x token, then source) with the "
        "source-cardinality totals broadcast back; per-token terms "
        "are round-8 then DECIMAL-summed so the reduction order "
        "cannot move the 4th decimal (the x88 recipe)",
)
def x136_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = tc.groupBy("source").agg(
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    p = F.col("c") / F.col("total").cast("double")
    term = F.round(-p * F.log(p), 8).cast("decimal(28,8)")
    return (
        tc.join(F.broadcast(tot), "source")
        .groupBy(
            "source",
            F.col("total").cast("long").alias("n_tokens"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
        )
        .agg(F.sum(term).alias("__h"))
        .select(
            "source",
            "n_tokens",
            "n_distinct",
            F.round(F.col("__h").cast("double"), 4).alias("entropy"),
            F.round(
                F.col("__h").cast("double")
                / F.nullif(
                    F.log(F.col("n_distinct").cast("double")), F.lit(0.0)
                ),
                4,
            ).alias("norm_entropy"),
        )
        .orderBy("source")
    )


@register(
    "x137_join_cardinality",
    """WITH oc AS (
         SELECT 'orders->customer' AS edge,
                (SELECT count(*) FROM orders) AS n_left,
                (SELECT count(*) FROM customer) AS n_right,
                count(*) AS n_shared_keys,
                SUM(cl * cr) AS join_rows
         FROM (SELECT o_custkey AS k, count(*) AS cl FROM orders
               GROUP BY 1) l
         JOIN (SELECT c_custkey AS k, count(*) AS cr FROM customer
               GROUP BY 1) r USING (k)
       ), lo AS (
         SELECT 'lineitem->orders' AS edge,
                (SELECT count(*) FROM lineitem) AS n_left,
                (SELECT count(*) FROM orders) AS n_right,
                count(*) AS n_shared_keys,
                SUM(cl * cr) AS join_rows
         FROM (SELECT l_orderkey AS k, count(*) AS cl FROM lineitem
               GROUP BY 1) l
         JOIN (SELECT o_orderkey AS k, count(*) AS cr FROM orders
               GROUP BY 1) r USING (k)
       ), ls AS (
         SELECT 'lineitem->supplier' AS edge,
                (SELECT count(*) FROM lineitem) AS n_left,
                (SELECT count(*) FROM supplier) AS n_right,
                count(*) AS n_shared_keys,
                SUM(cl * cr) AS join_rows
         FROM (SELECT l_suppkey AS k, count(*) AS cl FROM lineitem
               GROUP BY 1) l
         JOIN (SELECT s_suppkey AS k, count(*) AS cr FROM supplier
               GROUP BY 1) r USING (k)
       ), u AS (
         SELECT * FROM oc UNION ALL SELECT * FROM lo
         UNION ALL SELECT * FROM ls
       )
       SELECT edge, CAST(n_left AS BIGINT) AS n_left,
              CAST(n_right AS BIGINT) AS n_right,
              CAST(n_shared_keys AS BIGINT) AS n_shared_keys,
              CAST(join_rows AS BIGINT) AS join_rows,
              ROUND(join_rows / CAST(n_left AS DOUBLE), 4)
                  AS amplification
       FROM u ORDER BY edge""",
    doc="join-cardinality estimation from per-key histograms: for each "
        "FK edge, the exact inner-join output size computed as "
        "sum(c_left * c_right) over shared keys WITHOUT executing the "
        "join -- the perfect-histogram version of what a CBO estimates "
        "before picking join order, and the pre-flight check that "
        "catches a fan-out join (amplification >> 1) before it OOMs a "
        "100 TB pipeline. Per edge: two partial-aggregating key "
        "groupBys + a key-cardinality join, never the row-level join "
        "itself",
)
def x137_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools

    def edge(name, left, lk, right, rk):
        l = left.groupBy(F.col(lk).alias("k")).agg(
            F.count(F.lit(1)).alias("cl")
        )
        r = right.groupBy(F.col(rk).alias("k")).agg(
            F.count(F.lit(1)).alias("cr")
        )
        nl = left.agg(F.count(F.lit(1)).alias("n_left"))
        nr = right.agg(F.count(F.lit(1)).alias("n_right"))
        return (
            l.join(r, "k")
            .agg(
                F.count(F.lit(1)).alias("n_shared_keys"),
                F.sum(F.col("cl") * F.col("cr")).alias("join_rows"),
            )
            .crossJoin(F.broadcast(nl))
            .crossJoin(F.broadcast(nr))
            .select(
                F.lit(name).alias("edge"),
                F.col("n_left").cast("long").alias("n_left"),
                F.col("n_right").cast("long").alias("n_right"),
                F.col("n_shared_keys").cast("long").alias("n_shared_keys"),
                F.col("join_rows").cast("long").alias("join_rows"),
                F.round(
                    F.col("join_rows") / F.col("n_left").cast("double"), 4
                ).alias("amplification"),
            )
        )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    parts = [
        edge("orders->customer", orders, "o_custkey", cust, "c_custkey"),
        edge("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
        edge("lineitem->supplier", li, "l_suppkey", sup, "s_suppkey"),
    ]
    return functools.reduce(lambda a, b: a.unionAll(b), parts).orderBy(
        "edge"
    )


@register(
    "x138_jaccard_curve",
    """WITH t AS (
         SELECT doc_id,
                list_distinct(list_transform(
                  range(1, len(string_split(lower(text), ' ')) - 1),
                  i -> array_to_string(
                         (string_split(lower(text), ' '))[i:i+2], ' ')
                )) AS sh
         FROM documents
         WHERE len(string_split(lower(text), ' ')) >= 3
       ), e AS (
         SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM t
       ), p AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS inter
         FROM e a JOIN e b USING (shingle)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2, 3, 4
       ), j AS (
         SELECT LEAST(CAST(FLOOR(
                  ROUND(CAST(inter AS DOUBLE)
                        / (n_a + n_b - inter), 4) * 10) AS BIGINT), 9)
                    AS band
         FROM p
       ), b AS (
         SELECT band, count(*) AS n_pairs FROM j GROUP BY band
       )
       SELECT ROUND(band / 10.0, 1) AS band_lo,
              CAST(n_pairs AS BIGINT) AS n_pairs,
              CAST(SUM(n_pairs) OVER (ORDER BY band DESC
                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS n_pairs_at_or_above
       FROM b ORDER BY band_lo""",
    doc="dedup-threshold calibration curve: ALL shingle-sharing pairs "
        "(x03's blocked pair stage, unthresholded) banded by Jaccard "
        "decile, with the cumulative pairs-at-or-above count -- the "
        "table you read before choosing a near-dup cutoff (how many "
        "pairs does 0.5 vs 0.7 actually merge?). Reuses the shared "
        "localCheckpoint'ed pair counts; banding is row-local; the "
        "cumulative window runs over <= 10 band rows, not data",
)
def x138_jaccard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    counts = _shared_pair_counts(spark, sf_dir, k=3)
    jac = F.round(
        F.col("inter")
        / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        4,
    )
    j = counts.select(
        F.least(F.floor(jac * 10).cast("long"), F.lit(9).cast("long")).alias(
            "band"
        )
    )
    b = j.groupBy("band").agg(F.count(F.lit(1)).alias("n_pairs"))
    w = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        b.select(
            F.round(F.col("band") / 10.0, 1).alias("band_lo"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.sum("n_pairs").over(w).cast("long").alias(
                "n_pairs_at_or_above"
            ),
        )
        .orderBy("band_lo")
    )


@register(
    "x139_session_length_dist",
    """WITH ordered AS (
         SELECT user_id, event_id, ts,
                lag(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev_ts
         FROM events
       ), flagged AS (
         SELECT user_id, event_id, ts,
                CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_session
         FROM ordered
       ), sessions AS (
         SELECT user_id,
                CAST(SUM(new_session) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS session_id
         FROM flagged
       ), sz AS (
         SELECT user_id, session_id, count(*) AS n_events
         FROM sessions GROUP BY 1, 2
       ), lab AS (
         SELECT CASE WHEN n_events = 1 THEN '1 (bounce)'
                     WHEN n_events = 2 THEN '2'
                     WHEN n_events <= 5 THEN '3-5'
                     WHEN n_events <= 10 THEN '6-10'
                     ELSE '11+' END AS bucket
         FROM sz
       ), tot AS (SELECT count(*) AS t FROM lab)
       SELECT bucket, CAST(count(*) AS BIGINT) AS n_sessions,
              ROUND(count(*) / CAST(t AS DOUBLE), 4) AS share
       FROM lab, tot GROUP BY bucket, t ORDER BY bucket""",
    doc="session-length distribution with the bounce bucket: x21's "
        "gap-sessionization rolled into banded session sizes + share "
        "-- the engagement-shape report (a bounce-heavy feed is bot "
        "traffic or broken deep links). Same single user-key shuffle "
        "as x21 (window + rollup co-partitioned), then a 5-row banded "
        "aggregate with a broadcast total",
)
def x139_session_length_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias(
            "new_session"
        ),
    )
    sz = (
        flagged.select(
            "user_id", F.sum("new_session").over(run).alias("session_id")
        )
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    lab = sz.select(
        F.when(F.col("n_events") == 1, "1 (bounce)")
        .when(F.col("n_events") == 2, "2")
        .when(F.col("n_events") <= 5, "3-5")
        .when(F.col("n_events") <= 10, "6-10")
        .otherwise("11+")
        .alias("bucket")
    )
    tot = lab.agg(F.count(F.lit(1)).alias("t"))
    return (
        lab.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_sessions",
            F.round(
                F.col("n_sessions") / F.col("t").cast("double"), 4
            ).alias("share"),
        )
        .orderBy("bucket")
    )


def _x140_oracle() -> str:
    """Chained-CTE replay of 3 Markov power iterations (the x104
    pagerank oracle pattern, on the behavioral transition matrix)."""
    head = """WITH s AS (
         SELECT user_id, event_type,
                lead(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                ) AS next_type
         FROM events
       ), pm AS (
         SELECT event_type AS src, next_type AS dst, count(*) AS n
         FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
       ), tt AS (SELECT src, SUM(n) AS t FROM pm GROUP BY 1),
       P AS (
         SELECT pm.src, pm.dst, pm.n / CAST(tt.t AS DOUBLE) AS pp
         FROM pm JOIN tt USING (src)
       ), st AS (SELECT DISTINCT event_type AS et FROM events),
       kk AS (SELECT count(*) AS k FROM st),
       v0 AS (SELECT et, CAST(1.0 AS DOUBLE) / k AS v FROM st, kk)"""
    steps = []
    for i in range(1, 4):
        steps.append(f"""
       i{i} AS (
         SELECT P.dst AS et,
                ROUND(CAST(SUM(CAST(ROUND(v{i-1}.v * P.pp, 12)
                                    AS DECIMAL(28,12))) AS DOUBLE), 12)
                    AS v
         FROM v{i-1} JOIN P ON v{i-1}.et = P.src GROUP BY P.dst
       ), v{i} AS (
         SELECT st.et, COALESCE(i{i}.v, CAST(0.0 AS DOUBLE)) AS v
         FROM st LEFT JOIN i{i} ON st.et = i{i}.et
       )""")
    return (
        head
        + ","
        + ",".join(steps)
        + """
       SELECT et AS event_type, ROUND(v, 6) AS stationary
       FROM v3 ORDER BY et"""
    )


@register(
    "x140_markov_stationary",
    _x140_oracle(),
    doc="stationary distribution of the behavioral Markov chain: "
        "x96's transition matrix power-iterated 3 rounds from uniform "
        "-- where user journeys CONCENTRATE in the long run (states "
        "with no outgoing edges leak mass by design; fixed depth "
        "bounds lineage). The x104 iterative recipe on a "
        "type-cardinality matrix: contributions round-12 then "
        "DECIMAL-summed, state re-rounded per round so both engines "
        "enter each iteration bit-identical; one user-key window "
        "derives the matrix, every iteration is type-cardinality "
        "(broadcast) work",
)
def x140_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    pm = s.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    tt = pm.groupBy("src").agg(F.sum("n").alias("t"))
    P = (
        pm.join(tt, "src")
        .select("src", "dst", (F.col("n") / F.col("t").cast("double")).alias("pp"))
        .localCheckpoint(eager=False)
    )
    st = ev.select(F.col("event_type").alias("et")).distinct()
    kk = st.agg(F.count(F.lit(1)).alias("k"))
    v = st.crossJoin(F.broadcast(kk)).select(
        "et", (F.lit(1.0) / F.col("k")).alias("v")
    )
    for _ in range(3):
        contrib = (
            v.join(F.broadcast(P), v["et"] == P["src"])
            .select(
                F.col("dst").alias("et2"),
                F.round(F.col("v") * F.col("pp"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
            .groupBy("et2")
            .agg(F.round(F.sum("c").cast("double"), 12).alias("nv"))
        )
        v = (
            st.join(contrib, st["et"] == contrib["et2"], "left")
            .select("et", F.coalesce(F.col("nv"), F.lit(0.0)).alias("v"))
        )
    return v.select(
        F.col("et").alias("event_type"),
        F.round(F.col("v"), 6).alias("stationary"),
    ).orderBy("event_type")


@register(
    "x141_event_pivot",
    """SELECT CAST(FLOOR(FLOOR(date_part('epoch', ts)) / 86400)
                   AS BIGINT) AS day,
              CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS BIGINT) AS click,
              CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS BIGINT) AS error,
              CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END) AS BIGINT) AS purchase,
              CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   AS BIGINT) AS signup,
              CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS BIGINT) AS view
       FROM events GROUP BY 1 ORDER BY day""",
    doc="daily x event-type PIVOT (long->wide): the wide daily-ops "
        "matrix every monitoring dashboard consumes. Spark's "
        "df.pivot() with an EXPLICIT value list -- omitting the list "
        "makes pivot run a blocking distinct-collect planning pass "
        "AND produce schema drift when a type is absent some day; the "
        "oracle is the equivalent conditional-sum formulation, which "
        "is also exactly what Catalyst lowers pivot to (one "
        "partial-aggregating groupBy, no extra shuffle vs the long "
        "form). Day index is epoch arithmetic (x135)",
)
def x141_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400
    ).cast("long")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.select(day.alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .count()
    )
    # pivot yields NULL for absent (day, type) cells; the wide report
    # wants 0 (matching the oracle's conditional sums)
    return out.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types],
    ).orderBy("day")


@register(
    "x142_cube_sales",
    """SELECT o_orderstatus, o_orderpriority,
              CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
              CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
              CAST(count(*) AS BIGINT) AS n_orders,
              ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                         AS DOUBLE), 2) AS revenue
       FROM orders
       GROUP BY CUBE(o_orderstatus, o_orderpriority)
       ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""",
    doc="CUBE over (status, priority) with GROUPING() markers: all four "
        "marginal combinations in one pass -- completes the "
        "grouping-sets surface next to q10's ROLLUP (CUBE adds the "
        "per-priority-across-status marginal ROLLUP lacks). Catalyst "
        "lowers CUBE to one Expand + one hash aggregate: each input "
        "row fans to 4 grouping sets map-side, partial aggregation "
        "still applies -- no extra shuffle over the plain groupBy; "
        "DECIMAL-exact revenue; GROUPING() bits disambiguate real "
        "NULLs from subtotal rows",
)
def x142_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            # grouping() is only resolvable INSIDE the cube aggregate
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_priority",
            "n_orders",
            "revenue",
        )
        .orderBy(
            "g_status", "g_priority", "o_orderstatus", "o_orderpriority"
        )
    )


@register(
    "x143_stream_dedup_counts",
    """SELECT event_type,
              CAST(count(DISTINCT event_id) AS BIGINT) AS n_events
       FROM events GROUP BY 1 ORDER BY 1""",
    doc="streaming exact dedup, driver-hashable: the events table "
        "materialized TWICE into a file-stream source (every row a "
        "duplicate), drained through "
        "dropDuplicatesWithinWatermark(event_id) in one availableNow "
        "micro-batch, then rolled up per type -- hash-equal to the "
        "batch count-distinct oracle, proving the streaming dedup leg "
        "end-to-end through the correctness gate (streaming/dedup.py; "
        "single-batch drain keeps every duplicate inside the "
        "watermark horizon, the bounded-state trade documented "
        "there). State is keyed by event_id and expires with the "
        "watermark at scale",
)
def x143_stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import uuid

    from ..streaming.dedup import dedup_stream

    ev = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="x143_stream_")
    sink = f"x143_sink_{uuid.uuid4().hex[:8]}"
    try:
        src = os.path.join(tmp, "events_dup")
        base = ev.repartition(4)
        base.write.mode("overwrite").parquet(src)
        # second copy = every event_id duplicated across files
        base.write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        deduped = dedup_stream(stream, ["event_id"], ts_col="ts")
        agg = deduped.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_events")
        )
        from ..streaming.windows import _start_with_state_partitions

        writer = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
        )
        # 8 state stores, not the session's 32: the dedup + agg state is
        # tiny next to per-store open/commit overhead per micro-batch
        # (x103's measured 14.5 s -> 3.9 s recipe)
        q = _start_with_state_partitions(spark, writer, 8)
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("x143 stream drain did not finish in 300 s")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(sink).orderBy("event_type")


@register(
    "x144_bloom_prefilter",
    """WITH dim AS (
         SELECT DISTINCT s_suppkey AS k FROM supplier
         WHERE s_nationkey < 5
       ), bits AS (
         SELECT DISTINCT b FROM (
           SELECT CAST(('0x' || substr(md5('b1:' || CAST(k AS VARCHAR)),
                        1, 8)) AS BIGINT) % 4096 AS b FROM dim
           UNION ALL
           SELECT CAST(('0x' || substr(md5('b2:' || CAST(k AS VARCHAR)),
                        1, 8)) AS BIGINT) % 4096 AS b FROM dim
         )
       ), ba AS (SELECT list(b ORDER BY b) AS arr FROM bits),
       probe AS (
         SELECT l_suppkey,
                CAST(('0x' || substr(md5('b1:' ||
                      CAST(l_suppkey AS VARCHAR)), 1, 8)) AS BIGINT)
                    % 4096 AS b1,
                CAST(('0x' || substr(md5('b2:' ||
                      CAST(l_suppkey AS VARCHAR)), 1, 8)) AS BIGINT)
                    % 4096 AS b2
         FROM lineitem
       ), f AS (
         SELECT p.l_suppkey,
                (list_contains(ba.arr, p.b1) AND
                 list_contains(ba.arr, p.b2)) AS bloom_pass,
                EXISTS (SELECT 1 FROM dim WHERE dim.k = p.l_suppkey)
                    AS true_match
         FROM probe p, ba
       )
       SELECT CAST(count(*) AS BIGINT) AS n_probe,
              CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_pass,
              CAST(SUM(CASE WHEN true_match THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_true,
              CAST(SUM(CASE WHEN bloom_pass AND NOT true_match
                            THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_false_pos,
              CAST(SUM(CASE WHEN NOT bloom_pass AND true_match
                            THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_false_neg
       FROM f""",
    doc="runtime-filter (bloom) join pruning, simulated "
        "deterministically: the selective dim side's keys set 2 "
        "md5-derived bits in a 4096-bit filter; the fact side tests "
        "membership ROW-LOCALLY against the broadcast bit array and "
        "only survivors would reach the join shuffle -- the mechanism "
        "behind spark.sql.optimizer.runtimeFilter.* that turns a "
        "selective dim filter into fact-scan pruning at 100 TB. "
        "Report proves the contract: n_false_neg must be 0 (blooms "
        "never drop true matches), n_false_pos is the wasted-shuffle "
        "overhead. md5 bit positions are bit-identical cross-engine",
)
def x144_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        sup.filter(F.col("s_nationkey") < 5)
        .select(F.col("s_suppkey").alias("k"))
        .distinct()
    )

    def pos(salt, col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 4096
        )

    bits = (
        dim.select(pos("b1:", F.col("k")).alias("b"))
        .unionAll(dim.select(pos("b2:", F.col("k")).alias("b")))
        .distinct()
    )
    ba = bits.agg(F.array_sort(F.collect_list("b")).alias("arr"))
    probe = li.select(
        "l_suppkey",
        pos("b1:", F.col("l_suppkey")).alias("b1"),
        pos("b2:", F.col("l_suppkey")).alias("b2"),
    )
    truth = dim.select(F.col("k").alias("l_suppkey")).withColumn(
        "__t", F.lit(True)
    )
    f = (
        probe.crossJoin(F.broadcast(ba))
        .join(F.broadcast(truth), "l_suppkey", "left")
        .select(
            (
                F.array_contains(F.col("arr"), F.col("b1"))
                & F.array_contains(F.col("arr"), F.col("b2"))
            ).alias("bloom_pass"),
            F.coalesce(F.col("__t"), F.lit(False)).alias("true_match"),
        )
    )
    return f.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum(F.col("bloom_pass").cast("long")).cast("long").alias("n_pass"),
        F.sum(F.col("true_match").cast("long")).cast("long").alias("n_true"),
        F.sum((F.col("bloom_pass") & ~F.col("true_match")).cast("long"))
        .cast("long")
        .alias("n_false_pos"),
        F.sum((~F.col("bloom_pass") & F.col("true_match")).cast("long"))
        .cast("long")
        .alias("n_false_neg"),
    )


@register(
    "x145_decay_engagement",
    """WITH mx AS (SELECT MAX(ts) AS tmax FROM events),
       s AS (
         SELECT user_id,
                CAST(ROUND(
                  value * exp(-0.1 *
                    ((FLOOR(date_part('epoch', (SELECT tmax FROM mx))) -
                      FLOOR(date_part('epoch', ts))) / 86400.0)), 6)
                  AS DECIMAL(28,6)) AS w
         FROM events
       ), agg AS (
         -- round the exact DECIMAL sum FIRST, cast after: rounding the
         -- double cast instead lands on representation ties (x.xxxx5
         -- has no exact double) that the engines break differently
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(ROUND(SUM(w), 4) AS DOUBLE) AS score
         FROM s GROUP BY user_id
       )
       SELECT user_id, n_events, score FROM agg
       ORDER BY score DESC, user_id LIMIT 100""",
    doc="exponential time-decay engagement score: per user, "
        "sum(value * exp(-0.1 * age_days)) against the corpus max "
        "timestamp (deterministic, backfill-safe -- x126's anchor) -- "
        "the recency-weighted ranking signal feeding retention "
        "targeting and sample weighting (x38's weighted sampler "
        "upstream). Per-event terms are row-local exp() on identical "
        "doubles, round-6 then DECIMAL-summed (x88 recipe); one "
        "user-key groupBy; top-100 plans as TakeOrderedAndProject",
)
def x145_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("tmax"))
    age_days = (
        F.unix_timestamp(F.col("tmax").cast("timestamp"))
        - F.unix_timestamp(F.col("ts").cast("timestamp"))
    ) / F.lit(86400.0)
    w = F.round(F.col("value") * F.exp(F.lit(-0.1) * age_days), 6).cast(
        "decimal(28,6)"
    )
    return (
        ev.crossJoin(F.broadcast(mx))
        .select("user_id", w.alias("w"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("w"), 4).cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), "user_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Round-5 additions: split leakage, statistical audits, gaps-and-islands,
# BFS reachability, RANGE-frame rolling windows, weighted top-k sampling
# ---------------------------------------------------------------------------


@register(
    "x146_split_leakage",
    f"""WITH {_X03_PAIRS_CTE},
       sp AS (
         SELECT id_a, id_b,
                CASE WHEN substr(md5(concat(CAST(id_a AS VARCHAR),
                       ':split')), 1, 4) < '{sampling._threshold_hex(0.25)}'
                     THEN 'test' ELSE 'train' END AS sa,
                CASE WHEN substr(md5(concat(CAST(id_b AS VARCHAR),
                       ':split')), 1, 4) < '{sampling._threshold_hex(0.25)}'
                     THEN 'test' ELSE 'train' END AS sb
         FROM pairs
       ), cls AS (
         SELECT CASE WHEN sa = sb THEN concat(sa, '-', sa)
                     ELSE 'cross' END AS pair_class, id_a, id_b
         FROM sp
       ), np AS (
         SELECT pair_class, CAST(count(*) AS BIGINT) AS n_pairs
         FROM cls GROUP BY 1
       ), docs AS (
         SELECT pair_class, id_a AS d FROM cls
         UNION ALL SELECT pair_class, id_b FROM cls
       ), nd AS (
         SELECT pair_class, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
         FROM docs GROUP BY 1
       )
       SELECT pair_class, n_pairs, n_docs
       FROM np JOIN nd USING (pair_class) ORDER BY pair_class""",
    doc="train/test split LEAKAGE audit: near-dup pairs (x03's shared "
        "shingle-blocked Jaccard stage, threshold 0.5) classified by "
        "which side of x18's deterministic hash split each member lands "
        "on -- a 'cross' pair is an eval document whose near-duplicate "
        "is in train, the contamination mode x34 cannot see because "
        "both sides live in the SAME corpus. Split assignment is a "
        "row-local md5 expression (pure function of doc_id, no join "
        "back to the corpus); the expensive pair stage is shared with "
        "x03/x24/x44/x68/x70 via the session cache, so the audit rides "
        "an already-derived pairs table at near-zero marginal cost; "
        "class rollups are 3-row aggregates",
)
def x146_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _shared_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    sp = sampling.deterministic_split(pairs, "id_a", 0.25, out="sa")
    sp = sampling.deterministic_split(sp, "id_b", 0.25, out="sb")
    cls = sp.withColumn(
        "pair_class",
        F.when(
            F.col("sa") == F.col("sb"), F.concat_ws("-", "sa", "sa")
        ).otherwise(F.lit("cross")),
    )
    np = cls.groupBy("pair_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    docs = cls.select("pair_class", F.col("id_a").alias("d")).union(
        cls.select("pair_class", F.col("id_b").alias("d"))
    )
    nd = docs.groupBy("pair_class").agg(
        F.countDistinct("d").cast("long").alias("n_docs")
    )
    return np.join(nd, "pair_class").orderBy("pair_class")


@register(
    "x147_corr_matrix",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
              ROUND(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
              ROUND(corr(l_quantity, l_tax), 6) AS corr_qty_tax,
              ROUND(corr(l_extendedprice, l_discount), 6) AS corr_price_disc,
              ROUND(corr(l_extendedprice, l_tax), 6) AS corr_price_tax,
              ROUND(corr(l_discount, l_tax), 6) AS corr_disc_tax
       FROM lineitem""",
    doc="pairwise Pearson correlation of the four lineitem measures in "
        "ONE aggregate pass: corr is algebraic (co-moments merge "
        "associatively), so all six pairs compute map-side partials in "
        "a single scan with one 1-row reduce -- the feature-redundancy "
        "screen a training pipeline runs before fitting anything, and "
        "at 100 TB it costs exactly one read of the two columns per "
        "pair (column pruning keeps the scan at 4 columns). Round-6 "
        "absorbs partial-merge-order jitter in the co-moment low bits",
)
def x147_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice", "corr_qty_price"),
        ("l_quantity", "l_discount", "corr_qty_disc"),
        ("l_quantity", "l_tax", "corr_qty_tax"),
        ("l_extendedprice", "l_discount", "corr_price_disc"),
        ("l_extendedprice", "l_tax", "corr_price_tax"),
        ("l_discount", "l_tax", "corr_disc_tax"),
    ]
    return li.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[F.round(F.corr(a, b), 6).alias(n) for a, b, n in pairs],
    )


@register(
    "x148_chi2_independence",
    """WITH cells AS (
         SELECT o_orderpriority AS pr, o_orderstatus AS st,
                CAST(count(*) AS BIGINT) AS cnt
         FROM orders GROUP BY 1, 2
       ), rt AS (SELECT pr, SUM(cnt) AS rt FROM cells GROUP BY pr),
       ct AS (SELECT st, SUM(cnt) AS ct FROM cells GROUP BY st),
       nn AS (SELECT SUM(cnt) AS n,
                     count(DISTINCT pr) AS npr,
                     count(DISTINCT st) AS nst
              FROM cells),
       j AS (
         SELECT c.cnt,
                CAST(r.rt AS DOUBLE) * CAST(t.ct AS DOUBLE) /
                    CAST(nn.n AS DOUBLE) AS exp
         FROM cells c
         JOIN rt r ON c.pr = r.pr
         JOIN ct t ON c.st = t.st
         CROSS JOIN nn
       )
       SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n,
              CAST((SELECT (npr - 1) * (nst - 1) FROM nn) AS BIGINT)
                  AS dof,
              CAST(count(*) AS BIGINT) AS n_cells,
              ROUND(CAST(SUM(CAST(ROUND(
                    (cnt - exp) * (cnt - exp) / exp, 6)
                  AS DECIMAL(28,6))) AS DOUBLE), 4) AS chi2
       FROM j""",
    doc="chi-square independence test of order priority x status from "
        "one contingency pass: a single groupBy(priority, status) "
        "reduces the corpus to category-cardinality cells; marginals, "
        "expected counts, and the statistic are all arithmetic over "
        "that tiny table (broadcast joins, 1-row total). Per-cell "
        "contributions are identical doubles cross-engine (exact int "
        "counts through correctly-rounded * and /), round-6 "
        "DECIMAL-summed so the 15-cell reduction order cannot move "
        "the result (x88 recipe) -- the drift/independence screen for "
        "categorical metadata at corpus scale",
)
def x148_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("pr"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cells = cells.localCheckpoint(eager=False)  # category-cardinality
    rt = cells.groupBy("pr").agg(F.sum("cnt").alias("rt"))
    ct = cells.groupBy("st").agg(F.sum("cnt").alias("ct"))
    nn = cells.agg(
        F.sum("cnt").alias("n"),
        F.countDistinct("pr").alias("npr"),
        F.countDistinct("st").alias("nst"),
    )
    exp = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("n").cast("double")
    )
    contrib = F.round(
        (F.col("cnt") - F.col("exp"))
        * (F.col("cnt") - F.col("exp"))
        / F.col("exp"),
        6,
    ).cast("decimal(28,6)")
    j = (
        cells.join(F.broadcast(rt), "pr")
        .join(F.broadcast(ct), "st")
        .crossJoin(F.broadcast(nn))
        .withColumn("exp", exp)
    )
    return j.agg(
        F.first("n").cast("long").alias("n"),
        ((F.first("npr") - 1) * (F.first("nst") - 1))
        .cast("long")
        .alias("dof"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(F.sum(contrib).cast("double"), 4).alias("chi2"),
    )


@register(
    "x149_interval_islands",
    """WITH iv AS (
         SELECT l.l_suppkey AS sk, l.l_orderkey AS ok,
                l.l_linenumber AS ln,
                least(CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS s,
                greatest(CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS e
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       ), m AS (
         SELECT sk, ok, ln, s, e,
                MAX(e) OVER (PARTITION BY sk ORDER BY s, e, ok, ln
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
         FROM iv
       ), isl AS (
         SELECT sk, s, e,
                SUM(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
                  OVER (PARTITION BY sk ORDER BY s, e, ok, ln
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS island
         FROM m
       ), g AS (
         SELECT sk, island, MIN(s) AS is_, MAX(e) AS ie_,
                count(*) AS n_iv
         FROM isl GROUP BY 1, 2
       )
       SELECT CAST(sk AS BIGINT) AS suppkey,
              CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
              CAST(count(*) AS BIGINT) AS n_islands,
              CAST(SUM(date_diff('day', is_, ie_) + 1) AS BIGINT)
                  AS covered_days
       FROM g GROUP BY sk ORDER BY suppkey LIMIT 200""",
    doc="gaps-and-islands: per supplier, order-to-ship activity "
        "intervals merged into maximal overlapping runs (break when an "
        "interval starts after the running MAX(end) of everything "
        "before it), reporting islands and total covered days -- the "
        "busy-period/utilization shape behind SLA and capacity audits, "
        "and the interval-union primitive x113's SCD2 intervals don't "
        "cover. One shuffle on the entity key; cumulative-max and "
        "island-id windows run per supplier IN PARALLEL (no global "
        "sort, no SinglePartition); the window order key includes "
        "(orderkey, linenumber) so tie order -- and with it the "
        "running max -- is bit-identical cross-engine. Intervals are "
        "least/greatest-normalized: ~47%% of synthetic shipdates "
        "precede their order date",
)
def x149_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("sk"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_shipdate").cast("date").alias("sd"),
        "l_orderkey",
    )
    iv = li.join(orders, li.ok == orders.o_orderkey).select(
        "sk",
        "ok",
        "ln",
        F.least("od", "sd").alias("s"),
        F.greatest("od", "sd").alias("e"),
    )
    order_keys = [F.col(c) for c in ("s", "e", "ok", "ln")]
    wprev = (
        Window.partitionBy("sk")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcum = (
        Window.partitionBy("sk")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = iv.withColumn("pe", F.max("e").over(wprev))
    isl = m.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("pe").isNull() | (F.col("s") > F.col("pe")), 1
            ).otherwise(0)
        ).over(wcum),
    )
    g = isl.groupBy("sk", "island").agg(
        F.min("s").alias("is_"),
        F.max("e").alias("ie_"),
        F.count(F.lit(1)).alias("n_iv"),
    )
    return (
        g.groupBy("sk")
        .agg(
            F.sum("n_iv").cast("long").alias("n_intervals"),
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.sum(F.datediff("ie_", "is_") + 1)
            .cast("long")
            .alias("covered_days"),
        )
        .select(
            F.col("sk").cast("long").alias("suppkey"),
            "n_intervals",
            "n_islands",
            "covered_days",
        )
        .orderBy("suppkey")
        .limit(200)
    )


@register(
    "x150_bfs_reach",
    graph.bfs_copurchase_sql(3),
    doc="3-hop breadth-first reachability from the minimum-id node of "
        "the co-purchase graph: per-level first-reached node counts -- "
        "the other canonical Pregel workload next to x104's PageRank "
        "(reachability/components flavor instead of value "
        "propagation). Per hop ONE edge-sized equi-join + distinct + "
        "anti-join vs the visited set; the frontier is never "
        "collected; level counts are 1-row aggregates unioned, so the "
        "result is 4 rows at any graph size. Reuses x104's amortized "
        "bucketed edge table when the bench has persisted it. Oracle "
        "replays the loop as chained NOT-IN CTEs (ops/graph.py "
        "bfs_copurchase_sql)",
)
def x150_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = graph.copurchase_edge_table_name(sf_dir)
    if spark.catalog.tableExists(tbl):
        edges = spark.table(tbl)
    else:
        li = load_table(spark, sf_dir, "lineitem")
        edges = graph.symmetric_copurchase_edges(li)
    return graph.bfs_levels(edges, hops=3)


@register(
    "x151_rolling_revenue",
    """WITH d AS (
         SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS n_orders,
                SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS rev
         FROM orders GROUP BY 1
       )
       SELECT day, n_orders,
              ROUND(CAST(rev AS DOUBLE), 2) AS rev,
              ROUND(CAST(SUM(rev) OVER (
                  ORDER BY date_diff('day', DATE '1992-01-01', day)
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS DOUBLE), 2) AS rev_7d,
              CAST(count(*) OVER (
                  ORDER BY date_diff('day', DATE '1992-01-01', day)
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_days_7d
       FROM d ORDER BY day""",
    doc="7-day trailing revenue via a RANGE-frame window on an integer "
        "day index -- RANGE (value-based, gap-aware: a missing calendar "
        "day shrinks the window) vs the ROWS frames used everywhere "
        "else; completes the window-frame surface next to x81's lag "
        "and x74's rolling distinct. The corpus-sized pass is the "
        "day groupBy (map-side partial agg); the global-ordered window "
        "then runs over CALENDAR-cardinality rows (~2.4k days at "
        "sf0.1, ~36k for a century) -- a deliberate, documented "
        "SinglePartition over bounded data, the same contract as "
        "x81/x77. DECIMAL-exact daily sums; doubles only at the "
        "rounded edge",
)
def x151_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    d = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias(
                "drev"
            ),
        )
        .withColumn(
            "dayi", F.datediff("day", F.lit("1992-01-01").cast("date"))
        )
    )
    w = Window.orderBy("dayi").rangeBetween(-6, 0)
    return (
        d.select(
            "day",
            "n_orders",
            F.round(F.col("drev").cast("double"), 2).alias("rev"),
            F.round(F.sum("drev").over(w).cast("double"), 2).alias(
                "rev_7d"
            ),
            F.count(F.lit(1)).over(w).cast("long").alias("n_days_7d"),
        )
        .orderBy("day")
    )


@register(
    "x152_weighted_topk_sample",
    """WITH h AS (
         SELECT doc_id, n_chars,
                CAST(('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR),
                      ':es')), 1, 8)) AS BIGINT) AS v
         FROM documents WHERE n_chars >= 1
       )
       SELECT doc_id, n_chars,
              ROUND(-ln((v + 1) / 4294967297.0) /
                    CAST(n_chars AS DOUBLE), 12) AS es_key
       FROM h ORDER BY es_key, doc_id LIMIT 100""",
    doc="weighted sampling WITHOUT replacement (Efraimidis-Spirakis "
        "exponential keys): es_key = -ln(u)/w with u hash-derived from "
        "md5(doc_id), w = n_chars; the k smallest keys are an exact "
        "weight-proportional-without-replacement draw. Distinct from "
        "x36's Bernoulli thresholding (with-replacement semantics, "
        "approximate total) -- this yields an EXACT sample size, the "
        "contract batch construction needs. Key assignment is a "
        "row-local expression (no RNG state, stable under retry/"
        "rescale); selection plans as TakeOrderedAndProject (per-"
        "partition top-k, k-sized merge -- no global sort shuffle). "
        "u=(v+1)/2^32+1 lands in (0,1] so ln is total; round-12 keys "
        "+ doc_id tiebreak absorb last-ulp ln() divergence",
)
def x152_weighted_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= 1
    )
    v = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col("doc_id").cast("string"), F.lit(":es"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (v + F.lit(1)) / F.lit(4294967297.0)
    key = F.round(-F.log(u) / F.col("n_chars").cast("double"), 12)
    return (
        docs.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy("es_key", "doc_id")
        .limit(100)
    )


@register(
    "x153_quantile_normalize",
    """WITH r AS (
         SELECT o_orderkey, o_totalprice,
                CAST(row_number() OVER (
                  ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn
         FROM orders
       ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
       SELECT o_orderkey,
              ROUND(o_totalprice, 2) AS o_totalprice,
              rn,
              ROUND(CAST(rn AS DOUBLE) / (SELECT n FROM nn), 6) AS pct,
              CAST(least(CAST(floor(ROUND(CAST(rn AS DOUBLE) /
                    (SELECT n FROM nn), 6) * 10) AS BIGINT), 9)
                AS BIGINT) AS decile
       FROM r WHERE rn % 97 = 0 ORDER BY rn""",
    doc="quantile normalization: map every order price to its exact "
        "global percentile (and decile bucket) WITHOUT a global sort -- "
        "the rank comes from scale.global_row_number (per-range-"
        "partition counts fold into broadcast offsets; no Exchange "
        "SinglePartition), where the textbook PERCENT_RANK()/NTILE() "
        "window funnels the corpus through one task. The percentile "
        "map feeds rank-based feature scaling and equal-frequency "
        "binning at 100 TB; (price, orderkey) is a total order so "
        "ties are bit-identical cross-engine. Output is the "
        "deterministic rn%97 systematic sample of the full mapping "
        "(covers the whole range, keeps the artifact bounded); "
        "plan-gated alongside x90 (no SinglePartition rank)",
)
def x153_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import scale

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    n1 = orders.agg(F.count(F.lit(1)).cast("long").alias("n"))
    r = scale.global_row_number(
        orders,
        [F.col("o_totalprice"), F.col("o_orderkey")],
        out_col="rn",
    )
    pct = F.round(F.col("rn").cast("double") / F.col("n"), 6)
    return (
        r.filter(F.col("rn") % 97 == 0)
        .crossJoin(F.broadcast(n1))
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rn").cast("long").alias("rn"),
            pct.alias("pct"),
            F.least(F.floor(pct * 10).cast("long"), F.lit(9).cast("long"))
            .cast("long")
            .alias("decile"),
        )
        .orderBy("rn")
    )


@register(
    "x154_mutual_info",
    """WITH cells AS (
         SELECT o_orderpriority AS pr, o_orderstatus AS st,
                CAST(count(*) AS BIGINT) AS cnt
         FROM orders GROUP BY 1, 2
       ), rt AS (SELECT pr, SUM(cnt) AS rt FROM cells GROUP BY pr),
       ct AS (SELECT st, SUM(cnt) AS ct FROM cells GROUP BY st),
       nn AS (SELECT SUM(cnt) AS n FROM cells),
       mi AS (
         SELECT ROUND(CAST(SUM(CAST(ROUND(
                  (CAST(c.cnt AS DOUBLE) / CAST(nn.n AS DOUBLE)) *
                  ln((CAST(c.cnt AS DOUBLE) / CAST(nn.n AS DOUBLE)) /
                     ((CAST(r.rt AS DOUBLE) / CAST(nn.n AS DOUBLE)) *
                      (CAST(t.ct AS DOUBLE) / CAST(nn.n AS DOUBLE)))), 6)
                AS DECIMAL(28,6))) AS DOUBLE), 4) AS mi
         FROM cells c
         JOIN rt r ON c.pr = r.pr
         JOIN ct t ON c.st = t.st
         CROSS JOIN nn
       ), hp AS (
         SELECT ROUND(CAST(SUM(CAST(ROUND(
                  -(CAST(rt AS DOUBLE) / CAST(nn.n AS DOUBLE)) *
                  ln(CAST(rt AS DOUBLE) / CAST(nn.n AS DOUBLE)), 6)
                AS DECIMAL(28,6))) AS DOUBLE), 4) AS h_priority
         FROM rt CROSS JOIN nn
       ), hs AS (
         SELECT ROUND(CAST(SUM(CAST(ROUND(
                  -(CAST(ct AS DOUBLE) / CAST(nn.n AS DOUBLE)) *
                  ln(CAST(ct AS DOUBLE) / CAST(nn.n AS DOUBLE)), 6)
                AS DECIMAL(28,6))) AS DOUBLE), 4) AS h_status
         FROM ct CROSS JOIN nn
       )
       SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n,
              mi.mi, hp.h_priority, hs.h_status,
              ROUND(mi.mi / sqrt(hp.h_priority * hs.h_status), 4) AS nmi
       FROM mi, hp, hs""",
    doc="mutual information between order priority and status (plus "
        "marginal entropies and sqrt-normalized NMI): the feature-"
        "dependence screen that catches NONLINEAR association x147's "
        "Pearson corr misses and x148's chi2 only thresholds. Same "
        "contingency shape as x148: ONE groupBy reduces the corpus to "
        "category-cardinality cells; every term is arithmetic over that "
        "tiny table (broadcast joins, 1-row total); ln() over identical "
        "doubles, each term round-6 DECIMAL-summed (x88 recipe), so "
        "cell order cannot move the result",
)
def x154_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cells = (
        orders.groupBy(
            F.col("o_orderpriority").alias("pr"),
            F.col("o_orderstatus").alias("st"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    rt = cells.groupBy("pr").agg(F.sum("cnt").alias("rt"))
    ct = cells.groupBy("st").agg(F.sum("cnt").alias("ct"))
    nn = cells.agg(F.sum("cnt").alias("n"))

    def _p(col):
        return F.col(col).cast("double") / F.col("n").cast("double")

    mi_term = F.round(
        _p("cnt") * F.log(_p("cnt") / (_p("rt") * _p("ct"))), 6
    ).cast("decimal(28,6)")
    mi = (
        cells.join(F.broadcast(rt), "pr")
        .join(F.broadcast(ct), "st")
        .crossJoin(F.broadcast(nn))
        .agg(F.round(F.sum(mi_term).cast("double"), 4).alias("mi"))
    )
    hp = (
        rt.crossJoin(F.broadcast(nn))
        .agg(
            F.round(
                F.sum(
                    F.round(-_p("rt") * F.log(_p("rt")), 6).cast(
                        "decimal(28,6)"
                    )
                ).cast("double"),
                4,
            ).alias("h_priority")
        )
    )
    hs = (
        ct.crossJoin(F.broadcast(nn))
        .agg(
            F.round(
                F.sum(
                    F.round(-_p("ct") * F.log(_p("ct")), 6).cast(
                        "decimal(28,6)"
                    )
                ).cast("double"),
                4,
            ).alias("h_status")
        )
    )
    nsel = nn.select(F.col("n").cast("long").alias("n"))
    return (
        nsel.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hp))
        .crossJoin(F.broadcast(hs))
        .select(
            "n",
            "mi",
            "h_priority",
            "h_status",
            F.round(
                F.col("mi")
                / F.sqrt(F.col("h_priority") * F.col("h_status")),
                4,
            ).alias("nmi"),
        )
    )


@register(
    "x155_date_spine_fill",
    """WITH d AS (
         SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS n_orders,
                SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS rev
         FROM orders GROUP BY 1
       ), mn AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
       spine AS (
         SELECT CAST(unnest(generate_series(lo, hi,
                  INTERVAL 1 DAY)) AS DATE) AS day
         FROM mn
       )
       SELECT s.day,
              COALESCE(d.n_orders, 0) AS n_orders,
              ROUND(CAST(COALESCE(d.rev, 0) AS DOUBLE), 2) AS rev,
              CAST(CASE WHEN d.day IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_gap
       FROM spine s LEFT JOIN d ON s.day = d.day ORDER BY s.day""",
    doc="calendar gap-filling: a generated date spine (sequence from "
        "the corpus min to max day, exploded from a 1-row aggregate) "
        "LEFT-joins the daily revenue rollup, zero-filling missing "
        "days and flagging them -- the time-series regularization step "
        "x151's gap-AWARE window deliberately skips, and the "
        "prerequisite for any fixed-length model input. The corpus-"
        "sized pass is the day groupBy; spine generation and the fill "
        "join are calendar-cardinality (the spine explode never "
        "touches data). DECIMAL-exact daily sums",
)
def x155_date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("rev"),
    )
    spine = (
        d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    return (
        spine.join(d.withColumnRenamed("day", "dday"),
                   spine.day == F.col("dday"), "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).cast("long").alias(
                "n_orders"
            ),
            F.round(
                F.coalesce(
                    F.col("rev"), F.lit(0).cast("decimal(30,2)")
                ).cast("double"),
                2,
            ).alias("rev"),
            F.when(F.col("dday").isNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_gap"),
        )
        .orderBy("day")
    )


@register(
    "x156_partition_manifest",
    """SELECT CAST(ts AS DATE) AS event_date,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(MIN(event_id) AS BIGINT) AS min_id,
              CAST(MAX(event_id) AS BIGINT) AS max_id,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM events GROUP BY 1 ORDER BY event_date""",
    doc="data-layout round-trip through the correctness gate (x114's "
        "contract, for the hive-partitioned leg): events are written "
        "as a date-partitioned parquet tree (pipeline/layout.py "
        "write_partitioned -- one shuffle on the partition key bounds "
        "the file count; sortWithinPartitions gives tight row-group "
        "stats), read back through partition discovery, and rolled up "
        "BY THE PARTITION COLUMN; hash-matching the direct per-day SQL "
        "proves the layout write/read leg is lossless and the "
        "partition column round-trips with DATE type intact. At 100 TB "
        "this manifest (rows + key ranges per partition) is what "
        "drives partition pruning and incremental-load bookkeeping",
)
def x156_partition_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..pipeline.layout import write_partitioned

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    tmp = tempfile.mkdtemp(prefix="x156_layout_")
    try:
        write_partitioned(
            ev, tmp, ["event_date"], sort_cols=["event_id"]
        )
        back = spark.read.parquet(tmp)
        out = (
            back.groupBy("event_date")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.min("event_id").cast("long").alias("min_id"),
                F.max("event_id").cast("long").alias("max_id"),
                F.countDistinct("user_id").cast("long").alias("n_users"),
            )
            .orderBy("event_date")
            .localCheckpoint()  # materialize before the tree disappears
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@register(
    "x157_user_history",
    """WITH e AS (
         SELECT user_id, ts, event_id, event_type FROM events
       ), s AS (
         SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_events,
                string_agg(event_type, '>' ORDER BY ts, event_id)
                    AS history
         FROM e GROUP BY user_id
       )
       SELECT user_id, n_events,
              CASE WHEN length(history) > 200
                   THEN substr(history, 1, 200) ELSE history
              END AS history_prefix,
              md5(history) AS history_hash
       FROM s ORDER BY user_id""",
    doc="per-user event-history serialization: each user's full event "
        "sequence in (ts, event_id) order collapsed to one delimited "
        "string -- the session/history flattening step that turns an "
        "event log into sequence-model training rows (next-event "
        "prediction, behavioral embeddings). Declarative secondary "
        "sort: ONE shuffle on user_id, the order imposed by "
        "array_sort over (ts, event_id, type) structs INSIDE the "
        "aggregate -- no repartitionAndSortWithinPartitions RDD "
        "detour, no per-group Python. The unique event_id tiebreak "
        "makes the serialization bit-identical cross-engine; the "
        "md5 proves full-sequence equality while the stored prefix "
        "stays bounded",
)
def x157_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hist = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("ts", "event_id", "event_type")
                )
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            hist.alias("history"),
        )
        .select(
            "user_id",
            "n_events",
            F.when(
                F.length("history") > 200,
                F.substring("history", 1, 200),
            )
            .otherwise(F.col("history"))
            .alias("history_prefix"),
            F.md5("history").alias("history_hash"),
        )
        .orderBy("user_id")
    )


@register(
    "x158_order_reconciliation",
    """WITH li AS (
         SELECT l_orderkey,
                CAST(count(*) AS BIGINT) AS n_lines,
                SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4)
                    AS DECIMAL(28,4))) AS li_total
         FROM lineitem GROUP BY 1
       ), j AS (
         SELECT o.o_orderkey,
                CAST(o.o_totalprice AS DECIMAL(28,4)) AS o_total,
                li.n_lines, li.li_total
         FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
       ), c AS (
         SELECT CASE
                  WHEN n_lines IS NULL THEN 'no_lineitems'
                  WHEN li_total = o_total THEN 'exact'
                  WHEN abs(CAST(li_total - o_total AS DOUBLE)) /
                       CAST(o_total AS DOUBLE) <= 0.01
                    THEN 'within_1pct'
                  ELSE 'mismatch'
                END AS bucket,
                o_total, li_total
         FROM j
       )
       SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
              ROUND(CAST(SUM(o_total) AS DOUBLE), 2) AS header_total,
              ROUND(CAST(SUM(COALESCE(li_total, 0)) AS DOUBLE), 2)
                  AS detail_total
       FROM c GROUP BY bucket ORDER BY bucket""",
    doc="cross-table reconciliation (the financial-close DQ audit): "
        "order-header totals vs the SUM of their line items, bucketed "
        "exact / within-1%% / mismatch / no-lineitems, with DECIMAL-"
        "exact totals per bucket. The canonical fact-vs-rollup "
        "consistency check a warehouse runs after every load. One "
        "orderkey groupBy + one co-partitionable orderkey equi-join "
        "(both sides shuffle on the same key -- bucketed tables would "
        "make it exchange-free); per-row arithmetic is round-4 "
        "DECIMAL (x45's recipe), relative-diff comparison in double "
        "on identical inputs",
)
def x158_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount")),
                    4,
                ).cast("decimal(28,4)")
            ).alias("li_total"),
        )
    )
    j = orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(28,4)").alias("o_total"),
    ).join(li, orders.o_orderkey == li.l_orderkey, "left")
    bucket = (
        F.when(F.col("n_lines").isNull(), "no_lineitems")
        .when(F.col("li_total") == F.col("o_total"), "exact")
        .when(
            F.abs(
                (F.col("li_total") - F.col("o_total")).cast("double")
            )
            / F.col("o_total").cast("double")
            <= 0.01,
            "within_1pct",
        )
        .otherwise("mismatch")
    )
    return (
        j.select(bucket.alias("bucket"), "o_total", "li_total")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_total").cast("double"), 2).alias(
                "header_total"
            ),
            F.round(
                F.sum(
                    F.coalesce(
                        F.col("li_total"),
                        F.lit(0).cast("decimal(28,4)"),
                    )
                ).cast("double"),
                2,
            ).alias("detail_total"),
        )
        .orderBy("bucket")
    )


@register(
    "x159_histogram_2d",
    """SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bin,
              CAST(floor(l_discount / 0.02) AS BIGINT) AS disc_bin,
              CAST(count(*) AS BIGINT) AS n,
              ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2)))
                    AS DOUBLE), 2) AS revenue
       FROM lineitem
       GROUP BY 1, 2 ORDER BY qty_bin, disc_bin""",
    doc="2-D equi-width histogram (quantity x discount heatmap with a "
        "revenue measure): the joint-distribution readout behind drift "
        "monitors and pricing heatmaps, and the binned pre-aggregation "
        "that lets a dashboard query bins instead of rows. ONE "
        "partial-aggregating groupBy on row-local bin expressions -- "
        "bin-cardinality output regardless of corpus size; bin edges "
        "are exact (divide by 10 / 0.02 on identical doubles, floor is "
        "total) so assignment is bit-identical cross-engine",
)
def x159_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_quantity") / 10)
            .cast("long")
            .alias("qty_bin"),
            F.floor(F.col("l_discount") / 0.02)
            .cast("long")
            .alias("disc_bin"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(30,2)")
                ).cast("double"),
                2,
            ).alias("revenue"),
        )
        .orderBy("qty_bin", "disc_bin")
    )


@register(
    "x160_csv_roundtrip_dedup",
    """SELECT md5(lower(text)) AS h, MIN(doc_id) AS keep_id,
              count(*) AS dup_cnt
       FROM documents GROUP BY md5(lower(text)) ORDER BY h""",
    doc="format-abstraction contract for the CSV leg (x114's JSONL "
        "twin): export the corpus as headered CSV shards (Spark csv "
        "sink -- quoting/escaping is where CSV round-trips silently "
        "corrupt text columns), read them back with the ORIGINAL "
        "schema, and run x01's exact dedup on the round-tripped "
        "corpus; hash-matching the parquet-sourced oracle proves the "
        "quote/escape cycle is byte-lossless THROUGH the correctness "
        "gate. Shards write/read in parallel (csv sink, no collect)",
)
def x160_csv_roundtrip_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="x160_csv_")
    try:
        (
            docs.write.mode("overwrite")
            .option("header", True)
            .option("quoteAll", True)
            .csv(tmp)
        )
        back = (
            spark.read.schema(docs.schema)
            .option("header", True)
            .csv(tmp)
        )
        out = dedup.exact_dedup(back, "doc_id", "text").orderBy("h")
        out = out.localCheckpoint()  # materialize before tmp vanishes
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@register(
    "x161_interevent_gaps",
    """WITH g AS (
         -- integer MICROsecond difference, floored to whole seconds:
         -- truncating each endpoint to seconds first (unix_timestamp
         -- semantics) bins sub-second-straddling gaps differently
         SELECT event_type,
                CAST(FLOOR((epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id))
                      / 1000000.0) AS BIGINT) AS gap_s
         FROM events
       ), b AS (
         SELECT event_type,
                CAST(length(bin(CAST(gap_s + 1 AS BIGINT))) - 1
                  AS BIGINT) AS gap_bin
         FROM g WHERE gap_s IS NOT NULL
       )
       SELECT event_type, gap_bin, CAST(count(*) AS BIGINT) AS n
       FROM b GROUP BY 1, 2 ORDER BY event_type, gap_bin""",
    doc="inter-event gap distribution (burstiness profile): per user, "
        "the seconds between consecutive events (lag over the user "
        "timeline), log2-bucketed per event type -- the signal behind "
        "bot detection, session-gap calibration (x21's 30-min cutoff "
        "is READ OFF this histogram), and arrival-process modeling. "
        "One user-key shuffle; lag windows run per user in parallel; "
        "output is type x bucket cardinality. Integer epoch seconds "
        "make the bins exact; (ts, event_id) tiebreak pins duplicate "
        "timestamps cross-engine",
)
def x161_interevent_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = F.floor(
        (us - F.lag(us).over(w)) / F.lit(1000000.0)
    ).cast("long")
    return (
        ev.select("event_type", gap.alias("gap_s"))
        .filter(F.col("gap_s").isNotNull())
        .select(
            "event_type",
            # floor(log2(n)) as an exact INTEGER op: binary-digit
            # count minus 1 -- ln(x)/ln(2) floors wrong by 1 ulp at
            # power-of-2 boundaries depending on the engine's libm
            (
                F.length(F.bin((F.col("gap_s") + 1).cast("long"))) - 1
            )
            .cast("long")
            .alias("gap_bin"),
        )
        .groupBy("event_type", "gap_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("event_type", "gap_bin")
    )


@register(
    "x162_cumulative_reach",
    """WITH f AS (
         SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
         FROM events GROUP BY user_id
       ), d AS (
         SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new_users
         FROM f GROUP BY first_day
       )
       SELECT day, n_new_users,
              CAST(SUM(n_new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
       FROM d ORDER BY day""",
    doc="cumulative user reach (growth curve): first-seen day per user "
        "(one user-key groupBy), daily new-user counts, running total "
        "-- the acquisition metric next to x74's WINDOWED active users "
        "(reach never resets; WAU does). Two partial-aggregating "
        "groupBys reduce the corpus to day-cardinality before the "
        "running sum, which is a documented bounded SinglePartition "
        "over calendar-sized rows (x81/x151's contract); exact "
        "integers end to end",
)
def x162_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    d = f.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.select(
            "day",
            "n_new_users",
            F.sum("n_new_users").over(w).cast("long").alias("cum_users"),
        )
        .orderBy("day")
    )


@register(
    "x163_feature_hashing",
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
         FROM documents
       ), h AS (
         SELECT doc_id,
                CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT) % 64
                    AS idx
         FROM tok WHERE length(t) > 0
       ), c AS (
         SELECT doc_id, idx, CAST(count(*) AS BIGINT) AS cnt
         FROM h GROUP BY 1, 2
       )
       SELECT doc_id,
              CAST(count(*) AS BIGINT) AS nnz,
              CAST(SUM(cnt) AS BIGINT) AS l1,
              md5(string_agg(idx || ':' || cnt, ',' ORDER BY idx))
                  AS feat_hash
       FROM c GROUP BY doc_id ORDER BY doc_id""",
    doc="hashing-trick featurization (the fixed-width sparse vector "
        "every linear/DNN text baseline trains on): tokens hash into "
        "64 buckets via md5 (cross-engine -- Spark's hash() is Murmur3 "
        "and DuckDB's is not, so md5 is the portable bucket map), "
        "per-doc bucket counts serialize to a canonical 'idx:cnt' "
        "string whose md5 proves the full vector equal while the "
        "output row stays 4 columns. Two partial-aggregating groupBys "
        "(doc x bucket, then doc); no vocabulary build, no broadcast "
        "-- the property that makes feature hashing work at 100 TB",
)
def x163_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("t"),
    ).filter(F.length("t") > 0)
    idx = F.pmod(
        F.conv(F.substring(F.md5("t"), 1, 4), 16, 10).cast("long"),
        F.lit(64),
    )
    c = tok.select("doc_id", idx.alias("idx")).groupBy(
        "doc_id", "idx"
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    feat = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "cnt"))),
                lambda s: F.concat_ws(":", s["idx"], s["cnt"]),
            ),
            ",",
        )
    )
    return (
        c.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nnz"),
            F.sum("cnt").cast("long").alias("l1"),
            feat.alias("feat_hash"),
        )
        .orderBy("doc_id")
    )


@register(
    "x164_split_balance",
    f"""WITH s AS (
         SELECT doc_id, lang, n_chars,
                CASE WHEN substr(md5(concat(CAST(doc_id AS VARCHAR),
                       ':split')), 1, 4) < '{sampling._threshold_hex(0.25)}'
                     THEN 'test' ELSE 'train' END AS split
         FROM documents
       )
       SELECT split, lang,
              CAST(count(*) AS BIGINT) AS n_docs,
              ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(28,0))) AS DOUBLE)
                    / count(*), 2) AS avg_chars
       FROM s GROUP BY 1, 2 ORDER BY split, lang""",
    doc="split balance audit (the A/A test run before trusting any "
        "eval number): per split x language, document counts and mean "
        "length -- a hash split that skews on a covariate invalidates "
        "the holdout, and this is how it is caught. Split assignment "
        "is x18's row-local md5 expression; ONE partial-aggregating "
        "groupBy; the mean divides a DECIMAL-exact sum by an exact "
        "count in double (identical inputs -> identical rounding)",
)
def x164_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = sampling.deterministic_split(docs, "doc_id", 0.25, out="split")
    return (
        s.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("n_chars").cast("decimal(28,0)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                2,
            ).alias("avg_chars"),
        )
        .orderBy("split", "lang")
    )


@register(
    "x165_audience_overlap",
    """WITH u AS (
         SELECT user_id, list_sort(list_distinct(list(event_type)))
                    AS types
         FROM events GROUP BY user_id
       ), pairs AS (
         SELECT a.x AS type_a, b.x AS type_b, count(*) AS both_users
         FROM u,
              unnest(types) a(x),
              unnest(types) b(x)
         WHERE a.x < b.x
         GROUP BY 1, 2
       ), per AS (
         SELECT x AS t, count(*) AS n_users
         FROM u, unnest(types) t(x) GROUP BY 1
       )
       SELECT p.type_a, p.type_b,
              CAST(p.both_users AS BIGINT) AS both_users,
              CAST(pa.n_users AS BIGINT) AS n_a,
              CAST(pb.n_users AS BIGINT) AS n_b,
              ROUND(CAST(p.both_users AS DOUBLE) /
                    (pa.n_users + pb.n_users - p.both_users), 4)
                  AS jaccard
       FROM pairs p
       JOIN per pa ON pa.t = p.type_a
       JOIN per pb ON pb.t = p.type_b
       ORDER BY type_a, type_b""",
    doc="audience-overlap matrix: for every event-type pair, how many "
        "users do both, plus per-type reach and audience Jaccard -- "
        "the segment-overlap readout behind campaign dedup and "
        "cross-feature cannibalization checks. x102's in-bucket "
        "pattern one level up: ONE user-key groupBy collapses each "
        "user to a distinct type set, pairs expand INSIDE the "
        "(type-cardinality) array, and every downstream row is "
        "type-pair-sized -- the user cross product never exists. "
        "Per-type reach folds from the same sets; broadcast joins "
        "stitch the tiny tables",
)
def x165_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    ts = F.col("types")
    pairs = (
        u.select(
            F.explode(
                F.flatten(
                    F.transform(
                        ts,
                        lambda x, i: F.transform(
                            F.slice(ts, i + F.lit(2), F.size(ts)),
                            lambda y: F.struct(
                                x.alias("type_a"), y.alias("type_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.*")
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("both_users"))
    )
    per = (
        u.select(F.explode("types").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    pa = per.select(
        F.col("t").alias("type_a"), F.col("n_users").alias("n_a")
    )
    pb = per.select(
        F.col("t").alias("type_b"), F.col("n_users").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .select(
            "type_a",
            "type_b",
            "both_users",
            "n_a",
            "n_b",
            F.round(
                F.col("both_users").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("both_users")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "x166_time_to_convert",
    """WITH f AS (
         SELECT user_id,
                MIN(ts) AS first_ts,
                MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                    AS first_purchase
         FROM events GROUP BY user_id
       ), b AS (
         SELECT CASE WHEN first_purchase IS NULL THEN -1
                     ELSE CAST(FLOOR((epoch_us(first_purchase) -
                                      epoch_us(first_ts)) /
                                     86400000000.0) AS BIGINT)
                END AS days_bin
         FROM f
       ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f)
       SELECT days_bin,
              CAST(count(*) AS BIGINT) AS n_users,
              ROUND(CAST(count(*) AS DOUBLE) / (SELECT n FROM nn), 4)
                  AS share
       FROM b GROUP BY days_bin ORDER BY days_bin""",
    doc="time-to-convert survival table WITH censoring: per user, whole "
        "days from first-ever event to first purchase, binned; users "
        "who never purchase land in the -1 censored bucket instead of "
        "silently dropping out -- the censoring semantics x110's "
        "converters-only latency percentiles cannot express, and what "
        "makes the shares a valid survival readout. ONE user-key "
        "groupBy computes both anchors via a conditional MIN in the "
        "same pass (no self-join of the events table); day arithmetic "
        "in exact integer microseconds (x161's recipe); output is "
        "bin-cardinality",
)
def x166_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    days = F.floor(
        (us("first_purchase") - us("first_ts")) / F.lit(86400000000.0)
    ).cast("long")
    b = f.select(
        F.when(F.col("first_purchase").isNull(), F.lit(-1).cast("long"))
        .otherwise(days)
        .alias("days_bin")
    )
    nn = f.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        b.groupBy("days_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .crossJoin(F.broadcast(nn))
        .select(
            "days_bin",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("n"), 4
            ).alias("share"),
        )
        .orderBy("days_bin")
    )


@register(
    "x167_stream_latest_state",
    """WITH r AS (
         SELECT user_id, event_type, value,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY ts DESC, event_id DESC) AS rn
         FROM events
       )
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_users,
              ROUND(CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(28,2)))
                    AS DOUBLE), 2) AS sum_latest_value
       FROM r WHERE rn = 1
       GROUP BY event_type ORDER BY event_type""",
    doc="streaming materialized latest-state view (incremental SCD1 "
        "maintenance): the events file-stream aggregates max_by(latest "
        "row, (ts, event_id)) PER USER in complete mode -- each "
        "micro-batch upserts the keyed state declaratively, no "
        "foreachBatch merge code -- then the drained state rolls up "
        "per latest event type; hash-matched against the batch "
        "argmax-per-user oracle, so stream==batch through the "
        "correctness gate. State is user-cardinality by design (the "
        "materialized-view trade; x143's dedup state is watermark-"
        "bounded instead); state stores sized to state (x103's "
        "recipe). The (ts, event_id) ordering struct makes the argmax "
        "total, so duplicate timestamps pick the same row cross-engine",
)
def x167_stream_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import uuid

    from ..streaming.windows import _start_with_state_partitions

    ev = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="x167_stream_")
    sink = f"x167_sink_{uuid.uuid4().hex[:8]}"
    try:
        src = os.path.join(tmp, "events")
        ev.repartition(4).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        if "ts" in [f.name for f in schema.fields]:
            stream = stream.withColumn(
                "ts", F.col("ts").cast("timestamp")
            )
        latest = stream.groupBy("user_id").agg(
            F.max_by(
                F.struct("event_type", "value"),
                F.struct("ts", "event_id"),
            ).alias("latest")
        )
        writer = (
            latest.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
        )
        q = _start_with_state_partitions(spark, writer, 8)
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("x167 stream drain did not finish in 300 s")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return (
        spark.table(sink)
        .select(
            F.col("latest.event_type").alias("event_type"),
            F.col("latest.value").alias("value"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(
                F.sum(
                    F.round(F.col("value"), 2).cast("decimal(28,2)")
                ).cast("double"),
                2,
            ).alias("sum_latest_value"),
        )
        .orderBy("event_type")
    )


@register(
    "x168_multimodal_fingerprint",
    """WITH m AS (
         SELECT doc_id AS media_id,
                CASE doc_id % 3 WHEN 0 THEN 'image'
                     WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                md5(text) || md5(text || '#2') || md5(text || '#3')
                    AS hex
         FROM documents WHERE doc_id % 20 = 0
       ), f AS (
         SELECT media_id, kind,
                CAST(length(hex) / 2 AS BIGINT) AS byte_len,
                sha256(hex) AS sha_hex
         FROM m
       )
       SELECT media_id, kind, byte_len, sha_hex,
              CAST(('0x' || substr(sha_hex, 1, 2)) AS BIGINT) || ',' ||
              CAST(('0x' || substr(sha_hex, 3, 2)) AS BIGINT) || ',' ||
              CAST(('0x' || substr(sha_hex, 5, 2)) AS BIGINT) || ',' ||
              CAST(('0x' || substr(sha_hex, 7, 2)) AS BIGINT) || ',' ||
              CAST(('0x' || substr(sha_hex, 9, 2)) AS BIGINT) || ',' ||
              CAST(('0x' || substr(sha_hex, 11, 2)) AS BIGINT) || ',' ||
              CAST(('0x' || substr(sha_hex, 13, 2)) AS BIGINT) || ',' ||
              CAST(('0x' || substr(sha_hex, 15, 2)) AS BIGINT) AS feat
       FROM f ORDER BY media_id""",
    doc="the multimodal decode PLUMBING through the correctness gate: "
        "deterministic 48-byte binary payloads (unhex of chained md5s) "
        "attach to a 5% document slice, cross the JVM->Arrow->Python "
        "boundary in columnar batches, and a mapInPandas kernel "
        "fingerprints the received BYTES (ops/multimodal.py "
        "fingerprint_media) -- length, digest, and an 8-byte feature "
        "row. The oracle reconstructs every value from the hex the "
        "payload was built from, so one corrupted, reordered, or "
        "truncated byte in the binary transfer cascades into a hash "
        "mismatch. This is x13's metadata surface plus the actual "
        "binary data path; the codec slots stay gated "
        "(multimodal.py real_codecs) until libraries exist",
)
def x168_multimodal_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import multimodal

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.unhex(
            F.concat(
                F.md5("text"),
                F.md5(F.concat(F.col("text"), F.lit("#2"))),
                F.md5(F.concat(F.col("text"), F.lit("#3"))),
            )
        ).alias("payload"),
    )
    return multimodal.fingerprint_media(media).orderBy("media_id")


@register(
    "x169_scalable_median",
    """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
       r AS (
         SELECT l_extendedprice,
                CAST(row_number() OVER (
                  ORDER BY l_extendedprice, l_orderkey, l_linenumber)
                  AS BIGINT) AS rn
         FROM lineitem
       )
       SELECT (SELECT n FROM nn) AS n,
              ROUND(AVG(l_extendedprice), 2) AS median_price
       FROM r
       WHERE rn IN (SELECT (n + 1) // 2 FROM nn)
          OR rn IN (SELECT n // 2 + 1 FROM nn)""",
    doc="EXACT global median without materializing the column in one "
        "task: q30's percentile()/quantile_cont aggregate buffers every "
        "value in the final aggregate -- the hidden scale-killer in "
        "'exact percentile' at 100 TB. Here the two-pass prefix-sum "
        "rank (scale.global_row_number: range partition + broadcast "
        "offsets, no Exchange SinglePartition, no Window) finds the "
        "middle row(s) by POSITION and averages them -- two corpus "
        "passes, constant memory per task, same answer. The "
        "(price, orderkey, linenumber) total order pins rank ties; "
        "averaging the two middles matches quantile_cont(0.5) "
        "interpolation exactly for both parities",
)
def x169_scalable_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import scale

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    nn = li.agg(F.count(F.lit(1)).cast("long").alias("n"))
    r = scale.global_row_number(
        li,
        [
            F.col("l_extendedprice"),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        ],
        out_col="rn",
    )
    # integer division semantics: (n+1)//2 and n//2+1 via floor
    mid = (
        r.crossJoin(F.broadcast(nn))
        .filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor(F.col("n") / 2) + 1)
        )
    )
    return mid.groupBy().agg(
        F.first("n").alias("n"),
        F.round(F.avg("l_extendedprice"), 2).alias("median_price"),
    )


@register(
    "x170_top_paths",
    """WITH p AS (
         SELECT user_id,
                string_agg(event_type, '>' ORDER BY ts, event_id) AS path
         FROM events GROUP BY user_id
       )
       SELECT path,
              CAST(len(string_split(path, '>')) AS BIGINT) AS n_steps,
              CAST(count(*) AS BIGINT) AS n_users
       FROM p GROUP BY path
       ORDER BY n_users DESC, path LIMIT 20""",
    doc="top-20 full user-journey paths (the sequence-mining rollup "
        "behind funnel design): one user-key groupBy collapses each "
        "user's events into an ordered type string -- array_sort over "
        "(ts, event_id, type) structs pins tie order exactly as the "
        "oracle's ORDER BY ts, event_id -- then a path-key groupBy "
        "counts travelers and TakeOrderedAndProject keeps the head. "
        "Per-user state is event-cardinality-per-user (the x157 "
        "contract), never corpus-sized; both groupBys partial-agg "
        "map-side. x96/x107 see windows of the journey; this is the "
        "whole journey as the key",
)
def x170_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    paths = ev.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            "path",
            F.size(F.split(F.col("path"), ">")).cast("long").alias("n_steps"),
            "n_users",
        )
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


@register(
    "x171_weighted_median",
    """WITH g AS (
         SELECT l_returnflag, l_extendedprice,
                SUM(CAST(l_quantity AS DECIMAL(30,6))) AS w
         FROM lineitem GROUP BY 1, 2
       ), c AS (
         SELECT l_returnflag, l_extendedprice, w,
                SUM(w) OVER (PARTITION BY l_returnflag
                             ORDER BY l_extendedprice) AS cw
         FROM g
       ), t AS (
         SELECT l_returnflag, SUM(w) AS tw FROM g GROUP BY 1
       )
       SELECT c.l_returnflag,
              ROUND(MIN(c.l_extendedprice), 2) AS wmedian,
              ROUND(CAST(MAX(t.tw) AS DOUBLE), 2) AS total_qty
       FROM c JOIN t USING (l_returnflag)
       WHERE 2 * cw >= tw
       GROUP BY 1 ORDER BY 1""",
    doc="exact QUANTITY-WEIGHTED median price per return flag (lower "
        "weighted median: smallest price whose cumulative weight "
        "reaches half the total). The cumulative window NEVER sees "
        "corpus rows: a (flag, price) groupBy first compresses to "
        "distinct-price cardinality with DECIMAL-exact weight sums "
        "(the aggregate-first window contract, x62/x86), so the "
        "3-partition window rides a value-domain-sized table. "
        "Half-total comparison is 2*cw >= tw in DECIMAL -- no "
        "division, no float threshold, partition-order independent",
)
def x171_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    g = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("w")
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    c = g.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("w").over(w).alias("cw"),
    )
    t = g.groupBy("l_returnflag").agg(F.sum("w").alias("tw"))
    j = c.join(F.broadcast(t), "l_returnflag").filter(
        F.lit(2) * F.col("cw") >= F.col("tw")
    )
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_extendedprice"), 2).alias("wmedian"),
            F.round(F.max("tw").cast("double"), 2).alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "x172_k_anonymity",
    """WITH q AS (
         SELECT c_nationkey, c_mktsegment,
                CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket
         FROM customer
       ), g AS (
         SELECT CAST(count(*) AS BIGINT) AS k
         FROM q GROUP BY c_nationkey, c_mktsegment, bal_bucket
       )
       SELECT k, CAST(count(*) AS BIGINT) AS n_groups,
              CAST(SUM(k) AS BIGINT) AS n_rows
       FROM g GROUP BY k ORDER BY k""",
    doc="k-anonymity audit over the quasi-identifier (nation, segment, "
        "balance-centile bucket): the k-distribution -- how many QI "
        "equivalence classes have exactly k members and how many rows "
        "sit in them -- is the privacy release gate (rows in k=1 "
        "groups are singled out; k<5 is the conventional red line a "
        "downstream policy reads off this table). Two partial-"
        "aggregating groupBys, QI-cardinality intermediate, no joins; "
        "the bucket floor is IEEE-identical in both engines",
)
def x172_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    q = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("bal_bucket"),
    )
    g = q.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    return (
        g.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("k").cast("long").alias("n_rows"),
        )
        .orderBy("k")
    )


@register(
    "x173_novel_ngrams",
    """WITH t AS (
         SELECT doc_id,
                list_distinct(list_transform(
                  range(1, len(string_split(lower(text), ' ')) - 1),
                  i -> array_to_string(
                         (string_split(lower(text), ' '))[i:i+2], ' ')
                )) AS sh
         FROM documents
         WHERE len(string_split(lower(text), ' ')) >= 3
       ), e AS (
         SELECT CAST(floor(doc_id * 10 /
                  ((SELECT max(doc_id) FROM documents) + 1)) AS BIGINT)
                  AS batch,
                unnest(sh) AS shingle
         FROM t
       ), b AS (
         SELECT DISTINCT batch, shingle FROM e
       ), per_batch AS (
         SELECT batch, CAST(count(*) AS BIGINT) AS n_tri FROM b GROUP BY 1
       ), fb AS (
         SELECT shingle, MIN(batch) AS first_batch FROM b GROUP BY 1
       ), novel AS (
         SELECT first_batch AS batch, CAST(count(*) AS BIGINT) AS n_novel
         FROM fb GROUP BY 1
       )
       SELECT p.batch, p.n_tri,
              CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
              ROUND(CAST(COALESCE(n.n_novel, 0) AS DOUBLE) / p.n_tri, 4)
                  AS novelty_rate
       FROM per_batch p LEFT JOIN novel n ON p.batch = n.batch
       ORDER BY p.batch""",
    doc="crawl-novelty curve: docs bucket into 10 ingestion batches by "
        "id range (the broadcast 1-row max sets the range; batch = "
        "arrival decile), and each batch reports how many of its "
        "distinct trigrams first appear THERE -- the declining "
        "novelty_rate is the diminishing-returns signal that tells a "
        "crawl when more data stops adding information. Shapes: one "
        "(batch, shingle) distinct, then two shingle-key groupBys "
        "(min-batch, counts) -- all partial-aggregating, nothing "
        "corpus-quadratic; reuses x03's tokenizer so the oracle "
        "shares the proven shingle dialect",
)
def x173_novel_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id").alias("mx"))
    sh = dedup.shingles(docs, "doc_id", "text", k=3).select("doc", "shingle")
    b = (
        sh.crossJoin(F.broadcast(mx))
        .select(
            F.floor(F.col("doc") * 10 / (F.col("mx") + 1))
            .cast("long")
            .alias("batch"),
            "shingle",
        )
        .distinct()
    )
    per_batch = b.groupBy("batch").agg(
        F.count(F.lit(1)).cast("long").alias("n_tri")
    )
    fb = b.groupBy("shingle").agg(F.min("batch").alias("first_batch"))
    novel = fb.groupBy(F.col("first_batch").alias("batch")).agg(
        F.count(F.lit(1)).cast("long").alias("n_novel")
    )
    return (
        per_batch.join(novel, "batch", "left")
        .select(
            "batch",
            "n_tri",
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long")
            .alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
                / F.col("n_tri"),
                4,
            ).alias("novelty_rate"),
        )
        .orderBy("batch")
    )


@register(
    "x174_column_profile",
    """WITH u AS (
         SELECT 'l_quantity' AS col, l_quantity AS val FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice', l_extendedprice FROM lineitem
         UNION ALL
         SELECT 'l_discount', l_discount FROM lineitem
         UNION ALL
         SELECT 'l_tax', l_tax FROM lineitem
       )
       SELECT col,
              CAST(count(*) AS BIGINT) AS n,
              CAST(count(val) AS BIGINT) AS n_nonnull,
              CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
              MIN(val) AS min_val,
              MAX(val) AS max_val,
              ROUND(CAST(SUM(CAST(val AS DECIMAL(30,6))) AS DOUBLE)
                    / count(val), 4) AS mean_val
       FROM u GROUP BY col ORDER BY col""",
    doc="one-pass multi-column data profile via UNPIVOT (melt): the "
        "four lineitem measures pivot long through Spark's native "
        "unpivot (an Expand node -- 4x row fan-out but zero Python, "
        "zero extra scans; column pruning still reaches the parquet "
        "reader) into a single partial-aggregating groupBy emitting "
        "count / null-count / exact distinct / min / max / "
        "DECIMAL-exact mean per column. The long-format twin of x43's "
        "per-column wide profile, and the inverse operator of x141's "
        "pivot",
)
def x174_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    u = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "col",
        "val",
    )
    return (
        u.groupBy("col")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("val").cast("long").alias("n_nonnull"),
            F.countDistinct("val").cast("long").alias("n_distinct"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
            F.round(
                F.sum(F.col("val").cast("decimal(30,6)")).cast("double")
                / F.count("val"),
                4,
            ).alias("mean_val"),
        )
        .orderBy("col")
    )


@register(
    "x175_rollup_revenue",
    """SELECT r_name, n_name,
              CAST(GROUPING(r_name) AS BIGINT) AS g_region,
              CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
              CAST(count(*) AS BIGINT) AS n_orders,
              ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                    AS DOUBLE), 2) AS revenue
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP(r_name, n_name)
       ORDER BY g_region, g_nation,
                r_name NULLS FIRST, n_name NULLS FIRST""",
    doc="hierarchical ROLLUP (nation -> region subtotal -> grand "
        "total) with GROUPING() level markers -- the drill-down "
        "report x142's full CUBE overshoots (ROLLUP emits the 3 "
        "hierarchy levels, not all 4 combinations). The geography dim "
        "(region x nation x customer) assembles broadcast-side and "
        "rides a BroadcastHashJoin onto orders (dim is "
        "customer-cardinality -- broadcastable by the x78 contract); "
        "the rollup itself is one Expand + partial/final "
        "HashAggregate pair, so the shuffle carries 3 group rows per "
        "partition per key, never raw orders",
)
def x175_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dim = (
        customer.join(
            nation, customer.c_nationkey == nation.n_nationkey
        )
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name", "n_name")
    )
    j = orders.join(
        F.broadcast(dim), orders.o_custkey == dim.c_custkey
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("long").alias("g_region"),
            F.grouping("n_name").cast("long").alias("g_nation"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )
        .select(
            "r_name", "n_name", "g_region", "g_nation", "n_orders",
            "revenue",
        )
        .orderBy(
            "g_region",
            "g_nation",
            F.col("r_name").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


@register(
    "x176_churn_candidates",
    """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS m FROM orders),
       pc AS (
         SELECT o_custkey,
                max(CAST(o_orderdate AS DATE)) AS last_order,
                CAST(count(*) AS BIGINT) AS n_orders,
                SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS spend
         FROM orders GROUP BY 1
       )
       SELECT c_custkey, c_mktsegment, last_order, n_orders,
              CAST(datediff('day', last_order, (SELECT m FROM mx))
                   AS BIGINT) AS days_inactive,
              ROUND(CAST(spend AS DOUBLE), 2) AS lifetime_spend
       FROM pc JOIN customer ON o_custkey = c_custkey
       WHERE last_order < (SELECT m FROM mx) - INTERVAL 365 DAY
       ORDER BY lifetime_spend DESC, c_custkey LIMIT 50""",
    doc="churned-whale list: highest-lifetime-spend customers whose "
        "LAST order predates the corpus horizon by a year -- the "
        "win-back campaign seed. One orders groupBy compresses to "
        "customer cardinality (count + max-date + DECIMAL spend in "
        "the same pass), the corpus max-date rides a broadcast 1-row "
        "aggregate, the segment attach is a broadcast dim join, and "
        "TakeOrderedAndProject keeps the top 50 under a "
        "(spend, custkey) total order. Inactivity is date arithmetic "
        "against the data's own horizon, so the query is "
        "reproducible -- no wall-clock dependence",
)
def x176_churn_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    mx = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("m")
    )
    pc = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("spend"),
    )
    return (
        pc.crossJoin(F.broadcast(mx))
        .filter(F.col("last_order") < F.date_sub(F.col("m"), 365))
        .join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            pc.o_custkey == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_mktsegment",
            "last_order",
            "n_orders",
            F.datediff(F.col("m"), F.col("last_order"))
            .cast("long")
            .alias("days_inactive"),
            F.round(F.col("spend").cast("double"), 2).alias(
                "lifetime_spend"
            ),
        )
        .orderBy(F.desc("lifetime_spend"), "c_custkey")
        .limit(50)
    )


@register(
    "x177_ohlc_bars",
    """SELECT date_trunc('hour', ts) AS bar,
              first(value ORDER BY ts, event_id) AS open,
              MAX(value) AS high,
              MIN(value) AS low,
              last(value ORDER BY ts, event_id) AS close,
              CAST(count(*) AS BIGINT) AS n_trades,
              ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 4)
                  AS turnover
       FROM events
       WHERE event_type = 'purchase' AND value IS NOT NULL
       GROUP BY 1 ORDER BY 1""",
    doc="hourly OHLC bars over purchase values -- the time-series "
        "downsample every market/telemetry dashboard draws. "
        "Open/close are argmin/argmax by (ts, event_id) via Spark's "
        "min_by/max_by over a struct ordering key (event_id breaks "
        "same-microsecond ties, so the bar is deterministic; the "
        "oracle's ordered-aggregate first()/last() pins the same "
        "order) -- ONE partial-aggregating groupBy computes all six "
        "measures, no window, no self-join; the type filter pushes "
        "to the parquet scan",
)
def x177_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    ordk = F.struct("ts", "event_id")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bar"))
        .agg(
            F.min_by("value", ordk).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordk).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_trades"),
            F.round(
                F.sum(F.col("value").cast("decimal(30,6)")).cast("double"),
                4,
            ).alias("turnover"),
        )
        .orderBy("bar")
    )


@register(
    "x178_token_pmi",
    """WITH tok AS (
         SELECT DISTINCT doc_id, t FROM (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
           FROM documents
         ) WHERE length(t) > 0
       ), v AS (
         SELECT t, CAST(count(*) AS BIGINT) AS n_docs
         FROM tok GROUP BY t ORDER BY n_docs DESC, t LIMIT 100
       ), kept AS (
         SELECT tok.doc_id, tok.t FROM tok JOIN v USING (t)
       ), p AS (
         SELECT a.t AS tok_a, b.t AS tok_b,
                CAST(count(*) AS BIGINT) AS n_ab
         FROM kept a JOIN kept b USING (doc_id)
         WHERE a.t < b.t GROUP BY 1, 2
       ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
       SELECT tok_a, tok_b, n_ab,
              ROUND(ln(CAST(n_ab AS DOUBLE) * (SELECT n FROM nn)
                       / (va.n_docs * vb.n_docs)), 4) AS pmi
       FROM p
       JOIN v va ON p.tok_a = va.t
       JOIN v vb ON p.tok_b = vb.t
       ORDER BY n_ab DESC, tok_a, tok_b LIMIT 50""",
    doc="pointwise mutual information over top-vocab token "
        "co-occurrence (the collocation signal behind phrase mining "
        "and tokenizer-merge candidates): doc frequency picks the "
        "top-100 vocabulary (deterministic (count, token) tie-break), "
        "docs project onto it through a broadcast semi-join, and "
        "in-doc pairs expand INSIDE the per-doc sorted token array "
        "via the x165 HOF pattern -- bounded by C(100,2) per doc, "
        "never a corpus self-join; PMI arithmetic is exact-integer "
        "ratios pushed through one ln() at the end",
)
def x178_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("t"),
        )
        .filter(F.length("t") > 0)
        .distinct()
    )
    v = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "t")
        .limit(100)
    )
    kept = tok.join(F.broadcast(v.select("t")), "t", "leftsemi")
    u = kept.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("t")).alias("toks")
    )
    ts = F.col("toks")
    pairs = (
        u.select(
            F.explode(
                F.flatten(
                    F.transform(
                        ts,
                        lambda x, i: F.transform(
                            F.slice(ts, i + F.lit(2), F.size(ts)),
                            lambda y: F.struct(
                                x.alias("tok_a"), y.alias("tok_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.*")
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    nn = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    va = v.select(F.col("t").alias("tok_a"), F.col("n_docs").alias("n_a"))
    vb = v.select(F.col("t").alias("tok_b"), F.col("n_docs").alias("n_b"))
    return (
        pairs.join(F.broadcast(va), "tok_a")
        .join(F.broadcast(vb), "tok_b")
        .crossJoin(F.broadcast(nn))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double") * F.col("n")
                    / (F.col("n_a") * F.col("n_b"))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("n_ab"), "tok_a", "tok_b")
        .limit(50)
    )


@register(
    "x179_ship_sla",
    """WITH fs AS (
         SELECT l_orderkey,
                min(CAST(l_shipdate AS DATE)) AS first_ship
         FROM lineitem GROUP BY 1
       ), j AS (
         SELECT o_orderpriority,
                datediff('day', CAST(o_orderdate AS DATE), first_ship)
                    AS days
         FROM orders JOIN fs ON o_orderkey = l_orderkey
       )
       SELECT o_orderpriority,
              CAST(count(*) AS BIGINT) AS n_orders,
              ROUND(CAST(SUM(days) AS DOUBLE) / count(*), 4) AS avg_days,
              ROUND(100.0 * SUM(CASE WHEN days <= 30 THEN 1 ELSE 0 END)
                    / count(*), 4) AS pct_30,
              ROUND(100.0 * SUM(CASE WHEN days <= 60 THEN 1 ELSE 0 END)
                    / count(*), 4) AS pct_60,
              ROUND(100.0 * SUM(CASE WHEN days > 60 THEN 1 ELSE 0 END)
                    / count(*), 4) AS pct_late
       FROM j GROUP BY 1 ORDER BY 1""",
    doc="order-to-first-shipment SLA per priority class: lineitem "
        "compresses to order cardinality (min shipdate) BEFORE the "
        "big-big equi-join with orders -- the aggregate-first side "
        "halves the shuffle and the join stays a key-partitioned "
        "SMJ/AQE choice, never a broadcast of a fact table; SLA "
        "shares are integer CASE sums over exact day arithmetic, "
        "divided once at the end (orders with no lineitems are "
        "outside the SLA population by definition -- inner join)",
)
def x179_ship_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fs = li.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship")
    )
    j = orders.join(
        fs, orders.o_orderkey == fs.l_orderkey
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("first_ship"), F.col("o_orderdate").cast("date")
        ).alias("days"),
    )
    cnt = F.count(F.lit(1))
    return (
        j.groupBy("o_orderpriority")
        .agg(
            cnt.cast("long").alias("n_orders"),
            F.round(F.sum("days").cast("double") / cnt, 4).alias(
                "avg_days"
            ),
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("days") <= 30, 1).otherwise(0))
                / cnt,
                4,
            ).alias("pct_30"),
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("days") <= 60, 1).otherwise(0))
                / cnt,
                4,
            ).alias("pct_60"),
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("days") > 60, 1).otherwise(0))
                / cnt,
                4,
            ).alias("pct_late"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "x180_time_weighted_avg",
    """WITH s AS (
         SELECT user_id,
                CAST(round(value * 1e6) AS BIGINT) AS value_u,
                epoch_us(ts) AS t_us,
                lead(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS nxt_us
         FROM events WHERE value IS NOT NULL
       ), d AS (
         SELECT user_id, value_u, nxt_us - t_us AS dur_us
         FROM s WHERE nxt_us IS NOT NULL
       )
       SELECT user_id,
              CAST(count(*) AS BIGINT) AS n_steps,
              ROUND(SUM(dur_us) / 1e6, 3) AS span_sec,
              ROUND(CAST(SUM(CAST(value_u AS DECIMAL(19,0))
                              * CAST(dur_us AS DECIMAL(19,0))) AS DOUBLE)
                    / (1e6 * SUM(dur_us)), 6) AS twa
       FROM d GROUP BY 1 ORDER BY user_id""",
    doc="time-weighted average of each user's value step function "
        "(the right mean for irregularly-sampled telemetry -- a "
        "value held for an hour must outweigh one held a second): "
        "lead() over the user-key window yields each step's exact "
        "microsecond duration, weights multiply in DECIMAL(38,0) "
        "integer micro-units (value x 1e6, duration in us -- no "
        "float accumulation, partition-order independent), one "
        "double division at the end. Window and groupBy share the "
        "one user-key shuffle; single-event users have no interval "
        "and drop out by definition",
)
def x180_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in the parquet; unix_micros needs TIMESTAMP.
    # The session-tz shift the cast applies is CONSTANT, so it cancels
    # in the lead() difference -- durations are exact either way.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    s = ev.select(
        "user_id",
        F.round(F.col("value") * 1e6, 0).cast("long").alias("value_u"),
        us.alias("t_us"),
        F.lead(us).over(w).alias("nxt_us"),
    )
    d = s.filter(F.col("nxt_us").isNotNull()).select(
        "user_id",
        "value_u",
        (F.col("nxt_us") - F.col("t_us")).alias("dur_us"),
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_steps"),
            F.round(F.sum("dur_us") / 1e6, 3).alias("span_sec"),
            F.round(
                F.sum(
                    F.col("value_u").cast("decimal(19,0)")
                    * F.col("dur_us").cast("decimal(19,0)")
                ).cast("double")
                / (F.lit(1e6) * F.sum("dur_us")),
                6,
            ).alias("twa"),
        )
        .orderBy("user_id")
    )


@register(
    "x181_part_liveness",
    """WITH sold AS (SELECT DISTINCT l_partkey FROM lineitem),
       f AS (
         SELECT p_brand, p_partkey,
                CASE WHEN l_partkey IS NOT NULL THEN 1 ELSE 0 END AS hit
         FROM part LEFT JOIN sold ON p_partkey = l_partkey
       )
       SELECT p_brand,
              CAST(count(*) AS BIGINT) AS n_parts,
              CAST(SUM(hit) AS BIGINT) AS n_sold,
              CAST(count(*) - SUM(hit) AS BIGINT) AS n_never_sold,
              ROUND(100.0 * (count(*) - SUM(hit)) / count(*), 4)
                  AS pct_never
       FROM f GROUP BY 1 ORDER BY 1""",
    doc="catalog-liveness audit per brand: which parts have never "
        "shipped (the dead-stock / cold-start list every "
        "recommender and inventory plan needs). Spark side runs the "
        "REAL set operators -- LEFT SEMI for sold, LEFT ANTI for "
        "never-sold -- against the distinct-partkey projection of "
        "lineitem (fact compresses to key cardinality first, so the "
        "semi/anti probe side is distinct-key-sized); the oracle's "
        "left-join CASE formulation is the same set algebra. Brand "
        "rollups are dim-cardinality; counts join broadcast-side",
)
def x181_part_liveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    sold_keys = li.select(F.col("l_partkey")).distinct()
    n_parts = part.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )
    n_sold = (
        part.join(sold_keys, part.p_partkey == sold_keys.l_partkey, "leftsemi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sold"))
    )
    n_never = (
        part.join(sold_keys, part.p_partkey == sold_keys.l_partkey, "leftanti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_never_sold"))
    )
    return (
        n_parts.join(F.broadcast(n_sold), "p_brand", "left")
        .join(F.broadcast(n_never), "p_brand", "left")
        .select(
            "p_brand",
            "n_parts",
            F.coalesce("n_sold", F.lit(0)).cast("long").alias("n_sold"),
            F.coalesce("n_never_sold", F.lit(0))
            .cast("long")
            .alias("n_never_sold"),
            F.round(
                F.lit(100.0)
                * F.coalesce("n_never_sold", F.lit(0))
                / F.col("n_parts"),
                4,
            ).alias("pct_never"),
        )
        .orderBy("p_brand")
    )


@register(
    "x182_cohort_ltv",
    """WITH c AS (
         SELECT o_custkey,
                min(date_trunc('month', CAST(o_orderdate AS DATE)))
                    AS cohort
         FROM orders GROUP BY 1
       ), j AS (
         SELECT cohort,
                datediff('month', cohort,
                         date_trunc('month', CAST(o_orderdate AS DATE)))
                    AS age,
                o_totalprice
         FROM orders JOIN c USING (o_custkey)
       ), cell AS (
         SELECT cohort, CAST(age AS BIGINT) AS age,
                CAST(count(*) AS BIGINT) AS n_orders,
                SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS rev
         FROM j GROUP BY 1, 2
       )
       SELECT cohort, age, n_orders,
              ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
              ROUND(CAST(SUM(rev) OVER (
                PARTITION BY cohort ORDER BY age) AS DOUBLE), 2)
                  AS cum_revenue
       FROM cell ORDER BY cohort, age""",
    doc="cohort-LTV triangle (acquisition month x months-since): the "
        "revenue curve per acquisition cohort that x131's retention "
        "counts can't price. First-order month per customer from one "
        "orders groupBy (customer-cardinality, broadcastable by the "
        "x78 dim contract), cohort cells from a second "
        "partial-aggregating groupBy, and the cumulative-LTV window "
        "rides the cohort x age CELL table (a few hundred rows at "
        "any corpus size) -- the aggregate-first window contract; "
        "revenue is DECIMAL-exact until one final rounding cast",
)
def x182_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.min(
            F.date_trunc("month", F.col("o_orderdate").cast("date")).cast(
                "date"
            )
        ).alias("cohort")
    )
    j = orders.join(F.broadcast(c), "o_custkey").select(
        "cohort",
        F.months_between(
            F.date_trunc("month", F.col("o_orderdate").cast("date")).cast(
                "date"
            ),
            F.col("cohort"),
        )
        .cast("long")
        .alias("age"),
        "o_totalprice",
    )
    cell = j.groupBy("cohort", "age").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("rev"),
    )
    w = Window.partitionBy("cohort").orderBy("age")
    return (
        cell.select(
            "cohort",
            "age",
            "n_orders",
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
            F.round(F.sum("rev").over(w).cast("double"), 2).alias(
                "cum_revenue"
            ),
        )
        .orderBy("cohort", "age")
    )


@register(
    "x183_hhi_concentration",
    """WITH spend AS (
         SELECT c_mktsegment,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) * 100
                     AS BIGINT) AS cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment, o_custkey
       )
       SELECT c_mktsegment,
              CAST(count(*) AS BIGINT) AS n_customers,
              ROUND(CAST(SUM(cents) AS DOUBLE) / 100, 2) AS revenue,
              ROUND(1e4 * CAST(SUM(CAST(cents AS DECIMAL(19,0))
                                   * CAST(cents AS DECIMAL(19,0)))
                               AS DOUBLE)
                    / (CAST(SUM(cents) AS DOUBLE)
                       * CAST(SUM(cents) AS DOUBLE)), 4) AS hhi
       FROM spend GROUP BY 1 ORDER BY 1""",
    doc="Herfindahl-Hirschman concentration index per market segment "
        "(0 = atomized, 10000 = one customer owns the segment -- the "
        "dependency-risk number x108's Gini ranks but doesn't price "
        "in antitrust units): per-customer spend reduces to exact "
        "integer cents, squares accumulate in DECIMAL(38,0) (no "
        "float sum ordering anywhere), and HHI = 1e4 * sum(s^2) / "
        "total^2 is two double divisions at the very end. Two "
        "partial-aggregating groupBys; the customer dim joins "
        "broadcast-side",
)
def x183_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
                * 100
            )
            .cast("long")
            .alias("cents")
        )
    )
    c = F.col("cents")
    return (
        spend.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum(c).cast("double") / 100, 2).alias("revenue"),
            F.round(
                F.lit(1e4)
                * F.sum(
                    c.cast("decimal(19,0)") * c.cast("decimal(19,0)")
                ).cast("double")
                / (F.sum(c).cast("double") * F.sum(c).cast("double")),
                4,
            ).alias("hhi"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "x184_grouped_topn_array",
    """WITH spend AS (
         SELECT c_nationkey, o_custkey AS ck,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) * 100
                     AS BIGINT) AS cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2
       ), r AS (
         SELECT *, row_number() OVER (
                  PARTITION BY c_nationkey
                  ORDER BY cents DESC, ck) AS rk
         FROM spend
       )
       SELECT c_nationkey,
              string_agg(ck || ':' || cents, '|' ORDER BY rk) AS top3
       FROM r WHERE rk <= 3 GROUP BY 1 ORDER BY 1""",
    doc="grouped top-N as a NESTED column: each nation's three "
        "biggest customers, ordered, serialized 'custkey:cents' (the "
        "q33/q41 array-hashing precedent -- exact integer cents keep "
        "the string cross-engine byte-identical). The rank window "
        "rides the (nation, customer) AGGREGATE (aggregate-first "
        "contract), rank<=3 filters before the collect, and the "
        "per-nation array assembles from three rows -- collect_list "
        "is provably bounded, the general grouped-top-N shape that "
        "replaces ORDER BY ... LIMIT per group at scale",
)
def x184_grouped_topn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_nationkey", F.col("o_custkey").alias("ck"))
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
                * 100
            )
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("cents"), F.col("ck")
    )
    r = spend.select(
        "c_nationkey",
        F.concat_ws(":", F.col("ck"), F.col("cents")).alias("s"),
        F.row_number().over(w).alias("rk"),
    ).filter(F.col("rk") <= 3)
    return (
        r.groupBy("c_nationkey")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "s"))),
                    lambda x: x["s"],
                ),
            ).alias("top3")
        )
        .orderBy("c_nationkey")
    )


@register(
    "x185_daily_ledger",
    """WITH e AS (
         SELECT CAST(ts AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events GROUP BY 1
       ), o AS (
         SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS n_orders,
                SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS rev
         FROM orders GROUP BY 1
       )
       SELECT COALESCE(e.day, o.day) AS day,
              CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
              CAST(COALESCE(n_users, 0) AS BIGINT) AS n_users,
              CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
              ROUND(CAST(COALESCE(rev, 0) AS DOUBLE), 2) AS revenue
       FROM e FULL OUTER JOIN o ON e.day = o.day
       ORDER BY day""",
    doc="unified activity ledger across two fact tables on "
        "non-overlapping calendars: FULL OUTER join of daily event "
        "rollups and daily order rollups -- the one join type that "
        "keeps BOTH unmatched sides (a left/right join would silently "
        "drop one era of the business). Each side aggregates to day "
        "cardinality FIRST (corpus rows never reach the join), so the "
        "full-outer runs on two tiny day tables; COALESCE fills the "
        "holes with explicit zeros, not nulls",
)
def x185_daily_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    e = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    o = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("rev"),
    )
    return (
        e.join(o, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.round(
                F.coalesce(F.col("rev"), F.lit(0)).cast("double"), 2
            ).alias("revenue"),
        )
        .orderBy("day")
    )


@register(
    "x186_readability",
    """WITH d AS (
         SELECT lang,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
                CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                     AS BIGINT) AS s,
                CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                     AS BIGINT) AS y
         FROM documents
       ), p AS (
         SELECT lang, w, s, y,
                206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                        - 84.6 * (CAST(y AS DOUBLE) / w) AS fre
         FROM d
       )
       SELECT lang,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(SUM(w) AS BIGINT) AS words,
              CAST(SUM(s) AS BIGINT) AS sentences,
              CAST(SUM(y) AS BIGINT) AS syllables,
              ROUND(206.835
                    - 1.015 * (CAST(SUM(w) AS DOUBLE) / SUM(s))
                    - 84.6 * (CAST(SUM(y) AS DOUBLE) / SUM(w)), 4)
                  AS corpus_fre,
              CAST(SUM(CASE WHEN fre < 30 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_hard
       FROM p GROUP BY lang ORDER BY lang""",
    doc="Flesch reading-ease readability per language -- the "
        "quality-filter axis x11's length/punct ratios don't measure "
        "(a wall of long sentences scores low even with clean "
        "punctuation): words / sentence-terminator runs / vowel-group "
        "syllable proxy are three regexp_count expressions (pure "
        "codegen, no explode -- the counts never materialize token "
        "rows), per-doc hard-document flags compare row-locally, and "
        "the corpus score recomputes from exact integer count sums so "
        "no float mean ever accumulates across rows",
)
def x186_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.size(F.split("text", " ")).cast("long")
    s = F.greatest(
        F.lit(1), F.regexp_count("text", F.lit("[.!?]+"))
    ).cast("long")
    y = F.regexp_count(F.lower("text"), F.lit("[aeiouy]+")).cast("long")
    d = docs.select(
        "lang", w.alias("w"), s.alias("s"), y.alias("y")
    ).withColumn(
        "fre",
        F.lit(206.835)
        - F.lit(1.015) * (F.col("w").cast("double") / F.col("s"))
        - F.lit(84.6) * (F.col("y").cast("double") / F.col("w")),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("words"),
            F.sum("s").cast("long").alias("sentences"),
            F.sum("y").cast("long").alias("syllables"),
            F.round(
                F.lit(206.835)
                - F.lit(1.015)
                * (F.sum("w").cast("double") / F.sum("s"))
                - F.lit(84.6)
                * (F.sum("y").cast("double") / F.sum("w")),
                4,
            ).alias("corpus_fre"),
            F.sum(F.when(F.col("fre") < 30, 1).otherwise(0))
            .cast("long")
            .alias("n_hard"),
        )
        .orderBy("lang")
    )


@register(
    "x187_content_checksum",
    """SELECT source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(bit_xor(CAST(('0x' || substr(
                     md5(doc_id || '|' || text), 1, 15)) AS BIGINT))
                   AS BIGINT) AS checksum
       FROM documents GROUP BY source ORDER BY source""",
    doc="order-independent content checksum per source -- the "
        "migration/replication integrity primitive: every row hashes "
        "to 60 bits of its md5(id|text) and XOR-folds per group, so "
        "two copies of a corpus match iff their row MULTISETS match "
        "(any dropped, duplicated, or corrupted row flips the "
        "checksum) regardless of partitioning or row order -- the "
        "property a SUM- or concat-based digest lacks. One partial-"
        "aggregating groupBy; XOR is associative-commutative, so the "
        "map-side combine is exact",
)
def x187_content_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("doc_id"), F.col("text"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.bit_xor(h).cast("long").alias("checksum"),
        )
        .orderBy("source")
    )


@register(
    "x188_schema_merge_audit",
    """SELECT 'v1' AS ver,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(*) AS BIGINT) AS n_null_source,
              CAST(count(*) AS BIGINT) AS n_null_quality
       FROM documents
       UNION ALL
       SELECT 'v2',
              CAST(count(*) AS BIGINT),
              CAST(0 AS BIGINT),
              CAST(0 AS BIGINT)
       FROM documents
       ORDER BY ver""",
    doc="schema-evolution round-trip: the corpus writes twice -- a v1 "
        "epoch with the original 3-column schema and a v2 epoch that "
        "adds source and a derived quality column -- and reads back "
        "through mergeSchema=true, the mechanism that lets a year of "
        "heterogeneous parquet epochs scan as ONE table; the audit "
        "counts the null-filled columns per epoch, which is exactly "
        "what downstream code must tolerate. The oracle states the "
        "invariant directly: every v1 row null-fills the v2-only "
        "columns, no v2 row does. Writes go to a per-run temp dir "
        "(x160's round-trip idiom), result localCheckpoints before "
        "cleanup",
)
def x188_schema_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="x188_schema_")
    try:
        v1 = docs.select("doc_id", "text", "lang", F.lit("v1").alias("ver"))
        v2 = docs.select(
            "doc_id",
            "text",
            "lang",
            "source",
            (F.col("n_chars") / 100.0).alias("quality"),
            F.lit("v2").alias("ver"),
        )
        p1, p2 = os.path.join(tmp, "epoch1"), os.path.join(tmp, "epoch2")
        v1.write.mode("overwrite").parquet(p1)
        v2.write.mode("overwrite").parquet(p2)
        merged = spark.read.option("mergeSchema", "true").parquet(p1, p2)
        out = (
            merged.groupBy("ver")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(
                    F.when(F.col("source").isNull(), 1).otherwise(0)
                ).cast("long").alias("n_null_source"),
                F.sum(
                    F.when(F.col("quality").isNull(), 1).otherwise(0)
                ).cast("long").alias("n_null_quality"),
            )
            .orderBy("ver")
            .localCheckpoint()  # materialize before tmp vanishes
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@register(
    "x189_discount_elasticity",
    """WITH m AS (
         SELECT p_brand,
                CAST(round(l_discount * 100) AS BIGINT) AS d,
                CAST(l_quantity AS BIGINT) AS q
         FROM lineitem JOIN part ON l_partkey = p_partkey
       ), a AS (
         SELECT p_brand,
                CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(d) AS BIGINT) AS sd,
                CAST(SUM(q) AS BIGINT) AS sq,
                CAST(SUM(d * q) AS BIGINT) AS sdq,
                CAST(SUM(d * d) AS BIGINT) AS sd2,
                CAST(SUM(q * q) AS BIGINT) AS sq2
         FROM m GROUP BY 1
       )
       SELECT p_brand, n AS n_items,
              ROUND(CAST(sd AS DOUBLE) / (100.0 * n), 4) AS avg_discount,
              CASE WHEN (CAST(n AS DOUBLE) * sd2 - CAST(sd AS DOUBLE) * sd)
                        * (CAST(n AS DOUBLE) * sq2 - CAST(sq AS DOUBLE) * sq)
                        > 0
                   THEN ROUND(
                     (CAST(n AS DOUBLE) * sdq
                      - CAST(sd AS DOUBLE) * sq)
                     / sqrt((CAST(n AS DOUBLE) * sd2
                             - CAST(sd AS DOUBLE) * sd)
                            * (CAST(n AS DOUBLE) * sq2
                               - CAST(sq AS DOUBLE) * sq)), 4)
                   ELSE NULL END AS corr_dq
       FROM a ORDER BY p_brand""",
    doc="grouped Pearson correlation of discount vs quantity per part "
        "brand (the price-elasticity screen; x147 correlates global "
        "column pairs -- this is per-GROUP correlation at fact-table "
        "scale): discounts become exact integer percent units, the "
        "five moment sums accumulate as exact integers in ONE "
        "partial-aggregating groupBy behind a broadcast dim join, and "
        "the correlation assembles in double from six exact numbers "
        "per brand -- float never sums across rows, so the result is "
        "partition-order independent; zero-variance brands surface "
        "NULL, not NaN",
)
def x189_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    m = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    a = m.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("sd"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("d") * F.col("q")).cast("long").alias("sdq"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sd2"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sq2"),
    )
    nd = F.col("n").cast("double")
    sd, sq = F.col("sd").cast("double"), F.col("sq").cast("double")
    var_d = nd * F.col("sd2") - sd * sd
    var_q = nd * F.col("sq2") - sq * sq
    return a.select(
        "p_brand",
        F.col("n").alias("n_items"),
        F.round(sd / (F.lit(100.0) * F.col("n")), 4).alias("avg_discount"),
        F.when(
            var_d * var_q > 0,
            F.round(
                (nd * F.col("sdq") - sd * sq) / F.sqrt(var_d * var_q), 4
            ),
        ).alias("corr_dq"),
    ).orderBy("p_brand")


@register(
    "x190_first_transition",
    """WITH r AS (
         SELECT user_id, event_type,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn
         FROM events
       ), ft AS (
         SELECT user_id,
                MAX(CASE WHEN rn = 1 THEN event_type END) AS first_type,
                COALESCE(MAX(CASE WHEN rn = 2 THEN event_type END),
                         '(none)') AS second_type
         FROM r WHERE rn <= 2 GROUP BY user_id
       ), g AS (
         SELECT first_type, second_type,
                CAST(count(*) AS BIGINT) AS n_users
         FROM ft GROUP BY 1, 2
       )
       SELECT first_type, second_type, n_users,
              ROUND(100.0 * n_users / SUM(n_users) OVER (
                PARTITION BY first_type), 4) AS pct_of_first
       FROM g ORDER BY first_type, second_type""",
    doc="onboarding matrix: each user's FIRST event-type transition "
        "(x96 counts every adjacent transition; product decisions "
        "about the first session need only this one), single-event "
        "users land in an explicit '(none)' bucket instead of "
        "vanishing. The rank window shares the user-key shuffle with "
        "the pivot groupBy (rn<=2 filters before the pivot so "
        "per-user state is two rows), the share window rides the "
        "type-pair AGGREGATE (tens of rows); (ts, event_id) makes "
        "first/second deterministic under ties",
)
def x190_first_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 2)
    ft = r.groupBy("user_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias(
            "first_type"
        ),
        F.coalesce(
            F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
            F.lit("(none)"),
        ).alias("second_type"),
    )
    g = ft.groupBy("first_type", "second_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    share_w = Window.partitionBy("first_type")
    return (
        g.select(
            "first_type",
            "second_type",
            "n_users",
            F.round(
                F.lit(100.0)
                * F.col("n_users")
                / F.sum("n_users").over(share_w),
                4,
            ).alias("pct_of_first"),
        )
        .orderBy("first_type", "second_type")
    )


@register(
    "x191_equidepth_histogram",
    """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
       r AS (
         SELECT l_extendedprice,
                CAST(row_number() OVER (
                  ORDER BY l_extendedprice, l_orderkey, l_linenumber)
                  AS BIGINT) AS rn
         FROM lineitem
       ), ks AS (
         SELECT unnest(range(1, 10)) AS decile
       ), pos AS (
         SELECT CAST(decile AS BIGINT) AS decile,
                greatest(1, (CAST(decile AS BIGINT)
                             * (SELECT n FROM nn)) // 10) AS pos
         FROM ks
       )
       SELECT decile, CAST(pos AS BIGINT) AS pos,
              l_extendedprice AS edge_price
       FROM pos JOIN r ON r.rn = pos.pos
       ORDER BY decile""",
    doc="EXACT equi-depth decile edges by POSITION -- the histogram "
        "boundaries x17's GK sketch approximates, computed exactly "
        "without ever buffering the column: x169's two-pass "
        "prefix-sum rank (range partition + broadcast offsets, no "
        "SinglePartition, no Window) numbers the total order once, "
        "then the nine cut positions -- a 9-row derived table off the "
        "broadcast 1-row count -- equi-join back on rank. Total-order "
        "tiebreak (price, orderkey, linenumber) pins every edge; "
        "generalizing x169's single midpoint to any quantile grid "
        "costs one more broadcast join, not another pass",
)
def x191_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import scale

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    nn = li.agg(F.count(F.lit(1)).cast("long").alias("n"))
    r = scale.global_row_number(
        li,
        [
            F.col("l_extendedprice"),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        ],
        out_col="rn",
    )
    pos = nn.select(
        F.explode(F.sequence(F.lit(1), F.lit(9))).alias("decile"), "n"
    ).select(
        F.col("decile").cast("long").alias("decile"),
        F.greatest(
            F.lit(1).cast("long"),
            F.expr("(decile * n) div 10"),
        ).alias("pos"),
    )
    return (
        r.join(F.broadcast(pos), r.rn == pos.pos)
        .select("decile", "pos", F.col("l_extendedprice").alias("edge_price"))
        .orderBy("decile")
    )


@register(
    "x192_value_mix_shift",
    """WITH b AS (
         SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
                CAST(least(floor(o_totalprice / 50000), 5) AS BIGINT)
                    AS band,
                o_orderkey
         FROM orders
       ), g AS (
         SELECT yr, band, CAST(count(*) AS BIGINT) AS n_orders
         FROM b GROUP BY 1, 2
       ), t AS (
         SELECT yr, CAST(SUM(n_orders) AS BIGINT) AS n_tot FROM g
         GROUP BY 1
       ), s AS (
         SELECT g.yr, g.band, g.n_orders,
                CAST(g.n_orders AS DOUBLE) / t.n_tot AS share
         FROM g JOIN t USING (yr)
       )
       SELECT yr, band, n_orders,
              ROUND(share, 4) AS share,
              ROUND(share - lag(share) OVER (
                PARTITION BY band ORDER BY yr), 4) AS share_delta
       FROM s ORDER BY yr, band""",
    doc="order-value mix-shift monitor: yearly share of each value "
        "band plus the year-over-year share delta -- the "
        "distribution-drift alarm for a revenue pipeline (x128 "
        "measures corpus mix against a TARGET; this tracks it "
        "against its own past). Corpus rows reduce to a year x band "
        "cell table in one partial-aggregating groupBy; shares join "
        "year totals broadcast-side and the lag window rides the "
        "tiny cell table. Band floors are IEEE-identical; shares "
        "subtract BEFORE the single rounding so the delta is exact "
        "to the representation",
)
def x192_value_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    b = orders.select(
        F.year(F.col("o_orderdate").cast("date")).cast("long").alias("yr"),
        F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(5))
        .cast("long")
        .alias("band"),
    )
    g = b.groupBy("yr", "band").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    t = g.groupBy("yr").agg(F.sum("n_orders").cast("long").alias("n_tot"))
    s = g.join(F.broadcast(t), "yr").withColumn(
        "share", F.col("n_orders").cast("double") / F.col("n_tot")
    )
    w = Window.partitionBy("band").orderBy("yr")
    return (
        s.select(
            "yr",
            "band",
            "n_orders",
            F.round("share", 4).alias("share"),
            F.round(
                F.col("share") - F.lag("share").over(w), 4
            ).alias("share_delta"),
        )
        .orderBy("yr", "band")
    )


@register(
    "x193_budget_curve",
    """WITH d AS (
         SELECT doc_id, n_chars,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
         FROM documents
       ), c AS (
         SELECT doc_id, tok,
                CAST(row_number() OVER (
                  ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn,
                CAST(SUM(tok) OVER (
                  ORDER BY n_chars DESC, doc_id) AS BIGINT) AS cum
         FROM d
       ), t AS (SELECT CAST(SUM(tok) AS BIGINT) AS tot FROM d),
       ks AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS k)
       SELECT k,
              CAST(min(rn) AS BIGINT) AS n_docs,
              CAST(arg_min(cum, rn) AS BIGINT) AS cum_tokens
       FROM c, t, ks
       WHERE 10 * c.cum >= k * t.tot
       GROUP BY k ORDER BY k""",
    doc="token-budget selection curve: docs rank by quality proxy "
        "(longest-first here; any score column slots in) and the "
        "curve answers 'how many top docs until 10%..100% of the "
        "token budget' -- the cutoff table a data-mix planner reads "
        "before sampling (x33 samples TO a budget; this prices every "
        "budget at once). Scale shape: global_row_number + "
        "prefix_sum rank-and-accumulate the total order in two "
        "passes (no SinglePartition), then each row emits only the "
        "budget levels IT crosses via an integer-exact "
        "sequence((10*prev) div tot + 1 .. (10*cum) div tot) -- at "
        "most 10 rows survive corpus-wide, so the oracle's "
        "cross-join formulation never materializes on the Spark "
        "side",
)
def x193_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import scale

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("tok"),
    )
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    r = scale.global_row_number(docs, order, out_col="rn")
    c = scale.prefix_sum(r, order, "tok", out_col="cum")
    tot = docs.agg(F.sum("tok").cast("long").alias("tot"))
    j = c.crossJoin(F.broadcast(tot)).select(
        "rn",
        "cum",
        F.expr("(10 * (cum - tok)) div tot + 1").alias("k_lo"),
        F.least(F.expr("(10 * cum) div tot"), F.lit(10).cast("long"))
        .alias("k_hi"),
    )
    hits = j.select(
        "rn",
        "cum",
        F.explode(
            F.when(
                F.col("k_hi") >= F.col("k_lo"),
                F.sequence(F.col("k_lo"), F.col("k_hi")),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("k"),
    )
    return hits.select(
        "k",
        F.col("rn").alias("n_docs"),
        F.col("cum").alias("cum_tokens"),
    ).orderBy("k")


@register(
    "x194_correlated_subquery",
    """SELECT c_nationkey,
              CAST(count(*) AS BIGINT) AS n_rich_active
       FROM customer c
       WHERE CAST(round(c_acctbal * 100) AS BIGINT)
             * (SELECT count(*) FROM customer c2
                WHERE c2.c_nationkey = c.c_nationkey)
             > (SELECT SUM(CAST(round(c3.c_acctbal * 100) AS BIGINT))
                FROM customer c3
                WHERE c3.c_nationkey = c.c_nationkey)
         AND EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey)
       GROUP BY c_nationkey ORDER BY c_nationkey""",
    doc="the correlated-subquery SURFACE itself: customers above "
        "their nation's mean balance (stated sum/count-wise in exact "
        "integer cents -- no float mean at a comparison boundary) "
        "who have ordered, via TWO correlated scalar subqueries plus "
        "a correlated EXISTS, submitted as raw SQL. Catalyst "
        "DECORRELATES all three into aggregate-then-join plans (the "
        "per-row rescan a naive engine would do is the scale-killer); "
        "the oracle runs the SAME text modulo nothing -- both "
        "dialects accept it verbatim, so this entry also pins SQL "
        "portability",
)
def x194_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS n_rich_active
        FROM customer c
        WHERE CAST(round(c_acctbal * 100) AS BIGINT)
              * (SELECT count(*) FROM customer c2
                 WHERE c2.c_nationkey = c.c_nationkey)
              > (SELECT SUM(CAST(round(c3.c_acctbal * 100) AS BIGINT))
                 FROM customer c3
                 WHERE c3.c_nationkey = c.c_nationkey)
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_nationkey ORDER BY c_nationkey
        """
    )


@register(
    "x195_token_positions",
    """WITH tk AS (
         SELECT doc_id, string_split(lower(text), ' ') AS toks
         FROM documents
       ), e AS (
         SELECT doc_id, len(toks) AS n_toks,
                unnest(toks) AS t,
                unnest(range(0, len(toks))) AS pos
         FROM tk
       ), v AS (
         SELECT t, CAST(count(*) AS BIGINT) AS n_occ
         FROM e GROUP BY t ORDER BY n_occ DESC, t LIMIT 20
       )
       SELECT e.t AS token, v.n_occ,
              ROUND(CAST(SUM(e.pos) AS DOUBLE) / SUM(e.n_toks), 4)
                  AS avg_rel_pos
       FROM e JOIN v ON e.t = v.t
       GROUP BY e.t, v.n_occ
       ORDER BY v.n_occ DESC, e.t""",
    doc="positional token statistics via posexplode: where in a "
        "document does each high-frequency token tend to sit "
        "(boilerplate headers score near 0, signatures near 1 -- the "
        "positional prior behind x26's boilerplate detection). "
        "Position and token co-explode in ONE generator pass; the "
        "top-20 vocabulary joins back broadcast-side; the relative "
        "position is a ratio of two exact integer sums (sum(pos) / "
        "sum(doc_len)) so no float crosses a row boundary. Oracle "
        "zips DuckDB's parallel unnests to the same (token, "
        "position) pairs",
)
def x195_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    e = tk.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_toks"),
        F.posexplode("toks").alias("pos", "t"),
    )
    v = (
        e.groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .orderBy(F.desc("n_occ"), "t")
        .limit(20)
    )
    return (
        e.join(F.broadcast(v), "t")
        .groupBy(F.col("t").alias("token"), "n_occ")
        .agg(
            F.round(
                F.sum("pos").cast("double") / F.sum("n_toks"), 4
            ).alias("avg_rel_pos")
        )
        .orderBy(F.desc("n_occ"), "token")
    )


@register(
    "x196_lang_count_map",
    """WITH g AS (
         SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
         FROM documents GROUP BY 1, 2
       )
       SELECT source,
              CAST(SUM(cnt) AS BIGINT) AS n_docs,
              '{' || string_agg('"' || lang || '":' || cnt,
                                ',' ORDER BY lang) || '}' AS lang_counts
       FROM g GROUP BY source ORDER BY source""",
    doc="per-source language histogram as a MAP column (the nested "
        "key-value shape metadata catalogs store): (source, lang) "
        "counts assemble into map<string,long> via map_from_entries "
        "over the lang-sorted entry array -- insertion order is "
        "pinned, so to_json renders a canonical {..en..:123} JSON "
        "string the oracle rebuilds byte-identically with an ordered "
        "string_agg. Two partial-aggregating groupBys; the map is "
        "language-cardinality, provably bounded per group",
)
def x196_lang_count_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return (
        g.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_docs"),
            F.to_json(
                F.map_from_entries(
                    F.array_sort(
                        F.collect_list(F.struct("lang", "cnt"))
                    )
                )
            ).alias("lang_counts"),
        )
        .orderBy("source")
    )


@register(
    "x197_weekday_overlap",
    """WITH f AS (
         SELECT user_id, event_type,
                MAX(CASE WHEN isodow(ts) <= 5 THEN 1 ELSE 0 END) AS wd,
                MAX(CASE WHEN isodow(ts) > 5 THEN 1 ELSE 0 END) AS we
         FROM events GROUP BY 1, 2
       ), u AS (
         SELECT user_id,
                CAST(SUM(wd * we) AS BIGINT) AS n_shared,
                CAST(SUM(wd * (1 - we)) AS BIGINT) AS n_wd_only,
                CAST(SUM(we * (1 - wd)) AS BIGINT) AS n_we_only
         FROM f GROUP BY 1
       )
       SELECT n_shared, n_wd_only, n_we_only,
              CAST(count(*) AS BIGINT) AS n_users
       FROM u GROUP BY 1, 2, 3
       ORDER BY n_shared, n_wd_only, n_we_only""",
    doc="weekday/weekend behavioral overlap via the ARRAY SET "
        "operators: per user, the weekday event-type set and weekend "
        "set materialize from conditional collect_sets in one "
        "user-key groupBy, then array_intersect / array_except "
        "compute shared and exclusive behaviors ROW-LOCALLY (set "
        "algebra on type-cardinality arrays, never a join), and the "
        "(shared, wd-only, we-only) signature histogram is a second "
        "tiny groupBy. The oracle states the same set algebra "
        "relationally (max-flag pivot + flag products) -- two "
        "formulations, one truth",
)
def x197_weekday_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    is_wd = F.weekday("ts") < 5
    u = ev.groupBy("user_id").agg(
        F.collect_set(F.when(is_wd, F.col("event_type"))).alias("wd"),
        F.collect_set(F.when(~is_wd, F.col("event_type"))).alias("we"),
    )
    sig = u.select(
        F.size(F.array_intersect("wd", "we"))
        .cast("long")
        .alias("n_shared"),
        F.size(F.array_except("wd", "we")).cast("long").alias("n_wd_only"),
        F.size(F.array_except("we", "wd")).cast("long").alias("n_we_only"),
    )
    return (
        sig.groupBy("n_shared", "n_wd_only", "n_we_only")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("n_shared", "n_wd_only", "n_we_only")
    )


@register(
    "x198_trend_fit",
    """WITH mn AS (
         SELECT min(CAST(ts AS DATE)) AS d0 FROM events
       ), d AS (
         SELECT event_type,
                CAST(datediff('day', (SELECT d0 FROM mn),
                              CAST(ts AS DATE)) AS BIGINT) AS x,
                CAST(count(*) AS BIGINT) AS y
         FROM events GROUP BY 1, 2
       ), a AS (
         SELECT event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS sx,
                CAST(SUM(y) AS BIGINT) AS sy,
                CAST(SUM(x * y) AS BIGINT) AS sxy,
                CAST(SUM(x * x) AS BIGINT) AS sx2,
                CAST(SUM(y * y) AS BIGINT) AS sy2
         FROM d GROUP BY 1
       )
       SELECT event_type, n AS n_days,
              ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                    / (CAST(n AS DOUBLE) * sx2 - CAST(sx AS DOUBLE) * sx),
                    6) AS slope,
              ROUND((CAST(sy AS DOUBLE)
                     - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                       / (CAST(n AS DOUBLE) * sx2
                          - CAST(sx AS DOUBLE) * sx) * sx) / n, 4)
                  AS intercept,
              ROUND(CASE WHEN (CAST(n AS DOUBLE) * sy2
                               - CAST(sy AS DOUBLE) * sy) > 0
                    THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                         * (CAST(n AS DOUBLE) * sxy
                            - CAST(sx AS DOUBLE) * sy)
                         / ((CAST(n AS DOUBLE) * sx2
                             - CAST(sx AS DOUBLE) * sx)
                            * (CAST(n AS DOUBLE) * sy2
                               - CAST(sy AS DOUBLE) * sy))
                    ELSE NULL END, 4) AS r2
       FROM a ORDER BY event_type""",
    doc="per-type linear trend of daily event volume (the "
        "capacity-planning slope + goodness-of-fit): day counts "
        "reduce corpus rows to a type x day cell table, the day "
        "index anchors to the corpus' own min date (broadcast 1-row "
        "-- reproducible, no wall clock), and OLS slope / intercept "
        "/ R^2 assemble in double from SIX exact integer moment "
        "sums per type -- the x189 moments pattern extended to "
        "regression; float never accumulates across rows. "
        "Zero-variance series surface NULL R^2, not NaN",
)
def x198_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mn = ev.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    d = (
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        .crossJoin(F.broadcast(mn))
        .select(
            "event_type",
            F.datediff("day", "d0").cast("long").alias("x"),
            "y",
        )
    )
    a = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov = nd * F.col("sxy") - sx * sy
    var_x = nd * F.col("sx2") - sx * sx
    var_y = nd * F.col("sy2") - sy * sy
    slope = cov / var_x
    return a.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / F.col("n"), 4).alias("intercept"),
        F.round(
            F.when(var_y > 0, cov * cov / (var_x * var_y)), 4
        ).alias("r2"),
    ).orderBy("event_type")


@register(
    "x199_lateral_topn",
    """SELECT r.r_name, t.n_name, t.n_cust
       FROM region r JOIN LATERAL (
         SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_cust
         FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
         WHERE n.n_regionkey = r.r_regionkey
         GROUP BY n.n_name
         ORDER BY n_cust DESC, n.n_name LIMIT 2
       ) t ON TRUE
       ORDER BY r.r_name, t.n_cust DESC, t.n_name""",
    doc="correlated LATERAL top-N -- the 'for each outer row, run "
        "this parameterized subquery' surface (with ORDER BY + LIMIT "
        "inside the lateral, the shape engines historically "
        "rejected): per region, its two most-customered nations. "
        "Catalyst DECORRELATES the lateral into a join + per-group "
        "rank rather than re-executing the inner query per region "
        "-- the plan a 100 TB engine must produce; the oracle runs "
        "the equivalent LATERAL verbatim in DuckDB. Submitted as raw "
        "SQL to pin the API surface end-to-end",
)
def x199_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer"
    )
    return spark.sql(
        """
        SELECT r.r_name, t.n_name, t.n_cust
        FROM region r JOIN LATERAL (
          SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_cust
          FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY n_cust DESC, n.n_name LIMIT 2
        ) t
        ORDER BY r.r_name, t.n_cust DESC, t.n_name
        """
    )


@register(
    "x200_null_imputation",
    """WITH w AS (
         SELECT event_type,
                CASE WHEN event_id % 7 = 0 THEN NULL
                     ELSE CAST(round(value * 1e6) AS BIGINT) END AS v_u
         FROM events
       ), a AS (
         SELECT event_type,
                CAST(count(*) AS BIGINT) AS n,
                CAST(count(v_u) AS BIGINT) AS n_obs,
                CAST(SUM(v_u) AS BIGINT) AS s_u
         FROM w GROUP BY 1
       )
       SELECT event_type, n,
              CAST(n - n_obs AS BIGINT) AS n_imputed,
              ROUND(CAST(s_u AS DOUBLE) / (1e6 * n_obs), 4)
                  AS mean_observed,
              ROUND(CAST(s_u + (n - n_obs) * (s_u // n_obs) AS DOUBLE)
                    / (1e6 * n), 4) AS mean_imputed
       FROM a ORDER BY event_type""",
    doc="group-mean null imputation audit (the standard ML-prep "
        "fill): a deterministic missingness mask (every 7th event -- "
        "the x53 synthetic-corruption precedent, since the fixture "
        "has no natural nulls) knocks out values, per-type means "
        "compute in exact integer micro-units, and the fill value is "
        "the INTEGER-DIVISION mean so the post-imputation mean is "
        "itself exact arithmetic -- both engines agree to the bit, "
        "no float mean ever feeds back into data. One "
        "partial-aggregating groupBy carries count, observed count, "
        "and sum together",
)
def x200_null_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = ev.select(
        "event_type",
        F.when(
            F.col("event_id") % 7 == 0, F.lit(None).cast("long")
        )
        .otherwise(F.round(F.col("value") * 1e6, 0).cast("long"))
        .alias("v_u"),
    )
    a = w.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("v_u").cast("long").alias("n_obs"),
        F.sum("v_u").cast("long").alias("s_u"),
    )
    return a.select(
        "event_type",
        "n",
        (F.col("n") - F.col("n_obs")).cast("long").alias("n_imputed"),
        F.round(
            F.col("s_u").cast("double") / (F.lit(1e6) * F.col("n_obs")), 4
        ).alias("mean_observed"),
        F.round(
            (
                F.col("s_u")
                + (F.col("n") - F.col("n_obs"))
                * F.expr("s_u div n_obs")
            ).cast("double")
            / (F.lit(1e6) * F.col("n")),
            4,
        ).alias("mean_imputed"),
    ).orderBy("event_type")


@register(
    "x201_pareto_skyline",
    """WITH g AS (
         SELECT l_extendedprice AS price, l_discount AS disc,
                CAST(count(*) AS BIGINT) AS n_lines
         FROM lineitem GROUP BY 1, 2
       ), p AS (
         SELECT price, MAX(disc) AS disc,
                arg_max(n_lines, disc) AS n_lines
         FROM g GROUP BY price
       ), s AS (
         SELECT price, disc, n_lines,
                MAX(disc) OVER (
                  ORDER BY price DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS best_disc_at_higher_price
         FROM p
       )
       SELECT price, disc, n_lines
       FROM s
       WHERE best_disc_at_higher_price IS NULL
          OR disc > best_disc_at_higher_price
       ORDER BY price DESC""",
    doc="2-D Pareto skyline (maximize price AND discount): the "
        "non-dominated frontier of (price, discount) -- a point "
        "survives iff no strictly-higher-priced point had an equal "
        "or better discount, i.e. a running MAX over the price-sorted "
        "order beats the O(n^2) dominance self-join a naive skyline "
        "does. Same-price points collapse to the best discount FIRST "
        "(same-price dominance is a groupBy max, and it makes every "
        "window row's price DISTINCT -- a ROWS frame over tied keys "
        "would see ties in nondeterministic order), then the running "
        "max rides the per-price aggregate -- value-domain "
        "cardinality, the x171 aggregate-first contract (documented "
        "bounded-domain SinglePartition, x81's trade); ROWS ... 1 "
        "PRECEDING makes the self-exclusion exact",
)
def x201_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.groupBy(
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("disc"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_lines"))
    g = pairs.groupBy("price").agg(
        F.max("disc").alias("disc"),
        F.max_by("n_lines", "disc").alias("n_lines"),
    )
    w = (
        Window.orderBy(F.desc("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = g.select(
        "price",
        "disc",
        "n_lines",
        F.max("disc").over(w).alias("best"),
    )
    return (
        s.filter(F.col("best").isNull() | (F.col("disc") > F.col("best")))
        .select("price", "disc", "n_lines")
        .orderBy(F.desc("price"))
    )


@register(
    "x202_set_operations",
    """WITH a AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
       b AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 1)
       SELECT 'common' AS set_op, CAST(count(*) AS BIGINT) AS n
       FROM (SELECT h FROM a INTERSECT SELECT h FROM b)
       UNION ALL
       SELECT 'only_even', CAST(count(*) AS BIGINT)
       FROM (SELECT h FROM a EXCEPT SELECT h FROM b)
       UNION ALL
       SELECT 'only_odd', CAST(count(*) AS BIGINT)
       FROM (SELECT h FROM b EXCEPT SELECT h FROM a)
       ORDER BY set_op""",
    doc="the relational SET OPERATORS themselves -- INTERSECT and "
        "EXCEPT (distinct semantics) over content-hash projections of "
        "two corpus halves: the snapshot-diff primitive x50 builds "
        "with joins, expressed through the operators users actually "
        "type. Spark plans both as hash-partitioned aggregates/joins "
        "on the md5 key (skew-immune by construction); the three "
        "counts assemble with a lit-labeled union of 1-row "
        "aggregates. Parity split keys the halves deterministically",
)
def x202_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.md5("text").alias("h")
    )
    b = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.md5("text").alias("h")
    )

    def counted(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(label).alias("set_op"), "n"
        )

    return (
        counted(a.intersect(b), "common")
        .unionByName(counted(a.subtract(b), "only_even"))
        .unionByName(counted(b.subtract(a), "only_odd"))
        .orderBy("set_op")
    )


@register(
    "x203_stock_ledger",
    """WITH top AS (
         SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_moves
         FROM lineitem GROUP BY 1
         ORDER BY n_moves DESC, l_partkey LIMIT 20
       ), led AS (
         SELECT l.l_partkey,
                SUM(CASE WHEN l.l_returnflag = 'R'
                         THEN -CAST(l.l_quantity AS BIGINT)
                         ELSE CAST(l.l_quantity AS BIGINT) END)
                  OVER (PARTITION BY l.l_partkey
                        ORDER BY l.l_shipdate, l.l_orderkey,
                                 l.l_linenumber) AS bal
         FROM lineitem l JOIN top USING (l_partkey)
       )
       SELECT t.l_partkey, t.n_moves,
              CAST(mb.min_bal AS BIGINT) AS min_balance,
              CAST(fin.final_bal AS BIGINT) AS final_balance
       FROM top t
       JOIN (SELECT l_partkey, MIN(bal) AS min_bal
             FROM led GROUP BY 1) mb USING (l_partkey)
       JOIN (SELECT l.l_partkey,
                    SUM(CASE WHEN l.l_returnflag = 'R'
                             THEN -CAST(l.l_quantity AS BIGINT)
                             ELSE CAST(l.l_quantity AS BIGINT) END)
                        AS final_bal
             FROM lineitem l JOIN top USING (l_partkey)
             GROUP BY 1) fin USING (l_partkey)
       ORDER BY t.n_moves DESC, t.l_partkey""",
    doc="running stock ledger with drawdown: per part, returns (flag "
        "R) debit and shipments credit a signed-quantity ledger "
        "ordered by (shipdate, orderkey, linenumber); the running "
        "balance is a KEY-PARTITIONED window (each part's history in "
        "its own partition -- scales with parts, not corpus), and "
        "min-balance is the inventory drawdown a planner alerts on. "
        "Focused on the 20 highest-velocity parts via "
        "TakeOrderedAndProject + broadcast semi-join BEFORE the "
        "window, so the windowed slice is 20 parts' rows, not the "
        "fact table. Integer quantities end to end -- no float "
        "accumulation. Final balance = total signed sum (order-free); "
        "oracle reads it as the max-rank running value, same number",
)
def x203_stock_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_moves"))
        .orderBy(F.desc("n_moves"), "l_partkey")
        .limit(20)
    )
    signed = F.when(
        F.col("l_returnflag") == "R",
        -F.col("l_quantity").cast("long"),
    ).otherwise(F.col("l_quantity").cast("long"))
    led = li.join(F.broadcast(top.select("l_partkey")), "l_partkey").select(
        "l_partkey",
        signed.alias("dq"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bal = led.select("l_partkey", F.sum("dq").over(w).alias("bal"))
    mb = bal.groupBy("l_partkey").agg(
        F.min("bal").cast("long").alias("min_balance")
    )
    # final balance == total signed sum: order-independent, no window
    fin = led.groupBy("l_partkey").agg(
        F.sum("dq").cast("long").alias("final_balance")
    )
    return (
        top.join(F.broadcast(mb), "l_partkey")
        .join(F.broadcast(fin), "l_partkey")
        .select(
            "l_partkey", "n_moves", "min_balance", "final_balance"
        )
        .orderBy(F.desc("n_moves"), "l_partkey")
    )


@register(
    "x204_json_nested_roundtrip",
    """WITH js AS (
         SELECT user_id,
                '[' || string_agg(
                  '{"event_id":' || event_id
                  || ',"event_type":"' || event_type || '"}',
                  ',' ORDER BY event_id) || ']' AS j,
                CAST(count(*) AS BIGINT) AS n_events
         FROM events GROUP BY user_id
       )
       SELECT CAST(user_id % 16 AS BIGINT) AS bucket,
              CAST(count(*) AS BIGINT) AS n_users,
              CAST(SUM(n_events) AS BIGINT) AS n_events,
              CAST(bit_xor(CAST(('0x' || substr(md5(j), 1, 15))
                   AS BIGINT)) AS BIGINT) AS json_checksum
       FROM js GROUP BY 1 ORDER BY 1""",
    doc="nested-JSON round-trip integrity: each user's event list "
        "serializes to a canonical JSON array of structs (to_json "
        "over an event_id-sorted collect_list -- field order and "
        "element order both pinned), parses BACK through from_json "
        "with the declared array<struct> schema, and the recovered "
        "element count re-aggregates -- so a single byte of "
        "serializer drift, field reordering, or parse loss flips the "
        "per-bucket XOR checksum of the JSON text itself. This is "
        "the x14-style export/import contract for NESTED payloads "
        "(x114 proves flat JSONL); the oracle rebuilds the exact "
        "JSON byte string relationally",
)
def x204_json_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ev = load_table(spark, sf_dir, "events")
    schema = ArrayType(
        StructType(
            [
                StructField("event_id", LongType()),
                StructField("event_type", StringType()),
            ]
        )
    )
    js = ev.groupBy("user_id").agg(
        F.to_json(
            F.array_sort(F.collect_list(F.struct("event_id", "event_type")))
        ).alias("j")
    ).select(
        "user_id",
        "j",
        F.size(F.from_json("j", schema)).cast("long").alias("n_events"),
    )
    h = F.conv(F.substring(F.md5("j"), 1, 15), 16, 10).cast("long")
    return (
        js.groupBy((F.col("user_id") % 16).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.bit_xor(h).cast("long").alias("json_checksum"),
        )
        .orderBy("bucket")
    )


@register(
    "x205_activity_bitmask",
    """WITH mn AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
       m AS (
         SELECT user_id,
                bit_or(CAST(1 AS BIGINT) << CAST(
                  least(datediff('day', (SELECT d0 FROM mn),
                                 CAST(ts AS DATE)) // 7, 62)
                  AS INTEGER)) AS mask
         FROM events GROUP BY 1
       )
       SELECT CAST(bit_count(mask) AS BIGINT) AS n_weeks,
              CAST(count(*) AS BIGINT) AS n_users,
              CAST(bit_xor(mask) AS BIGINT) AS mask_checksum
       FROM m GROUP BY 1 ORDER BY 1""",
    doc="per-user activity encoded as a WEEK BITMASK -- 64 weeks of "
        "presence in one long via bit_or(1 << week_index) (the "
        "compact engagement encoding retention systems store instead "
        "of (user, week) rows -- 8 bytes replaces a row per active "
        "week): week indexes anchor to the corpus min date "
        "(broadcast 1-row, reproducible), bit_or folds map-side like "
        "any partial aggregate, bit_count reads weeks-active "
        "row-locally, and the per-cohort XOR checksum pins every "
        "individual mask through the hash gate. Two partial-agg "
        "groupBys, zero joins on corpus rows",
)
def x205_activity_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mn = ev.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    wk = F.least(
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.col("d0")) / 7
        ),
        F.lit(62),
    ).cast("int")
    m = (
        ev.crossJoin(F.broadcast(mn))
        .select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        # shiftleft's Python wrapper wants a literal bit count; the SQL
        # function form takes the wk COLUMN
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), wk))").alias(
                "mask"
            )
        )
    )
    return (
        m.groupBy(F.bit_count("mask").cast("long").alias("n_weeks"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.bit_xor("mask").cast("long").alias("mask_checksum"),
        )
        .orderBy("n_weeks")
    )


@register(
    "x206_wallet_share",
    """WITH m AS (
         SELECT o.o_custkey, p.p_brand,
                CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS cents
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY 1, 2
       ), c AS (
         SELECT o_custkey,
                CAST(SUM(cents) AS BIGINT) AS total_c,
                CAST(MAX(cents) AS BIGINT) AS top_c
         FROM m GROUP BY 1
       )
       SELECT CAST(least(floor(10.0 * top_c / total_c), 9) AS BIGINT)
                  AS share_decile,
              CAST(count(*) AS BIGINT) AS n_customers,
              ROUND(CAST(SUM(top_c) AS DOUBLE) / SUM(total_c), 4)
                  AS avg_share
       FROM c GROUP BY 1 ORDER BY 1""",
    doc="wallet-share concentration: how much of each customer's "
        "spend lands on their single favorite brand -- the loyalty "
        "distribution behind assortment planning. A THREE-hop "
        "fact-dim-fact chain: part attaches broadcast-side, the "
        "lineitem-orders join is the real big-big shuffle "
        "(key-partitioned SMJ/AQE -- the plan shape 100 TB requires), "
        "then two partial-agg groupBys collapse to (customer, brand) "
        "and customer. Cents are exact integers; the decile floor "
        "and pooled avg-share divide once at the end",
)
def x206_wallet_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    m = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey", "p_brand")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    c = m.groupBy("o_custkey").agg(
        F.sum("cents").cast("long").alias("total_c"),
        F.max("cents").cast("long").alias("top_c"),
    )
    return (
        c.groupBy(
            F.least(
                F.floor(
                    F.lit(10.0) * F.col("top_c") / F.col("total_c")
                ),
                F.lit(9),
            )
            .cast("long")
            .alias("share_decile")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(
                F.sum("top_c").cast("double") / F.sum("total_c"), 4
            ).alias("avg_share"),
        )
        .orderBy("share_decile")
    )


@register(
    "x207_forecast_wmape",
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS y
         FROM events GROUP BY 1, 2
       ), j AS (
         SELECT a.event_type, a.y, b.y AS yhat
         FROM d a JOIN d b
           ON a.event_type = b.event_type
          AND b.day = a.day - INTERVAL 7 DAY
       )
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_days,
              ROUND(CAST(SUM(abs(y - yhat)) AS DOUBLE) / SUM(y), 4)
                  AS wmape,
              CAST(SUM(CASE WHEN yhat > y THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_over
       FROM j GROUP BY 1 ORDER BY 1""",
    doc="seasonal-naive forecast scorecard: yhat(t) = y(t-7) (the "
        "baseline every real forecaster must beat) evaluated as "
        "weighted MAPE -- sum|err| / sum actual, the aggregate-ratio "
        "form that is EXACT integer arithmetic until one final "
        "division (per-day APE averaging would divide per row and "
        "accumulate floats). Corpus rows reduce to type x day cells "
        "first; the 7-day-lag self-join runs on the tiny cell table "
        "via exact date equality, not a window over sparse days "
        "(missing days must NOT slide -- a lag(7 rows) would)",
)
def x207_forecast_wmape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    b = d.select(
        F.col("event_type").alias("bt"),
        F.col("day").alias("bday"),
        F.col("y").alias("yhat"),
    )
    j = d.join(
        b,
        (F.col("event_type") == F.col("bt"))
        & (F.col("bday") == F.date_sub(F.col("day"), 7)),
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(
                F.sum(F.abs(F.col("y") - F.col("yhat"))).cast("double")
                / F.sum("y"),
                4,
            ).alias("wmape"),
            F.sum(
                F.when(F.col("yhat") > F.col("y"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_over"),
        )
        .orderBy("event_type")
    )


@register(
    "x208_regex_parse",
    """WITH p AS (
         SELECT CAST(nullif(regexp_extract(props, '"k":\\s*(\\d+)', 1),
                            '') AS BIGINT) AS k
         FROM events
       )
       SELECT CAST(k // 10 AS BIGINT) AS k_bucket,
              CAST(count(*) AS BIGINT) AS n,
              CAST(MIN(k) AS BIGINT) AS k_min,
              CAST(MAX(k) AS BIGINT) AS k_max
       FROM p WHERE k IS NOT NULL
       GROUP BY 1 ORDER BY 1""",
    doc="regex field extraction from semi-structured payloads -- the "
        "non-JSON-path twin of x53's parser (log lines and legacy "
        "formats don't parse as JSON; capture groups do the work): "
        "regexp_extract with a capture group pulls the numeric field, "
        "nullif guards the no-match empty string BEFORE the cast "
        "(ANSI-safe on both engines), and the decade-bucket rollup "
        "is one partial-agg groupBy. Pure codegen expressions -- the "
        "regex runs row-local in the scan stage, pushdown-friendly",
)
def x208_regex_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.nullif(
        F.regexp_extract("props", r'"k":\s*(\d+)', 1), F.lit("")
    ).cast("long")
    p = ev.select(k.alias("k")).filter(F.col("k").isNotNull())
    return (
        p.groupBy(F.expr("k div 10").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
        .orderBy("k_bucket")
    )


@register(
    "x209_topk_concentration",
    """WITH u AS (
         SELECT user_id, CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1
       ), r AS (
         SELECT n, CAST(row_number() OVER (
                  ORDER BY n DESC, user_id) AS BIGINT) AS rn
         FROM u
       ), t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot,
                       CAST(count(*) AS BIGINT) AS n_users FROM u)
       SELECT k.k AS top_k,
              CAST(SUM(CASE WHEN rn <= k.k THEN n ELSE 0 END) AS BIGINT)
                  AS events_covered,
              ROUND(CAST(SUM(CASE WHEN rn <= k.k THEN n ELSE 0 END)
                         AS DOUBLE) / MAX(t.tot), 4) AS share
       FROM r, t, (SELECT unnest([1, 10, 100, 1000]) AS k) k
       WHERE k.k <= t.n_users OR k.k = 1
       GROUP BY k.k ORDER BY k.k""",
    doc="audience concentration curve: what share of all events do "
        "the top-1/10/100/1000 most-active users produce (the "
        "platform-dependency number x41's heavy-hitter LIST doesn't "
        "summarize; a skew early-warning for training-data "
        "user-diversity): users aggregate first, x90's two-pass "
        "global rank orders them without a SinglePartition window, "
        "and the four coverage sums fold in ONE conditional "
        "aggregate over the user-cardinality table -- exact integer "
        "counts, one division per k at the end",
)
def x209_topk_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import scale

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    r = scale.global_row_number(
        u, [F.col("n").desc(), F.col("user_id")], out_col="rn"
    )
    t = u.agg(
        F.sum("n").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    ks = spark.range(0, 4).select(
        F.element_at(
            F.array(F.lit(1), F.lit(10), F.lit(100), F.lit(1000)),
            (F.col("id") + 1).cast("int"),
        ).cast("long").alias("k")
    )
    j = r.crossJoin(F.broadcast(ks)).crossJoin(F.broadcast(t)).filter(
        (F.col("k") <= F.col("n_users")) | (F.col("k") == 1)
    )
    return (
        j.groupBy("k")
        .agg(
            F.sum(F.when(F.col("rn") <= F.col("k"), F.col("n"))
                  .otherwise(0))
            .cast("long")
            .alias("events_covered"),
            F.round(
                F.sum(
                    F.when(F.col("rn") <= F.col("k"), F.col("n"))
                    .otherwise(0)
                ).cast("double")
                / F.max("tot"),
                4,
            ).alias("share"),
        )
        .select(
            F.col("k").alias("top_k"), "events_covered", "share"
        )
        .orderBy("top_k")
    )


@register(
    "x210_triangle_count",
    """WITH items AS (
         SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
       ), p AS (
         SELECT a.l_partkey AS u, b.l_partkey AS v,
                count(*) AS n
         FROM items a JOIN items b USING (l_orderkey)
         WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2
       ), e AS (SELECT u, v FROM p WHERE n >= 2),
       tri AS (
         SELECT e1.u AS a, e1.v AS b, e2.v AS c
         FROM e e1
         JOIN e e2 ON e1.v = e2.u
         JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
       ), nodes AS (
         SELECT a AS x FROM tri UNION SELECT b FROM tri
         UNION SELECT c FROM tri
       )
       SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
              (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles,
              (SELECT CAST(count(*) AS BIGINT) FROM nodes)
                  AS n_tri_nodes""",
    doc="triangle counting on the support>=2 co-purchase graph -- the "
        "clustering-coefficient numerator, the graph statistic x68's "
        "degrees and x104's ranks don't see: each triangle counts "
        "exactly once through the id-total-order orientation "
        "(a<b<c), so the count is two edge-sized equi-joins (wedge "
        "build + closure check), never an open wedge explosion over "
        "the raw graph -- the support filter prunes the hub edges "
        "that make naive triangle joins quadratic (production "
        "systems orient by DEGREE for the same reason; id-order is "
        "the deterministic stand-in). Edges derive once and "
        "localCheckpoint; three 1-row aggregates assemble "
        "broadcast-side",
)
def x210_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    buckets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    ps = F.col("parts")
    e = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        ps,
                        lambda x, i: F.transform(
                            F.slice(ps, i + F.lit(2), F.size(ps)),
                            lambda y: F.struct(
                                x.alias("u"), y.alias("v")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.*")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    e2 = e.select(F.col("u").alias("b2"), F.col("v").alias("c2"))
    e3 = e.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e.join(e2, e.v == e2.b2)
        .join(e3, (e.u == e3.a3) & (e2.c2 == e3.c3))
        .select(F.col("u").alias("a"), F.col("v").alias("b"),
                F.col("c2").alias("c"))
        .localCheckpoint(eager=False)
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    nodes = (
        tri.select(F.col("a").alias("x"))
        .union(tri.select(F.col("b").alias("x")))
        .union(tri.select(F.col("c").alias("x")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri_nodes"))
    )
    return n_edges.crossJoin(F.broadcast(n_tri)).crossJoin(
        F.broadcast(nodes)
    )


@register(
    "x211_locf_fill",
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS y
         FROM events GROUP BY 1, 2
       ), sp AS (
         SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
         FROM events
       ), days AS (
         SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                     AS DATE) AS day
         FROM sp
       ), ty AS (SELECT DISTINCT event_type FROM events),
       spine AS (SELECT ty.event_type, days.day FROM days, ty),
       j AS (
         SELECT spine.event_type, spine.day, d.y
         FROM spine LEFT JOIN d USING (event_type, day)
       ), f AS (
         SELECT event_type, day, y,
                COALESCE(last_value(y IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  0) AS fy
         FROM j
       )
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_days,
              CAST(count(y) AS BIGINT) AS n_present,
              CAST(count(*) - count(y) AS BIGINT) AS n_gaps,
              CAST(SUM(fy) AS BIGINT) AS sum_filled
       FROM f GROUP BY 1 ORDER BY 1""",
    doc="last-observation-carried-forward gap fill -- the time-series "
        "imputation x155's zero-fill can't express (a sensor that "
        "reports nothing repeats its LAST reading, it doesn't read "
        "zero): the date spine generates from the corpus' own span "
        "(1-row broadcast), crosses the tiny type dim "
        "broadcast-side, left-joins the day cells, and "
        "last(ignoreNulls) over the per-type day window carries "
        "values across gaps -- the window rides the spine (days x "
        "types), never corpus rows; pre-first-observation days "
        "COALESCE to 0 explicitly. Integer counts end to end",
)
def x211_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    sp = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    days = sp.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    ty = ev.select("event_type").distinct()
    spine = days.crossJoin(F.broadcast(ty))
    j = spine.join(d, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    f = j.select(
        "event_type",
        "day",
        "y",
        F.coalesce(
            F.last("y", ignorenulls=True).over(w), F.lit(0)
        ).alias("fy"),
    )
    return (
        f.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.count("y").cast("long").alias("n_present"),
            (F.count(F.lit(1)) - F.count("y"))
            .cast("long")
            .alias("n_gaps"),
            F.sum("fy").cast("long").alias("sum_filled"),
        )
        .orderBy("event_type")
    )


@register(
    "x212_burst_detection",
    """WITH s AS (
         SELECT user_id, epoch_us(ts) // 1000000 AS es
         FROM events
       ), b AS (
         SELECT user_id,
                count(*) OVER (
                  PARTITION BY user_id ORDER BY es
                  RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS burst
         FROM s
       ), m AS (
         SELECT user_id, CAST(MAX(burst) AS BIGINT) AS max_burst
         FROM b GROUP BY 1
       )
       SELECT max_burst, CAST(count(*) AS BIGINT) AS n_users
       FROM m GROUP BY 1 ORDER BY 1""",
    doc="rate-burst detector: each user's peak events-per-rolling-"
        "60-seconds, via a RANGE-interval window frame over integer "
        "epoch seconds -- RANGE (value-based, tie-inclusive) is the "
        "correct frame here where a ROWS frame would count a fixed "
        "number of events regardless of how long they took; both "
        "engines treat same-second peers identically by SQL "
        "semantics. The window shares the one user-key shuffle with "
        "the per-user max; the abuse-detection histogram is a final "
        "tiny groupBy. The streaming twin of this shape is x27's "
        "sliding window -- this is its exact-batch readout",
)
def x212_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 1000000"
        ).alias("es"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-59, Window.currentRow)
    )
    b = s.select(
        "user_id", F.count(F.lit(1)).over(w).alias("burst")
    )
    m = b.groupBy("user_id").agg(
        F.max("burst").cast("long").alias("max_burst")
    )
    return (
        m.groupBy("max_burst")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("max_burst")
    )


@register(
    "x213_time_grain_rollup",
    """WITH b AS (
         SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(date_trunc('month', CAST(o_orderdate AS DATE))
                     AS DATE) AS month,
                CAST(date_trunc('year', CAST(o_orderdate AS DATE))
                     AS DATE) AS yr,
                o_totalprice
         FROM orders
       )
       SELECT CASE WHEN day IS NOT NULL THEN 'day'
                   WHEN month IS NOT NULL THEN 'month'
                   ELSE 'year' END AS grain,
              COALESCE(day, month, yr) AS key_date,
              CAST(count(*) AS BIGINT) AS n_orders,
              ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                         AS DOUBLE), 2) AS revenue
       FROM b
       GROUP BY GROUPING SETS ((day), (month), (yr))
       ORDER BY grain, key_date""",
    doc="multi-granularity time rollup in ONE pass: revenue at day, "
        "month, and year grain via GROUPING SETS over precomputed "
        "calendar columns (x142's CUBE enumerates attribute "
        "combinations; this enumerates a time HIERARCHY, the "
        "materialized-rollup table serving layers precompute) -- one "
        "Expand node fans each order to its three grains, one "
        "partial/final HashAggregate pair does all three rollups, "
        "versus three scans in the naive UNION ALL. Grain labels "
        "read off the null pattern; DECIMAL-exact revenue",
)
def x213_time_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    b = orders.select(
        day.alias("day"),
        F.date_trunc("month", day).cast("date").alias("month"),
        F.date_trunc("year", day).cast("date").alias("yr"),
        "o_totalprice",
    )
    g = b.groupingSets(
        [["day"], ["month"], ["yr"]], "day", "month", "yr"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast(
                "double"
            ),
            2,
        ).alias("revenue"),
    )
    return (
        g.select(
            F.when(F.col("day").isNotNull(), F.lit("day"))
            .when(F.col("month").isNotNull(), F.lit("month"))
            .otherwise(F.lit("year"))
            .alias("grain"),
            F.coalesce("day", "month", "yr").alias("key_date"),
            "n_orders",
            "revenue",
        )
        .orderBy("grain", "key_date")
    )


@register(
    "x214_csv_corruption_audit",
    """SELECT lang,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(SUM(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_corrupt,
              CAST(SUM(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE n_chars END)
                   AS BIGINT) AS good_chars
       FROM documents GROUP BY lang ORDER BY lang""",
    doc="malformed-CSV ingestion audit -- the dirty-file contract "
        "x53 proves for JSON, proven for CSV: a deterministic "
        "corruption mask (every 13th row's numeric field becomes "
        "non-numeric -- the x53 precedent) writes through a text "
        "round-trip, reads back with a STRING schema (parse cannot "
        "fail) and quarantines via try_cast -- the ANSI-era contract "
        "where a bare cast would kill the job on the first dirty "
        "byte; the audit counts quarantined rows and sums the "
        "surviving numeric field per language, proving bad rows "
        "neither abort nor silently leak into aggregates. "
        "localCheckpoint before the temp dir vanishes",
)
def x214_csv_corruption_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    line = F.concat_ws(
        ",",
        F.col("doc_id"),
        F.col("lang"),
        # cast BEFORE the when: under ANSI, a STRING/BIGINT CASE
        # resolves to BIGINT and would cast the 'xx' literal
        F.when(F.col("doc_id") % 13 == 0, F.lit("xx")).otherwise(
            F.col("n_chars").cast("string")
        ),
    )
    tmp = tempfile.mkdtemp(prefix="x214_csv_")
    try:
        docs.select(line.alias("value")).write.mode("overwrite").text(tmp)
        back = spark.read.schema(
            "doc_id STRING, lang STRING, n_chars_raw STRING"
        ).csv(tmp)
        parsed = back.select(
            "lang",
            F.expr("try_cast(n_chars_raw AS BIGINT)").alias("n_chars"),
            F.col("n_chars_raw").isNotNull().alias("had_raw"),
        )
        out = (
            parsed.groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(
                    F.when(
                        F.col("had_raw") & F.col("n_chars").isNull(), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_corrupt"),
                F.sum(F.coalesce("n_chars", F.lit(0)))
                .cast("long")
                .alias("good_chars"),
            )
            .orderBy("lang")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@register(
    "x215_distinctive_terms",
    """WITH tok AS (
         SELECT lang, unnest(string_split(lower(text), ' ')) AS t
         FROM documents
       ), c AS (
         SELECT lang, t, CAST(count(*) AS BIGINT) AS c
         FROM tok WHERE length(t) > 0 GROUP BY 1, 2
       ), nl AS (
         SELECT lang, CAST(SUM(c) AS BIGINT) AS nl FROM c GROUP BY 1
       ), gt AS (
         SELECT t, CAST(SUM(c) AS BIGINT) AS ct FROM c GROUP BY 1
       ), nt AS (SELECT CAST(SUM(c) AS BIGINT) AS ntot FROM c),
       lo AS (
         SELECT c.lang, c.t, c.c,
                ln((c.c + 0.5) / (nl.nl - c.c + 0.5))
                - ln((gt.ct - c.c + 0.5)
                     / ((SELECT ntot FROM nt) - nl.nl
                        - (gt.ct - c.c) + 0.5)) AS lodds
         FROM c JOIN nl USING (lang) JOIN gt USING (t)
         WHERE c.c >= 20
       ), r AS (
         SELECT lang, t, c, lodds,
                row_number() OVER (PARTITION BY lang
                                   ORDER BY lodds DESC, t) AS rk
         FROM lo
       )
       SELECT lang, rk, t AS term, c AS n_occ,
              ROUND(lodds, 4) AS log_odds
       FROM r WHERE rk <= 5 ORDER BY lang, rk""",
    doc="distinctive vocabulary per language via smoothed log-odds "
        "(the corpus-comparison statistic behind 'what words "
        "characterize THIS slice' -- x19's tf-idf ranks within a "
        "document, this contrasts a partition against the REST of "
        "the corpus): per-(lang, token) counts, per-lang and global "
        "totals all reduce in partial-agg groupBys, the odds ratio "
        "assembles row-locally from exact integers (+0.5 Haldane "
        "smoothing keeps zero rest-counts finite), and the top-5 "
        "window rides the token-cardinality aggregate. The "
        "support>=20 floor drops noise terms before ranking",
)
def x215_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).filter(F.length("t") > 0)
    c = tok.groupBy("lang", "t").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    nl = c.groupBy("lang").agg(F.sum("c").cast("long").alias("nl"))
    gt = c.groupBy("t").agg(F.sum("c").cast("long").alias("ct"))
    nt = c.agg(F.sum("c").cast("long").alias("ntot"))
    lo = (
        c.filter(F.col("c") >= 20)
        .join(F.broadcast(nl), "lang")
        .join(gt, "t")
        .crossJoin(F.broadcast(nt))
        .select(
            "lang",
            "t",
            "c",
            (
                F.log(
                    (F.col("c") + 0.5)
                    / (F.col("nl") - F.col("c") + 0.5)
                )
                - F.log(
                    (F.col("ct") - F.col("c") + 0.5)
                    / (
                        F.col("ntot")
                        - F.col("nl")
                        - (F.col("ct") - F.col("c"))
                        + 0.5
                    )
                )
            ).alias("lodds"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("lodds"), "t")
    r = lo.select(
        "lang", "t", "c", "lodds", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= 5)
    return r.select(
        "lang",
        "rk",
        F.col("t").alias("term"),
        F.col("c").alias("n_occ"),
        F.round("lodds", 4).alias("log_odds"),
    ).orderBy("lang", "rk")


@register(
    "x216_merge_upsert",
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
       upd AS (
         SELECT doc_id, 'UPD:' || text AS t FROM documents
         WHERE doc_id % 10 = 0
       ), ins AS (
         SELECT doc_id + (SELECT m FROM mx) + 1 AS doc_id,
                'NEW:' || text AS t
         FROM documents WHERE doc_id % 17 = 0
       ), u AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
       merged AS (
         SELECT COALESCE(b.doc_id, u.doc_id) AS id,
                COALESCE(u.t, b.text) AS t,
                CASE WHEN b.doc_id IS NULL THEN 'insert'
                     WHEN u.doc_id IS NULL THEN 'keep'
                     ELSE 'update' END AS action
         FROM documents b FULL OUTER JOIN u ON b.doc_id = u.doc_id
       )
       SELECT action, CAST(count(*) AS BIGINT) AS n,
              CAST(bit_xor(CAST(('0x' || substr(
                     md5(id || '|' || t), 1, 15)) AS BIGINT))
                   AS BIGINT) AS state_checksum
       FROM merged GROUP BY action ORDER BY action""",
    doc="MERGE INTO semantics without a table format -- the lakehouse "
        "upsert expressed as FULL OUTER join + COALESCE (matched -> "
        "update, unmatched-source -> insert, unmatched-target -> "
        "keep), the batch path behind x167's streaming SCD1 and "
        "x50's snapshot diff: a deterministic update batch (every "
        "10th doc rewritten) and insert batch (every 17th, keys "
        "offset past max id) merge in ONE key-partitioned join, and "
        "the per-action counts plus the x187 XOR content checksum "
        "pin the ENTIRE post-merge state through the hash gate -- "
        "any lost update, duplicate insert, or clobbered keeper "
        "flips a checksum",
)
def x216_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id").alias("m"))
    upd = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.concat(F.lit("UPD:"), F.col("text")).alias("t")
    )
    ins = (
        docs.filter(F.col("doc_id") % 17 == 0)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("doc_id") + F.col("m") + 1).alias("doc_id"),
            F.concat(F.lit("NEW:"), F.col("text")).alias("t"),
        )
    )
    u = upd.unionByName(ins)
    b = docs.select(F.col("doc_id").alias("b_id"), "text")
    merged = b.join(u, b.b_id == u.doc_id, "full_outer").select(
        F.coalesce("b_id", "doc_id").alias("id"),
        F.coalesce("t", "text").alias("t"),
        F.when(F.col("b_id").isNull(), F.lit("insert"))
        .when(F.col("doc_id").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("id"), F.col("t"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (
        merged.groupBy("action")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.bit_xor(h).cast("long").alias("state_checksum"),
        )
        .orderBy("action")
    )


@register(
    "x217_bucketed_join",
    """SELECT c_mktsegment,
              CAST(count(*) AS BIGINT) AS n_orders,
              ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                         AS DOUBLE), 2) AS revenue
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY 1 ORDER BY 1""",
    doc="the co-located BUCKETED join -- the layout investment that "
        "deletes the shuffle from every future join on the key: both "
        "sides persist via write_bucketed (bucketBy + sortBy on the "
        "catalog table -- bare parquet carries no bucket metadata), "
        "then the join planner sees matching bucket specs and "
        "merge-joins bucket i to bucket i with ZERO Exchange "
        "(plan-gated in tests/test_plans.py) -- at 100 TB this is "
        "the difference between an hourly pipeline re-shuffling the "
        "fact table every run and reading it pre-partitioned. "
        "Result hash-matches the plain shuffle join oracle exactly",
)
def x217_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re as _re

    from .. import scale

    tag = _re.sub(r"[^A-Za-z0-9]+", "_", sf_dir).strip("_").lower()
    t_o, t_c = f"x217_orders_{tag}", f"x217_customer_{tag}"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    scale.write_bucketed(orders, t_o, "o_custkey")
    scale.write_bucketed(customer, t_c, "o_custkey")
    j = scale.bucketed_join(spark, t_o, t_c, "o_custkey")
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "x218_sql_udf",
    """SELECT l_returnflag,
              CAST(count(*) AS BIGINT) AS n_lines,
              ROUND(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                   * (1 + l_tax) * 100) AS BIGINT))
                    / 100.0, 2) AS net_revenue
       FROM lineitem GROUP BY 1 ORDER BY 1""",
    doc="SQL-defined scalar UDF (CREATE FUNCTION ... RETURN expr -- "
        "the catalog-resident business-logic unit Spark 4 added, NOT "
        "a Python UDF): net_cents(price, discount, tax) is declared "
        "once in SQL and inlined by Catalyst into codegen like any "
        "expression -- zero serialization cost, full pushdown, the "
        "right way to centralize a revenue formula; it returns EXACT "
        "integer cents (round happens per-row inside the UDF) so "
        "the aggregate is a long sum, order-independent. The oracle "
        "inlines the identical expression -- proving the UDF is pure "
        "sugar over the same plan",
)
def x218_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_cents(
          p DOUBLE, d DOUBLE, t DOUBLE) RETURNS BIGINT
        RETURN CAST(round(p * (1 - d) * (1 + t) * 100) AS BIGINT)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_lines,
               ROUND(SUM(net_cents(l_extendedprice, l_discount, l_tax))
                     / 100.0, 2) AS net_revenue
        FROM lineitem GROUP BY 1 ORDER BY 1
        """
    )


@register(
    "x219_variant_json",
    """WITH v AS (
         SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k
         FROM events
       )
       SELECT CAST(k // 10 AS BIGINT) AS k_decade,
              CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(k) AS BIGINT) AS k_sum
       FROM v WHERE k IS NOT NULL GROUP BY 1 ORDER BY 1""",
    doc="the VARIANT semi-structured type (Spark 4's open-ended JSON "
        "column -- parse once into a binary-encoded variant, extract "
        "typed paths without re-parsing text per access): props "
        "parses via parse_json, variant_get pulls '$.k' as a typed "
        "long, and the decade rollup is one partial-agg groupBy. "
        "Against x208's regex and x53's per-field JSON-path, variant "
        "is the scale answer when documents have HUNDREDS of paths: "
        "one parse, many cheap typed gets. Oracle reads the same "
        "path through DuckDB's JSON extraction",
)
def x219_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.expr(
        "variant_get(parse_json(props), '$.k', 'bigint')"
    ).alias("k")
    v = ev.select(k).filter(F.col("k").isNotNull())
    return (
        v.groupBy(F.expr("k div 10").alias("k_decade"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
        )
        .orderBy("k_decade")
    )


@register(
    "x220_python_datasource",
    """WITH s AS (
         SELECT i, (i * 2654435761) % 2147483647 AS v
         FROM (SELECT unnest(range(0, 100000)) AS i)
       )
       SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(v) AS BIGINT) AS v_sum,
              CAST(bit_xor(v) AS BIGINT) AS v_xor
       FROM s""",
    doc="a CUSTOM PYTHON DATA SOURCE (Spark 4's pyspark.sql.datasource "
        "API -- the extension point for reading systems Spark has no "
        "connector for, with partition planning owned by Python): "
        "the source declares 8 range partitions, each reader emits "
        "its slice of a deterministic Knuth-hash sequence, and Spark "
        "scans them as parallel tasks like any native source. The "
        "count / sum / xor triple fingerprints every emitted row, so "
        "a dropped partition, duplicated split, or wrong slice "
        "boundary fails the hash against the closed-form oracle. "
        "Pure-integer generation -- nothing engine-specific to drift",
)
def x220_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _DetRangeReader(DataSourceReader):
        def __init__(self, n_rows: int, n_parts: int):
            self.n_rows, self.n_parts = n_rows, n_parts

        def partitions(self):
            step = self.n_rows // self.n_parts
            return [
                InputPartition((p * step,
                                self.n_rows if p == self.n_parts - 1
                                else (p + 1) * step))
                for p in range(self.n_parts)
            ]

        def read(self, partition):
            lo, hi = partition.value
            for i in range(lo, hi):
                yield (i, (i * 2654435761) % 2147483647)

    class _DetRangeSource(DataSource):
        @classmethod
        def name(cls):
            return "detrange"

        def schema(self):
            return "i BIGINT, v BIGINT"

        def reader(self, schema):
            return _DetRangeReader(100000, 8)

    # idempotent per session: re-registering the same name is allowed
    spark.dataSource.register(_DetRangeSource)
    df = spark.read.format("detrange").load()
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("v_sum"),
        F.bit_xor("v").cast("long").alias("v_xor"),
    )


@register(
    "x221_group_by_all",
    """SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
              o_orderstatus,
              CAST(count(*) AS BIGINT) AS n_orders,
              ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                         AS DOUBLE), 2) AS revenue
       FROM orders GROUP BY ALL ORDER BY yr, o_orderstatus""",
    doc="GROUP BY ALL -- the infer-the-grouping-keys dialect both "
        "engines now share (every non-aggregate select item becomes "
        "a key; DuckDB coined it, Spark 4 adopted it): the SAME "
        "query text runs verbatim on both sides, which is exactly "
        "what makes analyst SQL portable off a warehouse onto the "
        "cluster. Plans identically to an explicit GROUP BY -- one "
        "partial/final HashAggregate pair; DECIMAL-exact revenue",
)
def x221_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
               o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                          AS DOUBLE), 2) AS revenue
        FROM orders GROUP BY ALL ORDER BY yr, o_orderstatus
        """
    )


@register(
    "x222_observe_metrics",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS total_cents,
              CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_large
       FROM orders WHERE o_orderstatus = 'F'""",
    doc="the OBSERVE API -- metrics piggybacked on a pass the job "
        "already makes (df.observe attaches aggregate accumulators "
        "to the plan; the scan that feeds the real workload also "
        "yields row counts / sums / distincts with ZERO extra scans "
        "-- at 100 TB the difference between data-quality telemetry "
        "that is free and telemetry that doubles the bill): the "
        "observed totals re-materialize as a 1-row DataFrame and "
        "hash-match the oracle's direct aggregation, proving the "
        "side-channel loses nothing. Integer cents keep the sum "
        "exact",
)
def x222_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    obs = Observation("x222")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("total_cents"),
        # DISTINCT aggregates are not observable (they need a shuffle;
        # observed metrics fold in the existing pass) -- conditional
        # counts are the supported shape
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0))
        .cast("long")
        .alias("n_large"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the "real" job
    row = obs.get
    return spark.createDataFrame(
        [(row["n_rows"], row["total_cents"], row["n_large"])],
        "n_rows BIGINT, total_cents BIGINT, n_large BIGINT",
    )


@register(
    "x223_try_arithmetic",
    """WITH b AS (
         SELECT CAST(l_quantity AS BIGINT) AS qty,
                CAST(round(l_discount * 100) AS BIGINT) AS d,
                CASE WHEN l_quantity >= 25 THEN 0
                     ELSE CAST(l_quantity AS BIGINT) END AS safe_div
         FROM lineitem
       )
       SELECT qty % 5 AS qty_band,
              CAST(count(*) AS BIGINT) AS n,
              ROUND(CAST(SUM(d) AS DOUBLE) / count(*), 4)
                  AS avg_disc_pct,
              CAST(SUM(CASE WHEN safe_div = 0 THEN NULL
                            ELSE d // safe_div END) AS BIGINT)
                  AS ratio_sum
       FROM b GROUP BY 1 ORDER BY 1""",
    doc="ANSI-era TRY arithmetic -- under Spark 4's default ANSI mode "
        "a division by zero ABORTS the job (the silent-null era is "
        "over), and try_divide is the explicit opt-back-in for data "
        "where zero denominators are expected: rows route through "
        "try_divide(d, safe_div) whose zero-denominator cases yield "
        "NULL and drop out of SUM by SQL semantics -- no crash, no "
        "poisoned aggregate, and the intent is visible in the query "
        "text. The oracle states the same semantics with an explicit "
        "CASE; integer division keeps both engines exact",
)
def x223_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d"),
        F.when(F.col("l_quantity") >= 25, F.lit(0).cast("long"))
        .otherwise(F.col("l_quantity").cast("long"))
        .alias("safe_div"),
    )
    return (
        b.groupBy((F.col("qty") % 5).alias("qty_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("d").cast("double") / F.count(F.lit(1)), 4)
            .alias("avg_disc_pct"),
            F.sum(
                F.expr("try_divide(d, safe_div)").cast("long")
            )
            .cast("long")
            .alias("ratio_sum"),
        )
        .orderBy("qty_band")
    )


@register(
    "x224_ks_test",
    """WITH v AS (
         SELECT CASE WHEN isodow(ts) <= 5 THEN 'wd' ELSE 'we' END AS g,
                CAST(round(value * 1e6) AS BIGINT) AS x
         FROM events
         WHERE event_type = 'purchase' AND value IS NOT NULL
       ), c AS (
         SELECT x,
                CAST(SUM(CASE WHEN g = 'wd' THEN 1 ELSE 0 END)
                     AS BIGINT) AS nwd,
                CAST(SUM(CASE WHEN g = 'we' THEN 1 ELSE 0 END)
                     AS BIGINT) AS nwe
         FROM v GROUP BY x
       ), t AS (
         SELECT CAST(SUM(nwd) AS BIGINT) AS twd,
                CAST(SUM(nwe) AS BIGINT) AS twe
         FROM c
       ), e AS (
         SELECT SUM(nwd) OVER (ORDER BY x) AS cwd,
                SUM(nwe) OVER (ORDER BY x) AS cwe
         FROM c
       )
       SELECT (SELECT twd FROM t) AS n_weekday,
              (SELECT twe FROM t) AS n_weekend,
              ROUND(MAX(abs(CAST(cwd AS DOUBLE) / (SELECT twd FROM t)
                            - CAST(cwe AS DOUBLE) / (SELECT twe FROM t))),
                    6) AS ks_stat
       FROM e""",
    doc="two-sample Kolmogorov-Smirnov statistic -- the "
        "distribution-shift detector for CONTINUOUS metrics (x148's "
        "chi-squared needs bins; KS compares whole ECDFs): weekday "
        "vs weekend purchase values reduce to per-VALUE group counts "
        "first (the aggregate-first contract -- the ECDF window "
        "rides the value-domain table, x81's documented bounded "
        "SinglePartition), both cumulative counts ride ONE window "
        "pass, and the sup-gap computes from exact integer "
        "cumulatives with two divisions per row. Micro-unit "
        "quantization makes the value key integer-exact cross-engine",
)
def x224_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    v = ev.select(
        F.when(F.weekday("ts") < 5, F.lit("wd"))
        .otherwise(F.lit("we"))
        .alias("g"),
        F.round(F.col("value") * 1e6, 0).cast("long").alias("x"),
    )
    c = v.groupBy("x").agg(
        F.sum(F.when(F.col("g") == "wd", 1).otherwise(0))
        .cast("long")
        .alias("nwd"),
        F.sum(F.when(F.col("g") == "we", 1).otherwise(0))
        .cast("long")
        .alias("nwe"),
    )
    t = c.agg(
        F.sum("nwd").cast("long").alias("twd"),
        F.sum("nwe").cast("long").alias("twe"),
    )
    w = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    e = c.select(
        F.sum("nwd").over(w).alias("cwd"),
        F.sum("nwe").over(w).alias("cwe"),
    )
    return (
        e.crossJoin(F.broadcast(t))
        .agg(
            F.max("twd").alias("n_weekday"),
            F.max("twe").alias("n_weekend"),
            F.round(
                F.max(
                    F.abs(
                        F.col("cwd").cast("double") / F.col("twd")
                        - F.col("cwe").cast("double") / F.col("twe")
                    )
                ),
                6,
            ).alias("ks_stat"),
        )
    )


@register(
    "x225_business_days",
    """WITH fs AS (
         SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS d1
         FROM lineitem GROUP BY 1
       ), j AS (
         SELECT o_orderpriority,
                datediff('day', CAST(o_orderdate AS DATE), d1) AS diff,
                isodow(CAST(o_orderdate AS DATE)) AS dow0
         FROM orders JOIN fs ON o_orderkey = l_orderkey
       ), b AS (
         SELECT o_orderpriority, diff,
                diff
                - (CASE WHEN diff > (6 - dow0 + 7) % 7
                        THEN (diff - 1 - (6 - dow0 + 7) % 7) // 7 + 1
                        ELSE 0 END)
                - (CASE WHEN diff > (7 - dow0 + 7) % 7
                        THEN (diff - 1 - (7 - dow0 + 7) % 7) // 7 + 1
                        ELSE 0 END) AS bd
         FROM j
       )
       SELECT o_orderpriority,
              CAST(count(*) AS BIGINT) AS n_orders,
              ROUND(CAST(SUM(diff) AS DOUBLE) / count(*), 4)
                  AS avg_calendar_days,
              ROUND(CAST(SUM(bd) AS DOUBLE) / count(*), 4)
                  AS avg_business_days
       FROM b GROUP BY 1 ORDER BY 1""",
    doc="BUSINESS-day shipping latency per priority -- the calendar "
        "arithmetic every SLA report actually wants (x179 counts "
        "weekends as lateness): Saturdays and Sundays inside each "
        "[order, first-ship) interval count via the closed-form "
        "occurrences-of-weekday-r formula (first-offset modulo + "
        "integer division -- row-local exact integers, NO per-day "
        "explode, which would fan the fact table up to 121x at "
        "scale); the same aggregate-first lineitem compression and "
        "big-big equi-join as x179. Both engines evaluate the "
        "identical closed form, and the calendar-day column keeps "
        "x179's semantics alongside for contrast",
)
def x225_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fs = li.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("d1")
    )
    od = F.col("o_orderdate").cast("date")
    j = orders.join(fs, orders.o_orderkey == fs.l_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("d1"), od).alias("diff"),
        # isodow: Monday=1..Sunday=7  ==  Spark weekday()+1
        (F.weekday(od) + 1).alias("dow0"),
    )

    def _count_dow(r: int):
        k0 = (F.lit(r) - F.col("dow0") + 7) % 7
        return F.when(
            F.col("diff") > k0,
            F.floor((F.col("diff") - 1 - k0) / 7) + 1,
        ).otherwise(F.lit(0))

    b = j.select(
        "o_orderpriority",
        "diff",
        (F.col("diff") - _count_dow(6) - _count_dow(7)).alias("bd"),
    )
    cnt = F.count(F.lit(1))
    return (
        b.groupBy("o_orderpriority")
        .agg(
            cnt.cast("long").alias("n_orders"),
            F.round(F.sum("diff").cast("double") / cnt, 4).alias(
                "avg_calendar_days"
            ),
            F.round(F.sum("bd").cast("double") / cnt, 4).alias(
                "avg_business_days"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "x226_incremental_agg_merge",
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2
       )
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_days,
              CAST(SUM(n) AS BIGINT) AS n_events
       FROM d GROUP BY 1 ORDER BY 1""",
    doc="incremental aggregate maintenance (the lambda-architecture "
        "merge): the corpus splits at a cutoff day into a BASE "
        "partial aggregate and a DELTA partial aggregate -- each at "
        "(type, day) grain, the grain that makes counts and "
        "day-distincts MERGEABLE -- and union + re-aggregate "
        "reconstitutes the exact full rollup, hash-equal to the "
        "direct recompute oracle. At 100 TB this is the pattern that "
        "turns a daily full-corpus scan into a delta-only scan "
        "against a stored state table; the merge itself touches "
        "state-sized rows only. Cutoff derives from the corpus' own "
        "span (broadcast 1-row, reproducible)",
)
def x226_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mn = ev.agg(
        F.date_add(F.min(F.col("ts").cast("date")), 30).alias("cutoff")
    )
    tagged = ev.crossJoin(F.broadcast(mn)).select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        (F.col("ts").cast("date") < F.col("cutoff")).alias("is_base"),
    )
    base = (
        tagged.filter(F.col("is_base"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    delta = (
        tagged.filter(~F.col("is_base"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    return (
        merged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("n").cast("long").alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "x227_percentile_scoring",
    """WITH ref AS (
         SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                CAST(count(*) AS BIGINT) AS cnt
         FROM orders
         WHERE year(CAST(o_orderdate AS DATE)) = 1995 GROUP BY 1
       ), rs AS (
         SELECT cents, SUM(cnt) OVER (ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cum
         FROM ref
       ), rt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM ref),
       tgt AS (
         SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                CAST(count(*) AS BIGINT) AS cnt
         FROM orders
         WHERE year(CAST(o_orderdate AS DATE)) = 1996 GROUP BY 1
       ), u AS (
         SELECT cents, 0 AS tag, cum, NULL AS cnt FROM rs
         UNION ALL
         SELECT cents, 1 AS tag, NULL AS cum, cnt FROM tgt
       ), c AS (
         SELECT cents, tag, cnt,
                last_value(cum IGNORE NULLS) OVER (
                  ORDER BY cents, tag
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS carry
         FROM u
       )
       SELECT CAST(least(floor(10.0 * COALESCE(carry, 0)
                         / (SELECT tot FROM rt)), 9) AS BIGINT)
                  AS ref_decile,
              CAST(SUM(cnt) AS BIGINT) AS n_orders
       FROM c WHERE tag = 1
       GROUP BY 1 ORDER BY 1""",
    doc="distribution scoring against a REFERENCE population: every "
        "1996 order scores as its percentile within the 1995 price "
        "distribution (the calibrated drift readout behind 'are this "
        "year's orders bigger?') -- both populations compress to "
        "exact-cent value domains first, the reference ECDF and the "
        "target domain merge-sort into ONE carry-forward window "
        "(ref rows sort before target at equal cents, so <= "
        "semantics are exact; the window rides the merged "
        "value-domain table, x224's bounded contract), and target "
        "counts weight the decile rollup. Integer cents + one floor "
        "division -- cross-engine exact",
)
def x227_percentile_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    yr = F.year(F.col("o_orderdate").cast("date"))
    ref = (
        orders.filter(yr == 1995)
        .groupBy(cents.alias("cents"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rs = ref.select("cents", F.sum("cnt").over(w).alias("cum"))
    rt = ref.agg(F.sum("cnt").cast("long").alias("tot"))
    tgt = (
        orders.filter(yr == 1996)
        .groupBy(cents.alias("cents"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    u = rs.select(
        "cents", F.lit(0).alias("tag"), "cum",
        F.lit(None).cast("long").alias("cnt"),
    ).unionByName(
        tgt.select(
            "cents", F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("cum"), "cnt",
        )
    )
    wc = Window.orderBy("cents", "tag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = u.select(
        "tag",
        "cnt",
        F.last("cum", ignorenulls=True).over(wc).alias("carry"),
    ).filter(F.col("tag") == 1)
    return (
        c.crossJoin(F.broadcast(rt))
        .groupBy(
            F.least(
                F.floor(
                    F.lit(10.0)
                    * F.coalesce(F.col("carry"), F.lit(0))
                    / F.col("tot")
                ),
                F.lit(9),
            )
            .cast("long")
            .alias("ref_decile")
        )
        .agg(F.sum("cnt").cast("long").alias("n_orders"))
        .orderBy("ref_decile")
    )


@register(
    "x228_embedding_dim_stats",
    """WITH e AS (
         SELECT unnest(range(0, len(embedding))) AS dim,
                CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6)
                     AS BIGINT) AS vu
         FROM embeddings
       )
       SELECT CAST(dim AS BIGINT) AS dim,
              CAST(count(*) AS BIGINT) AS n,
              CAST(MIN(vu) AS BIGINT) AS min_u,
              CAST(MAX(vu) AS BIGINT) AS max_u,
              ROUND(CAST(SUM(CAST(vu AS DECIMAL(18,0))) AS DOUBLE)
                    / (1e6 * count(*)), 6) AS mean,
              ROUND(sqrt((CAST(SUM(CAST(vu AS DECIMAL(19,0))
                                  * CAST(vu AS DECIMAL(19,0)))
                               AS DOUBLE)
                          - CAST(SUM(CAST(vu AS DECIMAL(18,0)))
                                 AS DOUBLE)
                            * SUM(CAST(vu AS DECIMAL(18,0)))
                            / count(*))
                         / count(*)) / 1e6, 6) AS std
       FROM e GROUP BY dim ORDER BY dim""",
    doc="feature-wise embedding statistics (per-DIMENSION mean/std/"
        "range -- the normalization table a feature store keeps; "
        "x63 audits per-ROW norms, this audits per-COLUMN "
        "distributions): values quantize by IEEE-exact floor into "
        "integer micro-units (no round() -- the x94 no-rounding-mode "
        "rule), position and value co-explode once, and the moment "
        "sums accumulate in DECIMAL -- float never sums across rows, "
        "so mean and std are partition-order independent and "
        "engine-identical. 64 output rows from one generator pass + "
        "one partial-agg groupBy",
)
def x228_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1e6).cast("long"),
            )
        ).alias("dim", "vu")
    )
    n = F.count(F.lit(1))
    s = F.sum(F.col("vu").cast("decimal(18,0)")).cast("double")
    s2 = F.sum(
        F.col("vu").cast("decimal(19,0)") * F.col("vu").cast("decimal(19,0)")
    ).cast("double")
    return (
        e.groupBy(F.col("dim").cast("long").alias("dim"))
        .agg(
            n.cast("long").alias("n"),
            F.min("vu").cast("long").alias("min_u"),
            F.max("vu").cast("long").alias("max_u"),
            F.round(s / (F.lit(1e6) * n), 6).alias("mean"),
            F.round(
                F.sqrt((s2 - s * F.sum(F.col("vu").cast("decimal(18,0)"))
                        .cast("double") / n) / n)
                / F.lit(1e6),
                6,
            ).alias("std"),
        )
        .orderBy("dim")
    )


@register(
    "x229_jl_projection",
    """WITH q AS (
         SELECT vec_id,
                list_transform(CAST(embedding AS DOUBLE[]),
                  x -> CAST(floor(x / (list_max(
                         list_transform(CAST(embedding AS DOUBLE[]),
                                        y -> abs(y))) / 127.0) + 0.5)
                       AS BIGINT)) AS qv
         FROM embeddings
         WHERE list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                       y -> abs(y))) > 0
       ), ex AS (
         SELECT vec_id,
                unnest(range(0, len(qv))) AS i,
                unnest(qv) AS qi
         FROM q
       ), proj AS (
         SELECT vec_id, j.j,
                CAST(SUM(qi * (CASE WHEN (i * 31 + j.j * 17) % 2 = 0
                                    THEN 1 ELSE -1 END)) AS BIGINT) AS p
         FROM ex, (SELECT unnest(range(0, 16)) AS j) j
         GROUP BY 1, 2
       ), norms AS (
         SELECT ex.vec_id,
                CAST(SUM(qi * qi) AS BIGINT) AS nq
         FROM ex GROUP BY 1
       ), pn AS (
         SELECT proj.vec_id, CAST(SUM(p * p) AS BIGINT) AS np
         FROM proj GROUP BY 1
       )
       SELECT CAST(floor(10.0 * sqrt(CAST(np AS DOUBLE) / 16.0)
                         / sqrt(CAST(nq AS DOUBLE))) AS BIGINT)
                  AS ratio_decibucket,
              CAST(count(*) AS BIGINT) AS n_vectors
       FROM pn JOIN norms USING (vec_id)
       WHERE nq > 0
       GROUP BY 1 ORDER BY 1""",
    doc="Johnson-Lindenstrauss random projection 64 -> 16 dims with a "
        "norm-preservation audit (the cheap-ANN trick: project, "
        "bucket, refine -- x08 uses hyperplane SIGNS, this keeps "
        "MAGNITUDES): vectors first quantize by x94's exact int8 "
        "floor formula so every dot product is INTEGER arithmetic, "
        "the +-1 plane matrix is a shared arithmetic parity rule "
        "((i*31 + j*17) mod 2 -- both engines compute it, no literal "
        "shipping), and the norm-ratio histogram shows the "
        "sqrt(1/16)-scaled projections concentrating around 1. "
        "Spark side is one narrow HOF pipeline per row; the oracle "
        "states the same algebra relationally via co-unnest",
)
def x229_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ev = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(ev, lambda x: F.abs(x)))
    q = (
        emb.select(F.col("vec_id"), ev.alias("e"), maxabs.alias("m"))
        .filter(F.col("m") > 0)
        .select(
            "vec_id",
            F.transform(
                F.col("e"),
                lambda x: F.floor(
                    x / (F.col("m") / F.lit(127.0)) + F.lit(0.5)
                ).cast("long"),
            ).alias("qv"),
        )
    )
    qv = F.col("qv")
    # p_j = sum_i qv[i] * sign(i, j); sign = parity of (i*31 + j*17)
    proj = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda j: F.aggregate(
            F.zip_with(
                qv,
                F.transform(
                    F.sequence(F.lit(0), F.size(qv) - 1),
                    lambda i: F.when(
                        (i * 31 + j * 17) % 2 == 0, F.lit(1)
                    ).otherwise(F.lit(-1)),
                ),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    norms = q.select(
        "vec_id",
        F.aggregate(
            qv, F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ).alias("nq"),
        F.aggregate(
            proj,
            F.lit(0).cast("long"),
            lambda acc, p: acc + p * p,
        ).alias("np"),
    ).filter(F.col("nq") > 0)
    ratio = F.sqrt(F.col("np").cast("double") / 16.0) / F.sqrt(
        F.col("nq").cast("double")
    )
    return (
        norms.groupBy(
            F.floor(F.lit(10.0) * ratio).cast("long").alias(
                "ratio_decibucket"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("ratio_decibucket")
    )


@register(
    "x230_heldout_perplexity",
    """WITH split AS (
         SELECT doc_id, lower(text) AS t,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 10 < 8 AS is_train
         FROM documents
       ), tok AS (
         SELECT doc_id, is_train,
                unnest(string_split(t, ' ')) AS w,
                unnest(range(1, len(string_split(t, ' ')) + 1)) AS pos
         FROM split
       ), big AS (
         SELECT a.doc_id, a.is_train, a.w AS w1, b.w AS w2
         FROM tok a JOIN tok b
           ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       ), c2 AS (
         SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
         FROM big WHERE is_train GROUP BY 1, 2
       ), c1 AS (
         SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1
       ), vv AS (
         SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM c2
       ), held AS (
         SELECT b.w1, b.w2 FROM big b WHERE NOT b.is_train
       ), scored AS (
         SELECT CAST(round(
                  ln((COALESCE(c2.c2, 0) + 1.0)
                     / (COALESCE(c1.c1, 0) + (SELECT v FROM vv))),
                  12) AS DECIMAL(28,12)) AS lp
         FROM held
         LEFT JOIN c2 ON held.w1 = c2.w1 AND held.w2 = c2.w2
         LEFT JOIN c1 ON held.w1 = c1.w1
       )
       SELECT CAST(count(*) AS BIGINT) AS n_bigrams,
              ROUND(CAST(-SUM(lp) AS DOUBLE) / count(*), 6)
                  AS avg_nll
       FROM scored""",
    doc="held-out language-model evaluation -- the train/test "
        "separation x52's self-scored logprob lacks (a model scored "
        "on its own training data can only flatter itself): an 80/20 "
        "md5-bucket doc split (x18's deterministic assignment), "
        "add-one-smoothed bigram model FROM TRAIN ONLY (context "
        "counts derived from the bigram table so conditionals "
        "normalize exactly; unseen contexts fall back to the uniform "
        "1/V floor), held-out bigrams score through two left joins, "
        "and per-token log-losses round to 12 dp then sum in "
        "DECIMAL(28,12) -- the x37/x88 determinism recipe, no float "
        "accumulation. One number out: held-out cross-entropy",
)
def x230_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_train = (
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long"),
            F.lit(10),
        )
        < 8
    )
    tk = docs.select(
        "doc_id",
        is_train.alias("is_train"),
        F.split(F.lower("text"), " ").alias("toks"),
    )
    big = tk.select(
        "is_train",
        F.explode(
            F.filter(
                F.zip_with(
                    F.col("toks"),
                    F.slice(
                        F.concat(
                            F.col("toks"), F.array(F.lit(None))
                        ),
                        2,
                        F.size("toks"),
                    ),
                    lambda a, b: F.struct(
                        a.alias("w1"), b.alias("w2")
                    ),
                ),
                lambda s: s["w2"].isNotNull(),
            )
        ).alias("bg"),
    ).select("is_train", "bg.w1", "bg.w2")
    c2 = (
        big.filter(F.col("is_train"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    vv = c2.agg(F.countDistinct("w2").cast("long").alias("v"))
    held = big.filter(~F.col("is_train")).select("w1", "w2")
    scored = (
        held.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vv))
        .select(
            F.round(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                ),
                12,
            )
            .cast("decimal(28,12)")
            .alias("lp")
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(
            (-F.sum("lp")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_nll"),
    )


@register(
    "x231_pipe_syntax",
    """SELECT o_orderpriority,
              CAST(count(*) AS BIGINT) AS n_orders,
              ROUND(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    / 100.0, 2) AS revenue
       FROM orders
       WHERE o_orderstatus = 'O'
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority""",
    doc="SQL PIPE syntax (Spark 4's |> operator chain -- queries read "
        "top-to-bottom in execution order, the composability fix "
        "GoogleSQL proposed and Spark adopted): FROM |> WHERE |> "
        "EXTEND |> AGGREGATE ... GROUP BY |> ORDER BY, submitted "
        "verbatim. The parser lowers pipes to exactly the relational "
        "plan the classic form produces (the oracle IS the classic "
        "form), so the surface is free -- same Catalyst plan, same "
        "pushdown, same codegen; exact integer cents keep the "
        "aggregate order-independent",
)
def x231_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> EXTEND CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_orders,
                     ROUND(SUM(cents) / 100.0, 2) AS revenue
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


@register(
    "x232_ht_estimator",
    """WITH s AS (
         SELECT event_type,
                CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                     1, 8)) AS BIGINT) % 10 = 0
                    AS in_sample
         FROM events
       )
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS true_n,
              CAST(10 * SUM(CASE WHEN in_sample THEN 1 ELSE 0 END)
                   AS BIGINT) AS est_n,
              ROUND(abs(10.0 * SUM(CASE WHEN in_sample THEN 1 ELSE 0 END)
                        - count(*)) / count(*), 4) AS rel_err
       FROM s GROUP BY 1 ORDER BY 1""",
    doc="Horvitz-Thompson estimation QA: a deterministic 10% "
        "md5-bucket sample (x18's assignment -- reproducible, "
        "join-stable, unlike TABLESAMPLE) inflates by the inverse "
        "inclusion probability and the entry reports estimate vs "
        "truth per type -- the calibration table that justifies "
        "running the NEXT query on the sample instead of the corpus "
        "(at 100 TB, the 10x-90x cost saving is only defensible "
        "with this error sheet next to it). Exact integer counts; "
        "one division per row at the end",
)
def x232_ht_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    in_sample = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.col("event_id").cast("string")), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(10),
        )
        == 0
    )
    s = ev.select("event_type", in_sample.alias("in_sample"))
    n_s = F.sum(F.when(F.col("in_sample"), 1).otherwise(0))
    cnt = F.count(F.lit(1))
    return (
        s.groupBy("event_type")
        .agg(
            cnt.cast("long").alias("true_n"),
            (F.lit(10) * n_s).cast("long").alias("est_n"),
            F.round(
                F.abs(F.lit(10.0) * n_s - cnt) / cnt, 4
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


@register(
    "x233_stream_multibatch",
    """WITH b AS (
         SELECT user_id % 4 AS bucket, CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1
       )
       SELECT CAST(count(*) AS BIGINT) AS n_batches,
              CAST(SUM(n) AS BIGINT) AS total_rows,
              string_agg(CAST(n AS VARCHAR), '|' ORDER BY n, bucket)
                  AS batch_sizes
       FROM b""",
    doc="bounded-backlog micro-batch pacing: the corpus lands as four "
        "single-partition files, a file-source stream with "
        "maxFilesPerTrigger=1 under Trigger.AvailableNow drains them "
        "as FOUR paced micro-batches (the backpressure contract that "
        "keeps a 100 TB backlog from entering one giant batch when a "
        "stream restarts), and a foreachBatch sink records each "
        "batch's row count -- batch count, total, and the sorted "
        "size multiset all hash against the per-file oracle; a "
        "single-batch drain or a skipped file flips them. The "
        "order-insensitive serialization absorbs nondeterministic "
        "file pickup order",
)
def x233_stream_multibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="x233_files_")
    ckpt = tempfile.mkdtemp(prefix="x233_ckpt_")
    counts: list[int] = []
    try:
        for b in range(4):
            (
                ev.filter(F.col("user_id") % 4 == b)
                .coalesce(1)
                .write.mode("append")
                .parquet(tmp)
            )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )

        def sink(batch_df, batch_id):
            n = batch_df.count()
            if n:
                counts.append(n)

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("x233 stream drain timed out")
        out = spark.createDataFrame(
            [
                (
                    len(counts),
                    sum(counts),
                    "|".join(str(c) for c in sorted(counts)),
                )
            ],
            "n_batches BIGINT, total_rows BIGINT, batch_sizes STRING",
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


@register(
    "x234_seq_predictability",
    """WITH s AS (
         SELECT user_id, event_type AS nxt,
                lag(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS p1,
                lag(event_type, 2) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS p2
         FROM events
       ), tri AS (
         SELECT p2, p1, nxt, CAST(count(*) AS BIGINT) AS c
         FROM s WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
       ), ctx AS (
         SELECT p2, p1, CAST(SUM(c) AS BIGINT) AS tot
         FROM tri GROUP BY 1, 2
       ), bi AS (
         SELECT p1, nxt, CAST(count(*) AS BIGINT) AS c
         FROM s WHERE p1 IS NOT NULL GROUP BY 1, 2
       ), bctx AS (
         SELECT p1, CAST(SUM(c) AS BIGINT) AS tot FROM bi GROUP BY 1
       ), h3 AS (
         SELECT CAST(SUM(tri.c) AS BIGINT) AS n,
                SUM(tri.c * CAST(round(ln(CAST(tri.c AS DOUBLE)
                                          / ctx.tot), 12)
                                 AS DECIMAL(28,12))) AS s
         FROM tri JOIN ctx USING (p2, p1)
       ), h2 AS (
         SELECT CAST(SUM(bi.c) AS BIGINT) AS n,
                SUM(bi.c * CAST(round(ln(CAST(bi.c AS DOUBLE)
                                         / bctx.tot), 12)
                                AS DECIMAL(28,12))) AS s
         FROM bi JOIN bctx USING (p1)
       )
       SELECT h3.n AS n_trigrams,
              ROUND(CAST(-h2.s AS DOUBLE) / h2.n, 6) AS h_given_1,
              ROUND(CAST(-h3.s AS DOUBLE) / h3.n, 6) AS h_given_2,
              ROUND(CAST(-h2.s AS DOUBLE) / h2.n
                    - CAST(-h3.s AS DOUBLE) / h3.n, 6)
                  AS predictability_gain
       FROM h3, h2""",
    doc="behavioral predictability: conditional entropy of the next "
        "event given one vs two steps of history (how much does a "
        "longer context actually buy a sequence model -- x96/x107 "
        "count the transitions, this prices them in nats): lag "
        "windows share one user-key shuffle, trigram/bigram count "
        "tables reduce to context-cardinality, and each entropy term "
        "is count x round(ln(c/tot), 12) accumulated in "
        "DECIMAL(28,12) -- the x37/x88 recipe, integer-weighted so "
        "no float ever sums across rows. The gain H(n|1) - H(n|2) "
        ">= 0 is the information a second-order model captures",
)
def x234_seq_predictability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("nxt"),
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    tri = (
        s.filter(F.col("p2").isNotNull())
        .groupBy("p2", "p1", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ctx = tri.groupBy("p2", "p1").agg(
        F.sum("c").cast("long").alias("tot")
    )
    bi = (
        s.filter(F.col("p1").isNotNull())
        .groupBy("p1", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bctx = bi.groupBy("p1").agg(F.sum("c").cast("long").alias("tot"))

    def entropy_sum(counts, totals, keys):
        term = (
            F.col("c")
            * F.round(
                F.log(F.col("c").cast("double") / F.col("tot")), 12
            ).cast("decimal(28,12)")
        )
        return counts.join(F.broadcast(totals), keys).agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(term).alias("s"),
        )

    h3 = entropy_sum(tri, ctx, ["p2", "p1"]).select(
        F.col("n").alias("n3"), F.col("s").alias("s3")
    )
    h2 = entropy_sum(bi, bctx, ["p1"]).select(
        F.col("n").alias("n2"), F.col("s").alias("s2")
    )
    g1 = (-F.col("s2")).cast("double") / F.col("n2")
    g2 = (-F.col("s3")).cast("double") / F.col("n3")
    return h3.crossJoin(F.broadcast(h2)).select(
        F.col("n3").alias("n_trigrams"),
        F.round(g1, 6).alias("h_given_1"),
        F.round(g2, 6).alias("h_given_2"),
        F.round(g1 - g2, 6).alias("predictability_gain"),
    )


@register(
    "x235_join_hints",
    """SELECT c_mktsegment,
              CAST(count(*) AS BIGINT) AS n_orders,
              ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                         AS DOUBLE), 2) AS revenue
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY 1 ORDER BY 1""",
    doc="the JOIN STRATEGY HINT surface: the same rollup forced "
        "through a SHUFFLE_HASH hint -- the escape hatch when the "
        "planner's default (broadcast under threshold, else "
        "sort-merge) is wrong for a workload the operator knows "
        "better (x104's PageRank refuses broadcast with exactly this "
        "hint; a hash join skips both sort phases when one side fits "
        "a task's memory). The hint changes the PHYSICAL strategy "
        "only -- the hash gate proves the result identical to the "
        "unhinted oracle, and the plan gate in tests/test_plans.py "
        "proves a ShuffledHashJoin was actually chosen",
)
def x235_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = orders.join(
        customer.hint("shuffle_hash"),
        orders.o_custkey == customer.c_custkey,
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "x236_bag_difference",
    """WITH c AS (
         SELECT source, md5(text) AS h, CAST(count(*) AS BIGINT) AS c
         FROM documents GROUP BY 1, 2
       )
       SELECT source,
              CAST(SUM(c - 1) AS BIGINT) AS n_dup_copies,
              CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dup_groups
       FROM c GROUP BY source ORDER BY source""",
    doc="EXCEPT ALL -- bag semantics where x202 proved set semantics: "
        "subtracting the DISTINCT projection from the full multiset "
        "leaves exactly the redundant copies (c-1 per duplicate "
        "group), the rows a dedup pass would delete -- as an "
        "operator expression, not a count formula; Spark plans "
        "exceptAll as a counted anti-form that never materializes "
        "pairs. The per-source redundancy report is the x60 dup-rate "
        "readout derived through the set-operator algebra instead "
        "of a groupBy-having; oracle states the c-1 identity "
        "directly",
)
def x236_bag_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select("source", F.md5("text").alias("h"))
    excess = a.exceptAll(a.distinct())
    dup_copies = excess.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_copies")
    )
    dup_groups = (
        excess.distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_groups"))
    )
    base = docs.select("source").distinct()
    return (
        base.join(F.broadcast(dup_copies), "source", "left")
        .join(F.broadcast(dup_groups), "source", "left")
        .select(
            "source",
            F.coalesce("n_dup_copies", F.lit(0))
            .cast("long")
            .alias("n_dup_copies"),
            F.coalesce("n_dup_groups", F.lit(0))
            .cast("long")
            .alias("n_dup_groups"),
        )
        .orderBy("source")
    )


@register(
    "x237_filter_clause",
    """SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_all,
              CAST(count(*) FILTER (WHERE value > 50) AS BIGINT)
                  AS n_high,
              CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT)
                  AS n_null,
              CAST(SUM(CAST(round(value * 100) AS BIGINT))
                   FILTER (WHERE value > 50) AS BIGINT)
                  AS high_cents
       FROM events GROUP BY event_type ORDER BY event_type""",
    doc="the aggregate FILTER clause -- per-aggregate predicates in "
        "ONE pass over the data (the standard-SQL form of the "
        "CASE-WHEN-inside-SUM idiom used across this repo; both "
        "engines parse it natively, so the text ships verbatim): "
        "four differently-filtered aggregates share one scan and one "
        "partial/final HashAggregate pair -- at 100 TB the "
        "alternative UNION of filtered subqueries would re-scan the "
        "fact table per metric. Exact integer cents under the "
        "filtered SUM",
)
def x237_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_all,
               CAST(count(*) FILTER (WHERE value > 50) AS BIGINT)
                   AS n_high,
               CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT)
                   AS n_null,
               CAST(SUM(CAST(round(value * 100) AS BIGINT))
                    FILTER (WHERE value > 50) AS BIGINT)
                   AS high_cents
        FROM events GROUP BY event_type ORDER BY event_type
        """
    )


@register(
    "x238_values_dim",
    """SELECT z.zone,
              CAST(count(*) AS BIGINT) AS n_customers,
              CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                   AS BIGINT) AS balance_cents
       FROM customer
       JOIN (VALUES (0, 'Z0'), (1, 'Z1'), (2, 'Z2'), (3, 'Z3'),
                    (4, 'Z4')) AS z(nk, zone)
         ON c_nationkey % 5 = z.nk
       GROUP BY z.zone ORDER BY z.zone""",
    doc="inline VALUES dimension -- the zero-infrastructure lookup "
        "table (a mapping that lives in the query text instead of a "
        "file or catalog table; the pattern for enum decodes, region "
        "groupings, config constants): both engines accept the same "
        "VALUES(...) AS t(cols) derived-table syntax, Spark folds "
        "the literal relation into a LocalRelation and broadcasts "
        "it by construction -- a join against it can never shuffle "
        "the fact side on the dim's account. Exact cents under the "
        "rollup",
)
def x238_values_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer"
    )
    return spark.sql(
        """
        SELECT z.zone,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                    AS BIGINT) AS balance_cents
        FROM customer
        JOIN (VALUES (0, 'Z0'), (1, 'Z1'), (2, 'Z2'), (3, 'Z3'),
                     (4, 'Z4')) AS z(nk, zone)
          ON c_nationkey % 5 = z.nk
        GROUP BY z.zone ORDER BY z.zone
        """
    )


@register(
    "x239_recursive_tree_depth",
    """WITH RECURSIVE w AS (
         SELECT doc_id AS id, doc_id AS cur, 0 AS depth
         FROM documents WHERE doc_id >= 1
         UNION ALL
         SELECT id, cur // 2, depth + 1 FROM w WHERE cur > 1
       )
       SELECT CAST(depth AS BIGINT) AS depth,
              CAST(count(*) AS BIGINT) AS n_nodes,
              CAST(SUM(id) AS BIGINT) AS id_checksum
       FROM w WHERE cur = 1
       GROUP BY 1 ORDER BY 1""",
    doc="recursive CTE over a DATA-SIZED hierarchy -- each doc walks "
        "the implicit binary tree id -> id/2 to the root (q42 "
        "recurses over a generator; this recurses over corpus rows, "
        "the org-chart/BOM/thread-ancestry shape): every iteration "
        "is one set-based step over the surviving frontier (rows "
        "halve each round, O(log max_id) rounds -- the same "
        "fixed-point shape as x24's label propagation, driven by "
        "the engine's own WITH RECURSIVE execution under the pinned "
        "cteRecursionLevelLimit), and the depth histogram + "
        "id-checksum pin every walk's termination point. Spark and "
        "DuckDB differ only in integer-division spelling (div vs //)",
)
def x239_recursive_tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(
        """
        WITH RECURSIVE w AS (
          SELECT doc_id AS id, doc_id AS cur, 0 AS depth
          FROM documents WHERE doc_id >= 1
          UNION ALL
          SELECT id, cur div 2, depth + 1 FROM w WHERE cur > 1
        )
        SELECT CAST(depth AS BIGINT) AS depth,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(SUM(id) AS BIGINT) AS id_checksum
        FROM w WHERE cur = 1
        GROUP BY 1 ORDER BY 1
        """
    )


@register(
    "x240_debounce",
    """WITH s AS (
         SELECT event_type,
                epoch_us(ts) - lag(epoch_us(ts)) OVER (
                  PARTITION BY user_id, event_type
                  ORDER BY ts, event_id) AS gap_us
         FROM events
       )
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_total,
              CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              CAST(SUM(CASE WHEN gap_us IS NOT NULL
                             AND gap_us <= 1000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
       FROM s GROUP BY 1 ORDER BY 1""",
    doc="telemetry debounce: collapse same-user same-type events "
        "arriving within one second of the previous one (the "
        "double-click / retry-storm filter that runs before any "
        "behavioral analysis; x95 dedups identical CONTENT, this "
        "dedups identical INTENT in time): one lag over the "
        "(user, type)-key window -- shared shuffle with nothing "
        "else needed -- and exact integer microsecond gaps decide "
        "keep vs drop; the per-type report sizes how much of the "
        "event stream is mechanical repetition. Chained bursts "
        "keep their first event per >1s gap by the lag-vs-anchor "
        "definition, identical in both engines",
)
def x240_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    s = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    )
    kept = F.col("gap_us").isNull() | (F.col("gap_us") > 1_000_000)
    return (
        s.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(~kept, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
        )
        .orderBy("event_type")
    )


@register(
    "x241_revenue_bridge",
    """WITH y AS (
         SELECT c_mktsegment,
                year(CAST(o_orderdate AS DATE)) AS yr,
                CAST(count(*) AS BIGINT) AS vol,
                CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
         GROUP BY 1, 2
       ), p AS (
         SELECT c_mktsegment,
                MAX(CASE WHEN yr = 1995 THEN vol END) AS vol0,
                MAX(CASE WHEN yr = 1995 THEN cents END) AS r0,
                MAX(CASE WHEN yr = 1996 THEN vol END) AS vol1,
                MAX(CASE WHEN yr = 1996 THEN cents END) AS r1
         FROM y GROUP BY 1
       )
       SELECT c_mktsegment,
              ROUND((r1 - r0) / 100.0, 2) AS revenue_delta,
              ROUND((vol1 - vol0) * (CAST(r0 AS DOUBLE) / vol0)
                    / 100.0, 2) AS volume_effect,
              ROUND((r1 - r0) / 100.0
                    - (vol1 - vol0) * (CAST(r0 AS DOUBLE) / vol0)
                      / 100.0, 2) AS price_effect
       FROM p ORDER BY c_mktsegment""",
    doc="revenue bridge (price/volume decomposition): the YoY revenue "
        "delta per segment splits into 'more orders at last year's "
        "average ticket' (volume effect) and the residual ticket-"
        "size change (price effect) -- the finance-review "
        "decomposition x81's growth rates can't explain. One "
        "broadcast-dim join + one (segment, year) partial-agg "
        "groupBy reduce the corpus; the two-year pivot is a "
        "MAX-CASE over a segment-cardinality table; arithmetic runs "
        "on exact integer cents with doubles only in the final "
        "three expressions -- identical order of operations on both "
        "engines",
)
def x241_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    yr = F.year(F.col("o_orderdate").cast("date"))
    y = (
        orders.filter(yr.isin(1995, 1996))
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", yr.alias("yr"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("vol"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    p = y.groupBy("c_mktsegment").agg(
        F.max(F.when(F.col("yr") == 1995, F.col("vol"))).alias("vol0"),
        F.max(F.when(F.col("yr") == 1995, F.col("cents"))).alias("r0"),
        F.max(F.when(F.col("yr") == 1996, F.col("vol"))).alias("vol1"),
        F.max(F.when(F.col("yr") == 1996, F.col("cents"))).alias("r1"),
    )
    vol_eff = (
        (F.col("vol1") - F.col("vol0"))
        * (F.col("r0").cast("double") / F.col("vol0"))
        / F.lit(100.0)
    )
    delta = (F.col("r1") - F.col("r0")) / F.lit(100.0)
    return p.select(
        "c_mktsegment",
        F.round(delta, 2).alias("revenue_delta"),
        F.round(vol_eff, 2).alias("volume_effect"),
        F.round(delta - vol_eff, 2).alias("price_effect"),
    ).orderBy("c_mktsegment")


@register(
    "x242_map_hofs",
    """WITH g AS (
         SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
         FROM documents GROUP BY 1, 2
       ), t AS (
         SELECT source, CAST(SUM(cnt) AS BIGINT) AS total FROM g
         GROUP BY 1
       ), pm AS (
         SELECT g.source, g.lang,
                CAST((g.cnt * 1000) // t.total AS BIGINT) AS permille
         FROM g JOIN t USING (source)
       )
       SELECT source,
              CAST(count(*) AS BIGINT) AS n_langs,
              CAST(SUM(CASE WHEN permille >= 50 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_major,
              '{' || COALESCE(string_agg(
                       '"' || lang || '":' || permille, ','
                       ORDER BY lang)
                       FILTER (WHERE permille >= 50), '')
                  || '}' AS majors
       FROM pm GROUP BY source ORDER BY source""",
    doc="MAP higher-order functions -- transform_values and map_filter "
        "operating on a real nested column (x196 builds the map; this "
        "entry COMPUTES on it without ever exploding back to rows): "
        "per-source language counts become a map, transform_values "
        "rescales every value to integer permille of the source total "
        "(exact -- integer division, no float shares), map_filter "
        "keeps the >=5% major languages, and the filtered map "
        "serializes canonically through the lang-sorted entry order. "
        "Row-local map algebra -- the nested-data path that avoids "
        "explode/groupBy round-trips at 100 TB",
)
def x242_map_hofs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    per_src = g.groupBy("source").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("lang", "cnt")))
        ).alias("m"),
        F.sum("cnt").cast("long").alias("total"),
    )
    pm = per_src.select(
        "source",
        # integer permille of the source total, computed in place on
        # the map values -- exact integer floor division
        F.transform_values(
            F.col("m"),
            lambda k, v: F.floor((v * 1000) / F.col("total")).cast(
                "long"
            ),
        ).alias("permille"),
    )
    majors = pm.select(
        "source",
        F.size("permille").cast("long").alias("n_langs"),
        F.map_filter(
            F.col("permille"), lambda k, v: v >= 50
        ).alias("majors_map"),
    )
    return majors.select(
        "source",
        "n_langs",
        F.size("majors_map").cast("long").alias("n_major"),
        F.to_json("majors_map").alias("majors"),
    ).orderBy("source")


@register(
    "x243_kcore",
    """WITH items AS MATERIALIZED (
         SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
       ), p AS MATERIALIZED (
         SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS n
         FROM items a JOIN items b USING (l_orderkey)
         WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2
       ), e0 AS MATERIALIZED (SELECT u, v FROM p WHERE n >= 2),
       d1 AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
              GROUP BY 1),
       k1 AS MATERIALIZED (SELECT node FROM d1 WHERE deg >= 2),
       e1 AS MATERIALIZED (SELECT u, v FROM e0
              WHERE u IN (SELECT node FROM k1)
                AND v IN (SELECT node FROM k1)),
       d2 AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1)
              GROUP BY 1),
       k2 AS MATERIALIZED (SELECT node FROM d2 WHERE deg >= 2),
       e2 AS MATERIALIZED (SELECT u, v FROM e1
              WHERE u IN (SELECT node FROM k2)
                AND v IN (SELECT node FROM k2)),
       d3 AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2)
              GROUP BY 1),
       k3 AS MATERIALIZED (SELECT node FROM d3 WHERE deg >= 2),
       e3 AS MATERIALIZED (SELECT u, v FROM e2
              WHERE u IN (SELECT node FROM k3)
                AND v IN (SELECT node FROM k3)),
       d4 AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
              GROUP BY 1),
       k4 AS MATERIALIZED (SELECT node FROM d4 WHERE deg >= 2),
       e4 AS MATERIALIZED (SELECT u, v FROM e3
              WHERE u IN (SELECT node FROM k4)
                AND v IN (SELECT node FROM k4))
       SELECT 1 AS round,
              (SELECT CAST(count(*) AS BIGINT) FROM k1) AS n_nodes,
              (SELECT CAST(count(*) AS BIGINT) FROM e1) AS n_edges
       UNION ALL SELECT 2, (SELECT count(*) FROM k2),
                           (SELECT count(*) FROM e2)
       UNION ALL SELECT 3, (SELECT count(*) FROM k3),
                           (SELECT count(*) FROM e3)
       UNION ALL SELECT 4, (SELECT count(*) FROM k4),
                           (SELECT count(*) FROM e4)
       ORDER BY round""",
    doc="2-core peeling on the support>=2 co-purchase graph -- the "
        "degeneracy pruning that strips hairball fringe (degree-1 "
        "tendrils) before community/triangle analysis, completing "
        "the graph suite (x24 components, x68 degrees, x104 ranks, "
        "x150 BFS, x210 triangles): four FIXED peeling rounds, each "
        "one degree count (edge-sized union + groupBy) and two "
        "LEFT SEMI joins back onto the shrinking edge list -- rows "
        "only ever decrease, the same monotone-frontier shape as "
        "BFS, and the per-round (nodes, edges) trajectory is the "
        "output so convergence is VISIBLE in the hash. Fixed depth "
        "keeps lineage bounded and the oracle replayable as "
        "unrolled CTEs (x104's contract)",
)
def x243_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    buckets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    ps = F.col("parts")
    e = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        ps,
                        lambda x, i: F.transform(
                            F.slice(ps, i + F.lit(2), F.size(ps)),
                            lambda y: F.struct(
                                x.alias("u"), y.alias("v")
                            ),
                        ),
                    )
                )
            ).alias("pr")
        )
        .select("pr.*")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    out_rows = []
    for rnd in range(1, 5):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= 2).select("node")
        e = (
            e.join(
                keep.select(F.col("node").alias("u")), "u", "leftsemi"
            )
            .join(
                keep.select(F.col("node").alias("v")), "v", "leftsemi"
            )
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        nk = keep.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        ne = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        out_rows.append(
            nk.crossJoin(F.broadcast(ne)).select(
                F.lit(rnd).cast("long").alias("round"),
                "n_nodes",
                "n_edges",
            )
        )
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("round")


@register(
    "x244_dedup_cascade",
    """WITH s0 AS (SELECT doc_id, text FROM documents),
       e AS (
         SELECT md5(lower(text)) AS h, MIN(doc_id) AS keep_id
         FROM s0 GROUP BY 1
       ), s1 AS (
         SELECT s0.doc_id, s0.text FROM s0
         JOIN e ON s0.doc_id = e.keep_id
       ), f AS (
         SELECT md5(array_to_string(list_sort(list_distinct(
                  string_split(lower(text), ' '))), ' ')) AS fp,
                MIN(doc_id) AS keep_id
         FROM s1 GROUP BY 1
       ), s2 AS (
         SELECT s1.doc_id, s1.text FROM s1
         JOIN f ON s1.doc_id = f.keep_id
       ), sh AS (SELECT doc_id, concat(CASE WHEN s0 >= 0 THEN '1' ELSE '0' END, CASE WHEN s1 >= 0 THEN '1' ELSE '0' END, CASE WHEN s2 >= 0 THEN '1' ELSE '0' END, CASE WHEN s3 >= 0 THEN '1' ELSE '0' END, CASE WHEN s4 >= 0 THEN '1' ELSE '0' END, CASE WHEN s5 >= 0 THEN '1' ELSE '0' END, CASE WHEN s6 >= 0 THEN '1' ELSE '0' END, CASE WHEN s7 >= 0 THEN '1' ELSE '0' END, CASE WHEN s8 >= 0 THEN '1' ELSE '0' END, CASE WHEN s9 >= 0 THEN '1' ELSE '0' END, CASE WHEN s10 >= 0 THEN '1' ELSE '0' END, CASE WHEN s11 >= 0 THEN '1' ELSE '0' END, CASE WHEN s12 >= 0 THEN '1' ELSE '0' END, CASE WHEN s13 >= 0 THEN '1' ELSE '0' END, CASE WHEN s14 >= 0 THEN '1' ELSE '0' END, CASE WHEN s15 >= 0 THEN '1' ELSE '0' END, CASE WHEN s16 >= 0 THEN '1' ELSE '0' END, CASE WHEN s17 >= 0 THEN '1' ELSE '0' END, CASE WHEN s18 >= 0 THEN '1' ELSE '0' END, CASE WHEN s19 >= 0 THEN '1' ELSE '0' END, CASE WHEN s20 >= 0 THEN '1' ELSE '0' END, CASE WHEN s21 >= 0 THEN '1' ELSE '0' END, CASE WHEN s22 >= 0 THEN '1' ELSE '0' END, CASE WHEN s23 >= 0 THEN '1' ELSE '0' END, CASE WHEN s24 >= 0 THEN '1' ELSE '0' END, CASE WHEN s25 >= 0 THEN '1' ELSE '0' END, CASE WHEN s26 >= 0 THEN '1' ELSE '0' END, CASE WHEN s27 >= 0 THEN '1' ELSE '0' END, CASE WHEN s28 >= 0 THEN '1' ELSE '0' END, CASE WHEN s29 >= 0 THEN '1' ELSE '0' END, CASE WHEN s30 >= 0 THEN '1' ELSE '0' END, CASE WHEN s31 >= 0 THEN '1' ELSE '0' END, CASE WHEN s32 >= 0 THEN '1' ELSE '0' END, CASE WHEN s33 >= 0 THEN '1' ELSE '0' END, CASE WHEN s34 >= 0 THEN '1' ELSE '0' END, CASE WHEN s35 >= 0 THEN '1' ELSE '0' END, CASE WHEN s36 >= 0 THEN '1' ELSE '0' END, CASE WHEN s37 >= 0 THEN '1' ELSE '0' END, CASE WHEN s38 >= 0 THEN '1' ELSE '0' END, CASE WHEN s39 >= 0 THEN '1' ELSE '0' END, CASE WHEN s40 >= 0 THEN '1' ELSE '0' END, CASE WHEN s41 >= 0 THEN '1' ELSE '0' END, CASE WHEN s42 >= 0 THEN '1' ELSE '0' END, CASE WHEN s43 >= 0 THEN '1' ELSE '0' END, CASE WHEN s44 >= 0 THEN '1' ELSE '0' END, CASE WHEN s45 >= 0 THEN '1' ELSE '0' END, CASE WHEN s46 >= 0 THEN '1' ELSE '0' END, CASE WHEN s47 >= 0 THEN '1' ELSE '0' END, CASE WHEN s48 >= 0 THEN '1' ELSE '0' END, CASE WHEN s49 >= 0 THEN '1' ELSE '0' END, CASE WHEN s50 >= 0 THEN '1' ELSE '0' END, CASE WHEN s51 >= 0 THEN '1' ELSE '0' END, CASE WHEN s52 >= 0 THEN '1' ELSE '0' END, CASE WHEN s53 >= 0 THEN '1' ELSE '0' END, CASE WHEN s54 >= 0 THEN '1' ELSE '0' END, CASE WHEN s55 >= 0 THEN '1' ELSE '0' END, CASE WHEN s56 >= 0 THEN '1' ELSE '0' END, CASE WHEN s57 >= 0 THEN '1' ELSE '0' END, CASE WHEN s58 >= 0 THEN '1' ELSE '0' END, CASE WHEN s59 >= 0 THEN '1' ELSE '0' END, CASE WHEN s60 >= 0 THEN '1' ELSE '0' END, CASE WHEN s61 >= 0 THEN '1' ELSE '0' END, CASE WHEN s62 >= 0 THEN '1' ELSE '0' END, CASE WHEN s63 >= 0 THEN '1' ELSE '0' END) AS simhash FROM (SELECT doc_id, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s0, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s1, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s2, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s3, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s4, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s5, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s6, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s7, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s8, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s9, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s10, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s11, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s12, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s13, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s14, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s15, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 5, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s16, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 5, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s17, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 5, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s18, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 5, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s19, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 6, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s20, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 6, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s21, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 6, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s22, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 6, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s23, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 7, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s24, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 7, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s25, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 7, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s26, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 7, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s27, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 8, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s28, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 8, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s29, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 8, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s30, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 8, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s31, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 9, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s32, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 9, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s33, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 9, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s34, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 9, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s35, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 10, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s36, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 10, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s37, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 10, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s38, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 10, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s39, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 11, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s40, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 11, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s41, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 11, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s42, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 11, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s43, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 12, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s44, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 12, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s45, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 12, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s46, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 12, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s47, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 13, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s48, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 13, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s49, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 13, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s50, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 13, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s51, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 14, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s52, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 14, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s53, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 14, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s54, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 14, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s55, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 15, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s56, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 15, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s57, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 15, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s58, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 15, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s59, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 16, 1)) - 1) IN (8, 9, 10, 11, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s60, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 16, 1)) - 1) IN (4, 5, 6, 7, 12, 13, 14, 15) THEN 1 ELSE -1 END) AS s61, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 16, 1)) - 1) IN (2, 3, 6, 7, 10, 11, 14, 15) THEN 1 ELSE -1 END) AS s62, SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), 16, 1)) - 1) IN (1, 3, 5, 7, 9, 11, 13, 15) THEN 1 ELSE -1 END) AS s63 FROM (SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok FROM s2) GROUP BY doc_id) ORDER BY doc_id),
       n0 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM s0),
       n1 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM e),
       n2 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM f),
       n3 AS (SELECT CAST(count(DISTINCT simhash) AS BIGINT) AS c
              FROM sh)
       SELECT '1_exact' AS stage,
              (SELECT c FROM n0) AS n_in,
              (SELECT c FROM n0) - (SELECT c FROM n1) AS n_removed,
              (SELECT c FROM n1) AS n_out
       UNION ALL
       SELECT '2_fingerprint', (SELECT c FROM n1),
              (SELECT c FROM n1) - (SELECT c FROM n2),
              (SELECT c FROM n2)
       UNION ALL
       SELECT '3_simhash', (SELECT c FROM n2),
              (SELECT c FROM n2) - (SELECT c FROM n3),
              (SELECT c FROM n3)
       ORDER BY stage""",
    doc="the curation CASCADE datasheet: exact -> fingerprint -> "
        "simhash dedup stages applied IN SEQUENCE, each only on the "
        "previous stage's survivors, reporting marginal removals per "
        "stage -- the diminishing-returns table that decides where a "
        "pipeline stops paying for more dedup (x23 composes a "
        "pipeline; this measures each stage's marginal yield; x120 "
        "summarizes one stage). Every stage is the verified x01/x02/"
        "x05 machinery -- hash-groupBy per stage, survivors via "
        "LEFT SEMI on keeper ids, never a pairwise join -- and the "
        "composed oracle re-derives all three stages in one chained "
        "CTE, so the CASCADE (not just its parts) is hash-checked",
)
def x244_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s0 = docs.select("doc_id", "text")
    e = s0.groupBy(F.md5(F.lower("text")).alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    s1 = s0.join(
        e.select(F.col("keep_id").alias("doc_id")), "doc_id", "leftsemi"
    )
    f = dedup.fingerprint_dedup(s1, "doc_id", "text")
    s2 = s1.join(
        f.select(F.col("keep_id").alias("doc_id")), "doc_id", "leftsemi"
    )
    sh = dedup.simhash(s2, "doc_id", "text")
    n0 = s0.agg(F.count(F.lit(1)).cast("long").alias("n0"))
    n1 = e.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2 = f.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    n3 = sh.agg(F.countDistinct("simhash").cast("long").alias("n3"))
    r = (
        n0.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
    )
    return r.select(
        F.expr(
            "stack(3, "
            "'1_exact', n0, n0 - n1, n1, "
            "'2_fingerprint', n1, n1 - n2, n2, "
            "'3_simhash', n2, n2 - n3, n3) "
            "AS (stage, n_in, n_removed, n_out)"
        )
    ).orderBy("stage")



# ---------------------------------------------------------------------------
# Round-5 batch: SCD2 consumption, privacy, sequence RLE, rounding seams,
# backlog ledger, schema drift
# ---------------------------------------------------------------------------


@register(
    "x245_pit_enrichment",
    """WITH p AS (SELECT DISTINCT user_id, ts FROM events
                  WHERE event_type = 'purchase'),
       iv AS (SELECT user_id, ts AS start_ts,
                     LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       AS end_ts,
                     CAST(LEAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts), 3) AS BIGINT)
                       AS tier
              FROM p),
       c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
       j AS (SELECT c.user_id, COALESCE(iv.tier, 0) AS tier
             FROM c LEFT JOIN iv
               ON iv.user_id = c.user_id AND c.ts >= iv.start_ts
              AND (iv.end_ts IS NULL OR c.ts < iv.end_ts))
       SELECT tier, CAST(count(*) AS BIGINT) AS n_clicks,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM j GROUP BY tier ORDER BY tier""",
    doc="point-in-time SCD2 CONSUMPTION -- x113 builds validity "
        "intervals, x29 as-of joins event-to-event; this is the "
        "feature-store read path: per-user loyalty-tier intervals "
        "derive from the purchase history (distinct purchase ts -> "
        "row_number tier capped at 3, lead() closes each interval), "
        "then every click is enriched with the tier VALID AT ITS "
        "TIMESTAMP via a user-keyed equi-join with the range "
        "predicate as the residual condition -- never a cross "
        "product, per-user interval lists are purchase-count "
        "bounded. Clicks before the first purchase left-join to "
        "tier 0 explicitly (the anti-leak default: no future tier "
        "bleeds backward). Intervals PARTITION each user's "
        "timeline, so every click matches at most one row -- the "
        "join cannot fan out",
)
def x245_pit_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    iv = p.select(
        "user_id",
        F.col("ts").alias("start_ts"),
        F.lead("ts").over(w).alias("end_ts"),
        F.least(F.row_number().over(w), F.lit(3))
        .cast("long")
        .alias("tier"),
    )
    c = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    j = c.join(
        iv,
        (c["user_id"] == iv["user_id"])
        & (c["ts"] >= iv["start_ts"])
        & (iv["end_ts"].isNull() | (c["ts"] < iv["end_ts"])),
        "left",
    ).select(c["user_id"], F.coalesce(iv["tier"], F.lit(0)).alias("tier"))
    return (
        j.groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clicks"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("tier")
    )


@register(
    "x246_l_diversity",
    """WITH g AS (SELECT lang, n_chars // 100 AS size_bucket,
                         CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(count(DISTINCT source) AS BIGINT) AS l
                  FROM documents GROUP BY 1, 2)
       SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
              CAST(SUM(n_docs) AS BIGINT) AS n_docs
       FROM g GROUP BY l ORDER BY l""",
    doc="l-diversity audit -- the sensitive-attribute complement of "
        "x172's k-anonymity: within each quasi-identifier group "
        "(lang x n_chars-century), how many DISTINCT values of the "
        "sensitive column (source) coexist; groups with l = 1 leak "
        "the sensitive value by membership alone even when k is "
        "large. Two partial-agg groupBys (QI cells, then the "
        "l-histogram over the tiny cell table); count(DISTINCT) "
        "plans one Expand, no joins, nothing collects",
)
def x246_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = (
        docs.select(
            "lang",
            F.expr("n_chars DIV 100").alias("size_bucket"),
            "source",
        )
        .groupBy("lang", "size_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("l"),
        )
    )
    return (
        g.groupBy("l")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("n_docs").cast("long").alias("n_docs"),
        )
        .orderBy("l")
    )


@register(
    "x247_event_rle",
    """WITH o AS (SELECT user_id, event_type,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS rn_all,
                    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                      ORDER BY ts, event_id) AS rn_t
                  FROM events),
       runs AS (SELECT user_id, event_type, rn_all - rn_t AS grp,
                       CAST(count(*) AS BIGINT) AS run_len
                FROM o GROUP BY 1, 2, 3)
       SELECT event_type, CAST(count(*) AS BIGINT) AS n_runs,
              CAST(MAX(run_len) AS BIGINT) AS max_run,
              CAST(SUM(run_len) AS BIGINT) AS n_events,
              CAST(SUM(run_len) * 100 // count(*) AS BIGINT)
                AS avg_len_x100
       FROM runs GROUP BY event_type ORDER BY event_type""",
    doc="run-length encoding of per-user event streams -- the "
        "sequence-compression stat behind repetition audits (a bot "
        "emits 400-click runs, a human alternates): classic "
        "gaps-and-islands via the rn_all - rn_per_type difference, "
        "both row_numbers ride ONE user-key exchange (the user_id "
        "window plans first, the (user_id, event_type) window's "
        "clustering is satisfied by the existing partitioning -- "
        "subset rule, no second shuffle), runs collapse in a "
        "partial-agg groupBy, mean run length is integer-exact "
        "(x100 DIV, no float accumulation). (ts, event_id) makes "
        "the order total so island ids are deterministic",
)
def x247_event_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_t = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    o = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w_all).alias("rn_all"),
        F.row_number().over(w_t).alias("rn_t"),
    )
    runs = (
        o.select(
            "user_id",
            "event_type",
            (F.col("rn_all") - F.col("rn_t")).alias("grp"),
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(F.count(F.lit(1)).cast("long").alias("run_len"))
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_runs"),
            F.max("run_len").cast("long").alias("max_run"),
            F.sum("run_len").cast("long").alias("n_events"),
            F.expr("CAST(SUM(run_len) * 100 DIV COUNT(*) AS BIGINT)")
            .alias("avg_len_x100"),
        )
        .orderBy("event_type")
    )


@register(
    "x248_rounding_semantics",
    """WITH t AS (SELECT CAST(l_quantity AS BIGINT) AS n,
                    (CAST(l_quantity AS BIGINT) * 10 + 5) / 10.0 AS tie
                  FROM lineitem)
       SELECT n % 2 AS parity, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(round(tie, 0) AS BIGINT)) AS BIGINT)
                AS sum_half_up,
              CAST(SUM(CAST(round_even(tie, 0) AS BIGINT)) AS BIGINT)
                AS sum_half_even
       FROM t GROUP BY 1 ORDER BY parity""",
    doc="financial rounding-mode seam, pinned by construction: every "
        "row is an EXACT .5 tie (10n+5 over 10.0 is the exactly "
        "representable n + 0.5 for every fixture quantity), so "
        "HALF_UP (Spark round / DuckDB round, away-from-zero on "
        "positives) and HALF_EVEN (Spark bround / DuckDB round_even, "
        "banker's) are forced to disagree on every odd-parity... "
        "even-parity n -- and the per-parity sums prove exactly "
        "where: HALF_UP always rounds n+0.5 up, HALF_EVEN only when "
        "n is odd. The entry documents WHICH native function "
        "implements which mode in each engine -- the seam that "
        "silently shifts money in a migrated billing pipeline "
        "(SURVEY dialect-seams list)",
)
def x248_rounding_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_quantity").cast("long").alias("n"),
        (
            (F.col("l_quantity").cast("long") * 10 + 5) / F.lit(10.0)
        ).alias("tie"),
    )
    return (
        t.groupBy((F.col("n") % 2).alias("parity"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.round(F.col("tie"), 0).cast("long"))
            .cast("long")
            .alias("sum_half_up"),
            F.sum(F.bround(F.col("tie"), 0).cast("long"))
            .cast("long")
            .alias("sum_half_even"),
        )
        .orderBy("parity")
    )


@register(
    "x249_order_backlog",
    """WITH cl AS (SELECT l_orderkey, MAX(l_shipdate) AS close_d
                   FROM lineitem GROUP BY 1),
       oo AS (SELECT date_trunc('month', o.o_orderdate) AS om,
                     date_trunc('month', cl.close_d) AS cm
              FROM orders o
              LEFT JOIN cl ON o.o_orderkey = cl.l_orderkey),
       d AS (SELECT om AS m, CAST(count(*) AS BIGINT) AS opened,
                    CAST(0 AS BIGINT) AS closed
             FROM oo GROUP BY 1
             UNION ALL
             SELECT cm, CAST(0 AS BIGINT), CAST(count(*) AS BIGINT)
             FROM oo WHERE cm IS NOT NULL GROUP BY 1),
       cells AS (SELECT m, CAST(SUM(opened) AS BIGINT) AS opened,
                        CAST(SUM(closed) AS BIGINT) AS closed
                 FROM d GROUP BY m)
       SELECT CAST(m AS DATE) AS month, opened, closed,
              CAST(SUM(opened - closed) OVER (ORDER BY m
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS backlog
       FROM cells ORDER BY month""",
    doc="open-order backlog time series -- the operations twin of "
        "x203's per-part stock ledger, at ORDER grain: each order "
        "contributes +1 at its order month and -1 at its LAST ship "
        "month (max l_shipdate per order); the orders-lineitem "
        "attach is the key-partitioned big-big SMJ (the 100 TB "
        "shape, x206's contract), everything after reduces to "
        "month-cardinality cells, so the running backlog window "
        "rides a bounded value-domain table (x81's contract) -- "
        "the single-partition sort costs ~nothing at any corpus "
        "size. Orders that never ship stay open forever via the "
        "LEFT join (no silent inner-join closure)",
)
def x249_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cl = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_d"))
    oo = o.join(
        cl, o["o_orderkey"] == cl["l_orderkey"], "left"
    ).select(
        F.date_trunc("month", "o_orderdate").alias("om"),
        F.date_trunc("month", "close_d").alias("cm"),
    )
    d = (
        oo.groupBy(F.col("om").alias("m"))
        .agg(F.count(F.lit(1)).cast("long").alias("opened"))
        .withColumn("closed", F.lit(0).cast("long"))
        .unionByName(
            oo.filter(F.col("cm").isNotNull())
            .groupBy(F.col("cm").alias("m"))
            .agg(F.count(F.lit(1)).cast("long").alias("closed"))
            .withColumn("opened", F.lit(0).cast("long"))
        )
    )
    cells = d.groupBy("m").agg(
        F.sum("opened").cast("long").alias("opened"),
        F.sum("closed").cast("long").alias("closed"),
    )
    w = Window.orderBy("m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return cells.select(
        F.col("m").cast("date").alias("month"),
        "opened",
        "closed",
        F.sum(F.col("opened") - F.col("closed"))
        .over(w)
        .cast("long")
        .alias("backlog"),
    ).orderBy("month")


@register(
    "x250_schema_drift",
    """SELECT col, n0, d0, n1, d1,
              CAST(CASE WHEN ABS(d0 - d1) * 100 > 10 * GREATEST(d0, d1)
                   THEN 1 ELSE 0 END AS BIGINT) AS drifted
       FROM (
         SELECT col,
                CAST(count(CASE WHEN epoch = 0 THEN 1 END) AS BIGINT)
                  AS n0,
                CAST(count(DISTINCT CASE WHEN epoch = 0 THEN val END)
                  AS BIGINT) AS d0,
                CAST(count(CASE WHEN epoch = 1 THEN 1 END) AS BIGINT)
                  AS n1,
                CAST(count(DISTINCT CASE WHEN epoch = 1 THEN val END)
                  AS BIGINT) AS d1
         FROM (
           SELECT doc_id % 2 AS epoch, 'lang' AS col, lang AS val
           FROM documents
           UNION ALL SELECT doc_id % 2, 'source', source FROM documents
           UNION ALL SELECT doc_id % 2, 'n_chars',
                            CAST(n_chars AS VARCHAR) FROM documents
           UNION ALL SELECT doc_id % 2, 'text', text FROM documents)
         GROUP BY col)
       ORDER BY col""",
    doc="cross-epoch schema/content drift detector -- x174 profiles "
        "ONE corpus column-wise; this compares TWO epochs (doc_id "
        "parity split standing in for yesterday/today) column by "
        "column: per-column row and distinct-value counts per epoch "
        "plus a 10%-relative-gap drift flag, the check that catches "
        "an upstream feed silently collapsing a column's domain. "
        "One stack() generator fans each row to 4 (col, val) pairs "
        "in the scan stage, one groupBy(col) with conditional "
        "count(DISTINCT)s (one Expand, x250's only multiplier), "
        "drift arithmetic is integer-exact; the flag computes in an "
        "outer projection because a sibling aggregate alias is not "
        "referenceable in either dialect (x209's lateral-alias "
        "seam)",
)
def x250_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(
        (F.col("doc_id") % 2).alias("epoch"),
        F.expr(
            "stack(4, 'lang', lang, 'source', source, "
            "'n_chars', CAST(n_chars AS STRING), 'text', text) "
            "AS (col, val)"
        ),
    )
    agg = u.groupBy("col").agg(
        F.count(F.when(F.col("epoch") == 0, 1)).cast("long").alias("n0"),
        F.countDistinct(F.when(F.col("epoch") == 0, F.col("val")))
        .cast("long")
        .alias("d0"),
        F.count(F.when(F.col("epoch") == 1, 1)).cast("long").alias("n1"),
        F.countDistinct(F.when(F.col("epoch") == 1, F.col("val")))
        .cast("long")
        .alias("d1"),
    )
    return agg.select(
        "col",
        "n0",
        "d0",
        "n1",
        "d1",
        F.when(
            F.abs(F.col("d0") - F.col("d1")) * 100
            > 10 * F.greatest("d0", "d1"),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("drifted"),
    ).orderBy("col")


@register(
    "x251_cogroup_reconcile",
    """WITH v AS (SELECT user_id, CAST(count(*) AS BIGINT) AS nv,
                         MIN(ts) AS first_view
                  FROM events WHERE event_type = 'view' GROUP BY 1),
       p AS (SELECT user_id, ts FROM events
             WHERE event_type = 'purchase'),
       pu AS (SELECT p.user_id, CAST(count(*) AS BIGINT) AS np,
                     CAST(SUM(CASE WHEN v.first_view IS NULL
                              OR p.ts < v.first_view
                              THEN 1 ELSE 0 END) AS BIGINT) AS blind
              FROM p LEFT JOIN v ON p.user_id = v.user_id
              GROUP BY 1),
       u AS (SELECT COALESCE(pu.user_id, v.user_id) AS user_id,
                    COALESCE(v.nv, 0) AS nv,
                    COALESCE(pu.np, 0) AS np,
                    COALESCE(pu.blind, 0) AS blind
             FROM pu FULL OUTER JOIN v ON pu.user_id = v.user_id)
       SELECT blind AS blind_purchases,
              CAST(count(*) AS BIGINT) AS n_users,
              CAST(SUM(np) AS BIGINT) AS n_purchases,
              CAST(SUM(nv) AS BIGINT) AS n_views
       FROM u GROUP BY 1 ORDER BY blind_purchases""",
    doc="the COGROUP API surface (groupBy().cogroup().applyInPandas) "
        "-- two event streams meet per user in ONE Arrow-batched "
        "Python stage instead of a join: each (views_pdf, "
        "purchases_pdf) group computes view count, purchase count, "
        "and BLIND purchases (before the user's first view -- the "
        "attribution-integrity number), then the user-level rows "
        "reduce to a blind-count histogram JVM-side. Both sides "
        "shuffle once on the user key (the same exchange a join "
        "would pay), per-group state is one user's events, and the "
        "oracle re-derives the identical numbers relationally "
        "(LEFT JOIN on first-view ts + FULL OUTER user union) -- "
        "so the cogroup path is hash-pinned to the join path",
)
def x251_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    # The two cogroup sides MUST come from independent scans: deriving
    # both from one parent DataFrame gives their columns identical
    # attribute ids, and Spark's self-join dedup silently drops the
    # right side's non-key columns from the Arrow batches (observed:
    # right pdf arrives with only ['user_id']). Same family as the
    # documented self-join ambiguity; a second load_table() creates
    # fresh ids.
    ev = load_table(spark, sf_dir, "events")
    ev2 = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    p = ev2.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )

    def reconcile(key, vdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        nv = len(vdf)
        np_ = len(pdf)
        if np_ == 0:
            blind = 0
        elif nv == 0:
            blind = np_
        else:
            blind = int((pdf["ts"] < vdf["ts"].min()).sum())
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "nv": [nv],
                "np": [np_],
                "blind": [blind],
            }
        )

    u = (
        v.groupBy("user_id")
        .cogroup(p.groupBy("user_id"))
        .applyInPandas(
            reconcile,
            "user_id bigint, nv bigint, np bigint, blind bigint",
        )
    )
    return (
        u.groupBy(F.col("blind").alias("blind_purchases"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("np").cast("long").alias("n_purchases"),
            F.sum("nv").cast("long").alias("n_views"),
        )
        .orderBy("blind_purchases")
    )


@register(
    "x252_arrow_bytes",
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
              CAST(SUM(length(text)) AS BIGINT) AS total_chars
       FROM documents GROUP BY source ORDER BY source""",
    doc="the mapInArrow API surface -- the zero-copy tier below "
        "mapInPandas (no pandas conversion at all; pyarrow "
        "RecordBatches in and out): each batch computes utf8 BYTE "
        "lengths via pyarrow.compute.binary_length on the "
        "utf8->binary view plus codepoint counts, emitting narrow "
        "(source, nbytes, nchars) batches; the JVM aggregates per "
        "source. Bytes != chars the moment a corpus goes "
        "multibyte -- the storage-sizing number ingestion needs. "
        "Oracle pins both sums via DuckDB strlen (bytes) vs length "
        "(codepoints); only the narrow projection crosses Python, "
        "Arrow-batched, never row-at-a-time",
)
def x252_arrow_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")

    def measure(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            text = b.column("text")
            nbytes = pc.binary_length(text.cast(pa.binary()))
            nchars = pc.utf8_length(text)
            yield pa.RecordBatch.from_arrays(
                [b.column("source"), nbytes.cast(pa.int64()),
                 nchars.cast(pa.int64())],
                ["source", "nbytes", "nchars"],
            )

    m = docs.mapInArrow(
        measure, "source string, nbytes long, nchars long"
    )
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nbytes").cast("long").alias("total_bytes"),
            F.sum("nchars").cast("long").alias("total_chars"),
        )
        .orderBy("source")
    )


@register(
    "x253_udtf_shards",
    """WITH r AS (SELECT source,
                    ROW_NUMBER() OVER (PARTITION BY source
                      ORDER BY doc_id) - 1 AS i
                  FROM documents)
       SELECT source, CAST(i // 10 AS BIGINT) AS shard_idx,
              CAST(count(*) AS BIGINT) AS shard_rows
       FROM r GROUP BY 1, 2 ORDER BY source, shard_idx""",
    doc="the Python UDTF surface (Spark 4 @udtf, one-to-many table "
        "function in SQL FROM position) -- the reference's shard "
        "planner (S16, handler.go shard clamp) re-expressed as a "
        "LATERAL-correlated UDTF: per (source, n_docs) row it "
        "yields one row per 10-doc shard with the tail shard "
        "clamped; the oracle re-derives the same shards by "
        "bucketing row_number (DuckDB's generate_series cannot "
        "take lateral column parameters -- dialect seam). "
        "Python UDTFs evaluate row-at-a-time, so the contract is "
        "the input MUST be aggregate-sized (here: one row per "
        "source, bounded by source cardinality) -- corpus rows "
        "never meet the UDTF; the corpus-sized work is the one "
        "partial-agg groupBy that feeds it",
)
def x253_udtf_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="shard_idx: bigint, shard_rows: bigint")
    class ShardPlanner:
        def eval(self, n_docs: int):
            size = 10
            full, rem = divmod(int(n_docs), size)
            for i in range(full):
                yield (i, size)
            if rem:
                yield (full, rem)

    spark.udtf.register("x253_shard_planner", ShardPlanner)
    docs = load_table(spark, sf_dir, "documents")
    docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).createOrReplaceTempView("x253_src_counts")
    return spark.sql(
        """SELECT s.source, t.shard_idx, t.shard_rows
           FROM x253_src_counts s,
                LATERAL x253_shard_planner(s.n_docs) t
           ORDER BY s.source, t.shard_idx"""
    )


@register(
    "x254_percentile_semantics",
    """WITH t AS (SELECT event_type,
                    CAST(round(value * 100, 0) AS BIGINT) AS cents
                  FROM events)
       SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              CAST(quantile_disc(cents, 0.5) AS BIGINT) AS p50_disc,
              CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT)
                AS p50_cont_x2
       FROM t GROUP BY event_type ORDER BY event_type""",
    doc="percentile SEMANTICS seam, pinned: DISC returns an actual "
        "data value (the lower of the two middle ranks), CONT "
        "interpolates between them -- on an even-count group they "
        "disagree by half the middle gap, and a migration that "
        "swaps one for the other silently shifts every SLA "
        "threshold. Spark percentile_disc <-> DuckDB quantile_disc, "
        "Spark percentile_cont <-> quantile_cont; values are "
        "integer cents so DISC is integer-exact, and CONT at 0.5 "
        "is reported x2 (the only possible fraction is .5, so "
        "doubling is exact) -- no float hash risk. One groupBy, "
        "both percentiles in the same aggregate",
)
def x254_percentile_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return (
        t.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr(
                "CAST(percentile_disc(0.5) WITHIN GROUP "
                "(ORDER BY cents) AS BIGINT)"
            ).alias("p50_disc"),
            F.expr(
                "CAST(percentile_cont(0.5) WITHIN GROUP "
                "(ORDER BY cents) * 2 AS BIGINT)"
            ).alias("p50_cont_x2"),
        )
        .orderBy("event_type")
    )


@register(
    "x255_explode_outer",
    """WITH f AS (SELECT doc_id, lang,
                    list_filter(string_split(lower(text), ' '),
                                x -> len(x) >= 8) AS longs
                  FROM documents)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN len(longs) = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_no_long,
              CAST(SUM(len(longs)) AS BIGINT) AS n_long_tokens
       FROM f GROUP BY lang ORDER BY lang""",
    doc="explode vs explode_outer NULL-preservation seam: a plain "
        "explode DROPS every document whose filtered token array is "
        "empty -- the silent row loss that understates corpus "
        "coverage stats; explode_outer keeps them as one NULL-token "
        "row each. The entry runs the OUTER generator over "
        "length>=8 tokens (empty for most docs) and counts docs, "
        "empty docs (NULL rows), and surviving tokens per lang -- "
        "numbers a dropped row would visibly corrupt (n_docs would "
        "shrink). The oracle needs no generator at all: the same "
        "three numbers fold over the array lengths row-locally -- "
        "mechanism differs, hash must not",
)
def x255_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "doc_id",
        "lang",
        F.filter(
            F.split(F.lower("text"), " "), lambda x: F.length(x) >= 8
        ).alias("longs"),
    )
    e = f.select(
        "doc_id", "lang", F.explode_outer("longs").alias("tok")
    )
    return (
        e.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.when(F.col("tok").isNull(), 1))
            .cast("long")
            .alias("n_docs_no_long"),
            F.count("tok").cast("long").alias("n_long_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "x256_array_align",
    """WITH c AS (SELECT user_id, ts,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY ts) AS rn
                  FROM events WHERE event_type = 'click'),
       p AS (SELECT user_id, ts,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY ts) AS rn
             FROM events WHERE event_type = 'purchase'),
       j AS (SELECT COALESCE(c.rn, p.rn) AS rn,
                    c.ts AS cts, p.ts AS pts
             FROM c FULL OUTER JOIN p
               ON c.user_id = p.user_id AND c.rn = p.rn)
       SELECT CAST(rn AS BIGINT) AS idx,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(SUM(CASE WHEN cts IS NOT NULL AND pts IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
              CAST(SUM(CASE WHEN pts > cts THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase_after
       FROM j GROUP BY rn ORDER BY idx""",
    doc="index-aligned array pairing via arrays_zip + posexplode -- "
        "each user's k-th click meets their k-th purchase without "
        "any join: both ordered ts arrays build in ONE user-key "
        "groupBy (two conditional collect_lists share the "
        "exchange), arrays_zip NULL-pads the shorter side exactly "
        "like the oracle's FULL OUTER rank join, and posexplode "
        "re-derives the rank from the array position. Per-index "
        "pair counts and the k-th-purchase-after-k-th-click tally "
        "are the hash surface. Duplicate ts within a user make "
        "row_number ties arbitrary BUT value-identical, so the "
        "k-th VALUE is deterministic either way -- the reason this "
        "hashes without an event_id tiebreak",
)
def x256_array_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arr = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("event_type") == "click", F.col("ts"))
                )
            ).alias("clicks"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("event_type") == "purchase", F.col("ts")
                    )
                )
            ).alias("purchases"),
        )
    )
    z = arr.select(
        F.posexplode(F.arrays_zip("clicks", "purchases")).alias(
            "pos", "pair"
        )
    ).select(
        (F.col("pos") + 1).cast("long").alias("idx"),
        F.col("pair.clicks").alias("cts"),
        F.col("pair.purchases").alias("pts"),
    )
    return (
        z.groupBy("idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.count(
                F.when(
                    F.col("cts").isNotNull() & F.col("pts").isNotNull(),
                    1,
                )
            )
            .cast("long")
            .alias("n_both"),
            F.count(F.when(F.col("pts") > F.col("cts"), 1))
            .cast("long")
            .alias("n_purchase_after"),
        )
        .orderBy("idx")
    )


@register(
    "x257_decimal_contract",
    """WITH t AS (SELECT l_returnflag,
                    CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                      AS cents,
                    CAST(round(l_discount * 10000, 0) AS BIGINT) AS bp
                  FROM lineitem),
       d AS (SELECT l_returnflag,
                    CAST(CAST(cents AS DECIMAL(18,2)) / 100
                      AS DECIMAL(18,2)) AS price,
                    CAST(CAST(bp AS DECIMAL(10,4)) / 10000
                      AS DECIMAL(10,4)) AS rate
             FROM t)
       SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(CAST(price * (1 - rate) AS DECIMAL(28,8)))
                AS DECIMAL(38,8)) AS net_sum
       FROM d GROUP BY l_returnflag ORDER BY l_returnflag""",
    doc="the DECIMAL type-contract seam, pinned end to end: Spark and "
        "DuckDB assign DIFFERENT precision/scale to decimal division "
        "and multiplication results (Spark widens scale to >= 6 on "
        "divide, DuckDB follows its own rule), so any money pipeline "
        "that lets the engine infer intermediate types diverges "
        "silently. The entry CASTS every intermediate explicitly -- "
        "cents -> DECIMAL(18,2) price, basis points -> DECIMAL(10,4) "
        "rate, product -> DECIMAL(28,8), sum -> DECIMAL(38,8) -- and "
        "all values are exact at every step (2dp x 4dp = 6dp < 8dp), "
        "so the hash pins that BOTH engines honor explicit decimal "
        "casts bit-for-bit; x45/x46's round-then-DECIMAL recipe "
        "generalized into the full arithmetic chain",
)
def x257_decimal_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("cents"),
        F.round(F.col("l_discount") * 10000, 0).cast("long").alias("bp"),
    )
    d = t.select(
        "l_returnflag",
        (F.col("cents").cast("decimal(18,2)") / 100)
        .cast("decimal(18,2)")
        .alias("price"),
        (F.col("bp").cast("decimal(10,4)") / 10000)
        .cast("decimal(10,4)")
        .alias("rate"),
    )
    return (
        d.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (F.col("price") * (1 - F.col("rate"))).cast(
                    "decimal(28,8)"
                )
            )
            .cast("decimal(38,8)")
            .alias("net_sum"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "x258_collation_distinct",
    """WITH t AS (SELECT source,
                    CASE WHEN doc_id % 2 = 0 THEN upper(lang)
                         ELSE lang END AS k
                  FROM documents)
       SELECT source,
              CAST(count(DISTINCT k) AS BIGINT) AS n_case_sensitive,
              CAST(count(DISTINCT lower(k)) AS BIGINT)
                AS n_case_insensitive,
              CAST(SUM(CASE WHEN lower(k) = 'en' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_en_ci
       FROM t GROUP BY source ORDER BY source""",
    doc="Spark 4 COLLATION surface: the same distinct/equality "
        "semantics lower() hand-rolls, declared as a column property "
        "instead -- count(DISTINCT collate(k, 'UTF8_LCASE')) and a "
        "collated equality filter against a mixed-case key (doc "
        "parity upper-cases half the rows). Counts are deterministic "
        "under collation where the GROUP KEY VALUE would not be "
        "(which case representative a collated groupBy returns is "
        "arbitrary -- the reason this entry outputs counts, never "
        "collated keys). Oracle states the identical semantics via "
        "lower(); one groupBy, Expand for the two distincts",
)
def x258_collation_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("k"),
    )
    ci = F.collate(F.col("k"), "UTF8_LCASE")
    return (
        t.groupBy("source")
        .agg(
            F.countDistinct("k").cast("long").alias("n_case_sensitive"),
            F.countDistinct(ci).cast("long").alias("n_case_insensitive"),
            F.sum(
                F.when(ci == F.lit("en"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_en_ci"),
        )
        .orderBy("source")
    )


@register(
    "x259_month_arithmetic",
    """WITH me AS (SELECT CAST(o_orderdate AS DATE) AS d
                   FROM orders
                   WHERE CAST(o_orderdate AS DATE)
                         = last_day(CAST(o_orderdate AS DATE))),
       s AS (SELECT d, CAST(d + INTERVAL 1 MONTH AS DATE) AS d1
             FROM me)
       SELECT CAST(EXTRACT(year FROM d) AS BIGINT) AS yr,
              CAST(count(*) AS BIGINT) AS n_month_end,
              CAST(SUM(CASE WHEN EXTRACT(day FROM d1)
                            < EXTRACT(day FROM d)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
              CAST(SUM(EXTRACT(day FROM d1)) AS BIGINT) AS day_sig
       FROM s GROUP BY 1 ORDER BY yr""",
    doc="calendar month-arithmetic seam, pinned on the clamping edge: "
        "Jan 31 + 1 month must land on Feb 28/29 in BOTH engines "
        "(Spark add_months and DuckDB + INTERVAL 1 MONTH both clamp "
        "to month end -- but a pipeline that emulates month shifts "
        "with +30 days or date_add does NOT, and every month-end "
        "row drifts). Month-end orders filter via last_day "
        "self-equality, the shifted day-of-month sums into an "
        "integer signature that any clamp divergence flips; "
        "pure codegen, one groupBy on year",
)
def x259_month_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    me = o.select(F.col("o_orderdate").cast("date").alias("d")).filter(
        F.col("d") == F.last_day("d")
    )
    s = me.select("d", F.add_months("d", 1).alias("d1"))
    return (
        s.groupBy(F.year("d").cast("long").alias("yr"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_month_end"),
            F.sum(
                F.when(F.dayofmonth("d1") < F.dayofmonth("d"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_clamped"),
            F.sum(F.dayofmonth("d1")).cast("long").alias("day_sig"),
        )
        .orderBy("yr")
    )


@register(
    "x260_quantile_array",
    """WITH t AS (SELECT event_type,
                    CAST(round(value * 100, 0) AS BIGINT) AS cents
                  FROM events)
       SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              array_to_string(list_transform(
                quantile_cont(cents, [0.25, 0.5, 0.75]),
                x -> CAST(CAST(x * 4 AS BIGINT) AS VARCHAR)), ',')
                AS quartiles_x4
       FROM t GROUP BY event_type ORDER BY event_type""",
    doc="the array-of-fractions percentile surface (ONE aggregate "
        "returns all three quartiles -- at scale, one sort-based "
        "aggregation pass instead of three): Spark "
        "percentile(col, array(...)) <-> DuckDB "
        "quantile_cont(col, [...]); the list serializes to a string "
        "in-query on both engines (q33/q41 array-hash precedent) "
        "and values report x4 so the only possible interpolation "
        "fractions (.25/.5/.75 between integer cents) become exact "
        "integers -- no float in the hash. One groupBy, no Expand "
        "(a single percentile aggregate, not three)",
)
def x260_quantile_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return (
        t.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.concat_ws(
                ",",
                F.transform(
                    F.percentile(
                        F.col("cents"),
                        F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
                    ),
                    lambda x: (x * 4).cast("long").cast("string"),
                ),
            ).alias("quartiles_x4"),
        )
        .orderBy("event_type")
    )


@register(
    "x261_hll_native",
    None,
    doc="Spark 4's NATIVE DataSketches HLL surface (hll_sketch_agg / "
        "hll_sketch_estimate / hll_union_agg) -- the engine-built "
        "mergeable sketch that replaces x16's hand-rolled HLL++ at "
        "100 TB: per-lang content sketches estimate distinct texts, "
        "and the union row proves MERGEABILITY (union the per-lang "
        "sketches, estimate once -- the two-level rollup pattern "
        "where per-partition sketches fold without re-reading data, "
        "x112's WAU contract on native machinery). Rows-only by "
        "design: DuckDB's approx_count_distinct is a different "
        "sketch with different estimates; the pytest gate bounds "
        "every estimate within 5% of the exact count "
        "(tests/test_ops_quality.py::test_hll_native_within_error)",
)
def x261_hll_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.groupBy("lang")
        .agg(F.hll_sketch_agg(F.md5("text"), F.lit(14)).alias("sk"))
    )
    by_lang = per.select(
        F.col("lang").alias("scope"),
        F.hll_sketch_estimate("sk").cast("long").alias("est_distinct"),
    )
    union_row = per.agg(
        F.hll_union_agg("sk").alias("u")
    ).select(
        F.lit("__union__").alias("scope"),
        F.hll_sketch_estimate("u").cast("long").alias("est_distinct"),
    )
    return by_lang.unionByName(union_row).orderBy("scope")


@register(
    "x262_orc_roundtrip",
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(bit_xor(CAST(('0x' || substr(
                md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 15))
                AS BIGINT)) AS BIGINT) AS checksum
       FROM documents GROUP BY source ORDER BY source""",
    doc="format-abstraction contract for the ORC leg -- the third "
        "interchange format after JSONL (x114) and CSV (x160), and "
        "the one with its own writer stack (ORC stripe encoding vs "
        "parquet pages): export the corpus as ORC shards, read them "
        "back, and XOR-fold x187's order-independent 60-bit content "
        "checksum per source; hash-matching the parquet-sourced "
        "oracle proves the encode/decode cycle byte-lossless through "
        "the correctness gate. Shards write/read in parallel (orc "
        "sink, no collect); checksum is partition-order immune by "
        "XOR algebra, so the round-trip's different file split "
        "cannot fake a pass or a fail",
)
def x262_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="x262_orc_")
    try:
        docs.write.mode("overwrite").orc(tmp)
        back = spark.read.schema(docs.schema).orc(tmp)
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws("|", F.col("doc_id"), F.col("text"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        out = (
            back.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.bit_xor(h).cast("long").alias("checksum"),
            )
            .orderBy("source")
        )
        out = out.localCheckpoint()  # materialize before tmp vanishes
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@register(
    "x263_string_parity",
    """WITH s AS (SELECT lang,
                    md5(concat_ws('#',
                      upper(text),
                      substr(text, 5, 20),
                      reverse(substr(text, 1, 16)),
                      lpad(substr(text, 1, 4), 8, '_'),
                      translate(substr(text, 1, 32), 'aeiou', 'AEIOU'),
                      replace(substr(text, 1, 32), ' ', '~'),
                      trim(substr(text, 1, 12)),
                      CAST(ascii(text) AS VARCHAR),
                      CAST(length(text) AS VARCHAR))) AS fp
                  FROM documents)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(bit_xor(CAST(('0x' || substr(fp, 1, 15)) AS BIGINT))
                AS BIGINT) AS parity_checksum
       FROM s GROUP BY lang ORDER BY lang""",
    doc="string-function PARITY MATRIX: nine core functions (upper, "
        "substr 1-based, reverse, lpad, translate, replace, trim, "
        "ascii, length) composed into one md5 fingerprint per row and "
        "XOR-folded per lang -- a single hash row pins the exact "
        "byte semantics of the whole battery across engines (any "
        "off-by-one in substr indexing, pad direction, or translate "
        "mapping flips the checksum). This is the migration "
        "smoke-test for expression-level compatibility, the "
        "expression-layer complement of the x187 content checksum; "
        "pure codegen, one partial-agg groupBy",
)
def x263_string_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    fp = F.md5(
        F.concat_ws(
            "#",
            F.upper(t),
            F.substring(t, 5, 20),
            F.reverse(F.substring(t, 1, 16)),
            F.lpad(F.substring(t, 1, 4), 8, "_"),
            F.translate(F.substring(t, 1, 32), "aeiou", "AEIOU"),
            F.replace(F.substring(t, 1, 32), F.lit(" "), F.lit("~")),
            F.trim(F.substring(t, 1, 12)),
            F.ascii(t).cast("string"),
            F.length(t).cast("string"),
        )
    )
    s = docs.select("lang", fp.alias("fp"))
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.bit_xor(
                F.conv(F.substring("fp", 1, 15), 16, 10).cast("long")
            )
            .cast("long")
            .alias("parity_checksum"),
        )
        .orderBy("lang")
    )


@register(
    "x264_date_parsing",
    """WITH r AS (SELECT strftime(CAST(o_orderdate AS DATE),
                                  '%m/%d/%Y') AS us_str
                  FROM orders),
       p AS (SELECT CAST(strptime(us_str, '%m/%d/%Y') AS DATE) AS d
             FROM r)
       SELECT CAST(EXTRACT(year FROM d) AS BIGINT) AS yr,
              CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(EXTRACT(doy FROM d)) AS BIGINT) AS doy_sum
       FROM p GROUP BY 1 ORDER BY yr""",
    doc="date FORMAT-PATTERN dialect seam: the same US-style "
        "MM/DD/YYYY string renders and parses through Spark's Java "
        "DateTimeFormatter patterns (date_format / to_date with "
        "'MM/dd/yyyy') and DuckDB's strftime/strptime ('%m/%d/%Y') "
        "-- two pattern LANGUAGES, one calendar; the round-trip "
        "(render -> parse -> day-of-year sum) flips on any "
        "zero-padding, month/minute confusion ('mm' vs 'MM' is the "
        "classic), or pivot-year divergence. Numeric patterns only "
        "-- month NAMES would drag locale into the hash (documented "
        "exclusion). Pure codegen both sides",
)
def x264_date_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    r = o.select(
        F.date_format(
            F.col("o_orderdate").cast("date"), "MM/dd/yyyy"
        ).alias("us_str")
    )
    p = r.select(F.to_date("us_str", "MM/dd/yyyy").alias("d"))
    return (
        p.groupBy(F.year("d").cast("long").alias("yr"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.dayofyear("d")).cast("long").alias("doy_sum"),
        )
        .orderBy("yr")
    )


@register(
    "x265_centroid_shift",
    """WITH e AS (
         SELECT label, vec_id % 2 AS epoch,
                unnest(range(0, len(embedding))) AS pos,
                CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6, 0)
                     AS BIGINT) AS q
         FROM embeddings),
       c AS (SELECT label, epoch, pos,
                    CAST(SUM(q) AS BIGINT) AS s
             FROM e GROUP BY 1, 2, 3),
       w AS (SELECT label, pos,
                    CAST(SUM(CASE WHEN epoch = 0 THEN s END)
                      AS BIGINT) AS s0,
                    CAST(SUM(CASE WHEN epoch = 1 THEN s END)
                      AS BIGINT) AS s1
             FROM c GROUP BY 1, 2),
       d AS (SELECT label,
                    CAST(SUM(s0 * s1) AS BIGINT) AS dot,
                    CAST(SUM(s0 * s0) AS BIGINT) AS n0,
                    CAST(SUM(s1 * s1) AS BIGINT) AS n1
             FROM w GROUP BY 1)
       SELECT CAST(label AS BIGINT) AS label,
              CAST(round(CAST(dot AS DOUBLE)
                   / sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))
                   * 1e6, 0) AS BIGINT) AS cos_x1e6
       FROM d ORDER BY label""",
    doc="per-label centroid DRIFT between two corpus epochs (vec_id "
        "parity split): the embedding-space answer to x250's "
        "columnar drift -- a label whose epoch centroids decohere "
        "signals distribution shift the scalar profiles miss. "
        "Everything order-dependent is eliminated: components "
        "quantize to integer micro-units at the scan, centroid "
        "sums / dot / norms accumulate as EXACT integers (partial "
        "agg over (label, epoch, pos) cells, dim x label x 2 "
        "bounded), and the single double division + sqrt at the end "
        "is IEEE-identical cross-engine; cosine reports in integer "
        "micro-units. The unnormalized-sum trick: cosine of sums "
        "equals cosine of means -- the counts cancel, so per-epoch "
        "counts never enter the arithmetic",
)
def x265_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("epoch"),
        F.posexplode("embedding").alias("pos", "x"),
    ).select(
        "label",
        "epoch",
        "pos",
        F.round(F.col("x").cast("double") * 1e6, 0)
        .cast("long")
        .alias("q"),
    )
    c = e.groupBy("label", "epoch", "pos").agg(
        F.sum("q").cast("long").alias("s")
    )
    w = c.groupBy("label", "pos").agg(
        F.sum(F.when(F.col("epoch") == 0, F.col("s")))
        .cast("long")
        .alias("s0"),
        F.sum(F.when(F.col("epoch") == 1, F.col("s")))
        .cast("long")
        .alias("s1"),
    )
    d = w.groupBy("label").agg(
        F.sum(F.col("s0") * F.col("s1")).cast("long").alias("dot"),
        F.sum(F.col("s0") * F.col("s0")).cast("long").alias("n0"),
        F.sum(F.col("s1") * F.col("s1")).cast("long").alias("n1"),
    )
    return d.select(
        F.col("label").cast("long").alias("label"),
        F.round(
            F.col("dot").cast("double")
            / F.sqrt(
                F.col("n0").cast("double") * F.col("n1").cast("double")
            )
            * 1e6,
            0,
        )
        .cast("long")
        .alias("cos_x1e6"),
    ).orderBy("label")


@register(
    "x266_rank_nulls",
    """WITH t AS (SELECT event_type,
                    NULLIF(CAST(round(value * 100, 0) AS BIGINT) % 7,
                           0) AS v
                  FROM events),
       r AS (SELECT event_type, v,
                    rank() OVER (PARTITION BY event_type
                      ORDER BY v ASC NULLS LAST) AS rk
             FROM t)
       SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null,
              CAST(SUM(CASE WHEN v IS NOT NULL THEN rk END)
                AS BIGINT) AS rank_sum_nonnull,
              CAST(MAX(rk) AS BIGINT) AS max_rank
       FROM r GROUP BY event_type ORDER BY event_type""",
    doc="NULL sort-order seam, pinned: Spark default-sorts NULLS "
        "FIRST ascending, DuckDB NULLS LAST -- an unannotated ORDER "
        "BY inside any window gives every null-containing partition "
        "DIFFERENT rank values on the two engines. The entry ranks "
        "a deterministically-nulled column (cents % 7, zero -> "
        "NULL) with EXPLICIT asc_nulls_last on both sides; the "
        "non-null rank sum and max rank flip if either engine "
        "defaults differently. Window is event_type-partitioned "
        "(never global), rank arithmetic integer-exact; ties get "
        "equal ranks so duplicate values cannot destabilize the "
        "hash",
)
def x266_rank_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        F.nullif(
            F.round(F.col("value") * 100, 0).cast("long") % 7, F.lit(0)
        ).alias("v"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("v").asc_nulls_last()
    )
    r = t.select("event_type", "v", F.rank().over(w).alias("rk"))
    return (
        r.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.sum(F.when(F.col("v").isNotNull(), F.col("rk")))
            .cast("long")
            .alias("rank_sum_nonnull"),
            F.max("rk").cast("long").alias("max_rank"),
        )
        .orderBy("event_type")
    )


@register(
    "x267_higher_moments",
    """WITH t AS (SELECT event_type,
                    CAST(round(value * 100, 0) AS BIGINT) AS c
                  FROM events),
       m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0))
                      AS s1,
                    CAST(SUM(CAST(c AS DECIMAL(19,0))
                             * CAST(c AS DECIMAL(19,0)))
                      AS DECIMAL(38,0)) AS s2,
                    CAST(SUM(CAST(CAST(c AS DECIMAL(19,0))
                                  * CAST(c AS DECIMAL(19,0))
                               AS DECIMAL(19,0))
                             * CAST(c AS DECIMAL(19,0)))
                      AS DECIMAL(38,0)) AS s3,
                    CAST(SUM(CAST(CAST(c AS DECIMAL(19,0))
                                  * CAST(c AS DECIMAL(19,0))
                               AS DECIMAL(19,0))
                             * CAST(CAST(c AS DECIMAL(19,0))
                                    * CAST(c AS DECIMAL(19,0))
                                 AS DECIMAL(19,0)))
                      AS DECIMAL(38,0)) AS s4
             FROM t GROUP BY event_type)
       SELECT event_type, n,
              ROUND((CAST(s3 AS DOUBLE) / n
                     - 3 * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s2 AS DOUBLE) / n)
                     + 2 * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n))
                    / ((CAST(s2 AS DOUBLE) / n
                        - (CAST(s1 AS DOUBLE) / n)
                            * (CAST(s1 AS DOUBLE) / n))
                       * sqrt(CAST(s2 AS DOUBLE) / n
                              - (CAST(s1 AS DOUBLE) / n)
                                  * (CAST(s1 AS DOUBLE) / n))),
                    6) AS skew_pop,
              ROUND((CAST(s4 AS DOUBLE) / n
                     - 4 * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s3 AS DOUBLE) / n)
                     + 6 * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s2 AS DOUBLE) / n)
                     - 3 * ((CAST(s1 AS DOUBLE) / n)
                            * (CAST(s1 AS DOUBLE) / n))
                         * ((CAST(s1 AS DOUBLE) / n)
                            * (CAST(s1 AS DOUBLE) / n)))
                    / ((CAST(s2 AS DOUBLE) / n
                        - (CAST(s1 AS DOUBLE) / n)
                            * (CAST(s1 AS DOUBLE) / n))
                       * (CAST(s2 AS DOUBLE) / n
                          - (CAST(s1 AS DOUBLE) / n)
                              * (CAST(s1 AS DOUBLE) / n)))
                    - 3, 6) AS kurt_excess_pop
       FROM m ORDER BY event_type""",
    doc="skewness/kurtosis the SCALE-SAFE way -- four exact integer "
        "power sums (DECIMAL(38,0) accumulation, x189's moment "
        "pattern run to 4th order) assembled into population moments "
        "by ONE double expression written identically in both "
        "dialects (no pow() -- engine-divergent per the verify "
        "gotchas; var^1.5 is var*sqrt(var)). The NATIVE skewness()/"
        "kurtosis() functions are deliberately absent from the hash: "
        "Spark returns population g1/excess-g2 while DuckDB returns "
        "SAMPLE-corrected b1/b2 -- the formula seam this entry "
        "documents by reconstructing from sums both engines agree "
        "on. One partial-agg groupBy; cents^4 at 1e16 per row needs "
        "the decimal sums (a DOUBLE sum drifts by partition order)",
)
def x267_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )
    cd = F.col("c").cast("decimal(19,0)")
    c2 = (cd * cd).cast("decimal(19,0)")
    m = t.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cd).cast("decimal(38,0)").alias("s1"),
        F.sum(cd * cd).cast("decimal(38,0)").alias("s2"),
        F.sum(c2 * cd).cast("decimal(38,0)").alias("s3"),
        F.sum(c2 * c2).cast("decimal(38,0)").alias("s4"),
    )
    # identical expression text as the oracle, evaluated by Spark SQL
    return m.selectExpr(
        "event_type",
        "n",
        """ROUND((CAST(s3 AS DOUBLE) / n
                  - 3 * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s2 AS DOUBLE) / n)
                  + 2 * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n))
                 / ((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n))
                    * sqrt(CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n)
                               * (CAST(s1 AS DOUBLE) / n))),
                 6) AS skew_pop""",
        """ROUND((CAST(s4 AS DOUBLE) / n
                  - 4 * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s3 AS DOUBLE) / n)
                  + 6 * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s2 AS DOUBLE) / n)
                  - 3 * ((CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n))
                      * ((CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n)))
                 / ((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n)
                         * (CAST(s1 AS DOUBLE) / n))
                    * (CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n)
                           * (CAST(s1 AS DOUBLE) / n)))
                 - 3, 6) AS kurt_excess_pop""",
    ).orderBy("event_type")


@register(
    "x268_id_gaps",
    """WITH g AS (SELECT o_orderkey AS ok,
                    lead(o_orderkey) OVER (ORDER BY o_orderkey)
                      - o_orderkey - 1 AS gap
                  FROM orders)
       SELECT CASE WHEN gap = 1 THEN '1_single'
                   WHEN gap <= 10 THEN '2_small'
                   ELSE '3_large' END AS gap_class,
              CAST(count(*) AS BIGINT) AS n_gaps,
              CAST(SUM(gap) AS BIGINT) AS total_missing,
              CAST(MAX(gap) AS BIGINT) AS max_gap
       FROM g WHERE gap > 0 GROUP BY 1 ORDER BY gap_class""",
    doc="missing-ID-range detection (integer islands -- x149's "
        "time-interval twin on the KEY domain; TPC-H orderkeys are "
        "sparse by construction, the perfect fixture): the oracle "
        "states the naive global lead(), the Spark side computes the "
        "SAME gaps with NO global sort -- lead() runs inside "
        "4096-wide key-range buckets (partition-local windows), and "
        "the cross-bucket seams stitch via one lead() over the "
        "bucket-cardinality (min, max) table, which also absorbs "
        "entirely-empty buckets. The two-level decomposition is "
        "exact: every gap is either interior to a bucket or spans "
        "bucket boundaries, never both. This is how global "
        "order-dependent scans survive 100 TB -- x90/x169's "
        "two-pass philosophy applied to lead()",
)
def x268_id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        (F.col("o_orderkey") / F.lit(4096)).cast("long").alias("b"),
    )
    win = Window.partitionBy("b").orderBy("ok")
    inner = o.select(
        (F.lead("ok").over(win) - F.col("ok") - 1).alias("gap")
    ).filter(F.col("gap") > 0)
    spans = o.groupBy("b").agg(
        F.min("ok").alias("mn"), F.max("ok").alias("mx")
    )
    bwin = Window.orderBy("b")  # bucket-cardinality table: bounded
    seams = spans.select(
        (F.lead("mn").over(bwin) - F.col("mx") - 1).alias("gap")
    ).filter(F.col("gap") > 0)
    g = inner.unionByName(seams)
    return (
        g.select(
            F.when(F.col("gap") == 1, "1_single")
            .when(F.col("gap") <= 10, "2_small")
            .otherwise("3_large")
            .alias("gap_class"),
            "gap",
        )
        .groupBy("gap_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("gap").cast("long").alias("total_missing"),
            F.max("gap").cast("long").alias("max_gap"),
        )
        .orderBy("gap_class")
    )


@register(
    "x269_str_to_map",
    """WITH s AS (SELECT 'lang=' || lang || ',src=' || source ||
                         ',len=' || CAST(n_chars AS VARCHAR) AS cfg
                  FROM documents)
       SELECT string_split(string_split(cfg, ',')[1], '=')[2] AS lang,
              string_split(string_split(cfg, ',')[2], '=')[2]
                AS src,
              CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(CAST(string_split(string_split(cfg, ',')[3],
                            '=')[2] AS BIGINT)) AS BIGINT) AS len_sum
       FROM s GROUP BY 1, 2 ORDER BY lang, src""",
    doc="config-string parsing via str_to_map -- the k=v,k=v payload "
        "format that predates JSON in logs and job confs: the entry "
        "SYNTHESIZES the config string from typed columns, parses it "
        "back with str_to_map(cfg, ',', '=') and aggregates on the "
        "extracted keys, so the parse is pinned against the ground "
        "truth it was rendered from. DuckDB has no str_to_map; the "
        "oracle does the same extraction with indexed string_split "
        "(1-based lists -- dialect seam). Pure codegen, the map "
        "lives only inside the row",
)
def x269_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        F.concat(
            F.lit("lang="), F.col("lang"),
            F.lit(",src="), F.col("source"),
            F.lit(",len="), F.col("n_chars").cast("string"),
        ).alias("cfg")
    )
    m = s.select(
        F.expr("str_to_map(cfg, ',', '=')").alias("m")
    ).select(
        F.col("m")["lang"].alias("lang"),
        F.col("m")["src"].alias("src"),
        F.col("m")["len"].cast("long").alias("len"),
    )
    return (
        m.groupBy("lang", "src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("len").cast("long").alias("len_sum"),
        )
        .orderBy("lang", "src")
    )


@register(
    "x270_from_csv",
    """WITH s AS (SELECT CAST(l_orderkey AS VARCHAR) || ',' ||
                         CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
                         || ',' || l_returnflag AS line
                  FROM lineitem)
       SELECT string_split(line, ',')[3] AS rf,
              CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(CAST(string_split(line, ',')[2] AS BIGINT))
                AS BIGINT) AS qty_sum
       FROM s GROUP BY 1 ORDER BY rf""",
    doc="embedded-CSV column parsing via from_csv -- the schema'd "
        "single-line parser for CSV payloads INSIDE a column (a "
        "Kafka value, a log field), distinct from the x160 file "
        "source: lines synthesize from typed columns, from_csv "
        "parses them back with a declared schema (typed BIGINT "
        "extraction, not string surgery), and the per-flag rollup "
        "hash-pins the parse against the ground truth. Oracle "
        "splits positionally (DuckDB has no from_csv; 1-based list "
        "indexing again). Pure codegen; the struct lives only "
        "inside the row",
)
def x270_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.concat_ws(
            ",",
            F.col("l_orderkey").cast("string"),
            F.col("l_quantity").cast("long").cast("string"),
            F.col("l_returnflag"),
        ).alias("line")
    )
    p = s.select(
        F.from_csv(
            "line", "ok BIGINT, qty BIGINT, rf STRING"
        ).alias("r")
    ).select(F.col("r.rf").alias("rf"), F.col("r.qty").alias("qty"))
    return (
        p.groupBy("rf")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qty").cast("long").alias("qty_sum"),
        )
        .orderBy("rf")
    )


@register(
    "x271_timezone_buckets",
    """WITH t AS (SELECT CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'
                           AT TIME ZONE 'America/New_York' AS local_ts
                  FROM events)
       SELECT CAST(EXTRACT(hour FROM local_ts) AS BIGINT) AS ny_hour,
              CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT CAST(local_ts AS DATE)) AS BIGINT)
                AS n_local_days
       FROM t GROUP BY 1 ORDER BY ny_hour""",
    doc="IANA timezone conversion seam (the DST trap every hourly "
        "rollup migration hits): naive UTC event timestamps render "
        "as America/New_York wall-clock -- Spark from_utc_timestamp "
        "<-> DuckDB's AT TIME ZONE 'UTC' AT TIME ZONE chain (ICU) "
        "-- and aggregate per LOCAL hour-of-day; the fixture's "
        "multi-month span crosses DST transitions, so any "
        "fixed-offset shortcut (ts - INTERVAL 5 HOUR) puts a slice "
        "of events in the wrong local hour and flips both the "
        "per-hour counts and the distinct local-date count. Both "
        "engines resolve the SAME IANA database; wall-clock "
        "conversion is a scan-stage expression, the groupBy is "
        "24-cell bounded",
)
def x271_timezone_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        F.from_utc_timestamp(
            F.col("ts").cast("timestamp"), "America/New_York"
        ).alias("local_ts")
    )
    return (
        t.groupBy(F.hour("local_ts").cast("long").alias("ny_hour"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct(F.col("local_ts").cast("date"))
            .cast("long")
            .alias("n_local_days"),
        )
        .orderBy("ny_hour")
    )


@register(
    "x272_approx_top_k",
    None,
    doc="Spark 4's native approx_top_k aggregate -- the bounded-memory "
        "heavy-hitter that replaces x41's exact two-pass when the key "
        "domain outgrows memory: one pass, maxItemsTracked-bounded "
        "state, mergeable across partitions. The entry reports the "
        "top-10 corpus tokens with their approximate counts; "
        "rows-only by design (DuckDB has no counterpart sketch), "
        "quality-gated against the exact x41-style counts: every "
        "reported count within 2% and >= 8/10 overlap with the exact "
        "top-10 (tests/test_ops_quality.py::"
        "test_approx_top_k_matches_exact_heavy_hitters)",
)
def x272_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.length("tok") >= 1)
    return (
        toks.agg(
            F.expr("approx_top_k(tok, 10, 10000)").alias("top")
        )
        .select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("token"),
            F.col("e.count").cast("long").alias("approx_count"),
        )
        .orderBy(F.desc("approx_count"), "token")
    )


@register(
    "x273_url_parse",
    """WITH u AS (SELECT source || '.example.com' AS host, lang,
                         doc_id % 7 AS ref
                  FROM documents)
       SELECT host, CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
              CAST(SUM(ref) AS BIGINT) AS ref_sum
       FROM u GROUP BY host ORDER BY host""",
    doc="URL decomposition via parse_url -- the web-corpus grouping "
        "primitive (per-host dedup budgets, crawl politeness, domain "
        "mixing weights all start here): URLs SYNTHESIZE injectively "
        "from typed columns, parse_url extracts HOST / the PATH lang "
        "segment / the ?ref= query parameter, and the per-host "
        "rollup hash-pins every extraction against the ground truth "
        "it rendered from (x269/x270's synthesis contract -- DuckDB "
        "has no parse_url, so the oracle states the truth directly). "
        "Pure codegen; a malformed-URL NULL would break a group out "
        "of the hash instantly",
)
def x273_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="), (F.col("doc_id") % 7).cast("string"),
    )
    u = docs.select(url.alias("url")).select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.split(F.parse_url("url", F.lit("PATH")), "/")
        .getItem(1)
        .alias("lang"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref"))
        .cast("long")
        .alias("ref"),
    )
    return (
        u.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum("ref").cast("long").alias("ref_sum"),
        )
        .orderBy("host")
    )


@register(
    "x274_char_trigrams",
    """WITH g AS (SELECT lang,
                    unnest(list_transform(
                      range(1, len(lower(text)) - 1),
                      i -> substr(lower(text), CAST(i AS INTEGER), 3)))
                      AS tri
                  FROM documents WHERE len(lower(text)) >= 3),
       c AS (SELECT lang, tri, CAST(count(*) AS BIGINT) AS cnt
             FROM g GROUP BY 1, 2),
       r AS (SELECT lang, tri, cnt,
                    row_number() OVER (PARTITION BY lang
                      ORDER BY cnt DESC, tri) AS rk
             FROM c)
       SELECT lang, CAST(rk AS BIGINT) AS rk, tri, cnt
       FROM r WHERE rk <= 5 ORDER BY lang, rk""",
    doc="character trigram profile per language -- the sub-token "
        "signal real language-ID models use (x12 votes on stopWORDS; "
        "char n-grams catch languages with no token overlap at all): "
        "every sliding 3-char window generates via a HOF transform "
        "over an index sequence (substr with a COLUMN start only "
        "works inside SQL lambdas -- the F.substring wrapper is "
        "literal-only, x205's wrapper-vs-SQL seam again), counts "
        "reduce in one partial-agg groupBy, top-5 rides a window "
        "over the (lang, trigram) AGGREGATE with a total (cnt, tri) "
        "order so ties are deterministic",
)
def x274_char_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # length >= 3 BEFORE the sequence: Spark's sequence(1, n) with
    # n <= 0 yields a DESCENDING sequence ([1, 0, ...]), not empty --
    # the round-4 bpe_learn_merges trap; DuckDB's range(1, n) is
    # upper-exclusive and simply empties. Filter both sides.
    g = docs.filter(F.length(F.lower("text")) >= 3).select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(lower(text)) - 2), "
                "i -> substr(lower(text), i, 3))"
            )
        ).alias("tri"),
    )
    c = g.groupBy("lang", "tri").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), "tri")
    return (
        c.select(
            "lang", "tri", "cnt",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 5)
        .select("lang", "rk", "tri", "cnt")
        .orderBy("lang", "rk")
    )


@register(
    "x275_xpath_extract",
    """SELECT lang, CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(n_chars) AS BIGINT) AS chars_sum
       FROM documents GROUP BY lang ORDER BY lang""",
    doc="XML field extraction via the xpath_* family -- the legacy "
        "feed format the reference's JSON pipeline never covers: "
        "row-level XML documents synthesize from typed columns "
        "(alphanumeric fields only -- embedding free text would "
        "need entity escaping, documented exclusion), xpath_string "
        "and xpath_long pull the fields back out through real XPath "
        "evaluation, and the per-lang rollup hash-pins the "
        "round-trip against ground truth (the x269/x270/x273 "
        "synthesis contract). Spark evaluates XPath in codegen "
        "scope; DuckDB has no XML support at all -- the oracle is "
        "mechanism-free by necessity",
)
def x275_xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit("<doc><lang>"), F.col("lang"),
        F.lit("</lang><n>"), F.col("n_chars").cast("string"),
        F.lit("</n></doc>"),
    )
    x = docs.select(xml.alias("xml")).select(
        F.expr("xpath_string(xml, '/doc/lang')").alias("lang"),
        F.expr("xpath_long(xml, '/doc/n')").alias("n_chars"),
    )
    return (
        x.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
        )
        .orderBy("lang")
    )


@register(
    "x276_bounded_levenshtein",
    """WITH sh AS (SELECT levenshtein(substr(lower(text), 1, 12),
                      substr(lower(text),
                             1 + CAST(doc_id % 3 AS INTEGER) + 1, 12))
                      AS d
                   FROM documents),
       a AS (SELECT doc_id, substr(lower(text), 1, 24) AS p
             FROM documents),
       adj AS (SELECT levenshtein(a.p, b.p) AS d
               FROM a JOIN a b ON b.doc_id = a.doc_id + 1),
       u AS (SELECT 'shifted_self' AS pair_kind,
                    CASE WHEN d > 5 THEN -1 ELSE d END AS d FROM sh
             UNION ALL
             SELECT 'adjacent_doc',
                    CASE WHEN d > 5 THEN -1 ELSE d END FROM adj)
       SELECT pair_kind, CAST(d AS BIGINT) AS dist,
              CAST(count(*) AS BIGINT) AS n_pairs
       FROM u GROUP BY 1, 2 ORDER BY pair_kind, dist""",
    doc="THRESHOLD-bounded edit distance (Spark 4's 3-arg "
        "levenshtein): the banded O(k*n) computation that makes "
        "edit-distance dedup affordable -- past the threshold the "
        "engine stops and returns -1 instead of filling the full "
        "matrix (x123's blocked ER pays full O(n^2) per candidate "
        "pair; this is the kernel upgrade). TWO pair populations "
        "pin BOTH regimes: shifted-self prefixes (a string vs its "
        "own 1-char shift -- distances land in 0..5, exercising "
        "the in-band exact path at several distances) and "
        "adjacent-doc prefixes "
        "(unrelated text -- lands in the -1 overflow bucket); the "
        "oracle computes UNBOUNDED levenshtein and clamps, so the "
        "early-exit band must agree with the exact distance "
        "everywhere within the threshold, not just on overflow",
)
def x276_bounded_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # shift varies 2..4 by doc parity -> distances spread over the
    # in-band range (2, 4) AND the -1 overflow, so BOTH regimes of the
    # banded kernel appear in the histogram
    sh = docs.select(
        F.expr(
            "levenshtein(substr(lower(text), 1, 12), "
            "substr(lower(text), 1 + CAST(doc_id % 3 AS INT) + 1, 12), "
            "5)"
        ).alias("d")
    ).select(F.lit("shifted_self").alias("pair_kind"), "d")
    a = docs.select(
        "doc_id", F.substring(F.lower("text"), 1, 24).alias("p")
    )
    b = a.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("p").alias("p2")
    )
    adj = (
        a.join(b, "doc_id")
        .select(F.expr("levenshtein(p, p2, 5)").alias("d"))
        .select(F.lit("adjacent_doc").alias("pair_kind"), "d")
    )
    u = sh.unionByName(adj)
    return (
        u.groupBy("pair_kind", F.col("d").cast("long").alias("dist"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("pair_kind", "dist")
    )


@register(
    "x277_luhn_check",
    """WITH n AS (SELECT lpad(CAST(o_orderkey * 7919 %
                           1000000000000000 AS VARCHAR), 16, '0')
                    AS num,
                  o_orderpriority AS prio
                  FROM orders),
       v AS (SELECT prio,
                    CASE WHEN list_sum(list_transform(
                           range(1, 17),
                           i -> CASE WHEN i % 2 = 1 THEN
                                  CASE WHEN 2 * CAST(substr(num,
                                         CAST(i AS INTEGER), 1)
                                       AS INTEGER) > 9
                                  THEN 2 * CAST(substr(num,
                                         CAST(i AS INTEGER), 1)
                                       AS INTEGER) - 9
                                  ELSE 2 * CAST(substr(num,
                                         CAST(i AS INTEGER), 1)
                                       AS INTEGER) END
                                ELSE CAST(substr(num,
                                       CAST(i AS INTEGER), 1)
                                     AS INTEGER) END))
                         % 10 = 0
                    THEN 1 ELSE 0 END AS ok
             FROM n)
       SELECT prio, CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(ok) AS BIGINT) AS n_luhn_valid
       FROM v GROUP BY prio ORDER BY prio""",
    doc="checksum-validation parity: Spark's native luhn_check "
        "(card-number validation -- the PII-scrub gate x49 would "
        "use to confirm a 16-digit hit IS a card before redacting) "
        "against an oracle that REIMPLEMENTS Luhn from first "
        "principles (digit doubling from the right via a list "
        "transform) -- the native function and the textbook "
        "algorithm must agree on every synthesized 16-digit "
        "number (injective from orderkey, ~1 in 10 passes). Any "
        "off-by-one in doubling position parity flips the "
        "per-priority valid counts",
)
def x277_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    n = o.select(
        F.lpad(
            ((F.col("o_orderkey") * 7919) % F.lit(1000000000000000))
            .cast("string"),
            16,
            "0",
        ).alias("num"),
        F.col("o_orderpriority").alias("prio"),
    )
    v = n.select(
        "prio",
        F.expr("luhn_check(num)").cast("int").alias("ok"),
    )
    return (
        v.groupBy("prio")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("ok").cast("long").alias("n_luhn_valid"),
        )
        .orderBy("prio")
    )


@register(
    "x278_bitmap_distinct",
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
              CAST(count(*) AS BIGINT) AS n_orders,
              CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
       FROM orders GROUP BY 1 ORDER BY month""",
    doc="EXACT distinct counting via roaring-style bitmaps (Spark "
        "3.5's bitmap_bucket_number / bitmap_bit_position / "
        "bitmap_construct_agg / bitmap_count) -- the mergeable exact "
        "alternative to x261's approximate HLL: keys bucket into "
        "32768-bit bitmap segments, each (month, bucket) cell folds "
        "its bit positions map-side, and per-month distinct = "
        "SUM(bitmap_count(segment)) because buckets partition the "
        "key domain. Two partial-agg groupBys, state bounded by "
        "occupied buckets (key-density), never by row count -- the "
        "100 TB exact-distinct shape when HLL error is not "
        "acceptable. The oracle's plain count(DISTINCT) must agree "
        "EXACTLY (bitmaps are not approximate)",
)
def x278_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    b = (
        o.select(
            F.date_trunc("month", "o_orderdate").alias("m"),
            F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("m", "bkt")
        .agg(
            F.expr("bitmap_construct_agg(pos)").alias("bm"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    return (
        b.groupBy(F.col("m").cast("date").alias("month"))
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.sum(F.expr("bitmap_count(bm)"))
            .cast("long")
            .alias("n_customers"),
        )
        .orderBy("month")
    )


@register(
    "x279_array_parity",
    """WITH a AS (SELECT lang,
                    (string_split(lower(text), ' '))[1:12] AS ar
                  FROM documents),
       f AS (SELECT lang, md5(concat_ws('|',
                CAST(len(ar) AS VARCHAR),
                CAST(len(list_distinct(ar)) AS VARCHAR),
                array_to_string(list_sort(ar), ','),
                array_to_string(list_reverse_sort(ar), ','),
                CAST(list_position(ar, 'the') AS VARCHAR),
                array_to_string(list_filter(ar, x -> x <> 'the'),
                                ','),
                ar[3],
                array_to_string(list_reverse(ar), ','),
                list_max(ar),
                list_min(ar))) AS fp
             FROM a)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(bit_xor(CAST(('0x' || substr(fp, 1, 15)) AS BIGINT))
                AS BIGINT) AS parity_checksum
       FROM f GROUP BY lang ORDER BY lang""",
    doc="ARRAY-function parity matrix (x263's battery for the nested "
        "domain): ten operations -- size, distinct-size, asc/desc "
        "sort, 1-based position, remove-by-predicate, element_at, "
        "reverse, max, min -- compose into one md5 per row and "
        "XOR-fold per lang. The name map is the payload: "
        "array_distinct<->list_distinct, sort_array(desc)<->"
        "list_reverse_sort, array_position<->list_position (both "
        "1-based, both 0/NULL-on-missing -- pinned by 'the' being "
        "genuinely absent from some rows), array_remove<->"
        "list_filter, element_at<->[i]. One flipped sort order or "
        "off-by-one index anywhere flips the checksum",
)
def x279_array_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(
        "lang",
        F.slice(F.split(F.lower("text"), " "), 1, 12).alias("ar"),
    )
    ar = F.col("ar")
    fp = F.md5(
        F.concat_ws(
            "|",
            F.size(ar).cast("string"),
            F.size(F.array_distinct(ar)).cast("string"),
            F.array_join(F.sort_array(ar), ","),
            F.array_join(F.sort_array(ar, asc=False), ","),
            F.array_position(ar, "the").cast("string"),
            F.array_join(F.array_remove(ar, "the"), ","),
            F.element_at(ar, 3),
            F.array_join(F.reverse(ar), ","),
            F.array_max(ar),
            F.array_min(ar),
        )
    )
    f = a.select("lang", fp.alias("fp"))
    return (
        f.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.bit_xor(
                F.conv(F.substring("fp", 1, 15), 16, 10).cast("long")
            )
            .cast("long")
            .alias("parity_checksum"),
        )
        .orderBy("lang")
    )


@register(
    "x280_mask_pii",
    """WITH m AS (SELECT lang,
                    regexp_replace(regexp_replace(regexp_replace(
                      substr(text, 1, 40),
                      '[A-Z]', 'X', 'g'),
                      '[a-z]', 'x', 'g'),
                      '[0-9]', 'n', 'g') AS masked
                  FROM documents)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT masked) AS BIGINT) AS n_shapes,
              CAST(bit_xor(CAST(('0x' || substr(md5(masked), 1, 15))
                AS BIGINT)) AS BIGINT) AS mask_checksum
       FROM m GROUP BY lang ORDER BY lang""",
    doc="structure-preserving PII masking via Spark 3.5's native "
        "mask() (upper->X, lower->x, digit->n, punctuation kept) -- "
        "the redaction that keeps FORMAT signal (a masked card "
        "still LOOKS like nnnn-nnnn...) so downstream shape "
        "analytics survive, unlike x20's token replacement; the "
        "distinct-shape count per lang is exactly the 'format "
        "fingerprint' cardinality PII classifiers train on. Oracle "
        "re-derives the identical masking as three global "
        "regexp_replace passes ('g' flag -- DuckDB replaces FIRST "
        "match by default, the classic dialect trap, SURVEY seam "
        "list). XOR checksum pins every masked byte",
)
def x280_mask_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "lang",
        F.expr(
            "mask(substr(text, 1, 40), 'X', 'x', 'n', NULL)"
        ).alias("masked"),
    )
    return (
        m.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("masked").cast("long").alias("n_shapes"),
            F.bit_xor(
                F.conv(
                    F.substring(F.md5("masked"), 1, 15), 16, 10
                ).cast("long")
            )
            .cast("long")
            .alias("mask_checksum"),
        )
        .orderBy("lang")
    )


@register(
    "x281_bool_aggregates",
    """SELECT source,
              bool_and(n_chars > 50) AS all_long,
              bool_or(lang = 'en') AS any_en,
              CAST(count_if(n_chars % 2 = 0) AS BIGINT) AS n_even
       FROM documents GROUP BY source ORDER BY source""",
    doc="boolean aggregate parity: bool_and / bool_or / count_if "
        "share names AND semantics across both engines (Spark also "
        "aliases every()/any()/some() -- same functions) -- the "
        "data-quality assertion layer ('EVERY row in this partition "
        "passes the gate') as aggregates instead of filters, which "
        "is how constraint checks fold into a pass the job already "
        "makes (x222's observe principle, expressible in plain "
        "GROUP BY). Boolean columns hash directly; one partial-agg "
        "groupBy",
)
def x281_bool_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.bool_and(F.col("n_chars") > 50).alias("all_long"),
            F.bool_or(F.col("lang") == "en").alias("any_en"),
            F.count_if(F.col("n_chars") % 2 == 0)
            .cast("long")
            .alias("n_even"),
        )
        .orderBy("source")
    )


@register(
    "x282_regex_subset",
    """SELECT lang,
              CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+')))
                AS BIGINT) AS n_words,
              CAST(SUM(len(regexp_extract_all(text, '[0-9]+')))
                AS BIGINT) AS n_numbers,
              CAST(SUM(CASE WHEN regexp_matches(text,
                       '^[A-Z]') THEN 1 ELSE 0 END) AS BIGINT)
                AS n_capital_start,
              CAST(SUM(len(regexp_extract_all(text,
                       '\\b(the|and|of)\\b'))) AS BIGINT)
                AS n_function_words
       FROM documents GROUP BY lang ORDER BY lang""",
    doc="regex DIALECT-SUBSET contract: Spark compiles Java "
        "java.util.regex, DuckDB compiles RE2 -- lookarounds, "
        "backreferences and possessive quantifiers exist ONLY on "
        "the Java side, so any pattern a pipeline must run on both "
        "engines has to stay inside the common subset. The entry "
        "pins that subset operationally: explicit char classes, "
        "quantifiers, anchors, alternation and word boundaries "
        "count identically per lang across four patterns (note "
        "[0-9]/[A-Za-z], NOT \\\\d/\\\\w -- shorthand-class unicode "
        "semantics are the first divergence). The doc is the "
        "negative space: patterns OUTSIDE this subset are a "
        "migration bug, not a porting task",
)
def x282_regex_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return (
        docs.groupBy("lang")
        .agg(
            F.sum(F.size(F.regexp_extract_all(t, F.lit("[A-Za-z]+"), 0)))
            .cast("long")
            .alias("n_words"),
            F.sum(F.size(F.regexp_extract_all(t, F.lit("[0-9]+"), 0)))
            .cast("long")
            .alias("n_numbers"),
            F.sum(F.when(t.rlike("^[A-Z]"), 1).otherwise(0))
            .cast("long")
            .alias("n_capital_start"),
            F.sum(
                F.size(
                    F.regexp_extract_all(
                        t, F.lit(r"\b(the|and|of)\b"), 0
                    )
                )
            )
            .cast("long")
            .alias("n_function_words"),
        )
        .orderBy("lang")
    )


@register(
    "x283_multi_gap_sessions",
    """WITH g AS (SELECT user_id,
                    epoch_us(ts) - lag(epoch_us(ts)) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id)
                      AS gap_us
                  FROM events)
       SELECT CAST(t.mins AS BIGINT) AS gap_minutes,
              CAST(SUM(CASE WHEN g.gap_us IS NULL
                            OR g.gap_us > CAST(t.mins AS BIGINT) * 60 * 1000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
       FROM g CROSS JOIN (VALUES (5), (30), (120)) AS t(mins)
       GROUP BY 1 ORDER BY gap_minutes""",
    doc="session-gap SENSITIVITY CURVE -- x21 sessionizes at one "
        "threshold; choosing that threshold needs the session count "
        "at several, and the naive approach re-shuffles the corpus "
        "per candidate. Here the per-user gap computes ONCE (one "
        "user-key window shuffle), then each gap row votes "
        "'session start' against all three thresholds -- the "
        "3-row VALUES dim crossed in (broadcast, rows x 3 only in "
        "the aggregate input, never materialized wide). Session "
        "count = count of starts, so no session-id assignment is "
        "even needed; integer microsecond gaps (x161's epoch "
        "contract) keep the threshold comparison exact",
)
def x283_multi_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = ev.select(
        (us - F.lag(us).over(w)).alias("gap_us")
    )
    dims = F.broadcast(
        spark.createDataFrame([(5,), (30,), (120,)], "mins bigint")
    )
    j = g.crossJoin(dims)
    return (
        j.groupBy(F.col("mins").cast("long").alias("gap_minutes"))
        .agg(
            F.sum(
                F.when(
                    F.col("gap_us").isNull()
                    | (F.col("gap_us") > F.col("mins") * 60 * 1000000),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_sessions")
        )
        .orderBy("gap_minutes")
    )


@register(
    "x284_crosstab",
    """SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt
       FROM documents GROUP BY 1, 2 ORDER BY lang, source""",
    doc="the DataFrameStatFunctions.crosstab API surface: the "
        "contingency table materializes WIDE (one column per "
        "distinct source -- fine for bounded domains, a schema "
        "explosion for unbounded ones, which is the documented "
        "contract), then unpivots back to tidy (lang, source, cnt) "
        "rows via stack so the hash is schema-stable regardless of "
        "column order. Zero-count cells drop on unpivot to match "
        "the relational GROUP BY the oracle states -- crosstab "
        "fills absent combinations with 0, GROUP BY omits them; "
        "the filter IS the semantic reconciliation",
)
def x284_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ct = docs.stat.crosstab("lang", "source")
    src_cols = sorted(c for c in ct.columns if c != "lang_source")
    stack_expr = "stack({}, {}) AS (source, cnt)".format(
        len(src_cols),
        ", ".join(f"'{c}', `{c}`" for c in src_cols),
    )
    return (
        ct.select(
            F.col("lang_source").alias("lang"), F.expr(stack_expr)
        )
        .filter(F.col("cnt") > 0)
        .select("lang", "source", F.col("cnt").cast("long").alias("cnt"))
        .orderBy("lang", "source")
    )


@register(
    "x285_freq_items",
    None,
    doc="the DataFrameStatFunctions.freqItems API surface -- "
        "single-pass Karp/Misra-Gries frequent-item sketching with "
        "the textbook guarantee: every value with frequency above "
        "the support threshold IS in the result (false positives "
        "allowed, false negatives never). Rows-only by design (the "
        "false-positive set is implementation-defined); the gate "
        "asserts the guarantee itself: all truly-frequent langs and "
        "sources (support 0.1) appear in the returned arrays "
        "(tests/test_ops_quality.py::"
        "test_freq_items_never_misses_frequent_values)",
)
def x285_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fi = docs.stat.freqItems(["lang", "source"], support=0.1)
    return fi.select(
        F.array_join(F.array_sort("lang_freqItems"), ",").alias(
            "langs"
        ),
        F.array_join(F.array_sort("source_freqItems"), ",").alias(
            "sources"
        ),
    )


@register(
    "x286_welch_ttest",
    """WITH t AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B'
                         END AS grp,
                    CAST(round(value * 100, 0) AS BIGINT) AS c
                  FROM events WHERE event_type = 'purchase'),
       m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(c AS DECIMAL(19,0)))
                      AS DECIMAL(38,0)) AS s1,
                    CAST(SUM(CAST(c AS DECIMAL(19,0))
                             * CAST(c AS DECIMAL(19,0)))
                      AS DECIMAL(38,0)) AS s2
             FROM t GROUP BY grp),
       w AS (SELECT
               MAX(CASE WHEN grp = 'A' THEN n END) AS na,
               MAX(CASE WHEN grp = 'A' THEN CAST(s1 AS DOUBLE) END)
                 AS sa1,
               MAX(CASE WHEN grp = 'A' THEN CAST(s2 AS DOUBLE) END)
                 AS sa2,
               MAX(CASE WHEN grp = 'B' THEN n END) AS nb,
               MAX(CASE WHEN grp = 'B' THEN CAST(s1 AS DOUBLE) END)
                 AS sb1,
               MAX(CASE WHEN grp = 'B' THEN CAST(s2 AS DOUBLE) END)
                 AS sb2
             FROM m)
       SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
              ROUND((sa1 / na - sb1 / nb)
                    / sqrt((sa2 / na - (sa1 / na) * (sa1 / na))
                             / (na - 1)
                           + (sb2 / nb - (sb1 / nb) * (sb1 / nb))
                             / (nb - 1)), 6) AS t_stat
       FROM w""",
    doc="Welch two-sample t statistic from exact moment sums -- the "
        "significance number x125's A/B lift is missing (a lift "
        "without a t is a coin flip with confidence theater): per-arm "
        "count / sum / sum-of-squares accumulate as exact integers "
        "(x267's DECIMAL(38,0) contract), the two arms pivot into "
        "ONE row via conditional MAX (a 2-row aggregate -- no join), "
        "and the t assembles in a single double expression written "
        "identically in both dialects. Unequal variances assumed "
        "(Welch, not pooled Student) -- the version that is valid "
        "when arms differ in spread, which real experiments do",
)
def x286_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = ev.filter(F.col("event_type") == "purchase").select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias(
            "grp"
        ),
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )
    cd = F.col("c").cast("decimal(19,0)")
    m = t.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cd).cast("decimal(38,0)").alias("s1"),
        F.sum(cd * cd).cast("decimal(38,0)").alias("s2"),
    )
    w = m.agg(
        F.max(F.when(F.col("grp") == "A", F.col("n"))).alias("na"),
        F.max(
            F.when(F.col("grp") == "A", F.col("s1").cast("double"))
        ).alias("sa1"),
        F.max(
            F.when(F.col("grp") == "A", F.col("s2").cast("double"))
        ).alias("sa2"),
        F.max(F.when(F.col("grp") == "B", F.col("n"))).alias("nb"),
        F.max(
            F.when(F.col("grp") == "B", F.col("s1").cast("double"))
        ).alias("sb1"),
        F.max(
            F.when(F.col("grp") == "B", F.col("s2").cast("double"))
        ).alias("sb2"),
    )
    return w.selectExpr(
        "CAST(na AS BIGINT) AS n_a",
        "CAST(nb AS BIGINT) AS n_b",
        """ROUND((sa1 / na - sb1 / nb)
                 / sqrt((sa2 / na - (sa1 / na) * (sa1 / na))
                          / (na - 1)
                        + (sb2 / nb - (sb1 / nb) * (sb1 / nb))
                          / (nb - 1)), 6) AS t_stat""",
    )


@register(
    "x287_linear_interpolation",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                      AS BIGINT) AS cents
                  FROM events WHERE event_type = 'purchase'
                  GROUP BY 1),
       nulled AS (SELECT day,
                    CASE WHEN EXTRACT(day FROM day) % 5 = 0 THEN NULL
                         ELSE cents END AS v
                  FROM d),
       ctx AS (SELECT day, v,
                 last_value(v IGNORE NULLS) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS pv,
                 first_value(v IGNORE NULLS) OVER (ORDER BY day
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS nv,
                 last_value(CASE WHEN v IS NOT NULL THEN day END
                   IGNORE NULLS) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS pd,
                 first_value(CASE WHEN v IS NOT NULL THEN day END
                   IGNORE NULLS) OVER (ORDER BY day
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS nd
               FROM nulled),
       f AS (SELECT day,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN pv IS NULL THEN nv
                    WHEN nv IS NULL THEN pv
                    ELSE (pv * CAST(nd - day AS BIGINT)
                          + nv * CAST(day - pd AS BIGINT))
                         // CAST(nd - pd AS BIGINT) END AS filled,
               CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_gap
             FROM ctx)
       SELECT CAST(count(*) AS BIGINT) AS n_days,
              CAST(SUM(was_gap) AS BIGINT) AS n_filled,
              CAST(SUM(filled) AS BIGINT) AS total_cents
       FROM f""",
    doc="LINEAR interpolation gap fill -- the imputation tier above "
        "x211's LOCF (a silent sensor repeats; a missing REVENUE day "
        "should split the difference): deterministic nulls (day%5) "
        "punch holes in the daily series, each hole finds its "
        "bracketing observations via four IGNORE-NULLS window "
        "functions over the day-cardinality aggregate (x81's "
        "bounded contract -- the corpus never meets a window), and "
        "the interpolated value is INTEGER-EXACT in the WEIGHTED "
        "form ((pv*(nd-day) + nv*(day-pd)) DIV span) -- the "
        "numerator stays non-negative, dodging the //-floors vs "
        "DIV-truncates divergence on negatives (seam). Leading/"
        "trailing holes degrade to nearest-neighbor explicitly. "
        "DuckDB date subtraction yields integer days; Spark uses "
        "datediff -- same number, different spelling (seam)",
)
def x287_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    nulled = d.select(
        "day",
        F.when(F.dayofmonth("day") % 5 == 0, None)
        .otherwise(F.col("cents"))
        .alias("v"),
    )
    back = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    fwd = Window.orderBy("day").rowsBetween(
        1, Window.unboundedFollowing
    )
    vday = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = nulled.select(
        "day",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.last(vday, ignorenulls=True).over(back).alias("pd"),
        F.first(vday, ignorenulls=True).over(fwd).alias("nd"),
    )
    filled = F.when(F.col("v").isNotNull(), F.col("v")).when(
        F.col("pv").isNull(), F.col("nv")
    ).when(F.col("nv").isNull(), F.col("pv")).otherwise(
        # weighted form keeps the numerator NON-NEGATIVE so integer
        # division agrees across engines (DuckDB // floors, Spark DIV
        # truncates toward zero -- they differ on negatives)
        F.expr(
            "(pv * CAST(datediff(nd, day) AS BIGINT) "
            " + nv * CAST(datediff(day, pd) AS BIGINT)) "
            "DIV CAST(datediff(nd, pd) AS BIGINT)"
        )
    )
    f = ctx.select(
        filled.alias("filled"),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("was_gap"),
    )
    return f.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("was_gap").cast("long").alias("n_filled"),
        F.sum("filled").cast("long").alias("total_cents"),
    )


@register(
    "x288_seasonality_index",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                      AS BIGINT) AS cents
                  FROM events GROUP BY 1),
       w AS (SELECT CAST(EXTRACT(isodow FROM day) AS BIGINT) AS dow,
                    CAST(count(*) AS BIGINT) AS n_days,
                    CAST(SUM(cents) AS BIGINT) AS cents
             FROM d GROUP BY 1),
       t AS (SELECT CAST(SUM(n_days) AS BIGINT) AS tot_days,
                    CAST(SUM(cents) AS BIGINT) AS tot_cents
             FROM w)
       SELECT w.dow, w.n_days, w.cents,
              CAST(w.cents * t.tot_days * 10000
                   // (w.n_days * t.tot_cents) AS BIGINT)
                AS seasonal_idx_x1e4
       FROM w, t ORDER BY dow""",
    doc="day-of-week seasonality index -- the multiplicative factor "
        "capacity planning and anomaly baselines both need (x77 "
        "flags deviations; this MEASURES the expected weekly shape): "
        "index = (dow mean / overall mean) as ONE integer expression "
        "-- cents*tot_days*1e4 DIV (n_days*tot_cents) -- so no "
        "intermediate float mean ever exists (numerator ~1e14, "
        "safely in BIGINT). The corpus reduces to day cells, then "
        "7 dow cells; the 1-row total attaches by broadcast cross "
        "join. ISO day-of-week on both engines (EXTRACT(isodow) <-> "
        "dayofweek remapped -- Spark's dayofweek is 1=Sunday, the "
        "off-by-one every calendar migration hits; documented by "
        "construction here)",
)
def x288_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    # Spark dayofweek(): 1=Sunday..7=Saturday; ISO wants 1=Monday..7=Sunday
    iso = ((F.dayofweek("day") + 5) % 7 + 1).cast("long")
    w = d.groupBy(iso.alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("cents"),
    )
    t = w.agg(
        F.sum("n_days").cast("long").alias("tot_days"),
        F.sum("cents").cast("long").alias("tot_cents"),
    )
    return (
        w.crossJoin(F.broadcast(t))
        .select(
            "dow",
            "n_days",
            "cents",
            F.expr(
                "CAST(cents * tot_days * 10000 "
                "DIV (n_days * tot_cents) AS BIGINT)"
            ).alias("seasonal_idx_x1e4"),
        )
        .orderBy("dow")
    )


@register(
    "x289_cusum_changepoint",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                    CAST(count(*) AS BIGINT) AS n
                  FROM events GROUP BY 1),
       t AS (SELECT CAST(count(*) AS BIGINT) AS k,
                    CAST(SUM(n) AS BIGINT) AS total FROM d),
       c AS (SELECT day,
                    CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                      AS i,
                    CAST(SUM(n) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                      ROW) AS BIGINT) AS prefix
             FROM d),
       s AS (SELECT c.day, c.i,
                    CAST(t.k * c.prefix - c.i * t.total AS BIGINT)
                      AS scaled_cusum
             FROM c, t)
       SELECT day, i AS day_index, scaled_cusum
       FROM s
       ORDER BY abs(scaled_cusum) DESC, day
       LIMIT 5""",
    doc="CUSUM changepoint scan with ZERO floats: the classic "
        "cumulative deviation from the mean, "
        "CUSUM_k = prefix_k - k*mean, scaled by the day count K "
        "into K*prefix_k - k*total -- an EXACT integer that ranks "
        "identically (positive scaling preserves argmax), so the "
        "level-shift candidate (max |CUSUM|) is bit-deterministic "
        "cross-engine where the float formulation would hash-drift. "
        "The running sum rides the day-cardinality aggregate (x81 "
        "bounded contract), the (K, total) pair broadcasts as one "
        "row; top-5 by |scaled| with a day tiebreak makes the "
        "output total-ordered",
)
def x289_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = d.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("total"),
    )
    w = Window.orderBy("day")
    c = d.select(
        "day",
        F.row_number().over(w).cast("long").alias("i"),
        F.sum("n")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("prefix"),
    )
    s = c.crossJoin(F.broadcast(t)).select(
        "day",
        F.col("i").alias("day_index"),
        (F.col("k") * F.col("prefix") - F.col("i") * F.col("total"))
        .cast("long")
        .alias("scaled_cusum"),
    )
    return s.orderBy(
        F.abs(F.col("scaled_cusum")).desc(), "day"
    ).limit(5)


@register(
    "x290_autocorrelation",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                      AS BIGINT) AS v
                  FROM events GROUP BY 1),
       p AS (SELECT l.lag, CAST(count(*) AS BIGINT) AS n,
                    CAST(SUM(a.v) AS BIGINT) AS sx,
                    CAST(SUM(b.v) AS BIGINT) AS sy,
                    CAST(SUM(CAST(a.v AS DECIMAL(19,0))
                             * CAST(b.v AS DECIMAL(19,0)))
                      AS DECIMAL(38,0)) AS sxy,
                    CAST(SUM(CAST(a.v AS DECIMAL(19,0))
                             * CAST(a.v AS DECIMAL(19,0)))
                      AS DECIMAL(38,0)) AS sxx,
                    CAST(SUM(CAST(b.v AS DECIMAL(19,0))
                             * CAST(b.v AS DECIMAL(19,0)))
                      AS DECIMAL(38,0)) AS syy
             FROM d a
             JOIN (VALUES (1), (7)) AS l(lag) ON TRUE
             JOIN d b ON b.day = a.day + CAST(l.lag AS INTEGER)
             GROUP BY 1)
       SELECT CAST(lag AS BIGINT) AS lag, n,
              ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE)
                                * CAST(sy AS DOUBLE))), 6) AS acf
       FROM p ORDER BY lag""",
    doc="lag-1 and lag-7 autocorrelation of the daily revenue series "
        "-- the two numbers that say 'trending' vs 'weekly-seasonal' "
        "(x288 measures the shape; this measures how much structure "
        "exists to measure): the lagged pairing is an exact DATE "
        "equi-join on the day-cardinality table (missing days "
        "correctly produce NO pair -- a row-lag would silently "
        "pair across gaps, x207's lesson), Pearson assembles from "
        "exact integer/decimal moment sums in one double expression "
        "written identically in both dialects (x189/x267 contract). "
        "Both lags share one pass via the 2-row VALUES dim",
)
def x290_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("v")
    )
    lags = F.broadcast(
        spark.createDataFrame([(1,), (7,)], "lag bigint")
    )
    a = d.select(F.col("day").alias("aday"), F.col("v").alias("av"))
    b = d.select(F.col("day").alias("bday"), F.col("v").alias("bv"))
    pairs = (
        a.crossJoin(lags)
        .join(
            b,
            F.col("bday")
            == F.expr("date_add(aday, CAST(lag AS INT))"),
        )
    )
    ad = F.col("av").cast("decimal(19,0)")
    bd = F.col("bv").cast("decimal(19,0)")
    p = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("av").cast("long").alias("sx"),
        F.sum("bv").cast("long").alias("sy"),
        F.sum(ad * bd).cast("decimal(38,0)").alias("sxy"),
        F.sum(ad * ad).cast("decimal(38,0)").alias("sxx"),
        F.sum(bd * bd).cast("decimal(38,0)").alias("syy"),
    )
    return p.selectExpr(
        "CAST(lag AS BIGINT) AS lag",
        "n",
        """ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE)
                             * CAST(sy AS DOUBLE))), 6) AS acf""",
    ).orderBy("lag")


@register(
    "x291_runs_test",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                    CAST(count(*) AS BIGINT) AS n
                  FROM events GROUP BY 1),
       med AS (SELECT CAST(quantile_disc(n, 0.5) AS BIGINT) AS m
               FROM d),
       s AS (SELECT day,
                    CASE WHEN d.n > med.m THEN 1 ELSE 0 END AS above
             FROM d, med WHERE d.n <> med.m),
       r AS (SELECT above,
                    CASE WHEN lag(above) OVER (ORDER BY day)
                         IS DISTINCT FROM above
                    THEN 1 ELSE 0 END AS new_run
             FROM s)
       SELECT CAST(SUM(new_run) AS BIGINT) AS n_runs,
              CAST(SUM(above) AS BIGINT) AS n_above,
              CAST(SUM(1 - above) AS BIGINT) AS n_below
       FROM r""",
    doc="Wald-Wolfowitz runs test inputs -- the randomness check "
        "behind 'is this daily series actually trending or just "
        "noisy' (too FEW runs = regime persistence, too MANY = "
        "oscillation): days classify above/below the DISCRETE "
        "median (quantile_disc picks an actual value -- x254's "
        "seam -- so median-equal days drop symmetrically on both "
        "engines), runs count via the lag-transition flag with "
        "IS DISTINCT FROM handling the first row's NULL, all over "
        "the day-cardinality table. The z-statistic is left to the "
        "consumer: (n_runs, n_above, n_below) is the sufficient "
        "statistic and keeps the hash float-free",
)
def x291_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    med = d.agg(
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n) "
            "AS BIGINT)"
        ).alias("m")
    )
    s = (
        d.crossJoin(F.broadcast(med))
        .filter(F.col("n") != F.col("m"))
        .select(
            "day",
            F.when(F.col("n") > F.col("m"), 1).otherwise(0).alias(
                "above"
            ),
        )
    )
    w = Window.orderBy("day")
    r = s.select(
        "above",
        F.when(
            ~F.lag("above").over(w).eqNullSafe(F.col("above")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    return r.agg(
        F.sum("new_run").cast("long").alias("n_runs"),
        F.sum("above").cast("long").alias("n_above"),
        F.sum(1 - F.col("above")).cast("long").alias("n_below"),
    )


@register(
    "x292_ewma_halflife",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                      AS BIGINT) AS v
                  FROM events GROUP BY 1),
       r AS (SELECT day, v,
                    CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                      AS i
             FROM d),
       e AS (SELECT a.day, a.i,
                    CAST(SUM(b.v * CAST(power(2, 10 - (a.i - b.i))
                             AS BIGINT)) AS BIGINT) AS num,
                    CAST(SUM(CAST(power(2, 10 - (a.i - b.i))
                             AS BIGINT)) AS BIGINT) AS den
             FROM r a JOIN r b
               ON b.i BETWEEN a.i - 10 AND a.i
             GROUP BY 1, 2)
       SELECT day, CAST(num // den AS BIGINT) AS ewma_cents
       FROM e ORDER BY day""",
    doc="half-life EWMA with ZERO floats: weights for a half-life-of-"
        "one-step decay are powers of two, so the 11-day windowed "
        "EWMA is an exact integer ratio -- numerator = sum of "
        "v_i * 2^(10-lag), denominator = sum of the same weights "
        "(self-normalizing at the series head, where fewer than 11 "
        "points exist -- the boundary most EWMA implementations get "
        "silently wrong). The float formulation (pow(alpha, lag)) "
        "is engine-divergent per the verify gotchas; integer "
        "power-of-two weights are not. The rank self-join runs on "
        "the day-cardinality table (x81 bounded contract), 11 rows "
        "per row, and power(2, k) on INTEGER exponents is exact in "
        "both engines for k <= 10",
)
def x292_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("v")
    )
    r = d.select(
        "day", "v",
        F.row_number().over(Window.orderBy("day")).cast("long")
        .alias("i"),
    )
    a = r.select(F.col("day"), F.col("i").alias("ai"))
    b = r.select(F.col("i").alias("bi"), F.col("v").alias("bv"))
    wgt = F.pow(F.lit(2.0), 10 - (F.col("ai") - F.col("bi"))).cast(
        "long"
    )
    e = (
        a.join(
            b,
            (F.col("bi") >= F.col("ai") - 10)
            & (F.col("bi") <= F.col("ai")),
        )
        .groupBy("day", "ai")
        .agg(
            F.sum(F.col("bv") * wgt).cast("long").alias("num"),
            F.sum(wgt).cast("long").alias("den"),
        )
    )
    return e.select(
        "day",
        F.expr("CAST(num DIV den AS BIGINT)").alias("ewma_cents"),
    ).orderBy("day")


@register(
    "x293_association_rules",
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
                      FROM lineitem),
       n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nb
             FROM items),
       s AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS supp
             FROM items GROUP BY 1),
       p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                    CAST(count(*) AS BIGINT) AS supp_ab
             FROM items a JOIN items b USING (l_orderkey)
             WHERE a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 3),
       l AS (SELECT p.pa, p.pb, p.supp_ab,
                    CAST(p.supp_ab * n.nb * 10000
                         // (sa.supp * sb.supp) AS BIGINT)
                      AS lift_x1e4
             FROM p, n
             JOIN s sa ON sa.l_partkey = p.pa
             JOIN s sb ON sb.l_partkey = p.pb)
       SELECT pa, pb, supp_ab, lift_x1e4
       FROM l ORDER BY lift_x1e4 DESC, pa, pb LIMIT 10""",
    doc="association-rule mining over the co-purchase pairs (x76 "
        "counts support; this prices it): lift = P(ab)/(P(a)P(b)) "
        "as ONE integer expression -- supp_ab * n_baskets * 1e4 "
        "DIV (supp_a * supp_b) -- so no probability ever exists as "
        "a float; the support>=3 floor prunes the pair table BEFORE "
        "the single-item supports attach (two broadcast-joinable "
        "lookups at any scale: the item-support table is "
        "part-cardinality). Top-10 by (lift, pa, pb) is "
        "total-ordered. The pair table comes from the basket-key "
        "equi-join (pairs are basket-local by construction -- the "
        "join key is the basket id, so cardinality is bounded by "
        "basket size squared, x76's contract)",
)
def x293_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = items.agg(
        F.countDistinct("l_orderkey").cast("long").alias("nb")
    )
    s = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("supp")
    )
    a = items.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("pa")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb")
    )
    p = (
        a.join(b, (a["l_orderkey"] == b["ok2"]) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("supp_ab"))
        .filter(F.col("supp_ab") >= 3)
    )
    sa = s.select(F.col("l_partkey").alias("pa"), F.col("supp").alias("supp_a"))
    sb = s.select(F.col("l_partkey").alias("pb"), F.col("supp").alias("supp_b"))
    l = (
        p.crossJoin(F.broadcast(n))
        .join(F.broadcast(sa), "pa")
        .join(F.broadcast(sb), "pb")
        .select(
            "pa", "pb", "supp_ab",
            F.expr(
                "CAST(supp_ab * nb * 10000 "
                "DIV (supp_a * supp_b) AS BIGINT)"
            ).alias("lift_x1e4"),
        )
    )
    return l.orderBy(F.desc("lift_x1e4"), "pa", "pb").limit(10)


@register(
    "x294_fifo_matching",
    """WITH mv AS (SELECT l_partkey AS part,
                    CASE WHEN l_returnflag = 'R' THEN 'in'
                         ELSE 'out' END AS dir,
                    CAST(l_quantity AS BIGINT) AS qty,
                    l_shipdate, l_orderkey, l_linenumber
                  FROM lineitem WHERE l_partkey % 50 = 0),
       c AS (SELECT part, dir, qty,
                    CAST(SUM(qty) OVER (PARTITION BY part, dir
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                      ROW) AS BIGINT) AS hi
             FROM mv),
       iv AS (SELECT part, dir, hi - qty AS lo, hi FROM c),
       m AS (SELECT i.part,
                    CAST(SUM(LEAST(i.hi, o.hi)
                             - GREATEST(i.lo, o.lo)) AS BIGINT)
                      AS matched_qty
             FROM iv i JOIN iv o
               ON o.part = i.part AND i.dir = 'in' AND o.dir = 'out'
              AND i.lo < o.hi AND o.lo < i.hi
             GROUP BY 1),
       tot AS (SELECT part,
                      CAST(SUM(CASE WHEN dir = 'in' THEN qty END)
                        AS BIGINT) AS total_in,
                      CAST(SUM(CASE WHEN dir = 'out' THEN qty END)
                        AS BIGINT) AS total_out
               FROM mv GROUP BY 1)
       SELECT t.part, t.total_in, t.total_out,
              COALESCE(m.matched_qty, 0) AS matched_qty
       FROM tot t LEFT JOIN m ON m.part = t.part
       ORDER BY t.part""",
    doc="FIFO layer matching -- the inventory/cost-attribution "
        "algorithm that LOOKS inherently sequential (each issue "
        "consumes the oldest open receipt) expressed as pure "
        "relational algebra: per part, receipts and issues each "
        "become cumulative-quantity INTERVALS ([cum-qty, cum+qty) "
        "on the shared FIFO number line), and matched quantity is "
        "the total INTERVAL OVERLAP -- an interval join on the "
        "cumulative axis (x30's range-join shape on a derived "
        "domain). Both cumulative windows share one part-key "
        "shuffle; the overlap join is part-local and "
        "layer-cardinality bounded. Total ORDER BY (shipdate, "
        "orderkey, linenumber) makes the FIFO sequence -- and "
        "therefore every layer boundary -- deterministic; the part "
        "% 50 sample keeps the oracle's self-join honest at sf0.1",
)
def x294_fifo_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    mv = li.filter(F.col("l_partkey") % 50 == 0).select(
        F.col("l_partkey").alias("part"),
        F.when(F.col("l_returnflag") == "R", "in")
        .otherwise("out")
        .alias("dir"),
        F.col("l_quantity").cast("long").alias("qty"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    w = (
        Window.partitionBy("part", "dir")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = mv.select(
        "part", "dir", "qty",
        F.sum("qty").over(w).cast("long").alias("hi"),
    )
    iv = c.select(
        "part", "dir", (F.col("hi") - F.col("qty")).alias("lo"), "hi"
    )
    i = iv.filter(F.col("dir") == "in").select(
        "part", F.col("lo").alias("ilo"), F.col("hi").alias("ihi")
    )
    o = iv.filter(F.col("dir") == "out").select(
        F.col("part").alias("part2"),
        F.col("lo").alias("olo"),
        F.col("hi").alias("ohi"),
    )
    m = (
        i.join(
            o,
            (F.col("part") == F.col("part2"))
            & (F.col("ilo") < F.col("ohi"))
            & (F.col("olo") < F.col("ihi")),
        )
        .groupBy("part")
        .agg(
            F.sum(
                F.least("ihi", "ohi") - F.greatest("ilo", "olo")
            )
            .cast("long")
            .alias("matched_qty")
        )
    )
    tot = mv.groupBy("part").agg(
        F.sum(F.when(F.col("dir") == "in", F.col("qty")))
        .cast("long")
        .alias("total_in"),
        F.sum(F.when(F.col("dir") == "out", F.col("qty")))
        .cast("long")
        .alias("total_out"),
    )
    return (
        tot.join(m, "part", "left")
        .select(
            "part",
            "total_in",
            "total_out",
            F.coalesce("matched_qty", F.lit(0))
            .cast("long")
            .alias("matched_qty"),
        )
        .orderBy("part")
    )


def _x295_oracle() -> str:
    from ..ops.incremental import incremental_neardup_oracle_sql

    return incremental_neardup_oracle_sql()


@register(
    "x295_incremental_neardup",
    _x295_oracle(),
    doc="cross-batch incremental NEAR-dup dedup end-to-end (the "
        "continuous-ingestion capability round-5 flagged missing: the "
        "persistent index was exact-hash only, so a drop paraphrasing "
        "yesterday's corpus sailed through). Batch 1 (doc_id % 5 < 3) "
        "self-dedups via deterministic MinHash band candidates + "
        "exact-Jaccard verify over HASHED shingle sets; its survivors' "
        "signatures (4 band keys + 16-hex shingle hashes, "
        "ops/incremental.py neardup_signatures) ARE the index -- no "
        "prior text is ever re-read. Batch 2 then probes the index and "
        "itself; each doc is classified neardup_prior / neardup_batch "
        "/ fresh (prior wins). Scale: the only corpus-sized shuffle "
        "per probe is the (band_id, band_key) equi-join; verify joins "
        "are candidate-sized; hot index bands capped at 1000 docs. "
        "Persistence leg (parquet append-mode index, idempotent "
        "re-runs) in incremental_neardup_dedup + "
        "streaming/dedup.py stream_incremental_neardup, exercised in "
        "tests/test_incremental.py",
)
def x295_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.incremental import neardup_matches, neardup_signatures

    docs = load_table(spark, sf_dir, "documents")
    b1 = docs.filter(F.col("doc_id") % 5 < 3)
    b2 = docs.filter(F.col("doc_id") % 5 >= 3)
    s1 = neardup_signatures(b1)
    drop1 = (
        neardup_matches(s1, s1)
        .filter(F.col("old_id") < F.col("new_id"))
        .select("new_id")
        .distinct()
    )
    idx = s1.join(drop1, s1["doc"] == drop1["new_id"], "left_anti")
    s2 = neardup_signatures(b2)
    within = (
        neardup_matches(s2, s2)
        .filter(F.col("old_id") < F.col("new_id"))
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
        .withColumn("__w", F.lit(1))
    )
    prior = (
        neardup_matches(s2, idx)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
        .withColumn("__p", F.lit(1))
    )
    status = (
        F.when(F.col("__p") == 1, F.lit("neardup_prior"))
        .when(F.col("__w") == 1, F.lit("neardup_batch"))
        .otherwise(F.lit("fresh"))
    )
    return (
        b2.select("doc_id")
        .join(prior, "doc_id", "left")
        .join(within, "doc_id", "left")
        .select("doc_id", status.alias("status"))
        .orderBy("doc_id")
    )


@register(
    "x310_cdc_merge",
    """WITH snap AS (
         SELECT c_custkey AS k,
                CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
         FROM customer
       ),
       cdc AS (
         SELECT k, 'U' AS op, cents + 10000 AS new_cents
         FROM snap WHERE k % 7 = 0
         UNION ALL
         SELECT k, 'D', NULL FROM snap
         WHERE k % 7 <> 0 AND k % 11 = 0
         UNION ALL
         SELECT k + 1000000, 'I', cents FROM snap WHERE k % 13 = 0
       ),
       merged AS (
         SELECT COALESCE(s.k, c.k) AS k,
                c.op,
                CASE WHEN c.op = 'U' THEN c.new_cents
                     WHEN c.op = 'I' THEN c.new_cents
                     ELSE s.cents END AS cents
         FROM snap s FULL OUTER JOIN cdc c ON c.k = s.k
         WHERE c.op IS NULL OR c.op <> 'D'
       )
       SELECT (SELECT CAST(count(*) AS BIGINT) FROM snap) AS n_before,
              CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_updated,
              CAST(SUM(CASE WHEN op = 'I' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inserted,
              (SELECT CAST(count(*) AS BIGINT) FROM cdc
               WHERE op = 'D') AS n_deleted,
              CAST(count(*) AS BIGINT) AS n_after,
              CAST(SUM(cents) AS BIGINT) AS total_cents_after
       FROM merged""",
    doc="CDC MERGE apply (upsert/delete) as pure DataFrame algebra -- "
        "the MERGE INTO shape without a table format: a deterministic "
        "change feed (updates +100.00 for custkey%7, deletes for %11, "
        "inserts as key+1e6 clones for %13) applies onto the customer "
        "snapshot via ONE key-partitioned FULL OUTER join + CASE -- "
        "matched-update, matched-delete and not-matched-insert in a "
        "single pass, the exact semantics Delta/Iceberg MERGE "
        "compiles to. Balances stay exact integer cents; the output "
        "reconciles op counts against n_before/n_after (the "
        "audit every CDC pipeline ships). Scale: both sides shuffle "
        "once on the merge key; at 100 TB this is the same "
        "sort-merge FULL OUTER any snapshot+feed reconciliation "
        "pays, with no driver-side state",
)
def x310_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    snap = cust.select(
        F.col("c_custkey").alias("k"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    upd = snap.filter(F.col("k") % 7 == 0).select(
        "k", F.lit("U").alias("op"), (F.col("cents") + 10000).alias("new_cents")
    )
    dele = snap.filter((F.col("k") % 7 != 0) & (F.col("k") % 11 == 0)).select(
        "k", F.lit("D").alias("op"), F.lit(None).cast("long").alias("new_cents")
    )
    ins = snap.filter(F.col("k") % 13 == 0).select(
        (F.col("k") + 1000000).alias("k"),
        F.lit("I").alias("op"),
        F.col("cents").alias("new_cents"),
    )
    cdc = upd.union(dele).union(ins)
    s = snap.withColumnRenamed("k", "sk")
    merged = (
        s.join(cdc, s["sk"] == cdc["k"], "full_outer")
        .filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce("sk", "k").alias("mk"),
            "op",
            F.when(F.col("op").isin("U", "I"), F.col("new_cents"))
            .otherwise(F.col("cents"))
            .alias("mcents"),
        )
    )
    n_before = snap.agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    n_deleted = cdc.filter(F.col("op") == "D").agg(
        F.count(F.lit(1)).cast("long").alias("n_deleted")
    )
    body = merged.agg(
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0))
        .cast("long")
        .alias("n_updated"),
        F.sum(F.when(F.col("op") == "I", 1).otherwise(0))
        .cast("long")
        .alias("n_inserted"),
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.sum("mcents").cast("long").alias("total_cents_after"),
    )
    return (
        body.crossJoin(F.broadcast(n_before))
        .crossJoin(F.broadcast(n_deleted))
        .select(
            "n_before",
            "n_updated",
            "n_inserted",
            "n_deleted",
            "n_after",
            "total_cents_after",
        )
    )


@register(
    "x311_fold_balance",
    """WITH f AS (
         SELECT CASE
                  WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':fold'),
                       1, 4) < '3333' THEN 0
                  WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':fold'),
                       1, 4) < '6666' THEN 1
                  WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':fold'),
                       1, 4) < '9999' THEN 2
                  WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':fold'),
                       1, 4) < 'cccc' THEN 3
                  ELSE 4 END AS fold,
                lang
         FROM documents
       ),
       c AS (SELECT fold, lang, CAST(count(*) AS BIGINT) AS n_docs
             FROM f GROUP BY 1, 2),
       t AS (SELECT fold, CAST(SUM(n_docs) AS BIGINT) AS fold_total
             FROM c GROUP BY 1)
       SELECT c.fold, c.lang, c.n_docs, t.fold_total,
              CAST(c.n_docs * 10000 // t.fold_total AS BIGINT)
                AS lang_share_x1e4
       FROM c JOIN t USING (fold)
       ORDER BY c.fold, c.lang""",
    doc="k-fold STRATIFICATION audit: x18 splits once, cross-"
        "validation needs k folds AND proof they are balanced -- "
        "each doc lands in one of 5 folds by md5-threshold buckets "
        "(x18's content-keyed rule generalized: equal 16-bit hex "
        "ranges, stable under retries/repartitioning), then per-fold "
        "language shares surface any stratification skew BEFORE a "
        "model trains on it (a fold missing a language is an eval "
        "lie). Shares are exact: n*1e4 DIV fold_total on positive "
        "BIGINTs. Scale: one narrow projection + two tiny "
        "aggregations; the fold x lang table is k*|langs| rows "
        "regardless of corpus size",
)
def x311_fold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":fold"))),
        1,
        4,
    )
    fold = (
        F.when(h < "3333", 0)
        .when(h < "6666", 1)
        .when(h < "9999", 2)
        .when(h < "cccc", 3)
        .otherwise(4)
    )
    c = docs.select(fold.alias("fold"), "lang").groupBy(
        "fold", "lang"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    t = c.groupBy("fold").agg(
        F.sum("n_docs").cast("long").alias("fold_total")
    )
    return (
        c.join(t, "fold")
        .select(
            "fold",
            "lang",
            "n_docs",
            "fold_total",
            F.expr(
                "CAST(n_docs * 10000 DIV fold_total AS BIGINT)"
            ).alias("lang_share_x1e4"),
        )
        .orderBy("fold", "lang")
    )


@register(
    "x312_feature_hashing",
    """WITH tok AS (
         SELECT DISTINCT t AS token
         FROM documents, unnest(string_split(lower(text), ' ')) u(t)
         WHERE t <> ''
       ),
       b AS (
         SELECT token,
                (strpos('0123456789abcdef',
                        substr(md5(token), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                          substr(md5(token), 2, 1)) - 1) AS bucket
         FROM tok
       ),
       load AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n
                FROM b GROUP BY 1)
       SELECT CAST(SUM(n) AS BIGINT) AS n_tokens,
              CAST(count(*) AS BIGINT) AS buckets_used,
              CAST(MAX(n) AS BIGINT) AS max_bucket_load,
              CAST((SUM(n) - count(*)) * 10000 // SUM(n) AS BIGINT)
                AS collision_rate_x1e4
       FROM load""",
    doc="hashing-trick collision audit for a 256-bucket feature "
        "space: every distinct token maps to a bucket via its first "
        "two md5 hex chars decoded with strpos math (hex->int "
        "WITHOUT a conv() builtin -- DuckDB has none, so the "
        "position arithmetic IS the portable decode; the instr/"
        "strpos name seam is the documented dialect map). Reports "
        "vocabulary size, buckets hit, max bucket load and the "
        "collision rate -- the number that decides whether 2^k "
        "buckets suffice before a hashed-features model silently "
        "aliases its vocabulary. Exact integers throughout. Scale: "
        "one token explode (the corpus pass any vocab build pays), "
        "distinct, then 256-row arithmetic",
)
def x312_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    # expr(): F.instr takes only a string-literal needle, and here the
    # needle is constant but the HAYSTACK position of a per-row char is
    # wanted -- instr(haystack_lit, char_col) needs the SQL form
    bucket = F.expr(
        "(instr('0123456789abcdef', substr(md5(token), 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substr(md5(token), 2, 1)) - 1)"
    )
    load = tok.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return load.agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("buckets_used"),
        F.max("n").cast("long").alias("max_bucket_load"),
        F.expr(
            "CAST((SUM(n) - count(*)) * 10000 DIV SUM(n) AS BIGINT)"
        ).alias("collision_rate_x1e4"),
    )


@register(
    "x306_deletion_audit",
    """WITH flagged AS (SELECT c_custkey FROM customer
                        WHERE c_custkey % 97 = 0),
       c AS (SELECT 'customer' AS tbl,
                    CAST(count(*) AS BIGINT) AS residual_rows
             FROM customer WHERE c_custkey % 97 = 0),
       o AS (SELECT 'orders' AS tbl, CAST(count(*) AS BIGINT)
             FROM orders WHERE o_custkey IN
               (SELECT c_custkey FROM flagged)),
       l AS (SELECT 'lineitem' AS tbl, CAST(count(*) AS BIGINT)
             FROM lineitem li JOIN orders od
               ON od.o_orderkey = li.l_orderkey
             WHERE od.o_custkey IN (SELECT c_custkey FROM flagged))
       SELECT * FROM c UNION ALL SELECT * FROM o
       UNION ALL SELECT * FROM l
       ORDER BY tbl""",
    doc="right-to-be-forgotten CASCADE audit: given a deletion set "
        "(custkey % 97 = 0 stands in for the request list), count "
        "every row still REFERENCING a flagged subject per table -- "
        "directly (customer), through the FK (orders), and "
        "transitively through two hops (lineitem via its order) -- "
        "the residual report a GDPR/CCPA purge must drive to zero, "
        "and the missing piece next to x172/x246/x280's "
        "anonymization entries (deleting the customer row while "
        "order history remains IS the compliance failure). Scale: "
        "the request list is a broadcast-small semi-join side at "
        "every hop; lineitem joins orders on its natural key, "
        "flags never fan out",
)
def x306_deletion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    flagged = cust.filter(F.col("c_custkey") % 97 == 0).select(
        "c_custkey"
    )
    c = flagged.agg(F.count(F.lit(1)).cast("long").alias("residual_rows")).select(
        F.lit("customer").alias("tbl"), "residual_rows"
    )
    fo = orders.join(
        F.broadcast(flagged),
        orders["o_custkey"] == flagged["c_custkey"],
        "left_semi",
    )
    o = fo.agg(F.count(F.lit(1)).cast("long").alias("residual_rows")).select(
        F.lit("orders").alias("tbl"), "residual_rows"
    )
    fl = li.join(
        fo.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_semi",
    )
    l = fl.agg(F.count(F.lit(1)).cast("long").alias("residual_rows")).select(
        F.lit("lineitem").alias("tbl"), "residual_rows"
    )
    return c.union(o).union(l).orderBy("tbl")


def _x307_oracle() -> str:
    return f"""WITH RECURSIVE {_X03_PAIRS_CTE},
       edges AS (
         SELECT id_a AS u, id_b AS v FROM pairs
         UNION
         SELECT id_b, id_a FROM pairs
       ),
       walk (node, lbl) AS (
         SELECT u, u FROM edges
         UNION
         SELECT e.u, w.lbl FROM edges e JOIN walk w ON w.node = e.v
       ),
       comp AS (SELECT node, MIN(lbl) AS rep FROM walk GROUP BY node),
       scored AS (
         SELECT c.rep, c.node, d.n_chars
         FROM comp c JOIN documents d ON d.doc_id = c.node
       ),
       agg AS (
         SELECT rep, CAST(count(*) AS BIGINT) AS n_members,
                CAST(MIN(node) AS BIGINT) AS min_id,
                MAX(n_chars) AS mx
         FROM scored GROUP BY rep
       )
       SELECT a.rep AS cluster, a.n_members, a.min_id,
              CAST(MIN(s.node) AS BIGINT) AS keep_id,
              CAST(a.mx AS BIGINT) AS keep_chars
       FROM agg a JOIN scored s ON s.rep = a.rep AND s.n_chars = a.mx
       GROUP BY a.rep, a.n_members, a.min_id, a.mx
       ORDER BY cluster"""


@register(
    "x307_cluster_representative",
    _x307_oracle(),
    doc="QUALITY-AWARE canonical-doc selection per duplicate cluster: "
        "x24 labels transitive near-dup clusters but keeps the MIN-ID "
        "doc -- production pipelines keep the LONGEST member (the "
        "least-truncated crawl of the page); this entry picks "
        "argmax(n_chars) with a min-id tie-break per cluster, the "
        "keep-list a transitive dedup actually ships. Spark folds the "
        "argmax into one min(struct(-n_chars, node)) aggregate over "
        "the cluster labels (x302's shape -- no window, no per-group "
        "subquery); DuckDB mirrors with arg_min over the same "
        "composite key. Cluster labels come from the shared x03 pair "
        "stage + min-label propagation, so the whole chain reuses "
        "verified machinery",
)
def x307_cluster_representative(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pairs = _shared_jaccard_pairs(spark, sf_dir)
    comp = dedup.duplicate_clusters(pairs)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node"), "n_chars"
    )
    scored = comp.join(docs, "node")
    return (
        scored.groupBy(F.col("rep").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("node").cast("long").alias("min_id"),
            F.min(
                F.struct(
                    (-F.col("n_chars")).alias("nc"), F.col("node")
                )
            )
            .getField("node")
            .cast("long")
            .alias("keep_id"),
            F.max("n_chars").cast("long").alias("keep_chars"),
        )
        .orderBy("cluster")
    )


@register(
    "x308_mad_outliers",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                      AS BIGINT) AS v
                  FROM events GROUP BY 1),
       med AS (SELECT CAST(quantile_disc(v, 0.5) AS BIGINT) AS m
               FROM d),
       dev AS (SELECT d.day, d.v, abs(d.v - med.m) AS ad
               FROM d, med),
       mad AS (SELECT CAST(quantile_disc(ad, 0.5) AS BIGINT) AS mad
               FROM dev)
       SELECT med.m AS median_cents, mad.mad AS mad_cents,
              CAST(med.m - 3 * mad.mad AS BIGINT) AS lo_fence,
              CAST(med.m + 3 * mad.mad AS BIGINT) AS hi_fence,
              CAST(count(*) AS BIGINT) AS n_days,
              CAST(SUM(CASE WHEN dev.v < med.m - 3 * mad.mad
                         OR dev.v > med.m + 3 * mad.mad
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM dev, med, mad
       GROUP BY med.m, mad.mad""",
    doc="robust outlier fence via MEDIAN ABSOLUTE DEVIATION: a "
        "mean/stddev fence (z-score) is dragged by the very outliers "
        "it hunts -- median +/- 3*MAD has a 50% breakdown point, the "
        "robust-statistics standard for revenue anomaly days. "
        "Everything is exact integers: daily cents, DISC medians "
        "(actual data values -- x254's pinned seam, so both engines "
        "pick the identical cents), absolute deviations, and the "
        "fences; NO float ever exists. Both medians ride the "
        "day-cardinality aggregate (x81 bounded contract); the "
        "1-row med/mad attach as broadcast scalars",
)
def x308_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("v")
    )
    med = d.agg(
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) "
            "AS BIGINT)"
        ).alias("m")
    )
    dev = d.crossJoin(F.broadcast(med)).select(
        "day", "v", "m", F.abs(F.col("v") - F.col("m")).alias("ad")
    )
    mad = dev.agg(
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) "
            "AS BIGINT)"
        ).alias("mad")
    )
    out = dev.crossJoin(F.broadcast(mad))
    lo = F.col("m") - 3 * F.col("mad")
    hi = F.col("m") + 3 * F.col("mad")
    return out.groupBy("m", "mad").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(
            F.when((F.col("v") < lo) | (F.col("v") > hi), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    ).select(
        F.col("m").alias("median_cents"),
        F.col("mad").alias("mad_cents"),
        lo.cast("long").alias("lo_fence"),
        hi.cast("long").alias("hi_fence"),
        "n_days",
        "n_outliers",
    )


@register(
    "x309_theil_sen",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                      AS BIGINT) AS v
                  FROM events GROUP BY 1),
       p AS (SELECT ROUND(CAST(b.v - a.v AS DOUBLE)
                          / date_diff('day', a.day, b.day), 4)
                 AS slope
             FROM d a JOIN d b ON a.day < b.day)
       SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              ROUND(CAST(quantile_disc(slope, 0.5) AS DOUBLE), 4)
                AS slope_cents_per_day
       FROM p""",
    doc="Theil-Sen trend estimator -- the MEDIAN of all pairwise "
        "day-to-day slopes: a single anomalous day wrecks an OLS "
        "slope, but Theil-Sen tolerates ~29% corruption (the robust "
        "complement to x290's Pearson ACF and x308's MAD fence). "
        "Slopes divide exact integer cents by exact integer day gaps "
        "(DATE-typed date_diff counts whole days -- no "
        "boundary-crossing trap) once in DOUBLE, round to 4; the "
        "median is DISC (an actual slope value -- x254's seam, "
        "identical pick both engines). The pair stage is the "
        "day-cardinality table self-joined -- bounded quadratic in "
        "DAYS (365^2 at any corpus size), never in rows (x81 "
        "contract squared)",
)
def x309_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("v")
    )
    a = d.select(F.col("day").alias("da"), F.col("v").alias("va"))
    b = d.select(F.col("day").alias("db"), F.col("v").alias("vb"))
    # day-cardinality inequality join: broadcast one side so the range
    # condition plans as a bounded BNLJ, never a CartesianProduct
    p = a.join(F.broadcast(b), F.col("da") < F.col("db")).select(
        F.round(
            (F.col("vb") - F.col("va")).cast("double")
            / F.datediff("db", "da"),
            4,
        ).alias("slope")
    )
    return p.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.expr(
                "CAST(percentile_disc(0.5) WITHIN GROUP "
                "(ORDER BY slope) AS DOUBLE)"
            ),
            4,
        ).alias("slope_cents_per_day"),
    )


# x304: RBO(p=1/2, k=10) decomposes per common item: an item entering
# both rankings at depth g = max(rank_a, rank_b) contributes
# W(g) = sum_{d=g..10} 2^(10-d) * (2520/d) to the 2^10*2520-scaled
# score (2520 = lcm(1..10), so every term is an exact integer).
_RBO_W = {
    1: 1788440, 2: 498200, 3: 175640, 4: 68120, 5: 27800,
    6: 11672, 7: 4952, 8: 2072, 9: 812, 10: 252,
}
_RBO_DEN = 1024 * 2520


@register(
    "x304_rank_biased_overlap",
    f"""WITH s AS (
         SELECT l_suppkey AS item,
                CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
                CAST(count(*) AS BIGINT) AS c
         FROM lineitem GROUP BY 1
       ),
       ra AS (SELECT item, CAST(row_number() OVER (ORDER BY q DESC,
                item) AS BIGINT) AS ra
              FROM s ORDER BY q DESC, item LIMIT 10),
       rb AS (SELECT item, CAST(row_number() OVER (ORDER BY c DESC,
                item) AS BIGINT) AS rb
              FROM s ORDER BY c DESC, item LIMIT 10),
       m AS (SELECT GREATEST(ra.ra, rb.rb) AS g
             FROM ra JOIN rb USING (item)),
       w AS (SELECT CAST(COALESCE(SUM(
                CASE g {' '.join(f'WHEN {g} THEN {w}' for g, w in _RBO_W.items())} END), 0)
                AS BIGINT) AS rbo_scaled,
                CAST(count(*) AS BIGINT) AS n_common
             FROM m)
       SELECT n_common, rbo_scaled,
              ROUND(CAST(rbo_scaled AS DOUBLE) / {_RBO_DEN}, 4) AS rbo
       FROM w""",
    doc="rank-biased overlap (RBO, Webber et al.) between two top-10 "
        "supplier rankings -- by total quantity vs by lineitem count: "
        "the top-weighted list-agreement metric for comparing ranking "
        "functions (search/reco eval, metric-migration audits), where "
        "plain set overlap ignores ORDER. p = 1/2 makes every "
        "geometric weight a power of two and 2520 = lcm(1..10) clears "
        "the per-depth divisions, so the score is an exact integer "
        "scaled by 2^10*2520 -- no float accumulates; the one "
        "division happens last in DOUBLE. Decomposed per common item "
        "(weight depends only on g = max of its two ranks -- no "
        "per-depth dim join) and both rank windows ride the "
        "supplier-cardinality aggregate (x81 bounded contract)",
)
def x304_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy(F.col("l_suppkey").alias("item")).agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    ra = (
        s.select(
            "item",
            F.row_number()
            .over(Window.orderBy(F.desc("q"), "item"))
            .cast("long")
            .alias("ra"),
        )
        .filter(F.col("ra") <= 10)
    )
    rb = (
        s.select(
            "item",
            F.row_number()
            .over(Window.orderBy(F.desc("c"), "item"))
            .cast("long")
            .alias("rb"),
        )
        .filter(F.col("rb") <= 10)
    )
    g = F.greatest("ra", "rb")
    w_expr = F.lit(None)
    for gv, wv in _RBO_W.items():
        w_expr = F.when(g == gv, F.lit(wv)).otherwise(w_expr)
    m = ra.join(rb, "item").select(w_expr.alias("w"))
    out = m.agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("rbo_scaled"),
    )
    return out.select(
        "n_common",
        "rbo_scaled",
        F.round(
            F.col("rbo_scaled").cast("double") / F.lit(_RBO_DEN), 4
        ).alias("rbo"),
    )


@register(
    "x305_kaplan_meier",
    """WITH u AS (
         SELECT user_id,
                CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
                     // 3600000000 AS BIGINT) AS lt,
                CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
         FROM events GROUP BY 1
       ),
       mx AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS max_us
              FROM events),
       lab AS (
         SELECT lt,
                CASE WHEN mx.max_us - last_us > 86400000000
                     THEN 1 ELSE 0 END AS observed
         FROM u, mx
       ),
       d AS (
         SELECT lt, CAST(SUM(observed) AS BIGINT) AS deaths,
                CAST(count(*) AS BIGINT) AS ending
         FROM lab GROUP BY lt
       ),
       r AS (
         SELECT lt, deaths,
                CAST(SUM(ending) OVER (ORDER BY lt DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS at_risk
         FROM d
       ),
       k AS (
         SELECT lt, deaths, at_risk,
                SUM(CASE WHEN deaths < at_risk THEN
                      CAST(ROUND(ln(1.0 - CAST(deaths AS DOUBLE)
                        / at_risk), 12) AS DECIMAL(28,12))
                    END)
                  OVER (ORDER BY lt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cum
         FROM r WHERE deaths > 0
       )
       SELECT lt AS lt_hours, at_risk, deaths,
              CASE WHEN deaths = at_risk THEN 0.0
                   ELSE ROUND(exp(CAST(cum AS DOUBLE)), 4)
              END AS survival
       FROM k ORDER BY lt_hours""",
    doc="Kaplan-Meier survival curve of user engagement lifetimes "
        "(hours between first and last event; a user whose last event "
        "sits within 24h of the corpus edge is CENSORED -- still "
        "at-risk, never a death: the estimator exists precisely "
        "because dropping censored users biases churn down). Exact "
        "machinery: lifetimes are integer-microsecond differences DIV "
        "3600e6 (DuckDB's date_diff counts boundary CROSSINGS, not "
        "elapsed hours -- the dialect trap dodged by epoch "
        "arithmetic); at-risk counts come from ONE descending "
        "cumulative window over the lifetime-cardinality table; the "
        "product folds to a cumulative sum of round(ln(1-d/n),12) in "
        "DECIMAL(28,12) (x37/x234 recipe) with exp last; a "
        "deaths==at_risk final step is pinned to 0.0 (ln(0) guard). "
        "Both windows ride aggregate-cardinality tables (x81 "
        "contract)",
)
def x305_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # timestampdiff on the NTZ column is pure wall-clock arithmetic --
    # the same naive difference DuckDB's epoch_us subtraction computes;
    # a cast to TIMESTAMP would route through the session zone (and its
    # DST holes) for no benefit since only DIFFERENCES are emitted
    u = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.min("ts").alias("first_ts"),
    ).select(
        F.expr(
            "CAST(timestampdiff(MICROSECOND, first_ts, last_ts) "
            "DIV 3600000000 AS BIGINT)"
        ).alias("lt"),
        "last_ts",
    )
    mx = ev.agg(F.max("ts").alias("max_ts"))
    lab = u.crossJoin(F.broadcast(mx)).select(
        "lt",
        F.when(
            F.expr("timestampdiff(MICROSECOND, last_ts, max_ts)")
            > F.lit(86400000000),
            1,
        )
        .otherwise(0)
        .alias("observed"),
    )
    d = lab.groupBy("lt").agg(
        F.sum("observed").cast("long").alias("deaths"),
        F.count(F.lit(1)).cast("long").alias("ending"),
    )
    w_risk = Window.orderBy(F.desc("lt")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = d.select(
        "lt",
        "deaths",
        F.sum("ending").over(w_risk).cast("long").alias("at_risk"),
    )
    term = F.when(
        F.col("deaths") < F.col("at_risk"),
        F.round(
            F.log(
                F.lit(1.0)
                - F.col("deaths").cast("double") / F.col("at_risk")
            ),
            12,
        ).cast("decimal(28,12)"),
    )
    w_cum = Window.orderBy("lt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    k = r.filter(F.col("deaths") > 0).select(
        "lt",
        "deaths",
        "at_risk",
        F.sum(term).over(w_cum).alias("cum"),
    )
    survival = F.when(
        F.col("deaths") == F.col("at_risk"), F.lit(0.0)
    ).otherwise(F.round(F.exp(F.col("cum").cast("double")), 4))
    return k.select(
        F.col("lt").alias("lt_hours"),
        "at_risk",
        "deaths",
        survival.alias("survival"),
    ).orderBy("lt_hours")


def _x302_oracle() -> str:
    return graph.lpa_copurchase_sql(iterations=2, part_mod=4)


@register(
    "x302_label_propagation",
    _x302_oracle(),
    doc="label-propagation communities over the l_partkey % 4 = 0 "
        "co-purchase subgraph, 2 synchronous rounds -- the "
        "community-detection member of the Pregel family (x104 "
        "PageRank = influence, x150 BFS = reachability, x243 k-core = "
        "density; this one answers 'which parts sell TOGETHER as a "
        "cluster'). Deterministic by construction: synchronous "
        "rounds + max-count/min-label tie-break, so the full "
        "community assignment is oracle-replayable. Per round ONE "
        "edge-sized equi-join with node-state in shuffled hash joins "
        "(never broadcast -- x104's refusal), argmax folded into a "
        "single min(struct(-c, lab)) aggregate: no window, no "
        "per-node subquery. Output: community sizes",
)
def x302_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 4 == 0
    )
    edges = graph.symmetric_copurchase_edges(li)
    labels = graph.label_propagation(edges, iterations=2)
    return (
        labels.groupBy(F.col("lab").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").cast("long").alias("rep"),
        )
        .select(
            F.col("community").cast("long").alias("community"),
            "n_nodes",
            "rep",
        )
        .orderBy(F.desc("n_nodes"), "community")
    )


@register(
    "x303_ab_uplift",
    """WITH u AS (
         SELECT user_id,
                CASE WHEN substr(md5(CAST(user_id AS VARCHAR)
                       || ':ab'), 1, 4) < '8000'
                     THEN 'treat' ELSE 'control' END AS arm,
                MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                    END) AS converted
         FROM events GROUP BY 1
       ),
       a AS (
         SELECT CAST(SUM(CASE WHEN arm = 'treat' THEN 1 END)
                  AS BIGINT) AS users_t,
                CAST(SUM(CASE WHEN arm = 'treat' THEN converted END)
                  AS BIGINT) AS conv_t,
                CAST(SUM(CASE WHEN arm = 'control' THEN 1 END)
                  AS BIGINT) AS users_c,
                CAST(SUM(CASE WHEN arm = 'control' THEN converted
                    END) AS BIGINT) AS conv_c
         FROM u
       )
       SELECT users_t, conv_t, users_c, conv_c,
              ROUND(CAST(conv_t AS DOUBLE) / users_t, 4) AS rate_t,
              ROUND(CAST(conv_c AS DOUBLE) / users_c, 4) AS rate_c,
              ROUND(CAST(conv_t AS DOUBLE) / users_t
                    - CAST(conv_c AS DOUBLE) / users_c, 4) AS uplift
       FROM a""",
    doc="deterministic A/B experiment readout: users assigned to arms "
        "by the SAME content-keyed md5-bucket rule as x18's split "
        "(stable under retries and scale -- the assignment IS the "
        "randomization unit, never df.sample), per-arm user-level "
        "conversion (any purchase event), uplift = rate_t - rate_c. "
        "Counts stay exact BIGINTs; the two divisions and their "
        "difference happen once in DOUBLE on identical integers "
        "(engine-identical), then round. Scale: one user-level "
        "aggregate (the corpus shuffle), then a 1-row conditional "
        "rollup -- no joins at all",
)
def x303_ab_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))),
            1,
            4,
        )
        < "8000",
        F.lit("treat"),
    ).otherwise(F.lit("control"))
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).withColumn("arm", arm)
    t = F.col("arm") == "treat"
    c = F.col("arm") == "control"
    a = u.agg(
        F.sum(F.when(t, 1)).cast("long").alias("users_t"),
        F.sum(F.when(t, F.col("converted"))).cast("long").alias("conv_t"),
        F.sum(F.when(c, 1)).cast("long").alias("users_c"),
        F.sum(F.when(c, F.col("converted"))).cast("long").alias("conv_c"),
    )
    rate_t = F.col("conv_t").cast("double") / F.col("users_t")
    rate_c = F.col("conv_c").cast("double") / F.col("users_c")
    return a.select(
        "users_t",
        "conv_t",
        "users_c",
        "conv_c",
        F.round(rate_t, 4).alias("rate_t"),
        F.round(rate_c, 4).alias("rate_c"),
        F.round(rate_t - rate_c, 4).alias("uplift"),
    )


@register(
    "x296_editdist_neardup",
    """WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
       cand AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                a.lt AS la, b.lt AS lb
         FROM t a JOIN t b
           ON substr(a.lt, 1, 12) = substr(b.lt, 1, 12)
          AND a.doc_id < b.doc_id
         WHERE abs(length(a.lt) - length(b.lt)) <= 20
       )
       SELECT id_a, id_b,
              CAST(levenshtein(la, lb) AS BIGINT) AS edit_dist
       FROM cand WHERE levenshtein(la, lb) <= 40
       ORDER BY id_a, id_b""",
    doc="typo-level near-dup pairs by bounded EDIT DISTANCE -- the "
        "character-edit complement of shingle Jaccard (x03): catches "
        "single-character corruptions, OCR noise and truncations that "
        "token-level shingles over- or under-count. Candidates are "
        "PREFIX-BLOCKED (shared 12-char lowercase prefix) with a "
        "length-difference guard (|dlen| <= 20 -- a free lower bound "
        "on edit distance) so levenshtein() -- O(len^2) per pair -- "
        "runs only inside blocks, never all-pairs. levenshtein is "
        "engine-identical (classic Wagner-Fischer in both). At 100 TB "
        "the block key generalizes to (length bucket, prefix) with a "
        "hot-block cap, the same shape as x40's banding; the join "
        "shuffles on the block key only",
)
def x296_editdist_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.lower(F.col("text")).alias("lt")
    ).withColumn("blk", F.substring("lt", 1, 12))
    a = t.select(
        F.col("doc_id").alias("id_a"), F.col("lt").alias("la"), "blk"
    )
    b = t.select(
        F.col("doc_id").alias("id_b"), F.col("lt").alias("lb"), "blk"
    )
    cand = a.join(b, "blk").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.length("la") - F.length("lb")) <= 20)
    )
    dist = F.levenshtein("la", "lb")
    return (
        cand.withColumn("edit_dist", dist.cast("long"))
        .filter(F.col("edit_dist") <= 40)
        .select("id_a", "id_b", "edit_dist")
        .orderBy("id_a", "id_b")
    )


def _x297_oracle() -> str:
    from ..ops.dedup import lsh_verified_pairs_oracle_sql
    from ..ops.sampling import split_sql

    pairs = lsh_verified_pairs_oracle_sql(threshold=0.7).rsplit(
        "ORDER BY id_a, id_b", 1
    )[0]
    split = split_sql("duckdb", "documents", "doc_id").rsplit(
        "ORDER BY doc_id", 1
    )[0]
    return f"""
WITH pairs AS MATERIALIZED ({pairs}),
sp AS MATERIALIZED ({split})
SELECT CASE WHEN sa.split = 'train' THEN p.id_a ELSE p.id_b END
         AS train_doc,
       CASE WHEN sa.split = 'train' THEN p.id_b ELSE p.id_a END
         AS test_doc,
       p.jaccard
FROM pairs p
JOIN sp sa ON sa.doc_id = p.id_a
JOIN sp sb ON sb.doc_id = p.id_b
WHERE sa.split <> sb.split
ORDER BY train_doc, test_doc
"""


@register(
    "x297_split_leakage",
    _x297_oracle(),
    doc="train/test SPLIT LEAKAGE audit: near-dup pairs (deterministic "
        "MinHash banding + exact-Jaccard verify >= 0.7, x40/x75's "
        "machinery) that STRADDLE x18's content-keyed train/test "
        "assignment -- each row is an eval document whose training "
        "twin would inflate the benchmark (the check every held-out "
        "split needs before a training run; doc-level hashing splits "
        "the pair across sides precisely because assignment is "
        "per-doc, which is WHY the audit exists). Output (train_doc, "
        "test_doc, jaccard). Scale: the pair stage is band-blocked "
        "(never all-pairs); the split table is a narrow key->side "
        "projection, two candidate-sized equi-joins attach it",
)
def x297_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.sampling import deterministic_split

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.lsh_verified_pairs(
        docs, "doc_id", "text", threshold=0.7
    )
    sp = deterministic_split(docs, "doc_id").select("doc_id", "split")
    sa = sp.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    sb = sp.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    leaked = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
    )
    train_doc = F.when(
        F.col("split_a") == "train", F.col("id_a")
    ).otherwise(F.col("id_b"))
    test_doc = F.when(
        F.col("split_a") == "train", F.col("id_b")
    ).otherwise(F.col("id_a"))
    return leaked.select(
        train_doc.alias("train_doc"),
        test_doc.alias("test_doc"),
        "jaccard",
    ).orderBy("train_doc", "test_doc")


def _x298_oracle() -> str:
    from ..ops.text import lang_id_oracle_sql

    pred = lang_id_oracle_sql().rsplit("ORDER BY doc_id", 1)[0]
    return f"""
WITH pred AS MATERIALIZED ({pred}),
lab AS (
  SELECT d.lang AS gold, p.pred_lang AS pred
  FROM documents d JOIN pred p ON p.doc_id = d.doc_id
),
conf AS (SELECT gold, pred, CAST(count(*) AS BIGINT) AS c
         FROM lab GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN gold = pred THEN c ELSE 0 END)
                 AS BIGINT) AS agree
        FROM conf),
marg AS (
  SELECT CAST(SUM(ga.na * pb.nb) AS BIGINT) AS chance
  FROM (SELECT gold AS l, SUM(c) AS na FROM conf GROUP BY 1) ga
  JOIN (SELECT pred AS l, SUM(c) AS nb FROM conf GROUP BY 1) pb
    USING (l)
)
SELECT t.n, t.agree,
       ROUND(CAST(t.agree * t.n - m.chance AS DOUBLE)
             / (t.n * t.n - m.chance), 4) AS kappa
FROM tot t, marg m
"""


@register(
    "x298_cohens_kappa",
    _x298_oracle(),
    doc="Cohen's kappa between the labeled ``lang`` column and x12's "
        "stopword-vote language prediction -- chance-corrected "
        "agreement, THE metric for judging an auto-labeler (or two "
        "annotators) beyond raw accuracy. Exact-integer core: kappa = "
        "(agree*n - sum_l gold_l*pred_l) / (n^2 - sum_l gold_l*"
        "pred_l); both numerator and denominator are exact BIGINTs "
        "(no probability ever exists as a float), the single division "
        "happens once in DOUBLE (the engine-safe recipe). Scale: one "
        "corpus pass builds the k x k confusion table; marginals and "
        "kappa are k-sized arithmetic -- broadcast-trivial at any "
        "corpus size",
)
def x298_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select(
        F.col("lang").alias("gold"),
        text.lang_pred_column("text").alias("pred"),
    )
    conf = lab.groupBy("gold", "pred").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = conf.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("gold") == F.col("pred"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    ga = conf.groupBy(F.col("gold").alias("l")).agg(
        F.sum("c").cast("long").alias("na")
    )
    pb = conf.groupBy(F.col("pred").alias("l")).agg(
        F.sum("c").cast("long").alias("nb")
    )
    marg = (
        ga.join(pb, "l")
        .agg(F.sum(F.col("na") * F.col("nb")).cast("long").alias("chance"))
    )
    return (
        tot.crossJoin(F.broadcast(marg))
        .select(
            "n",
            "agree",
            F.round(
                (F.col("agree") * F.col("n") - F.col("chance")).cast(
                    "double"
                )
                / (F.col("n") * F.col("n") - F.col("chance")),
                4,
            ).alias("kappa"),
        )
    )


@register(
    "x299_applyinarrow_agg",
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY source ORDER BY source""",
    doc="groupBy().applyInArrow API parity (completes the "
        "custom-function matrix alongside pandas UDF / UDAF / "
        "mapInPandas / mapInArrow / applyInPandas(+State) / cogroup / "
        "UDTF / Python DataSource): per-source rollup computed "
        "INSIDE Arrow -- the zero-copy pyarrow.Table path, no pandas "
        "conversion -- pinned to the identical relational aggregate. "
        "Scale: same one-shuffle groupBy shape as the native agg; the "
        "Arrow stage prices ONLY the serialization seam. Real use: "
        "per-group logic that needs Arrow-native compute kernels "
        "(or libraries consuming Arrow directly) without a pandas "
        "detour",
)
def x299_applyinarrow_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def per_source(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "source": [table.column("source")[0].as_py()],
                "n_docs": pa.array([table.num_rows], pa.int64()),
                "total_chars": pa.array(
                    [pc.sum(table.column("n_chars")).as_py()], pa.int64()
                ),
            }
        )

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", "n_chars")
        .groupBy("source")
        .applyInArrow(
            per_source,
            "source string, n_docs long, total_chars long",
        )
        .orderBy("source")
    )


@register(
    "x300_nullsafe_join",
    """WITH a AS (SELECT source, NULLIF(lang, 'en') AS lang_n,
                  CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2),
       b AS (SELECT NULLIF(lang, 'en') AS lang_n,
                  CAST(count(*) AS BIGINT) AS lang_total
           FROM documents GROUP BY 1)
       SELECT a.source, a.lang_n, a.n, b.lang_total
       FROM a JOIN b ON a.lang_n IS NOT DISTINCT FROM b.lang_n
       ORDER BY a.source, a.lang_n NULLS FIRST""",
    doc="null-safe equi-join semantics (<=> / IS NOT DISTINCT FROM): "
        "the NULL bucket -- here 'en' collapsed to NULL, the shape of "
        "any join on a nullable enrichment key -- must MATCH across "
        "sides instead of silently dropping, the classic inner-join "
        "footgun. Dialect seam: Spark eqNullSafe(<=>) keeps the join "
        "an EQUI-join (hash-partitionable, broadcast-able -- NOT a "
        "nested loop), DuckDB spells it IS NOT DISTINCT FROM. Both "
        "sides are aggregate-first (source x lang cardinality), so "
        "the join is broadcast-trivial at any corpus size",
)
def x300_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lang_n = F.nullif(F.col("lang"), F.lit("en"))
    a = docs.groupBy(
        "source", lang_n.alias("lang_n")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    b = docs.groupBy(lang_n.alias("lang_nb")).agg(
        F.count(F.lit(1)).cast("long").alias("lang_total")
    )
    return (
        a.join(b, a["lang_n"].eqNullSafe(b["lang_nb"]))
        .select("source", "lang_n", "n", "lang_total")
        .orderBy("source", F.col("lang_n").asc_nulls_first())
    )


@register(
    "x301_grouping_sets",
    """SELECT source, lang, CAST(GROUPING(source, lang) AS BIGINT)
              AS gid,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS total_chars
       FROM documents
       GROUP BY GROUPING SETS ((source, lang), (source), ())
       ORDER BY gid, source NULLS FIRST, lang NULLS FIRST""",
    doc="GROUPING SETS with grouping_id() -- the BI rollup surface "
        "beyond q10's plain ROLLUP: an explicit lattice (source x "
        "lang detail, per-source subtotal, grand total) in ONE scan "
        "with partial aggregation per set, and grouping_id "
        "disambiguating a real NULL group key from a rolled-up one "
        "(the correctness trap of reading rollup output without it). "
        "Both engines use the same bitmask convention (left column = "
        "high bit). Scale: Spark expands the sets BELOW the shuffle "
        "(Expand then one hash aggregate) -- rows shuffle once, not "
        "once per set",
)
def x301_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupingSets(
            [["source", "lang"], ["source"], []], "source", "lang"
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy(
            "gid",
            F.col("source").asc_nulls_first(),
            F.col("lang").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Retrieval serving & evaluation (round 6 tail: hybrid fusion, diversified
# re-rank, ranking metrics, calibration, sharding)
# ---------------------------------------------------------------------------


def _x313_oracle() -> str:
    bm = text.bm25_topk_sql("documents", "doc_id", "text", top_k=20)
    return f"""
WITH bm AS MATERIALIZED ({bm}),
lexr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
           AS r_lex
  FROM bm
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
s AS (
  SELECT c.vec_id AS doc_id,
         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS raw
  FROM (SELECT * FROM n WHERE vec_id = 0) q
  JOIN n c ON c.vec_id != 0
),
semr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY raw DESC, doc_id) AS BIGINT)
           AS r_sem
  FROM s
  QUALIFY r_sem <= 20
),
fused AS (
  SELECT doc_id, r_lex, r_sem,
         COALESCE(CAST(ROUND(1.0 / (60.0 + r_lex), 8) AS DECIMAL(12,8)),
                  CAST(0 AS DECIMAL(12,8)))
         + COALESCE(CAST(ROUND(1.0 / (60.0 + r_sem), 8) AS DECIMAL(12,8)),
                    CAST(0 AS DECIMAL(12,8))) AS rrf_dec
  FROM lexr FULL JOIN semr USING (doc_id)
)
SELECT doc_id, r_lex, r_sem,
       ROUND(CAST(rrf_dec AS DOUBLE), 8) AS rrf
FROM fused ORDER BY rrf DESC, doc_id
"""


@register(
    "x313_rrf_fusion",
    _x313_oracle(),
    doc="reciprocal-rank fusion of the two retrieval legs every hybrid "
        "search serves: x106's BM25 top-20 (lexical) and x07's exact "
        "cosine top-20 for query vector 0 (semantic), fused as "
        "sum(1/(60+rank)) with a doc absent from a leg contributing 0 "
        "-- RRF needs no score normalization across legs, which is why "
        "it is the default hybrid combiner in Elasticsearch/OpenSearch/"
        "Vespa. Determinism: each leg ranks on its own proven recipe, "
        "the two RRF terms round to 8 and add in DECIMAL (exact, "
        "order-free). Scale: both legs are top-k frames (k=20), so the "
        "rank windows and the FULL OUTER join run on k-sized inputs -- "
        "the corpus-scale work is inside the legs, which carry their "
        "own 100 TB contracts (postings-filtered BM25, broadcast-query "
        "matmul ANN)",
)
def x313_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = text.bm25_topk(docs, "doc_id", "text", top_k=20)
    w = Window.orderBy(F.desc("bm25"), "doc_id")  # 20-row frame
    lexr = lex.select(
        "doc_id", F.row_number().over(w).cast("long").alias("r_lex")
    )
    q = emb.filter(F.col("vec_id") == 0)
    semr = similarity.brute_force_topk(
        emb, q, "vec_id", "embedding", k=20
    ).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("r_sem")
    )
    zero = F.lit(0).cast("decimal(12,8)")
    term = lambda c: F.coalesce(  # noqa: E731
        F.round(F.lit(1.0) / (F.lit(60.0) + F.col(c)), 8).cast(
            "decimal(12,8)"
        ),
        zero,
    )
    return (
        lexr.join(semr, "doc_id", "full_outer")
        .select(
            "doc_id",
            "r_lex",
            "r_sem",
            F.round(
                (term("r_lex") + term("r_sem")).cast("double"), 8
            ).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
    )


_X317_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS raw
  FROM (SELECT * FROM n WHERE vec_id < 20) q
  JOIN n c ON q.vec_id != c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY raw DESC, neighbor_id)
              AS BIGINT) AS rnk
  FROM s
  QUALIFY rnk <= 10
),
lab AS (SELECT vec_id, label FROM embeddings),
rel AS (
  SELECT r.query_id, r.rnk,
         CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel
  FROM ranked r
  JOIN lab ql ON ql.vec_id = r.query_id
  JOIN lab nl ON nl.vec_id = r.neighbor_id
),
perq AS (
  SELECT query_id,
         CAST(SUM(rel) AS BIGINT) AS n_hit,
         MIN(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
         SUM(CAST(ROUND(rel * 1.0 / log2(rnk + 1), 8)
                  AS DECIMAL(14,8))) AS dcg_dec
  FROM rel GROUP BY query_id
),
csz AS (SELECT label, CAST(count(*) AS BIGINT) AS cnt
        FROM embeddings GROUP BY label),
nq AS (
  SELECT q.vec_id AS query_id, c.cnt - 1 AS n_rel
  FROM (SELECT vec_id, label FROM embeddings WHERE vec_id < 20) q
  JOIN csz c USING (label)
),
ideal AS (
  SELECT query_id,
         SUM(CAST(ROUND(1.0 / log2(j + 1), 8) AS DECIMAL(14,8)))
           AS idcg_dec
  FROM (
    SELECT query_id,
           unnest(generate_series(
             1, CAST(LEAST(n_rel, 10) AS BIGINT))) AS j
    FROM nq
  )
  GROUP BY query_id
)
SELECT nq.query_id, nq.n_rel,
       ROUND(COALESCE(p.n_hit, 0) / 10.0, 4) AS p_at_10,
       ROUND(COALESCE(1.0 / p.first_rel, 0.0), 6) AS mrr,
       ROUND(CAST(COALESCE(p.dcg_dec, 0) AS DOUBLE)
             / CAST(i.idcg_dec AS DOUBLE), 6) AS ndcg_10
FROM nq
LEFT JOIN perq p USING (query_id)
JOIN ideal i USING (query_id)
ORDER BY query_id
"""


@register(
    "x317_retrieval_metrics",
    _X317_ORACLE,
    doc="ranking-quality metrics for the ANN surface -- P@10, MRR, "
        "nDCG@10 per query (vec_id < 20, relevant = same label as the "
        "query, x07's exact top-k as the ranked list): the eval "
        "harness that turns 'we have an ANN index' into 'retrieval is "
        "good enough to mine hard negatives from'. Determinism: ranks "
        "come from x07's proven raw-sim ordering; each 1/log2(rank+1) "
        "discount rounds to 8 and accumulates in DECIMAL; nDCG divides "
        "two such sums once in DOUBLE; ideal DCG truncates at "
        "min(n_rel, 10) via an in-engine series on BOTH sides. Scale: "
        "metrics are arithmetic over the k-sized ranked lists (one "
        "groupBy on query_id); corpus label sizes are a "
        "label-cardinality aggregate riding a broadcast join",
)
def x317_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    ranked = similarity.brute_force_topk(
        emb, q, "vec_id", "embedding", k=10
    )
    lab = emb.select("vec_id", "label")
    rel = (
        ranked.join(
            lab.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("q_label"),
            ),
            "query_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("n_label"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            F.col("rank").alias("rnk"),
            F.when(F.col("q_label") == F.col("n_label"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    perq = rel.groupBy("query_id").agg(
        F.sum("rel").cast("long").alias("n_hit"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rel"),
        F.sum(
            F.round(
                F.col("rel") * F.lit(1.0) / F.log2(F.col("rnk") + 1), 8
            ).cast("decimal(14,8)")
        ).alias("dcg_dec"),
    )
    csz = emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    nq = (
        emb.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("query_id"), "label")
        .join(F.broadcast(csz), "label")
        .select("query_id", (F.col("cnt") - 1).alias("n_rel"))
    )
    ideal = (
        nq.select(
            "query_id",
            F.explode(
                F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(10)))
            ).alias("j"),
        )
        .groupBy("query_id")
        .agg(
            F.sum(
                F.round(F.lit(1.0) / F.log2(F.col("j") + 1), 8).cast(
                    "decimal(14,8)"
                )
            ).alias("idcg_dec")
        )
    )
    return (
        nq.join(perq, "query_id", "left")
        .join(ideal, "query_id")
        .select(
            "query_id",
            "n_rel",
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(10.0), 4)
            .alias("p_at_10"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("dcg_dec"), F.lit(0).cast("decimal(14,8)"))
                .cast("double")
                / F.col("idcg_dec").cast("double"),
                6,
            ).alias("ndcg_10"),
        )
        .orderBy("query_id")
    )


def _x314_oracle() -> str:
    # Candidate stage: exact cosine top-20 for query vector 0 (x07's
    # proven raw-sim ranking), relevance and pairwise sims scaled to
    # exact 1e4 integers so every greedy argmax compares BIGINTs.
    head = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
s AS (
  SELECT c.vec_id AS doc, c.v AS cv, c.nrm AS cnrm,
         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS raw
  FROM (SELECT * FROM n WHERE vec_id = 0) q
  JOIN n c ON c.vec_id != 0
),
cand AS MATERIALIZED (
  SELECT doc, cv, cnrm,
         CAST(FLOOR(ROUND(raw, 4) * 10000 + 0.5) AS BIGINT) AS rel_s
  FROM s
  QUALIFY CAST(row_number() OVER (ORDER BY raw DESC, doc) AS BIGINT) <= 20
),
pairs AS MATERIALIZED (
  SELECT a.doc AS pa, b.doc AS pb,
         CAST(FLOOR(ROUND(list_dot_product(a.cv, b.cv)
                          / (a.cnrm * b.cnrm), 4) * 10000 + 0.5)
              AS BIGINT) AS sim_s
  FROM cand a JOIN cand b ON a.doc != b.doc
),
s1 AS MATERIALIZED (
  SELECT doc, rel_s, CAST(0 AS BIGINT) AS maxsim_s, rel_s AS mmr_s
  FROM cand ORDER BY rel_s DESC, doc LIMIT 1
)"""
    steps = []
    prev_sets = ["s1"]
    for i in range(2, 6):
        sel_union = " UNION ALL ".join(
            f"SELECT doc FROM {s}" for s in prev_sets
        )
        steps.append(f""",
r{i} AS (
  SELECT c.doc, c.rel_s,
         (SELECT MAX(p.sim_s) FROM pairs p
          WHERE p.pa = c.doc AND p.pb IN ({sel_union})) AS maxsim_s
  FROM cand c WHERE c.doc NOT IN ({sel_union})
),
s{i} AS MATERIALIZED (
  SELECT doc, rel_s, maxsim_s, rel_s - maxsim_s AS mmr_s
  FROM r{i} ORDER BY mmr_s DESC, doc LIMIT 1
)""")
        prev_sets.append(f"s{i}")
    finals = " UNION ALL ".join(
        f"SELECT {i} AS pick_order, doc, rel_s, maxsim_s, mmr_s FROM s{i}"
        for i in range(1, 6)
    )
    return f"""{head}{''.join(steps)}
SELECT CAST(pick_order AS BIGINT) AS pick_order, doc AS doc_id,
       ROUND(rel_s / 10000.0, 4) AS rel,
       ROUND(maxsim_s / 10000.0, 4) AS max_sim_sel,
       ROUND((rel_s - maxsim_s) / 20000.0, 8) AS mmr
FROM ({finals}) ORDER BY pick_order
"""


@register(
    "x314_mmr_rerank",
    _x314_oracle(),
    doc="maximal-marginal-relevance diversified re-rank (lambda=0.5, 5 "
        "picks from the exact cosine top-20 of query vector 0): the "
        "post-retrieval step that stops a RAG context window filling "
        "with five near-copies of the same passage. Greedy argmax "
        "unrolled to fixed depth (x104's fixed-iteration pattern): "
        "pick 1 maximizes relevance, each later pick maximizes "
        "rel - max_sim_to_selected over the remainder. Determinism: "
        "relevance and pairwise sims round to 4 then scale to exact "
        "1e4 BIGINTs, so every argmax and the published mmr score are "
        "integer comparisons (mmr = (rel_s - maxsim_s)/20000, one "
        "power-of-2x10^4 division in DOUBLE). Scale: the candidate "
        "frame is k-sized by construction -- every iteration joins "
        "20-row frames; corpus-scale work lives in the candidate "
        "generator, which carries the ANN tier's contracts",
)
def x314_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    topk = similarity.brute_force_topk(emb, q, "vec_id", "embedding", k=20)
    scale_s = lambda c: F.floor(c * 10000 + F.lit(0.5)).cast(  # noqa: E731
        "long"
    )
    cand = topk.select(
        F.col("neighbor_id").alias("doc"), scale_s(F.col("sim")).alias("rel_s")
    ).localCheckpoint()
    cand_emb = emb.join(
        cand.select(F.col("doc").alias("vec_id")), "vec_id"
    ).select("vec_id", "embedding")
    half = similarity.cosine_neardup_pairs(
        cand_emb, "vec_id", "embedding", threshold=-1.0
    ).select("id_a", "id_b", scale_s(F.col("sim")).alias("sim_s"))
    sym = half.union(
        half.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            "sim_s",
        )
    ).localCheckpoint()
    first = (
        cand.orderBy(F.desc("rel_s"), "doc")
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("pick_order"),
            "doc",
            "rel_s",
            F.lit(0).cast("long").alias("maxsim_s"),
        )
    )
    picks = [first]
    for i in range(2, 6):
        selected = picks[0].select("doc")
        for p in picks[1:]:
            selected = selected.union(p.select("doc"))
        remaining = cand.join(selected, "doc", "left_anti")
        ms = (
            sym.join(
                selected.select(F.col("doc").alias("id_b")), "id_b"
            )
            .groupBy(F.col("id_a").alias("doc"))
            .agg(F.max("sim_s").alias("maxsim_s"))
        )
        pick = (
            remaining.join(ms, "doc")
            .orderBy(F.desc(F.col("rel_s") - F.col("maxsim_s")), "doc")
            .limit(1)
            .select(
                F.lit(i).cast("long").alias("pick_order"),
                "doc",
                "rel_s",
                "maxsim_s",
            )
        )
        picks.append(pick)
    out = picks[0]
    for p in picks[1:]:
        out = out.union(p)
    return out.select(
        "pick_order",
        F.col("doc").alias("doc_id"),
        F.round(F.col("rel_s") / 10000.0, 4).alias("rel"),
        F.round(F.col("maxsim_s") / 10000.0, 4).alias("max_sim_sel"),
        F.round((F.col("rel_s") - F.col("maxsim_s")) / 20000.0, 8).alias(
            "mmr"
        ),
    ).orderBy("pick_order")


_X315_ORACLE = """
WITH scored AS (
  SELECT CAST(FLOOR(ROUND(CAST(len(list_filter(
                string_split(lower(text), ' '),
                t -> t IN (%s))) AS DOUBLE)
              / len(string_split(lower(text), ' ')), 4)
              * 10000 + 0.5) AS BIGINT) AS p_s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
bins AS (
  SELECT LEAST(p_s // 1000, 9) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(p_s) AS BIGINT) AS sum_p_s
  FROM scored GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM bins),
gaps AS (
  SELECT bin, n, n_pos,
         ROUND(sum_p_s / (n * 10000.0), 6) AS mean_score,
         ROUND(CAST(n_pos AS DOUBLE) / n, 6) AS frac_pos,
         ROUND(ABS(ROUND(sum_p_s / (n * 10000.0), 6)
                   - ROUND(CAST(n_pos AS DOUBLE) / n, 6)), 6) AS abs_gap
  FROM bins
),
ece AS (
  SELECT ROUND(CAST(SUM(CAST(ROUND(g.n * g.abs_gap / t.n_total, 8)
                             AS DECIMAL(14,8))) AS DOUBLE), 8) AS ece
  FROM gaps g, tot t
)
SELECT g.bin, g.n, g.n_pos, g.mean_score, g.frac_pos, g.abs_gap, e.ece
FROM gaps g, ece e ORDER BY g.bin
""" % _STOP_EN


@register(
    "x315_calibration_ece",
    _X315_ORACLE,
    doc="reliability diagram + expected calibration error for a "
        "deterministic scorer: treat the English-stopword ratio as a "
        "'probability of English' and audit it against the lang label "
        "-- per-decile-bin mean score vs empirical positive rate, ECE "
        "= sum n_b/N * |gap_b|. The check any learned quality/language "
        "filter needs before its threshold means anything (a "
        "miscalibrated filter silently shifts the corpus mix). "
        "Determinism: scores round to 4 and scale to exact 1e4 "
        "BIGINTs, bin = integer division; per-bin means divide exact "
        "integer sums once in DOUBLE and round 6; per-bin ECE terms "
        "round 8 and sum in DECIMAL. Scale: one corpus pass into a "
        "10-row bin aggregate; everything downstream is bin-sized "
        "arithmetic with 1-row broadcasts",
)
def x315_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    p_s = F.floor(
        text.stop_ratio_column("text") * 10000 + F.lit(0.5)
    ).cast("long")
    scored = docs.select(
        p_s.alias("p_s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    bins = scored.groupBy(
        F.least(F.col("p_s") / F.lit(1000), F.lit(9))
        .cast("long")
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("p_s").cast("long").alias("sum_p_s"),
    )
    mean_score = F.round(F.col("sum_p_s") / (F.col("n") * 10000.0), 6)
    frac_pos = F.round(F.col("n_pos").cast("double") / F.col("n"), 6)
    gaps = bins.select(
        "bin",
        "n",
        "n_pos",
        mean_score.alias("mean_score"),
        frac_pos.alias("frac_pos"),
        F.round(F.abs(mean_score - frac_pos), 6).alias("abs_gap"),
    )
    tot = gaps.agg(F.sum("n").cast("long").alias("n_total"))
    ece = (
        gaps.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("n") * F.col("abs_gap") / F.col("n_total"), 8
                    ).cast("decimal(14,8)")
                ).cast("double"),
                8,
            ).alias("ece")
        )
    )
    return (
        gaps.crossJoin(F.broadcast(ece))
        .select(
            "bin", "n", "n_pos", "mean_score", "frac_pos", "abs_gap", "ece"
        )
        .orderBy("bin")
    )


_X316_ORACLE = """
WITH w8 AS (
  SELECT doc_id, s, md5(doc_id || ':' || s) AS w
  FROM documents, (SELECT unnest(generate_series(0, 7)) AS s)
),
a8 AS (
  SELECT doc_id, s AS shard8 FROM w8
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY w DESC, s DESC) = 1
),
w9 AS (
  SELECT doc_id, s, md5(doc_id || ':' || s) AS w
  FROM documents, (SELECT unnest(generate_series(0, 8)) AS s)
),
a9 AS (
  SELECT doc_id, s AS shard9 FROM w9
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY w DESC, s DESC) = 1
),
j AS (
  SELECT a8.shard8, a9.shard9,
         CASE WHEN a8.shard8 != a9.shard9 THEN 1 ELSE 0 END AS moved
  FROM a8 JOIN a9 USING (doc_id)
),
per AS (
  SELECT CAST(shard8 AS BIGINT) AS shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(moved) AS BIGINT) AS n_moved_out
  FROM j GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
         CAST(SUM(n_moved_out) AS BIGINT) AS n_moved
  FROM per
)
SELECT p.shard, p.n_docs, p.n_moved_out,
       ROUND(CAST(t.n_moved AS DOUBLE) / t.n_total, 4) AS moved_frac
FROM per p, tot t ORDER BY p.shard
"""


@register(
    "x316_rendezvous_sharding",
    _X316_ORACLE,
    doc="rendezvous (highest-random-weight) sharding audit: each doc "
        "goes to argmax_s md5(doc_id:s) over 8 shards, then again over "
        "9, reporting per-shard balance and the fraction of docs that "
        "MOVE when a shard is added -- HRW's guarantee is ~1/(n+1) "
        "moves (vs ~1/2 for mod-N), the number that decides whether "
        "resharding a 100 TB corpus store is an overnight shuffle of "
        "one-ninth of the data or of half of it. Determinism: weights "
        "are md5 hex strings (lexicographic argmax, ties impossible in "
        "practice and broken by shard id); assignment is a row-local "
        "expression -- Spark folds the 8/9-slot struct array through "
        "array_max, no explode, no shuffle except the shard-cardinality "
        "rollup. Scale: one corpus pass, 9-row output",
)
def x316_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def shard(n: int):
        slots = [
            F.struct(
                F.md5(
                    F.concat_ws(
                        ":", F.col("doc_id").cast("string"), F.lit(str(s))
                    )
                ).alias("w"),
                F.lit(s).alias("s"),
            )
            for s in range(n)
        ]
        return F.array_max(F.array(*slots))["s"]

    j = docs.select(
        shard(8).alias("shard8"), shard(9).alias("shard9")
    ).select(
        "shard8",
        F.when(F.col("shard8") != F.col("shard9"), 1)
        .otherwise(0)
        .alias("moved"),
    )
    per = j.groupBy(F.col("shard8").cast("long").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("moved").cast("long").alias("n_moved_out"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("n_total"),
        F.sum("n_moved_out").cast("long").alias("n_moved"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "n_moved_out",
            F.round(
                F.col("n_moved").cast("double") / F.col("n_total"), 4
            ).alias("moved_frac"),
        )
        .orderBy("shard")
    )


_X318_ORACLE = """
WITH base AS (
  SELECT l_linestatus AS stratum,
         CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2')
              THEN 'hi' ELSE 'lo' END AS mode,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
strata AS (
  SELECT stratum,
         CAST(SUM(CASE WHEN mode = 'hi' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_a,
         CAST(SUM(CASE WHEN mode = 'hi' THEN late ELSE 0 END) AS BIGINT)
           AS late_a,
         CAST(SUM(CASE WHEN mode = 'lo' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_b,
         CAST(SUM(CASE WHEN mode = 'lo' THEN late ELSE 0 END) AS BIGINT)
           AS late_b
  FROM base GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_a) AS BIGINT) AS n_a,
         CAST(SUM(late_a) AS BIGINT) AS late_a,
         CAST(SUM(n_b) AS BIGINT) AS n_b,
         CAST(SUM(late_b) AS BIGINT) AS late_b,
         CAST(SUM(n_a + n_b) AS BIGINT) AS n_all
  FROM strata
),
std AS (
  SELECT
    ROUND(CAST(SUM(CAST(ROUND((CAST(s.late_a AS DOUBLE) / s.n_a)
                * (CAST(s.n_a + s.n_b AS DOUBLE) / t.n_all), 8)
                AS DECIMAL(14,8))) AS DOUBLE), 6) AS std_rate_a,
    ROUND(CAST(SUM(CAST(ROUND((CAST(s.late_b AS DOUBLE) / s.n_b)
                * (CAST(s.n_a + s.n_b AS DOUBLE) / t.n_all), 8)
                AS DECIMAL(14,8))) AS DOUBLE), 6) AS std_rate_b
  FROM strata s, tot t
)
SELECT stratum, n_a, late_a, n_b, late_b,
       ROUND(CAST(late_a AS DOUBLE) / n_a, 6) AS rate_a,
       ROUND(CAST(late_b AS DOUBLE) / n_b, 6) AS rate_b,
       CAST(NULL AS DOUBLE) AS std_rate_a,
       CAST(NULL AS DOUBLE) AS std_rate_b
FROM strata
UNION ALL
SELECT 'ALL', t.n_a, t.late_a, t.n_b, t.late_b,
       ROUND(CAST(t.late_a AS DOUBLE) / t.n_a, 6),
       ROUND(CAST(t.late_b AS DOUBLE) / t.n_b, 6),
       s.std_rate_a, s.std_rate_b
FROM tot t, std s
ORDER BY stratum
"""


@register(
    "x318_simpson_audit",
    _X318_ORACLE,
    doc="Simpson's-paradox audit for an aggregation: return rates for "
        "high- vs low-priority orders overall AND stratified by line "
        "status (open lines barely return, so the crude comparison "
        "mostly measures each group's open/filled mix), plus "
        "direct-standardized rates (each mode's stratum rates weighted "
        "by the POOLED stratum mix) on the ALL row -- when the crude "
        "gap and the standardized gap disagree in sign, the rollup is "
        "lying about the comparison (the composition-confounding trap "
        "every BI aggregate over heterogeneous strata can hit). "
        "Determinism: rates divide exact BIGINT counts once in DOUBLE "
        "round 6; standardized terms round 8 and sum in DECIMAL. "
        "Scale: one fact-fact equi-join + a stratum-cardinality "
        "aggregate; everything after is 5-row arithmetic",
)
def x318_simpson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    base = li.join(
        orders.select("o_orderkey", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        F.col("l_linestatus").alias("stratum"),
        F.when(
            F.substring("o_orderpriority", 1, 1).isin("1", "2"), "hi"
        )
        .otherwise("lo")
        .alias("mode"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("late"),
    )
    is_a = F.col("mode") == "hi"
    strata = base.groupBy("stratum").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(is_a, F.col("late")).otherwise(0))
        .cast("long")
        .alias("late_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(~is_a, F.col("late")).otherwise(0))
        .cast("long")
        .alias("late_b"),
    )
    tot = strata.agg(
        F.sum("n_a").cast("long").alias("n_a"),
        F.sum("late_a").cast("long").alias("late_a"),
        F.sum("n_b").cast("long").alias("n_b"),
        F.sum("late_b").cast("long").alias("late_b"),
        F.sum(F.col("n_a") + F.col("n_b")).cast("long").alias("n_all"),
    )
    term = lambda late, n: F.round(  # noqa: E731
        (F.col(late).cast("double") / F.col(n))
        * ((F.col("n_a") + F.col("n_b")).cast("double") / F.col("n_all")),
        8,
    ).cast("decimal(14,8)")
    std = (
        strata.crossJoin(F.broadcast(tot.select("n_all")))
        .agg(
            F.round(F.sum(term("late_a", "n_a")).cast("double"), 6).alias(
                "std_rate_a"
            ),
            F.round(F.sum(term("late_b", "n_b")).cast("double"), 6).alias(
                "std_rate_b"
            ),
        )
    )
    rate = lambda late, n: F.round(  # noqa: E731
        F.col(late).cast("double") / F.col(n), 6
    )
    strata_rows = strata.select(
        "stratum",
        "n_a",
        "late_a",
        "n_b",
        "late_b",
        rate("late_a", "n_a").alias("rate_a"),
        rate("late_b", "n_b").alias("rate_b"),
        F.lit(None).cast("double").alias("std_rate_a"),
        F.lit(None).cast("double").alias("std_rate_b"),
    )
    all_row = tot.crossJoin(F.broadcast(std)).select(
        F.lit("ALL").alias("stratum"),
        "n_a",
        "late_a",
        "n_b",
        "late_b",
        rate("late_a", "n_a").alias("rate_a"),
        rate("late_b", "n_b").alias("rate_b"),
        "std_rate_a",
        "std_rate_b",
    )
    return strata_rows.union(all_row).orderBy("stratum")


_X319_ORACLE = """
WITH lab AS (
  SELECT LEAST(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
               // 5000000, 9) AS bin,
         CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2')
              THEN 1 ELSE 0 END AS pos
  FROM orders
),
bins AS (
  SELECT bin, CAST(SUM(pos) AS BIGINT) AS pos_b,
         CAST(SUM(1 - pos) AS BIGINT) AS neg_b
  FROM lab GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(pos_b) AS BIGINT) AS pos_tot,
         CAST(SUM(neg_b) AS BIGINT) AS neg_tot
  FROM bins
),
woe AS (
  SELECT b.bin, b.pos_b, b.neg_b,
         CASE WHEN b.pos_b > 0 AND b.neg_b > 0
              THEN ROUND(ln(CAST(b.pos_b * t.neg_tot AS DOUBLE)
                            / (b.neg_b * t.pos_tot)), 6)
         END AS woe,
         CASE WHEN b.pos_b > 0 AND b.neg_b > 0
              THEN ROUND(ROUND(CAST(b.pos_b AS DOUBLE) / t.pos_tot
                               - CAST(b.neg_b AS DOUBLE) / t.neg_tot, 8)
                         * ROUND(ln(CAST(b.pos_b * t.neg_tot AS DOUBLE)
                                    / (b.neg_b * t.pos_tot)), 6), 8)
         END AS iv_term
  FROM bins b, tot t
),
iv AS (
  SELECT ROUND(CAST(SUM(CAST(COALESCE(iv_term, 0) AS DECIMAL(14,8)))
                    AS DOUBLE), 6) AS iv
  FROM woe
)
SELECT w.bin, w.pos_b, w.neg_b, w.woe, i.iv
FROM woe w, iv i ORDER BY w.bin
"""


@register(
    "x319_woe_iv",
    _X319_ORACLE,
    doc="weight-of-evidence / information-value screen (the "
        "credit-scoring feature audit): order value binned to $50k "
        "buckets vs the high-priority label, WOE_b = "
        "ln((pos_b/pos_tot)/(neg_b/neg_tot)) per bin and IV = "
        "sum((pos_share - neg_share) * WOE) -- the one-number answer "
        "to 'does this feature separate the classes, and monotonically "
        "where?' before a model trains on it. Determinism: the WOE "
        "argument is a ratio of exact BIGINT cross-products divided "
        "once in DOUBLE (no per-class float shares), ln rounds 6 "
        "(x106's precedent), share gaps round 8, IV terms round 8 and "
        "sum in DECIMAL; empty-class bins yield NULL WOE and "
        "contribute 0. Scale: one corpus pass into a 10-row bin "
        "aggregate, 1-row totals broadcast",
)
def x319_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = (
        F.col("o_totalprice").cast("decimal(30,2)") * 100
    ).cast("long")
    lab = orders.select(
        F.least(
            F.floor(cents / F.lit(5000000)).cast("long"), F.lit(9).cast("long")
        ).alias("bin"),
        F.when(
            F.substring("o_orderpriority", 1, 1).isin("1", "2"), 1
        )
        .otherwise(0)
        .alias("pos"),
    )
    bins = lab.groupBy("bin").agg(
        F.sum("pos").cast("long").alias("pos_b"),
        F.sum(1 - F.col("pos")).cast("long").alias("neg_b"),
    )
    tot = bins.agg(
        F.sum("pos_b").cast("long").alias("pos_tot"),
        F.sum("neg_b").cast("long").alias("neg_tot"),
    )
    ok = (F.col("pos_b") > 0) & (F.col("neg_b") > 0)
    woe_val = F.round(
        F.log(
            (F.col("pos_b") * F.col("neg_tot")).cast("double")
            / (F.col("neg_b") * F.col("pos_tot"))
        ),
        6,
    )
    gap = F.round(
        F.col("pos_b").cast("double") / F.col("pos_tot")
        - F.col("neg_b").cast("double") / F.col("neg_tot"),
        8,
    )
    woe = bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "pos_b",
        "neg_b",
        F.when(ok, woe_val).alias("woe"),
        F.when(ok, F.round(gap * woe_val, 8)).alias("iv_term"),
    )
    iv = woe.agg(
        F.round(
            F.sum(
                F.coalesce(F.col("iv_term"), F.lit(0)).cast("decimal(14,8)")
            ).cast("double"),
            6,
        ).alias("iv")
    )
    return (
        woe.crossJoin(F.broadcast(iv))
        .select("bin", "pos_b", "neg_b", "woe", "iv")
        .orderBy("bin")
    )


_X320_ORACLE = """
WITH per AS (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n_i,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                       AS BIGINT)) AS BIGINT) AS s_i
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_i) AS BIGINT) AS n,
         CAST(SUM(s_i) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS g
  FROM per
),
loo AS (
  SELECT p.n_name, p.n_i,
         ROUND(CAST(t.s - p.s_i AS DOUBLE) / (t.n - p.n_i), 6)
           AS theta_loo_c
  FROM per p, tot t
),
bar AS (
  SELECT CAST(SUM(CAST(theta_loo_c AS DECIMAL(20,6))) AS DOUBLE)
         / (SELECT g FROM tot) AS theta_bar
  FROM loo
),
var_j AS (
  SELECT ROUND(sqrt(
           CAST(SUM(CAST(ROUND((l.theta_loo_c - b.theta_bar)
                               * (l.theta_loo_c - b.theta_bar), 6)
                         AS DECIMAL(38,6))) AS DOUBLE)
           * (t.g - 1) / t.g), 4) AS se_jack_c
  FROM loo l, bar b, tot t
  GROUP BY t.g
)
SELECT l.n_name, l.n_i,
       ROUND(l.theta_loo_c / 100, 4) AS theta_loo,
       ROUND(CAST(t.s AS DOUBLE) / t.n / 100, 4) AS theta_hat,
       ROUND(v.se_jack_c / 100, 4) AS se_jack
FROM loo l, tot t, var_j v
ORDER BY l.n_name
"""


@register(
    "x320_jackknife_se",
    _X320_ORACLE,
    doc="delete-one-GROUP jackknife standard error for the mean order "
        "value (groups = customer nations): each leave-nation-out "
        "replicate is (S - s_i)/(n - n_i) over exact integer cents, "
        "se = sqrt((g-1)/g * sum((theta_i - theta_bar)^2)) -- the "
        "resampling-free uncertainty estimate that prices how much one "
        "country drives the corpus statistic (clustered data makes "
        "the iid bootstrap lie; group jackknife respects the cluster "
        "structure). Determinism: replicates divide exact BIGINTs "
        "once in DOUBLE round 6, their mean is a DECIMAL sum over "
        "round-6 values, squared deviations round 6 and sum in "
        "DECIMAL, one sqrt (IEEE correctly rounded) at the end. "
        "Scale: one fact aggregate to nation cardinality (25 rows); "
        "every replicate is totals-minus-group arithmetic -- no "
        "second corpus pass, no resampling",
)
def x320_jackknife_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cents = (
        F.col("o_totalprice").cast("decimal(30,2)") * 100
    ).cast("long")
    per = (
        orders.select("o_custkey", cents.alias("cents"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_i"),
            F.sum("cents").cast("long").alias("s_i"),
        )
    )
    tot = per.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("s_i").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("g"),
    )
    loo = per.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "n_i",
        F.round(
            (F.col("s") - F.col("s_i")).cast("double")
            / (F.col("n") - F.col("n_i")),
            6,
        ).alias("theta_loo_c"),
        "n",
        "s",
        "g",
    )
    bar = loo.agg(
        (
            F.sum(F.col("theta_loo_c").cast("decimal(20,6)")).cast("double")
            / F.first("g")
        ).alias("theta_bar")
    )
    dev = F.col("theta_loo_c") - F.col("theta_bar")
    var_j = (
        loo.crossJoin(F.broadcast(bar))
        .groupBy("g")
        .agg(
            F.round(
                F.sqrt(
                    F.sum(
                        F.round(dev * dev, 6).cast("decimal(38,6)")
                    ).cast("double")
                    * (F.col("g") - 1)
                    / F.col("g")
                ),
                4,
            ).alias("se_jack_c")
        )
        .select("se_jack_c")
    )
    return (
        loo.crossJoin(F.broadcast(var_j))
        .select(
            "n_name",
            "n_i",
            F.round(F.col("theta_loo_c") / 100, 4).alias("theta_loo"),
            F.round(
                F.col("s").cast("double") / F.col("n") / 100, 4
            ).alias("theta_hat"),
            F.round(F.col("se_jack_c") / 100, 4).alias("se_jack"),
        )
        .orderBy("n_name")
    )


_X321_ORACLE = """
WITH u AS (
  SELECT user_id,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 4)
                   < '8000'
              THEN 'treat' ELSE 'control' END AS arm
  FROM events GROUP BY 1
),
arms AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_users
  FROM u GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_users) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN arm = 'treat' THEN n_users END) AS BIGINT)
           AS n_t,
         CAST(SUM(CASE WHEN arm = 'control' THEN n_users END) AS BIGINT)
           AS n_c
  FROM arms
)
SELECT a.arm, a.n_users,
       ROUND(CAST(a.n_users AS DOUBLE) / t.n, 6) AS share,
       ROUND(CAST((t.n_t - t.n_c) * (t.n_t - t.n_c) AS DOUBLE) / t.n, 6)
         AS chi2,
       CAST((t.n_t - t.n_c) * (t.n_t - t.n_c) AS DOUBLE) / t.n > 3.841
         AS srm_flag
FROM arms a, tot t ORDER BY a.arm
"""


@register(
    "x321_srm_guardrail",
    _X321_ORACLE,
    doc="sample-ratio-mismatch guardrail for the A/B assignment x303 "
        "reads out: user counts per md5-bucket arm vs the designed "
        "50/50, chi-square reduced to its exact-integer form "
        "(n_t - n_c)^2 / n with the 3.841 (df=1, p=0.05) flag -- the "
        "first check any experiment readout must pass, because a "
        "mismatched ratio means assignment is broken and every "
        "downstream metric is biased. Determinism: counts are exact "
        "BIGINTs, the squared difference is exact, ONE double "
        "division; the flag compares that double to a constant. "
        "Scale: one user-level distinct aggregate (the corpus "
        "shuffle), then 2-row arithmetic",
)
def x321_srm_guardrail(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))),
            1,
            4,
        )
        < "8000",
        "treat",
    ).otherwise("control")
    arms = (
        events.select("user_id")
        .distinct()
        .select(arm.alias("arm"))
        .groupBy("arm")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    tot = arms.agg(
        F.sum("n_users").cast("long").alias("n"),
        F.sum(F.when(F.col("arm") == "treat", F.col("n_users")))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("arm") == "control", F.col("n_users")))
        .cast("long")
        .alias("n_c"),
    )
    d2 = (F.col("n_t") - F.col("n_c")) * (F.col("n_t") - F.col("n_c"))
    return (
        arms.crossJoin(F.broadcast(tot))
        .select(
            "arm",
            "n_users",
            F.round(F.col("n_users").cast("double") / F.col("n"), 6).alias(
                "share"
            ),
            F.round(d2.cast("double") / F.col("n"), 6).alias("chi2"),
            (d2.cast("double") / F.col("n") > 3.841).alias("srm_flag"),
        )
        .orderBy("arm")
    )


_X322_ORACLE = """
WITH k_exact AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(lower(text))
),
k_fp AS (
  SELECT MIN(doc_id) AS doc_id FROM documents
  GROUP BY md5(array_to_string(list_sort(list_distinct(
             string_split(lower(text), ' '))), ' '))
),
k_norm AS (
  SELECT MIN(doc_id) AS doc_id FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
),
pair_ab AS (
  SELECT 'exact' AS method_a, 'fingerprint' AS method_b,
         (SELECT CAST(count(*) AS BIGINT) FROM k_exact) AS n_a,
         (SELECT CAST(count(*) AS BIGINT) FROM k_fp) AS n_b,
         (SELECT CAST(count(*) AS BIGINT) FROM k_exact
          JOIN k_fp USING (doc_id)) AS n_both
),
pair_ac AS (
  SELECT 'exact', 'normalized',
         (SELECT CAST(count(*) AS BIGINT) FROM k_exact),
         (SELECT CAST(count(*) AS BIGINT) FROM k_norm),
         (SELECT CAST(count(*) AS BIGINT) FROM k_exact
          JOIN k_norm USING (doc_id))
),
pair_bc AS (
  SELECT 'fingerprint', 'normalized',
         (SELECT CAST(count(*) AS BIGINT) FROM k_fp),
         (SELECT CAST(count(*) AS BIGINT) FROM k_norm),
         (SELECT CAST(count(*) AS BIGINT) FROM k_fp
          JOIN k_norm USING (doc_id))
),
pairs AS (
  SELECT * FROM pair_ab UNION ALL
  SELECT * FROM pair_ac UNION ALL
  SELECT * FROM pair_bc
)
SELECT method_a, method_b, n_a, n_b, n_both,
       ROUND(CAST(n_both AS DOUBLE) / (n_a + n_b - n_both), 6)
         AS survivor_jaccard
FROM pairs ORDER BY method_a, method_b
"""


@register(
    "x322_dedup_method_agreement",
    _X322_ORACLE,
    doc="dedup-tier agreement audit: survivor sets from three exact "
        "tiers (x01 lowercase-hash, x02 sorted-token fingerprint, and "
        "a punctuation/whitespace-normalized hash) compared pairwise "
        "by survivor-set Jaccard -- the table that tells you how much "
        "each normalization step actually buys BEFORE you pay for the "
        "near-dup tiers (methods agreeing at 0.99 are redundant; at "
        "0.7 the cheaper one is leaking duplicates). Determinism: "
        "survivor sets are MIN(doc_id) per hash group (exact), "
        "intersections are equi-joins on those ids, one double "
        "division per pair. Scale: three hash-groupBys over the "
        "corpus + three id-projected equi-joins; md5 keys cannot skew",
)
def x322_dedup_method_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    k_exact = dedup.exact_dedup(docs, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    k_fp = dedup.fingerprint_dedup(docs, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    k_norm = docs.groupBy(
        F.md5(
            F.trim(
                F.regexp_replace(
                    F.lower(F.col("text")), "[^a-z0-9]+", " "
                )
            )
        ).alias("h")
    ).agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    sets = {"exact": k_exact, "fingerprint": k_fp, "normalized": k_norm}

    def pair_row(na: str, nb: str) -> DataFrame:
        a, b = sets[na], sets[nb]
        counts = (
            a.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
            .crossJoin(
                b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
            )
            .crossJoin(
                a.join(b, "doc_id").agg(
                    F.count(F.lit(1)).cast("long").alias("n_both")
                )
            )
        )
        return counts.select(
            F.lit(na).alias("method_a"),
            F.lit(nb).alias("method_b"),
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("survivor_jaccard"),
        )

    out = (
        pair_row("exact", "fingerprint")
        .union(pair_row("exact", "normalized"))
        .union(pair_row("fingerprint", "normalized"))
    )
    return out.orderBy("method_a", "method_b")


_X323_ORACLE = """
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN regexp_matches(text,
           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')
           THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM documents GROUP BY 1
)
SELECT source, n, k,
       ROUND(CAST(k AS DOUBLE) / n, 6) AS p_hat,
       ROUND((CAST(k AS DOUBLE) / n + 1.9208 / n
              - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                            * (1 - CAST(k AS DOUBLE) / n) / n
                            + 0.9604 / (n * CAST(n AS DOUBLE))))
             / (1 + 3.8416 / n), 6) AS wilson_lo,
       ROUND((CAST(k AS DOUBLE) / n + 1.9208 / n
              + 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                            * (1 - CAST(k AS DOUBLE) / n) / n
                            + 0.9604 / (n * CAST(n AS DOUBLE))))
             / (1 + 3.8416 / n), 6) AS wilson_hi
FROM per ORDER BY source
"""


@register(
    "x323_wilson_interval",
    _X323_ORACLE,
    doc="Wilson 95% score interval for the per-source email-PII rate "
        "(x20's email pattern as the detector): the interval that "
        "stays honest at small n and extreme p where the Wald "
        "interval collapses -- the difference between 'source X leaks "
        "more PII' and 'source X has fewer documents'. Determinism: "
        "p_hat divides exact BIGINTs once in DOUBLE; the z=1.96 "
        "constants enter as exact literals (1.9208 = z^2/2, 3.8416 = "
        "z^2, 0.9604 = z^2/4); one IEEE-correctly-rounded sqrt; the "
        "whole chain is identical double ops on identical inputs, "
        "rounded 6 at the end. Scale: one corpus pass with a "
        "row-local regexp into a source-cardinality aggregate",
)
def x323_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    email_pat = text.SCRUB_PATTERNS[1][0]
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("text").rlike(email_pat), 1).otherwise(0)
        )
        .cast("long")
        .alias("k"),
    )
    p = F.col("k").cast("double") / F.col("n")
    n = F.col("n")
    half = F.lit(1.96) * F.sqrt(
        p * (1 - p) / n + F.lit(0.9604) / (n * n.cast("double"))
    )
    denom = 1 + F.lit(3.8416) / n
    center = p + F.lit(1.9208) / n
    return per.select(
        "source",
        "n",
        "k",
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    ).orderBy("source")


def _word_cooccurrence_edges(docs: DataFrame) -> DataFrame:
    """Distinct symmetric adjacency edges between content words
    (lowercase alpha, length >= 4) -- the TextRank graph shared by
    x324 (global PageRank) and x352 (seeded personalized PageRank)."""
    ft = F.filter(
        F.split(F.lower(F.col("text")), " "),
        lambda t: t.rlike("^[a-z]{4,}$"),
    )
    with_ft = docs.select(ft.alias("ft"))
    adj = with_ft.select(
        F.explode(
            F.transform(
                F.slice(F.col("ft"), 1, F.size("ft") - 1),
                lambda x, i: F.struct(
                    x.alias("a"),
                    F.element_at(F.col("ft"), i + F.lit(2)).alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    pairs = (
        adj.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    return pairs.union(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _x324_oracle() -> str:
    edge_ctes = [
        """ft AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '),
                     t -> regexp_matches(t, '^[a-z]{4,}$')) AS ft
  FROM documents
)""",
        """adj AS (
  SELECT (p).a AS a, (p).b AS b FROM (
    SELECT unnest(list_transform(range(1, len(ft)),
                  i -> struct_pack(a := ft[i], b := ft[i + 1]))) AS p
    FROM ft
  )
)""",
        """pr AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM adj WHERE a != b
)""",
        "edges AS (SELECT u, v FROM pr UNION ALL SELECT v, u FROM pr)",
    ]
    return graph.pagerank_sql_over_edges(
        edge_ctes, iterations=3, top_k=20, node_select="u AS token"
    )


@register(
    "x324_textrank_keywords",
    _x324_oracle(),
    doc="TextRank keyword extraction: PageRank over the corpus word "
        "co-occurrence graph (adjacent content words -- lowercase "
        "alpha, length >= 4 -- in each document's filtered token "
        "sequence; distinct symmetric edges), top-20 tokens by rank. "
        "The unsupervised keyword/keyphrase miner (Mihalcea & Tarau "
        "2004) every corpus-tagging pipeline starts from. Reuses "
        "x104's pagerank operator verbatim -- same fixed-depth "
        "iterations, shuffle_hash refusal of node-state broadcast, "
        "round-12 DECIMAL contributions -- on a vocabulary-sized "
        "graph; the oracle replays through the same proven CTE chain "
        "template (graph.pagerank_sql_over_edges). Scale: edge "
        "derivation is one explode + distinct (vocab^2-bounded, "
        "corpus-independent after dedup); iterations touch only the "
        "edge/node tables",
)
def x324_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    edges = _word_cooccurrence_edges(docs)
    pr = graph.pagerank(edges, iterations=3, damping=0.85)
    return (
        pr.select(
            F.col("node").alias("token"), F.round("rank", 8).alias("rank")
        )
        .orderBy(F.desc("rank"), "token")
        .limit(20)
    )


_X325_ORACLE = """
WITH per AS (
  SELECT o_orderpriority AS stratum,
         CAST(count(*) AS BIGINT) AS n_pop,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                       AS BIGINT)) AS BIGINT) AS s,
         SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                       AS BIGINT) AS DECIMAL(19,0))
             * CAST(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100
                         AS BIGINT) AS DECIMAL(19,0))) AS ss
  FROM orders GROUP BY 1
),
sd AS (
  SELECT stratum, n_pop, s,
         ROUND(sqrt(CAST(n_pop * ss - CAST(s AS DECIMAL(38,0))
                         * CAST(s AS DECIMAL(38,0)) AS DOUBLE)
                    / (CAST(n_pop AS DOUBLE) * (n_pop - 1))), 6)
           AS sd_c
  FROM per
),
w AS (
  SELECT stratum, n_pop, s, sd_c,
         CAST(ROUND(n_pop * sd_c, 6) AS DECIMAL(28,6)) AS w_dec
  FROM sd
),
tot AS (SELECT SUM(w_dec) AS w_tot FROM w)
SELECT w.stratum, w.n_pop,
       ROUND(CAST(w.s AS DOUBLE) / w.n_pop / 100, 4) AS mean_value,
       ROUND(w.sd_c / 100, 4) AS sd_value,
       ROUND(CAST(w.w_dec AS DOUBLE) / CAST(t.w_tot AS DOUBLE), 6)
         AS alloc_share,
       CAST(FLOOR(10000 * CAST(w.w_dec AS DOUBLE)
                  / CAST(t.w_tot AS DOUBLE) + 0.5) AS BIGINT)
         AS n_alloc
FROM w, tot t ORDER BY w.stratum
"""


@register(
    "x325_neyman_allocation",
    _X325_ORACLE,
    doc="Neyman optimal allocation of a 10k-row sample budget across "
        "order-priority strata: n_h proportional to N_h * S_h -- the "
        "sampling-theory answer to 'where do my sample rows buy the "
        "most variance reduction' (uniform or proportional allocation "
        "wastes budget on homogeneous strata; x232's HT estimator "
        "then inflates whatever this allocates). Determinism: "
        "stratum variance numerator N*SS - S^2 is exact "
        "DECIMAL(38,0) integer arithmetic over cents, ONE double "
        "division + IEEE sqrt round 6; N_h*S_h weights round 6 into "
        "DECIMAL before the 5-row sum so the share denominator is "
        "order-free; allocations floor(x + 0.5) identically. Scale: "
        "one corpus aggregate to stratum cardinality (5 rows), "
        "everything after is broadcast-trivial",
)
def x325_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = (
        F.col("o_totalprice").cast("decimal(30,2)") * 100
    ).cast("long")
    per = orders.select(
        F.col("o_orderpriority").alias("stratum"), cents.alias("c")
    ).groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_pop"),
        F.sum("c").cast("long").alias("s"),
        F.sum(
            F.col("c").cast("decimal(19,0)") * F.col("c").cast("decimal(19,0)")
        ).alias("ss"),
    )
    sd_c = F.round(
        F.sqrt(
            (
                F.col("n_pop") * F.col("ss")
                - F.col("s").cast("decimal(38,0)")
                * F.col("s").cast("decimal(38,0)")
            ).cast("double")
            / (F.col("n_pop").cast("double") * (F.col("n_pop") - 1))
        ),
        6,
    )
    w = per.select(
        "stratum",
        "n_pop",
        "s",
        sd_c.alias("sd_c"),
        F.round(F.col("n_pop") * sd_c, 6)
        .cast("decimal(28,6)")
        .alias("w_dec"),
    )
    tot = w.agg(F.sum("w_dec").alias("w_tot"))
    share = F.col("w_dec").cast("double") / F.col("w_tot").cast("double")
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_pop",
            F.round(F.col("s").cast("double") / F.col("n_pop") / 100, 4)
            .alias("mean_value"),
            F.round(F.col("sd_c") / 100, 4).alias("sd_value"),
            F.round(share, 6).alias("alloc_share"),
            F.floor(10000 * share + F.lit(0.5))
            .cast("long")
            .alias("n_alloc"),
        )
        .orderBy("stratum")
    )


_X326_ORACLE = """
WITH tf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS f FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS term
    FROM documents
  ) GROUP BY term
),
spec AS (
  SELECT CAST(SUM(f) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS d_vocab,
         CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM tf
)
SELECT n_tokens, d_vocab, f1, f2,
       ROUND(d_vocab + CAST(f1 * (f1 - 1) AS DOUBLE) / (2 * (f2 + 1)), 4)
         AS chao1,
       ROUND(CAST(f1 AS DOUBLE) / n_tokens, 6) AS p_unseen,
       ROUND(1 - CAST(f1 AS DOUBLE) / n_tokens, 6) AS coverage
FROM spec
"""


@register(
    "x326_vocab_estimators",
    _X326_ORACLE,
    doc="unseen-vocabulary estimators from the frequency spectrum x87 "
        "surfaces: bias-corrected Chao1 richness D + f1(f1-1)/(2(f2+1)) "
        "('how many distinct tokens exist in the population this "
        "corpus samples'), Good-Turing unseen mass f1/N and its "
        "complement coverage -- the numbers that decide whether "
        "crawling more of a source will still grow the tokenizer's "
        "vocabulary or just re-sample it. Determinism: all inputs are "
        "exact BIGINTs off two chained hash-groupBys; each estimator "
        "is one double expression over them. Scale: token groupBy "
        "(map-side partial agg) + a 1-row spectrum rollup -- same "
        "profile as x87",
)
def x326_vocab_estimators(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    spec = tf.agg(
        F.sum("f").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("d_vocab"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    return spec.select(
        "n_tokens",
        "d_vocab",
        "f1",
        "f2",
        F.round(
            F.col("d_vocab")
            + (F.col("f1") * (F.col("f1") - 1)).cast("double")
            / (2 * (F.col("f2") + 1)),
            4,
        ).alias("chao1"),
        F.round(F.col("f1").cast("double") / F.col("n_tokens"), 6).alias(
            "p_unseen"
        ),
        F.round(
            1 - F.col("f1").cast("double") / F.col("n_tokens"), 6
        ).alias("coverage"),
    )


_X327_ORACLE = """
WITH flagged AS (
  SELECT event_type,
         LEAST(CAST(FLOOR(value / 25) AS BIGINT), 19) AS bin,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_e
  FROM events
),
cnt AS (
  SELECT event_type, bin,
         CAST(SUM(is_e) AS BIGINT) AS c_e,
         CAST(SUM(1 - is_e) AS BIGINT) AS c_a
  FROM flagged GROUP BY 1, 2
),
tot AS (
  SELECT event_type,
         CAST(SUM(c_e) AS BIGINT) AS n_e,
         CAST(SUM(c_a) AS BIGINT) AS n_a
  FROM cnt GROUP BY 1
),
spine AS (
  SELECT t.event_type, b.bin, t.n_e, t.n_a
  FROM tot t CROSS JOIN (SELECT unnest(range(0, 20)) AS bin) b
),
terms AS (
  SELECT s.event_type, s.n_e, s.n_a,
         (COALESCE(c.c_a, 0) + 1) / CAST(s.n_a + 20 AS DOUBLE) AS pa,
         (COALESCE(c.c_e, 0) + 1) / CAST(s.n_e + 20 AS DOUBLE) AS pe
  FROM spine s LEFT JOIN cnt c
    ON s.event_type = c.event_type AND s.bin = c.bin
)
SELECT event_type, n_e AS n_expected, n_a AS n_actual,
       ROUND(CAST(SUM(CAST(ROUND((pa - pe) * ln(pa / pe), 12)
                           AS DECIMAL(28,12))) AS DOUBLE), 6) AS psi
FROM terms GROUP BY 1, 2, 3 ORDER BY event_type
"""


@register(
    "x327_psi_drift",
    _X327_ORACLE,
    doc="population stability index per event type between the first "
        "and second half of the month (split at 2024-01-16): "
        "PSI = sum (p_actual - p_expected) * ln(p_actual/p_expected) "
        "over 20 fixed-width value bins -- THE feature-drift guardrail "
        "model-monitoring stacks alert on (complements x128's KL: PSI "
        "is symmetric-ish and bin-based, the industry-dashboard "
        "number). Determinism: Laplace-smoothed (c+1)/(n+20) "
        "proportions from exact BIGINT counts are bit-identical "
        "double divisions; each bin term rounds 12 into "
        "DECIMAL(28,12) before the order-free per-type sum; full "
        "0..19 bin spine so zero bins contribute their smoothed term "
        "in both engines. Scale: one (type,bin,side) aggregate -- "
        "map-side partial -- then 100-row arithmetic",
)
def x327_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    flagged = events.select(
        "event_type",
        F.least(
            F.floor(F.col("value") / 25).cast("long"), F.lit(19)
        ).alias("bin"),
        F.when(
            F.col("ts") < F.expr("TIMESTAMP_NTZ '2024-01-16 00:00:00'"), 1
        )
        .otherwise(0)
        .alias("is_e"),
    )
    cnt = flagged.groupBy("event_type", "bin").agg(
        F.sum("is_e").cast("long").alias("c_e"),
        F.sum(1 - F.col("is_e")).cast("long").alias("c_a"),
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("c_e").cast("long").alias("n_e"),
        F.sum("c_a").cast("long").alias("n_a"),
    )
    spine = tot.select(
        "event_type",
        "n_e",
        "n_a",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(19))).alias(
            "bin"
        ),
    )
    terms = spine.join(F.broadcast(cnt), ["event_type", "bin"], "left")
    pa = (F.coalesce(F.col("c_a"), F.lit(0)) + 1) / (
        F.col("n_a") + 20
    ).cast("double")
    pe = (F.coalesce(F.col("c_e"), F.lit(0)) + 1) / (
        F.col("n_e") + 20
    ).cast("double")
    return (
        terms.select(
            "event_type",
            "n_e",
            "n_a",
            F.round((pa - pe) * F.log(pa / pe), 12)
            .cast("decimal(28,12)")
            .alias("term"),
        )
        .groupBy("event_type", "n_e", "n_a")
        .agg(F.round(F.sum("term").cast("double"), 6).alias("psi"))
        .select(
            "event_type",
            F.col("n_e").alias("n_expected"),
            F.col("n_a").alias("n_actual"),
            "psi",
        )
        .orderBy("event_type")
    )


_X328_POISSON_CASE = """CASE
  WHEN u < 1580030168 THEN 0 WHEN u < 3160060337 THEN 1
  WHEN u < 3950075421 THEN 2 WHEN u < 4213413783 THEN 3
  WHEN u < 4279248373 THEN 4 WHEN u < 4292415291 THEN 5
  WHEN u < 4294609777 THEN 6 WHEN u < 4294923276 THEN 7
  ELSE 8 END"""

_X328_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS c
  FROM orders
),
expanded AS (
  SELECT b.k, b.c, r.r,
         CAST(concat('0x', substr(md5(concat(CAST(b.k AS VARCHAR), ':boot:',
              CAST(r.r AS VARCHAR))), 1, 8)) AS BIGINT) AS u
  FROM base b CROSS JOIN (SELECT unnest(range(0, 32)) AS r) r
),
weighted AS (
  SELECT r, {_X328_POISSON_CASE} AS w, c FROM expanded
),
reps AS (
  SELECT r,
         CAST(ROUND(SUM(w * c) / CAST(SUM(w) AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS m
  FROM weighted GROUP BY r
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_reps,
         SUM(m) AS sum_m,
         SUM(CAST(m AS DECIMAL(28,6)) * CAST(m AS DECIMAL(28,6)))
           AS sum_m2
  FROM reps
),
full_mean AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         SUM(c) / CAST(count(*) AS DOUBLE) AS fm
  FROM base
)
SELECT f.n_rows, s.n_reps,
       ROUND(f.fm / 100, 4) AS full_mean,
       ROUND(CAST(s.sum_m AS DOUBLE) / s.n_reps / 100, 4) AS boot_mean,
       ROUND(sqrt((CAST(s.sum_m2 AS DOUBLE)
                   - CAST(s.sum_m AS DOUBLE) * CAST(s.sum_m AS DOUBLE)
                     / s.n_reps) / (s.n_reps - 1)) / 100, 4) AS boot_se,
       ROUND((CAST(s.sum_m AS DOUBLE) / s.n_reps
              - 1.96 * sqrt((CAST(s.sum_m2 AS DOUBLE)
                   - CAST(s.sum_m AS DOUBLE) * CAST(s.sum_m AS DOUBLE)
                     / s.n_reps) / (s.n_reps - 1))) / 100, 4) AS ci_lo,
       ROUND((CAST(s.sum_m AS DOUBLE) / s.n_reps
              + 1.96 * sqrt((CAST(s.sum_m2 AS DOUBLE)
                   - CAST(s.sum_m AS DOUBLE) * CAST(s.sum_m AS DOUBLE)
                     / s.n_reps) / (s.n_reps - 1))) / 100, 4) AS ci_hi
FROM stats s CROSS JOIN full_mean f
"""


@register(
    "x328_poisson_bootstrap",
    _X328_ORACLE,
    doc="Poisson bootstrap CI for mean order value, 32 replicates: "
        "each row gets replicate weight ~ Poisson(1) via inverse-CDF "
        "on a 32-bit md5(key:boot:r) uniform -- the bootstrap that "
        "works at 100 TB because it streams (no resampling index, no "
        "RNG state: weights are a pure row-local function of the key, "
        "so retries and engine swaps reproduce them bit-exactly). "
        "Determinism: the inverse-CDF thresholds are exact integer "
        "literals against the exact 32-bit hash; replicate sums "
        "SUM(w*cents) are BIGINT; each replicate mean rounds 6 into "
        "DECIMAL(18,6) so the cross-replicate moments are order-free; "
        "variance assembled from the exact moments in one IEEE "
        "expression. Scale: one explode x32 (map-side) into a "
        "32-group aggregate -- partial agg absorbs it; the final "
        "stage is 32-row arithmetic",
)
def x328_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("long")
        .alias("c"),
    )
    expanded = base.select(
        "k",
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("r"),
    ).withColumn(
        "u",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("k").cast("string"),
                        F.lit(":boot:"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
    )
    w = (
        F.when(F.col("u") < 1580030168, 0)
        .when(F.col("u") < 3160060337, 1)
        .when(F.col("u") < 3950075421, 2)
        .when(F.col("u") < 4213413783, 3)
        .when(F.col("u") < 4279248373, 4)
        .when(F.col("u") < 4292415291, 5)
        .when(F.col("u") < 4294609777, 6)
        .when(F.col("u") < 4294923276, 7)
        .otherwise(8)
    )
    reps = (
        expanded.select("r", w.alias("w"), "c")
        .groupBy("r")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("c"))
                / F.sum("w").cast("double"),
                6,
            )
            .cast("decimal(18,6)")
            .alias("m")
        )
    )
    stats = reps.agg(
        F.count(F.lit(1)).cast("long").alias("n_reps"),
        F.sum("m").alias("sum_m"),
        F.sum(F.col("m") * F.col("m")).alias("sum_m2"),
    )
    full = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.sum("c") / F.count(F.lit(1)).cast("double")).alias("fm"),
    )
    var = (
        F.col("sum_m2").cast("double")
        - F.col("sum_m").cast("double")
        * F.col("sum_m").cast("double")
        / F.col("n_reps")
    ) / (F.col("n_reps") - 1)
    bm = F.col("sum_m").cast("double") / F.col("n_reps")
    return stats.crossJoin(F.broadcast(full)).select(
        "n_rows",
        "n_reps",
        F.round(F.col("fm") / 100, 4).alias("full_mean"),
        F.round(bm / 100, 4).alias("boot_mean"),
        F.round(F.sqrt(var) / 100, 4).alias("boot_se"),
        F.round((bm - 1.96 * F.sqrt(var)) / 100, 4).alias("ci_lo"),
        F.round((bm + 1.96 * F.sqrt(var)) / 100, 4).alias("ci_hi"),
    )


def _x329_oracle(iterations: int = 3) -> str:
    ctes = [
        """ob AS MATERIALIZED (
  SELECT l.l_orderkey AS ok, p.p_brand AS b,
         CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100
                       AS BIGINT)) AS BIGINT) AS c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
)""",
        """pr AS MATERIALIZED (
  SELECT a.b AS i, bb.b AS j,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a.c >= bb.c THEN 1 ELSE 0 END) AS BIGINT)
           AS wi
  FROM ob a JOIN ob bb ON a.ok = bb.ok AND a.b < bb.b
  GROUP BY 1, 2
)""",
        """sm AS MATERIALIZED (
  SELECT i, j, n, wi AS w FROM pr
  UNION ALL SELECT j AS i, i AS j, n, n - wi AS w FROM pr
)""",
        """wt AS MATERIALIZED (
  SELECT i AS b, CAST(SUM(w) AS BIGINT) AS wins,
         CAST(SUM(n) AS BIGINT) AS n_matches
  FROM sm GROUP BY 1
)""",
        "s0 AS MATERIALIZED (SELECT b, CAST(0.04 AS DOUBLE) AS s FROM wt)",
    ]
    for t in range(1, iterations + 1):
        ctes.append(
            f"""d{t} AS MATERIALIZED (
  SELECT sm.i AS b,
         SUM(CAST(ROUND(sm.n / (si.s + sj.s), 12) AS DECIMAL(28,12)))
           AS den
  FROM sm JOIN s{t - 1} si ON sm.i = si.b
          JOIN s{t - 1} sj ON sm.j = sj.b
  GROUP BY sm.i
)"""
        )
        ctes.append(
            f"""r{t} AS MATERIALIZED (
  SELECT w.b, ROUND(w.wins / CAST(d.den AS DOUBLE), 12) AS sr
  FROM wt w JOIN d{t} d ON w.b = d.b
)"""
        )
        ctes.append(
            f"""s{t} AS MATERIALIZED (
  SELECT b, ROUND(sr / CAST((SELECT SUM(CAST(sr AS DECIMAL(28,12)))
                             FROM r{t}) AS DOUBLE), 12) AS s
  FROM r{t}
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT w.b AS brand, w.n_matches, w.wins, ROUND(s.s, 8) AS strength
FROM wt w JOIN s{iterations} s ON w.b = s.b
ORDER BY s.s DESC, w.b"""
    )


@register(
    "x329_bradley_terry",
    _x329_oracle(),
    doc="Bradley-Terry preference strengths over part brands, 3 MM "
        "iterations: within each order, every brand pair is a 'match' "
        "won by the higher order-local spend (ties to the "
        "lexicographically smaller brand); s_i <- W_i / sum_j "
        "n_ij/(s_i+s_j), renormalized to sum 1 -- the pairwise-"
        "preference -> scalar-strength model RLHF reward ranking and "
        "LLM-judge leaderboards run on (Elo's batch cousin). "
        "Determinism: match counts/wins exact BIGINT off cents; each "
        "MM term rounds 12 into DECIMAL(28,12) before order-free "
        "sums; the normalizer sums round-12 DECIMALs. Scale: the "
        "per-order pair join is bounded by brands-per-order (~4 -> 6 "
        "pairs) and aggregates straight to a brand^2-sized matrix "
        "(<=600 rows); iterations touch only the matrix -- same "
        "fixed-depth shape as x104; matrix localCheckpointed so "
        "iterations never replay the corpus join",
)
def x329_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cents = (
        F.col("l_extendedprice").cast("decimal(30,2)") * 100
    ).cast("long")
    ob = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("p_brand").alias("b"),
            cents.alias("cc"),
        )
        .groupBy("ok", "b")
        .agg(F.sum("cc").cast("long").alias("c"))
    )
    a = ob.alias("a")
    bb = ob.alias("bb")
    pr = (
        a.join(
            bb,
            (F.col("a.ok") == F.col("bb.ok"))
            & (F.col("a.b") < F.col("bb.b")),
        )
        .select(
            F.col("a.b").alias("i"),
            F.col("bb.b").alias("j"),
            F.when(F.col("a.c") >= F.col("bb.c"), 1)
            .otherwise(0)
            .alias("win_i"),
        )
        .groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("win_i").cast("long").alias("wi"),
        )
    )
    sm = pr.select("i", "j", "n", F.col("wi").alias("w")).union(
        pr.select(
            F.col("j").alias("i"),
            F.col("i").alias("j"),
            "n",
            (F.col("n") - F.col("wi")).alias("w"),
        )
    )
    # Matrix is brand^2-bounded (<=600 rows); checkpoint so the three
    # MM iterations never replay the corpus-sized pair derivation.
    sm = sm.localCheckpoint()
    wt = sm.groupBy(F.col("i").alias("b")).agg(
        F.sum("w").cast("long").alias("wins"),
        F.sum("n").cast("long").alias("n_matches"),
    ).localCheckpoint()
    s = wt.select("b", F.lit(0.04).cast("double").alias("s"))
    for _ in range(3):
        si = s.select(F.col("b").alias("i"), F.col("s").alias("s_i"))
        sj = s.select(F.col("b").alias("j"), F.col("s").alias("s_j"))
        den = (
            sm.join(si, "i")
            .join(sj, "j")
            .select(
                F.col("i").alias("b"),
                F.round(
                    F.col("n") / (F.col("s_i") + F.col("s_j")), 12
                )
                .cast("decimal(28,12)")
                .alias("term"),
            )
            .groupBy("b")
            .agg(F.sum("term").alias("den"))
        )
        raw = wt.join(den, "b").select(
            "b",
            F.round(
                F.col("wins") / F.col("den").cast("double"), 12
            ).alias("sr"),
        )
        tot = raw.agg(
            F.sum(F.col("sr").cast("decimal(28,12)")).alias("tot")
        )
        s = raw.crossJoin(F.broadcast(tot)).select(
            "b",
            F.round(
                F.col("sr") / F.col("tot").cast("double"), 12
            ).alias("s"),
        )
    return (
        wt.join(s, "b")
        .select(
            F.col("b").alias("brand"),
            "n_matches",
            "wins",
            F.round("s", 8).alias("strength"),
        )
        .orderBy(F.desc("strength"), "brand")
    )


_X330_ORACLE = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click'
    AND e.ts > t1.t1 AND e.ts <= t1.t1 + INTERVAL 72 HOUR
  GROUP BY 1
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > t2.t2 AND e.ts <= t2.t2 + INTERVAL 72 HOUR
  GROUP BY 1
),
lvl AS (
  SELECT u.user_id,
         CASE WHEN t3.user_id IS NOT NULL THEN 3
              WHEN t2.user_id IS NOT NULL THEN 2
              WHEN t1.user_id IS NOT NULL THEN 1
              ELSE 0 END AS level
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN t1 ON u.user_id = t1.user_id
  LEFT JOIN t2 ON u.user_id = t2.user_id
  LEFT JOIN t3 ON u.user_id = t3.user_id
),
agg AS (SELECT level, CAST(count(*) AS BIGINT) AS n_users FROM lvl GROUP BY 1),
tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n_total FROM agg)
SELECT a.level, a.n_users,
       ROUND(a.n_users / CAST(t.n_total AS DOUBLE), 4) AS share
FROM agg a CROSS JOIN tot t ORDER BY a.level
"""


@register(
    "x330_window_funnel",
    _X330_ORACLE,
    doc="strict-order window funnel (the ClickHouse windowFunnel "
        "semantic): per user, max depth along view -> click -> "
        "purchase where each step strictly follows and lands within "
        "72 h of the previous step's FIRST qualifying event; output "
        "the user count and share per reached level. Unlike x72's "
        "session funnel (set-containment within a session) this "
        "prices ordered step-chaining with per-step deadlines -- the "
        "conversion metric growth teams actually track. Scale: three "
        "user-key min-aggregates chained by user-key joins -- every "
        "stage shuffles on the SAME key so the exchanges reuse one "
        "partitioning; no windows, no corpus self-join fan-out "
        "(each stage's input is filtered to one event type first)",
)
def x330_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    t1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        events.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 72 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 72 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    lvl = (
        events.select("user_id")
        .distinct()
        .join(t1, "user_id", "left")
        .join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .alias("level")
        )
    )
    agg = lvl.groupBy("level").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    tot = agg.agg(F.sum("n_users").cast("long").alias("n_total"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "level",
            "n_users",
            F.round(
                F.col("n_users") / F.col("n_total").cast("double"), 4
            ).alias("share"),
        )
        .orderBy("level")
    )


_X331_ORACLE = """
WITH d AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp,
         substr(text, 1, 16) AS blk
  FROM documents
),
f AS (SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS true_pairs
      FROM (SELECT count(*) AS n FROM d GROUP BY fp)),
b AS (SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS cand_pairs
      FROM (SELECT count(*) AS n FROM d GROUP BY blk)),
fb AS (SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS captured_pairs
       FROM (SELECT count(*) AS n FROM d GROUP BY fp, blk)),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d)
SELECT nn.n_docs, f.true_pairs, b.cand_pairs, fb.captured_pairs,
       CASE WHEN f.true_pairs = 0 THEN 1.0
            ELSE ROUND(fb.captured_pairs
                       / CAST(f.true_pairs AS DOUBLE), 4) END
         AS pair_completeness,
       ROUND(1 - b.cand_pairs
             / (nn.n_docs * (nn.n_docs - 1) / CAST(2 AS DOUBLE)), 6)
         AS reduction_ratio
FROM nn CROSS JOIN f CROSS JOIN b CROSS JOIN fb
"""


@register(
    "x331_blocking_audit",
    _X331_ORACLE,
    doc="entity-resolution blocking quality audit: reduction ratio "
        "(candidate pairs avoided vs the full n^2) and pair "
        "completeness (true normalized-duplicate pairs whose members "
        "share a raw 16-char-prefix block) -- the two numbers that "
        "decide whether a blocking key is safe BEFORE paying for the "
        "pairwise stage. The trick that scales: every pair count is "
        "sum-of-C(group,2) COMBINATORICS on group sizes (three "
        "hash-groupBys), no pair is ever materialized -- auditing a "
        "100 TB blocking scheme costs one aggregate pass. Truth tier "
        "is x02's punctuation-normalized fingerprint; this fixture's "
        "dups never differ inside the first 16 raw chars, so "
        "completeness reads 1.0 (and is division-guarded where true "
        "pairs = 0)",
)
def x331_blocking_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""),
                " +",
                " ",
            )
        )
    )
    d = docs.select(
        fp.alias("fp"), F.substring("text", 1, 16).alias("blk")
    )
    pair_sum = lambda cnt: F.sum(
        (F.col(cnt) * (F.col(cnt) - 1) / 2).cast("long")
    ).cast("long")
    f = (
        d.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
        .agg(pair_sum("n").alias("true_pairs"))
    )
    b = (
        d.groupBy("blk").agg(F.count(F.lit(1)).alias("n"))
        .agg(pair_sum("n").alias("cand_pairs"))
    )
    fb = (
        d.groupBy("fp", "blk").agg(F.count(F.lit(1)).alias("n"))
        .agg(pair_sum("n").alias("captured_pairs"))
    )
    nn = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        nn.crossJoin(F.broadcast(f))
        .crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(fb))
        .select(
            "n_docs",
            "true_pairs",
            "cand_pairs",
            "captured_pairs",
            F.when(F.col("true_pairs") == 0, F.lit(1.0))
            .otherwise(
                F.round(
                    F.col("captured_pairs")
                    / F.col("true_pairs").cast("double"),
                    4,
                )
            )
            .alias("pair_completeness"),
            F.round(
                1
                - F.col("cand_pairs")
                / (
                    F.col("n_docs")
                    * (F.col("n_docs") - 1)
                    / F.lit(2).cast("double")
                ),
                6,
            ).alias("reduction_ratio"),
        )
    )


_X332_ORACLE = """
WITH toks AS (
  SELECT list_filter(string_split(lower(text), ' '),
                     t -> regexp_matches(t, '^[a-z]+$')) AS ts
  FROM documents
),
bg AS (
  SELECT (p).a AS a, (p).b AS b FROM (
    SELECT unnest(list_transform(range(1, len(ts)),
                  i -> struct_pack(a := ts[i], b := ts[i + 1]))) AS p
    FROM toks
  )
),
cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
        FROM bg GROUP BY 1, 2),
ca AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY 1),
cb AS (SELECT b, CAST(SUM(c_ab) AS BIGINT) AS c_b FROM cab GROUP BY 1),
nn AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n FROM cab),
k AS (
  SELECT cab.a, cab.b, cab.c_ab, ca.c_a, cb.c_b, nn.n,
         cab.c_ab AS k11, ca.c_a - cab.c_ab AS k12,
         cb.c_b - cab.c_ab AS k21,
         nn.n - ca.c_a - cb.c_b + cab.c_ab AS k22
  FROM cab JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN nn
  WHERE cab.c_ab >= 5
),
g AS (
  SELECT a, b, c_ab, c_a, c_b,
         ROUND(2 * (
           (CASE WHEN k11 > 0 THEN k11 * ln(CAST(k11 AS DOUBLE) * n
                / (CAST(c_a AS DOUBLE) * c_b)) ELSE 0 END)
         + (CASE WHEN k12 > 0 THEN k12 * ln(CAST(k12 AS DOUBLE) * n
                / (CAST(c_a AS DOUBLE) * (n - c_b))) ELSE 0 END)
         + (CASE WHEN k21 > 0 THEN k21 * ln(CAST(k21 AS DOUBLE) * n
                / (CAST(n - c_a AS DOUBLE) * c_b)) ELSE 0 END)
         + (CASE WHEN k22 > 0 THEN k22 * ln(CAST(k22 AS DOUBLE) * n
                / (CAST(n - c_a AS DOUBLE) * (n - c_b))) ELSE 0 END)
         ), 4) AS g2
  FROM k
)
SELECT a AS tok_a, b AS tok_b, c_ab, c_a, c_b, g2
FROM g ORDER BY g2 DESC, tok_a, tok_b LIMIT 20
"""


@register(
    "x332_loglik_collocations",
    _X332_ORACLE,
    doc="Dunning log-likelihood-ratio (G^2) collocations over adjacent "
        "token bigrams, top-20: the 2x2 contingency statistic that "
        "beats raw PMI (x178) on sparse counts -- the standard "
        "phrase-mining / tokenizer-merge ranking signal. All four "
        "contingency cells derive from exact BIGINT bigram counts and "
        "margins (margins are sums OVER the bigram table, one shuffle "
        "reused); G^2 is one fixed-shape IEEE expression per row "
        "(zero-cells contribute 0 by guard), rounded 4 before the "
        "ORDER BY so ranking never rides a ulp. Scale: one bigram "
        "groupBy (map-side partial) + two margin aggregates of "
        "vocab^2-bounded size; no joins touch the corpus twice",
)
def x332_loglik_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ts = F.filter(
        F.split(F.lower("text"), " "), lambda t: t.rlike("^[a-z]+$")
    )
    bg = (
        docs.select(ts.alias("ts"))
        .select(
            F.explode(
                F.transform(
                    F.slice(F.col("ts"), 1, F.size("ts") - 1),
                    lambda x, i: F.struct(
                        x.alias("a"),
                        F.element_at(F.col("ts"), i + F.lit(2)).alias(
                            "b"
                        ),
                    ),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    cab = bg.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    ca = cab.groupBy("a").agg(F.sum("c_ab").cast("long").alias("c_a"))
    cb = cab.groupBy("b").agg(F.sum("c_ab").cast("long").alias("c_b"))
    nn = cab.agg(F.sum("c_ab").cast("long").alias("n"))
    k = (
        cab.filter(F.col("c_ab") >= 5)
        .join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(nn))
        .withColumn("k11", F.col("c_ab"))
        .withColumn("k12", F.col("c_a") - F.col("c_ab"))
        .withColumn("k21", F.col("c_b") - F.col("c_ab"))
        .withColumn(
            "k22", F.col("n") - F.col("c_a") - F.col("c_b") + F.col("c_ab")
        )
    )

    def term(kc, row_d, col_d):
        return F.when(
            F.col(kc) > 0,
            F.col(kc)
            * F.log(
                F.col(kc).cast("double")
                * F.col("n")
                / (row_d.cast("double") * col_d)
            ),
        ).otherwise(F.lit(0.0))

    g2 = F.round(
        2
        * (
            term("k11", F.col("c_a"), F.col("c_b"))
            + term("k12", F.col("c_a"), F.col("n") - F.col("c_b"))
            + term("k21", F.col("n") - F.col("c_a"), F.col("c_b"))
            + term("k22", F.col("n") - F.col("c_a"), F.col("n") - F.col("c_b"))
        ),
        4,
    )
    return (
        k.select(
            F.col("a").alias("tok_a"),
            F.col("b").alias("tok_b"),
            "c_ab",
            "c_a",
            "c_b",
            g2.alias("g2"),
        )
        .orderBy(F.desc("g2"), "tok_a", "tok_b")
        .limit(20)
    )


_X333_ORACLE = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
n AS (SELECT vec_id, label, v,
             sqrt(list_dot_product(v, v)) AS nrm FROM e),
s AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS sim
  FROM (SELECT * FROM n WHERE label < 5) a
  JOIN (SELECT * FROM n WHERE label >= 5) b ON true
),
r AS (
  SELECT a_id, b_id, sim,
         row_number() OVER (PARTITION BY a_id
                            ORDER BY sim DESC, b_id) AS rn_a,
         row_number() OVER (PARTITION BY b_id
                            ORDER BY sim DESC, a_id) AS rn_b
  FROM s
),
m4a AS (
  SELECT a_id, CAST(SUM(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) / 4
           AS m4a
  FROM r WHERE rn_a <= 4 GROUP BY 1
),
m4b AS (
  SELECT b_id, CAST(SUM(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) / 4
           AS m4b
  FROM r WHERE rn_b <= 4 GROUP BY 1
),
mut AS (
  SELECT ta.a_id, ta.b_id, ta.sim
  FROM (SELECT a_id, b_id, sim FROM r WHERE rn_a = 1) ta
  JOIN (SELECT a_id, b_id FROM r WHERE rn_b = 1) tb
    ON ta.a_id = tb.a_id AND ta.b_id = tb.b_id
)
SELECT mut.a_id, mut.b_id, mut.sim,
       ROUND(2 * mut.sim - m4a.m4a - m4b.m4b, 6) AS csls
FROM mut JOIN m4a ON mut.a_id = m4a.a_id
         JOIN m4b ON mut.b_id = m4b.b_id
ORDER BY mut.a_id
"""


@register(
    "x333_mnn_alignment",
    _X333_ORACLE,
    doc="mutual-nearest-neighbor alignment with CSLS margin scoring "
        "between the two embedding halves (label < 5 vs >= 5): a pair "
        "survives only if each side is the other's cosine top-1, "
        "scored 2*cos - mean(top-4 of a) - mean(top-4 of b) -- the "
        "bitext-mining / cross-lingual-alignment recipe (Artetxe & "
        "Schwenk) that kills hubness-driven false matches. "
        "Determinism: cosines ROUND 6 BEFORE ranking (id tie-breaks), "
        "so rank never rides a ulp; top-4 means sum round-6 DECIMALs. "
        "Correctness tier is the exact product with the query side "
        "broadcast (x07's contract); the 100 TB tier blocks both "
        "sides by IVF centroid (x15) and runs the same MNN inside "
        "blocks. Spark-side sims come from similarity.pairwise_sims "
        "-- one BLAS matmul per Arrow batch (the x07 fast path; a "
        "JVM zip_with/aggregate fold measured ~7x slower at 1M x 64)",
)
def x333_mnn_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    a_side = emb.filter(F.col("label") < 5)
    b_side = emb.filter(F.col("label") >= 5)
    s = similarity.pairwise_sims(
        b_side, a_side, id_col="vec_id", vec_col="embedding"
    )
    wa = Window.partitionBy("a_id").orderBy(F.desc("sim"), "b_id")
    wb = Window.partitionBy("b_id").orderBy(F.desc("sim"), "a_id")
    r = s.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_b", F.row_number().over(wb)
    )
    m4a = (
        r.filter(F.col("rn_a") <= 4)
        .groupBy("a_id")
        .agg(
            (
                F.sum(F.col("sim").cast("decimal(18,6)")).cast("double")
                / 4
            ).alias("m4a")
        )
    )
    m4b = (
        r.filter(F.col("rn_b") <= 4)
        .groupBy("b_id")
        .agg(
            (
                F.sum(F.col("sim").cast("decimal(18,6)")).cast("double")
                / 4
            ).alias("m4b")
        )
    )
    ta = r.filter(F.col("rn_a") == 1).select("a_id", "b_id", "sim")
    tb = r.filter(F.col("rn_b") == 1).select("a_id", "b_id")
    mut = ta.join(tb, ["a_id", "b_id"])
    return (
        mut.join(m4a, "a_id")
        .join(m4b, "b_id")
        .select(
            "a_id",
            "b_id",
            "sim",
            F.round(
                2 * F.col("sim") - F.col("m4a") - F.col("m4b"), 6
            ).alias("csls"),
        )
        .orderBy("a_id")
    )


_X334_ORACLE = """
WITH ft AS (
  SELECT user_id, event_type, min(ts) AS t
  FROM events GROUP BY 1, 2
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_both,
       CAST(SUM(CASE WHEN a.t < b.t THEN 1 ELSE 0 END) AS BIGINT)
         AS n_a_first,
       ROUND(SUM(CASE WHEN a.t < b.t THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS support_a_first
FROM ft a JOIN ft b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY type_a, type_b
"""


@register(
    "x334_precedence_matrix",
    _X334_ORACLE,
    doc="temporal precedence matrix over event types: for every type "
        "pair, among users who emit BOTH, how often does the "
        "first-ever a precede the first-ever b -- the "
        "sequential-pattern support that seeds funnel hypotheses "
        "(x330 then prices a specific chain) and orders curriculum "
        "stages. Unlike x96's adjacent transitions this measures "
        "global first-occurrence order, any gap. Scale: one "
        "(user,type) min-aggregate, then a self-join bounded by "
        "types-per-user (<=5 rows/user -> <=10 pairs), aggregated to "
        "a types^2 matrix; exact integer counts, one rounded "
        "division",
)
def x334_precedence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ft = events.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("t")
    )
    a = ft.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("t").alias("ta"),
    )
    b = ft.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("t").alias("tb"),
    )
    return (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_both"),
            F.sum(
                F.when(F.col("ta") < F.col("tb"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_a_first"),
            F.round(
                F.sum(
                    F.when(F.col("ta") < F.col("tb"), 1).otherwise(0)
                )
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("support_a_first"),
        )
        .orderBy("type_a", "type_b")
    )


_X335_STEM_CASE_DUCK = """CASE
  WHEN regexp_matches({t}, 'sses$') THEN substr({t}, 1, length({t}) - 2)
  WHEN regexp_matches({t}, '[a-z]ies$') THEN substr({t}, 1, length({t}) - 2)
  WHEN regexp_matches({t}, '[a-z]{{3,}}[^s]s$')
    THEN substr({t}, 1, length({t}) - 1)
  ELSE {t} END"""

_X335_SUFFIX_CASE_DUCK = """CASE
  WHEN regexp_matches({t}, '[a-z]{{3,}}ing$')
    THEN substr({t}, 1, length({t}) - 3)
  WHEN regexp_matches({t}, '[a-z]{{3,}}ed$')
    THEN substr({t}, 1, length({t}) - 2)
  ELSE {t} END"""

_X335_ORACLE = f"""
WITH tok AS (
  SELECT t FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE regexp_matches(t, '^[a-z]+$')
),
s1 AS (SELECT t, {_X335_STEM_CASE_DUCK.format(t='t')} AS p FROM tok),
s2 AS (SELECT t, {_X335_SUFFIX_CASE_DUCK.format(t='p')} AS stem FROM s1)
SELECT CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT t) AS BIGINT) AS vocab_raw,
       CAST(count(DISTINCT stem) AS BIGINT) AS vocab_stem,
       CAST(SUM(CASE WHEN stem != t THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       ROUND(1 - count(DISTINCT stem)
             / CAST(count(DISTINCT t) AS DOUBLE), 4) AS vocab_reduction
FROM s2
"""


@register(
    "x335_stem_profile",
    _X335_ORACLE,
    doc="suffix-strip stemming profile (Porter step-1 subset: sses->ss, "
        "ies->i, plural -s, -ing, -ed with length guards): how much "
        "vocabulary a cheap rule-based normalizer collapses before "
        "building indexes, dedup fingerprints, or tokenizer vocab -- "
        "the normalization-vs-recall dial x322 then compares tiers "
        "on. Both engines apply the SAME first-match-wins CASE "
        "ladder (pure substring arithmetic, no stemmer library); "
        "counts are exact. Scale: token explode into two hash "
        "count-distincts -- one pass, map-side partials",
)
def x335_stem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).filter(F.col("t").rlike("^[a-z]+$"))
    t = F.col("t")
    p = (
        F.when(t.rlike("sses$"), F.expr("substring(t, 1, length(t) - 2)"))
        .when(t.rlike("[a-z]ies$"), F.expr("substring(t, 1, length(t) - 2)"))
        .when(
            t.rlike("[a-z]{3,}[^s]s$"),
            F.expr("substring(t, 1, length(t) - 1)"),
        )
        .otherwise(t)
    )
    s1 = tok.select("t", p.alias("p"))
    pc = F.col("p")
    stem = (
        F.when(
            pc.rlike("[a-z]{3,}ing$"),
            F.expr("substring(p, 1, length(p) - 3)"),
        )
        .when(
            pc.rlike("[a-z]{3,}ed$"),
            F.expr("substring(p, 1, length(p) - 2)"),
        )
        .otherwise(pc)
    )
    s2 = s1.select("t", stem.alias("stem"))
    return s2.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("t").cast("long").alias("vocab_raw"),
        F.countDistinct("stem").cast("long").alias("vocab_stem"),
        F.sum(F.when(F.col("stem") != F.col("t"), 1).otherwise(0))
        .cast("long")
        .alias("n_changed"),
        F.round(
            1
            - F.countDistinct("stem")
            / F.countDistinct("t").cast("double"),
            4,
        ).alias("vocab_reduction"),
    )


_X336_ORACLE = """
WITH d AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp,
         substr(text, 1, 16) AS f_prefix,
         CAST(n_chars // 100 AS BIGINT) AS f_lenbkt,
         lang AS f_lang
  FROM documents
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
mm AS (SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS m
       FROM (SELECT count(*) AS n FROM d GROUP BY fp)),
fields AS (
  SELECT 'prefix16' AS field,
         (SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT)
          FROM (SELECT count(*) AS n FROM d GROUP BY f_prefix)) AS agree,
         (SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT)
          FROM (SELECT count(*) AS n FROM d GROUP BY fp, f_prefix))
           AS agree_match
  UNION ALL
  SELECT 'len_bucket',
         (SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT)
          FROM (SELECT count(*) AS n FROM d GROUP BY f_lenbkt)),
         (SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT)
          FROM (SELECT count(*) AS n FROM d GROUP BY fp, f_lenbkt))
  UNION ALL
  SELECT 'lang',
         (SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT)
          FROM (SELECT count(*) AS n FROM d GROUP BY f_lang)),
         (SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT)
          FROM (SELECT count(*) AS n FROM d GROUP BY fp, f_lang))
)
SELECT f.field, f.agree, f.agree_match, mm.m AS match_pairs,
       ROUND((f.agree_match + 1)
             / CAST(mm.m + 2 AS DOUBLE), 6) AS m_prob,
       ROUND((f.agree - f.agree_match + 1)
             / CAST(nn.n * (nn.n - 1) / 2 - mm.m + 2 AS DOUBLE), 6)
         AS u_prob,
       ROUND(ln(((f.agree_match + 1) / CAST(mm.m + 2 AS DOUBLE))
                / ((f.agree - f.agree_match + 1)
                   / CAST(nn.n * (nn.n - 1) / 2 - mm.m + 2
                          AS DOUBLE))), 6) AS agree_weight
FROM fields f CROSS JOIN nn CROSS JOIN mm
ORDER BY f.field
"""


@register(
    "x336_fellegi_sunter",
    _X336_ORACLE,
    doc="Fellegi-Sunter record-linkage weights for three comparison "
        "fields (raw 16-char prefix, n_chars//100 length bucket, "
        "lang): m = P(field agrees | match), u = P(agrees | "
        "non-match), agreement weight ln(m/u) -- the classical "
        "probabilistic-linkage scoring x331's blocking feeds into. "
        "Match truth is x02's normalized fingerprint. The scale "
        "trick is x331's: every pair probability comes from "
        "sum-of-C(group,2) combinatorics on group sizes (two "
        "hash-groupBys per field), NO pair materialization -- exact "
        "m/u over a 100 TB corpus in one aggregate pass per field; "
        "Laplace (+1/+2) smoothing keeps ln defined and "
        "deterministic everywhere",
)
def x336_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""),
                " +",
                " ",
            )
        )
    )
    d = docs.select(
        fp.alias("fp"),
        F.substring("text", 1, 16).alias("f_prefix"),
        F.floor(F.col("n_chars") / 100).cast("long").alias("f_lenbkt"),
        F.col("lang").alias("f_lang"),
    ).localCheckpoint()
    pair_sum = lambda: F.sum(
        (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    ).cast("long")
    nn = d.count()
    mm = (
        d.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
        .agg(pair_sum().alias("m"))
    )

    def field_row(name, col):
        agree = (
            d.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
            .agg(pair_sum().alias("agree"))
        )
        am = (
            d.groupBy("fp", col).agg(F.count(F.lit(1)).alias("n"))
            .agg(pair_sum().alias("agree_match"))
        )
        return agree.crossJoin(F.broadcast(am)).select(
            F.lit(name).alias("field"), "agree", "agree_match"
        )

    fields = (
        field_row("prefix16", "f_prefix")
        .union(field_row("len_bucket", "f_lenbkt"))
        .union(field_row("lang", "f_lang"))
    )
    total_pairs = nn * (nn - 1) // 2
    joined = fields.crossJoin(F.broadcast(mm))
    m_prob = (F.col("agree_match") + 1) / (F.col("m") + 2).cast("double")
    u_prob = (F.col("agree") - F.col("agree_match") + 1) / (
        F.lit(total_pairs) - F.col("m") + 2
    ).cast("double")
    return joined.select(
        "field",
        "agree",
        "agree_match",
        F.col("m").alias("match_pairs"),
        F.round(m_prob, 6).alias("m_prob"),
        F.round(u_prob, 6).alias("u_prob"),
        F.round(F.log(m_prob / u_prob), 6).alias("agree_weight"),
    ).orderBy("field")


_X337_ORACLE = """
WITH toks AS (
  SELECT list_filter(string_split(lower(text), ' '),
                     t -> length(t) > 0) AS ts
  FROM documents
),
grams AS (
  SELECT 1 AS n, unnest(ts) AS g FROM toks
  UNION ALL
  SELECT 2, unnest(list_transform(range(1, len(ts)),
              i -> ts[i] || ' ' || ts[i + 1])) FROM toks
  UNION ALL
  SELECT 3, unnest(list_transform(range(1, len(ts) - 1),
              i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]))
  FROM toks
)
SELECT n, CAST(count(*) AS BIGINT) AS total_ngrams,
       CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams,
       ROUND(count(DISTINCT g) / CAST(count(*) AS DOUBLE), 6)
         AS distinct_ratio
FROM grams GROUP BY n ORDER BY n
"""


@register(
    "x337_distinct_ngrams",
    _X337_ORACLE,
    doc="distinct-1/2/3 corpus diversity (Li et al.'s distinct-n): "
        "unique n-grams over total n-grams per n -- the standard "
        "degeneracy/mode-collapse readout for generated corpora, and "
        "the complement of x127's within-doc repetition ratio. One "
        "explode per n (in-array window expansion, no joins) into "
        "hash count-distincts with map-side partials; exact BIGINT "
        "counts, one rounded division per row",
)
def x337_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ts = F.filter(
        F.split(F.lower("text"), " "), lambda t: F.length(t) > 0
    )
    base = docs.select(ts.alias("ts"))

    def grams(n):
        if n == 1:
            g = F.explode(F.col("ts"))
        else:
            g = F.explode(
                F.transform(
                    F.slice(F.col("ts"), 1, F.size("ts") - (n - 1)),
                    lambda x, i: F.concat_ws(
                        " ",
                        *[
                            x
                            if j == 0
                            else F.element_at(
                                F.col("ts"), i + F.lit(j + 1)
                            )
                            for j in range(n)
                        ],
                    ),
                )
            )
        return base.select(F.lit(n).alias("n"), g.alias("g"))

    allg = grams(1).union(grams(2)).union(grams(3))
    return (
        allg.groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_ngrams"),
            F.countDistinct("g").cast("long").alias("distinct_ngrams"),
            F.round(
                F.countDistinct("g") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("distinct_ratio"),
        )
        .orderBy("n")
    )


_X338_ORACLE = """
WITH o AS (
  SELECT c.c_nationkey AS cat,
         CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
           AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS sum_g,
         CAST(count(*) AS BIGINT) AS n_g
  FROM o
),
c AS (
  SELECT cat, CAST(SUM(cents) AS BIGINT) AS sum_c,
         CAST(count(*) AS BIGINT) AS n_c
  FROM o GROUP BY cat
)
SELECT c.cat AS nationkey, c.n_c AS n_orders,
       ROUND(c.sum_c / CAST(c.n_c AS DOUBLE) / 100, 4) AS raw_mean,
       ROUND((c.sum_c + 20 * (g.sum_g / CAST(g.n_g AS DOUBLE)))
             / (c.n_c + 20) / 100, 4) AS encoded_mean,
       ROUND(c.n_c / CAST(c.n_c + 20 AS DOUBLE), 6) AS shrink_weight
FROM c CROSS JOIN g ORDER BY c.cat
"""


@register(
    "x338_target_encoding",
    _X338_ORACLE,
    doc="smoothed (James-Stein-style) target encoding of customer "
        "nation against mean order value, smoothing m=20: enc = "
        "(sum_c + m*global_mean) / (n_c + m) -- the leakage-resistant "
        "categorical encoder every tabular-ML pipeline ships, with "
        "the shrinkage weight n/(n+m) made explicit so rare "
        "categories visibly pull to the prior. Exact cents BIGINTs "
        "everywhere; the only doubles are two final divisions in a "
        "fixed expression. Scale: one broadcast-dim join + one "
        "category aggregate + a 1-row global, all map-side "
        "partial-agg friendly",
)
def x338_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    o = orders.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_nationkey").alias("cat"),
        (F.col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    g = o.agg(
        F.sum("cents").cast("long").alias("sum_g"),
        F.count(F.lit(1)).cast("long").alias("n_g"),
    )
    c = o.groupBy("cat").agg(
        F.sum("cents").cast("long").alias("sum_c"),
        F.count(F.lit(1)).cast("long").alias("n_c"),
    )
    gm = F.col("sum_g") / F.col("n_g").cast("double")
    return (
        c.crossJoin(F.broadcast(g))
        .select(
            F.col("cat").alias("nationkey"),
            F.col("n_c").alias("n_orders"),
            F.round(
                F.col("sum_c") / F.col("n_c").cast("double") / 100, 4
            ).alias("raw_mean"),
            F.round(
                (F.col("sum_c") + 20 * gm)
                / (F.col("n_c") + 20)
                / 100,
                4,
            ).alias("encoded_mean"),
            F.round(
                F.col("n_c") / (F.col("n_c") + 20).cast("double"), 6
            ).alias("shrink_weight"),
        )
        .orderBy("nationkey")
    )


_X339_ORACLE = """
WITH scored AS (
  SELECT CAST(FLOOR(ROUND(CAST(len(list_filter(
                string_split(lower(text), ' '),
                t -> t IN (%s))) AS DOUBLE)
              / len(string_split(lower(text), ' ')), 4)
              * 10000 + 0.5) AS BIGINT) AS p_s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM((p_s - pos * 10000) * (p_s - pos * 10000)) AS BIGINT)
           AS sq
  FROM scored
),
bins AS (
  SELECT LEAST(p_s // 1000, 9) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS np,
         CAST(SUM(p_s) AS BIGINT) AS sp
  FROM scored GROUP BY 1
),
parts AS (
  SELECT SUM(CAST(ROUND(b.n * (sp / (b.n * 10000.0)
                               - CAST(np AS DOUBLE) / b.n)
                        * (sp / (b.n * 10000.0)
                           - CAST(np AS DOUBLE) / b.n)
                        / t.n_total, 12) AS DECIMAL(28,12))) AS rel,
         SUM(CAST(ROUND(b.n * (CAST(np AS DOUBLE) / b.n
                               - CAST(t.n_pos AS DOUBLE) / t.n_total)
                        * (CAST(np AS DOUBLE) / b.n
                           - CAST(t.n_pos AS DOUBLE) / t.n_total)
                        / t.n_total, 12) AS DECIMAL(28,12))) AS res
  FROM bins b CROSS JOIN tot t
)
SELECT t.n_total,
       ROUND(t.sq / (t.n_total * 100000000.0), 6) AS brier,
       ROUND(CAST(p.rel AS DOUBLE), 6) AS reliability,
       ROUND(CAST(p.res AS DOUBLE), 6) AS resolution,
       ROUND((CAST(t.n_pos AS DOUBLE) / t.n_total)
             * (1 - CAST(t.n_pos AS DOUBLE) / t.n_total), 6)
         AS uncertainty
FROM tot t CROSS JOIN parts p
""" % _STOP_EN


@register(
    "x339_brier_decomposition",
    _X339_ORACLE,
    doc="Brier score + Murphy decomposition (reliability - resolution "
        "+ uncertainty) for x315's stopword-ratio scorer against the "
        "lang label: the proper-scoring-rule companion to ECE -- "
        "reliability isolates miscalibration, resolution rewards "
        "discrimination, uncertainty is the label base rate's floor "
        "(binned decomposition; the within-bin variance term is "
        "deliberately not added back, so brier != rel - res + unc by "
        "exactly that variance). Determinism: scores are exact 1e4 "
        "BIGINTs (x315's contract), the exact Brier numerator is an "
        "integer sum of squares, per-bin terms round 12 into "
        "DECIMAL(28,12) before the 10-row sums. Scale: one corpus "
        "pass -> 10-bin aggregate + 1-row totals",
)
def x339_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    p_s = F.floor(
        text.stop_ratio_column("text") * 10000 + F.lit(0.5)
    ).cast("long")
    scored = docs.select(
        p_s.alias("p_s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    tot = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(
            (F.col("p_s") - F.col("pos") * 10000)
            * (F.col("p_s") - F.col("pos") * 10000)
        )
        .cast("long")
        .alias("sq"),
    )
    bins = scored.groupBy(
        F.least(F.col("p_s") / F.lit(1000), F.lit(9))
        .cast("long")
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("np"),
        F.sum("p_s").cast("long").alias("sp"),
    )
    j = bins.crossJoin(F.broadcast(tot))
    pbar = F.col("sp") / (F.col("n") * F.lit(10000.0))
    obar_b = F.col("np").cast("double") / F.col("n")
    obar = F.col("n_pos").cast("double") / F.col("n_total")
    parts = j.agg(
        F.sum(
            F.round(
                F.col("n") * (pbar - obar_b) * (pbar - obar_b)
                / F.col("n_total"),
                12,
            ).cast("decimal(28,12)")
        ).alias("rel"),
        F.sum(
            F.round(
                F.col("n") * (obar_b - obar) * (obar_b - obar)
                / F.col("n_total"),
                12,
            ).cast("decimal(28,12)")
        ).alias("res"),
    )
    return tot.crossJoin(F.broadcast(parts)).select(
        "n_total",
        F.round(F.col("sq") / (F.col("n_total") * F.lit(1e8)), 6).alias(
            "brier"
        ),
        F.round(F.col("rel").cast("double"), 6).alias("reliability"),
        F.round(F.col("res").cast("double"), 6).alias("resolution"),
        F.round(obar * (1 - obar), 6).alias("uncertainty"),
    )


_X340_ORACLE = """
WITH flagged AS (
  SELECT value,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_e
  FROM events
),
per AS (
  SELECT value, CAST(SUM(is_e) AS BIGINT) AS ce,
         CAST(SUM(1 - is_e) AS BIGINT) AS ca
  FROM flagged GROUP BY value
),
tot AS (SELECT CAST(SUM(ce) AS BIGINT) AS ne,
               CAST(SUM(ca) AS BIGINT) AS na FROM per),
cum AS (
  SELECT value,
         SUM(ce) OVER (ORDER BY value) AS cume,
         SUM(ca) OVER (ORDER BY value) AS cuma,
         LEAD(value) OVER (ORDER BY value) AS nxt
  FROM per
)
SELECT t.ne AS n_expected, t.na AS n_actual,
       CAST((SELECT count(*) FROM per) AS BIGINT) AS n_distinct_values,
       ROUND(CAST(SUM(CAST(ROUND(ABS(cume / CAST(t.ne AS DOUBLE)
                                     - cuma / CAST(t.na AS DOUBLE))
                                 * (nxt - value), 12)
                           AS DECIMAL(28,12))) AS DOUBLE), 6) AS w1
FROM cum CROSS JOIN tot t
WHERE nxt IS NOT NULL
GROUP BY t.ne, t.na
"""


@register(
    "x340_wasserstein_drift",
    _X340_ORACLE,
    doc="Wasserstein-1 (earth-mover) distance between the event-value "
        "distributions of the two month halves: integral |CDF_e - "
        "CDF_a| dv computed EXACTLY as sum over distinct values of "
        "|cume/ne - cuma/na| * gap-to-next -- the metric-space drift "
        "number that complements x327's binned PSI (W1 sees HOW FAR "
        "mass moved, not just that bins changed; no binning choice, "
        "no smoothing constant). Determinism: cumulative counts are "
        "exact BIGINT window sums; per-gap terms round 12 into "
        "DECIMAL(28,12) before the order-free sum. Scale: one "
        "corpus aggregate to the DISTINCT-VALUE table (bounded by "
        "the 2-dp value domain, <=56001 rows, corpus-independent); "
        "the ordered window rides that aggregate under the "
        "x81/x292 bounded contract, plan-gated in test_plans.py",
)
def x340_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    per = (
        events.select(
            "value",
            F.when(
                F.col("ts")
                < F.expr("TIMESTAMP_NTZ '2024-01-16 00:00:00'"),
                1,
            )
            .otherwise(0)
            .alias("is_e"),
        )
        .groupBy("value")
        .agg(
            F.sum("is_e").cast("long").alias("ce"),
            F.sum(1 - F.col("is_e")).cast("long").alias("ca"),
        )
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "value",
        F.sum("ce").over(w).alias("cume"),
        F.sum("ca").over(w).alias("cuma"),
        F.lead("value").over(Window.orderBy("value")).alias("nxt"),
    )
    tot = per.agg(
        F.sum("ce").cast("long").alias("ne"),
        F.sum("ca").cast("long").alias("na"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_values"),
    )
    term = F.round(
        F.abs(
            F.col("cume") / F.col("ne").cast("double")
            - F.col("cuma") / F.col("na").cast("double")
        )
        * (F.col("nxt") - F.col("value")),
        12,
    ).cast("decimal(28,12)")
    return (
        cum.filter(F.col("nxt").isNotNull())
        .crossJoin(F.broadcast(tot))
        .groupBy("ne", "na", "n_distinct_values")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("w1"))
        .select(
            F.col("ne").alias("n_expected"),
            F.col("na").alias("n_actual"),
            "n_distinct_values",
            "w1",
        )
    )


_X341_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 10),
d AS (
  SELECT e.vec_id, c.cid,
         ROUND(list_dot_product(e.v, e.v)
               - 2 * list_dot_product(e.v, c.cv)
               + list_dot_product(c.cv, c.cv), 6) AS d2
  FROM e CROSS JOIN c
),
md AS (SELECT vec_id, min(d2) AS mind FROM d GROUP BY 1),
asg AS (
  SELECT d.vec_id, min(d.cid) AS cid
  FROM d JOIN md ON d.vec_id = md.vec_id AND d.d2 = md.mind
  GROUP BY 1
),
comp AS (
  SELECT a.cid, (p).d AS dim,
         CAST(ROUND((p).x, 6) AS DECIMAL(18,6)) AS x
  FROM asg a JOIN e ON a.vec_id = e.vec_id,
       LATERAL (SELECT unnest(list_transform(range(1, len(e.v) + 1),
                    i -> struct_pack(d := i, x := e.v[i]))) AS p)
),
m AS (
  SELECT cid, dim,
         ROUND(CAST(SUM(x) AS DOUBLE) / count(*), 6) AS md_new
  FROM comp GROUP BY 1, 2
),
oldc AS (
  SELECT cid, (p).d AS dim, (p).x AS md_old
  FROM c, LATERAL (SELECT unnest(list_transform(range(1, len(cv) + 1),
                       i -> struct_pack(d := i, x := cv[i]))) AS p)
),
agg AS (
  SELECT m.cid,
         SUM(CAST(ROUND(m.md_new * m.md_new, 12) AS DECIMAL(28,12)))
           AS nrm2,
         SUM(CAST(ROUND((m.md_new - o.md_old) * (m.md_new - o.md_old),
                        12) AS DECIMAL(28,12))) AS shift2
  FROM m JOIN oldc o ON m.cid = o.cid AND m.dim = o.dim
  GROUP BY 1
),
sz AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_assigned
       FROM asg GROUP BY 1)
SELECT s.cid, s.n_assigned,
       ROUND(sqrt(CAST(a.nrm2 AS DOUBLE)), 6) AS new_norm,
       ROUND(sqrt(CAST(a.shift2 AS DOUBLE)), 6) AS shift
FROM sz s JOIN agg a ON s.cid = a.cid ORDER BY s.cid
"""


@register(
    "x341_kmeans_step",
    _X341_ORACLE,
    doc="one deterministic Lloyd iteration of k-means (k=10, seeds = "
        "vectors 0..9): squared-distance assignment with round-6 "
        "distances and min-cid tie-break, then per-dimension centroid "
        "means -- reporting cluster sizes, new-centroid norms and "
        "seed->centroid shift. The iterative-ML-on-Spark pattern "
        "made engine-exact: distances via the |v|^2 - 2v.c + |c|^2 "
        "identity (same fold both engines), components round 6 into "
        "DECIMAL before per-dim means so the mean is order-free, "
        "norm/shift terms round 12 before dim sums. Scale: centroids "
        "broadcast (k rows); assignment is one map-side pass; the "
        "centroid update is a (k x dim)-bounded aggregate off a "
        "posexplode -- the same shuffle a real multi-iteration "
        "kmeans pays per step, with convergence read from 'shift'",
)
def x341_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
    )
    c = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    d = e.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "cid",
        "v",
        F.round(
            dot(F.col("v"), F.col("v"))
            - 2 * dot(F.col("v"), F.col("cv"))
            + dot(F.col("cv"), F.col("cv")),
            6,
        ).alias("d2"),
    )
    asg = d.groupBy("vec_id").agg(
        F.min(F.struct("d2", "cid")).getField("cid").alias("cid")
    )
    comp = (
        asg.join(e, "vec_id")
        .select("cid", F.posexplode("v").alias("dim0", "x"))
        .select(
            "cid",
            (F.col("dim0") + 1).alias("dim"),
            F.round("x", 6).cast("decimal(18,6)").alias("x"),
        )
    )
    m = comp.groupBy("cid", "dim").agg(
        F.round(
            F.sum("x").cast("double") / F.count(F.lit(1)), 6
        ).alias("md_new")
    )
    oldc = c.select(
        "cid", F.posexplode("cv").alias("dim0", "md_old")
    ).select("cid", (F.col("dim0") + 1).alias("dim"), "md_old")
    agg = (
        m.join(oldc, ["cid", "dim"])
        .groupBy("cid")
        .agg(
            F.sum(
                F.round(F.col("md_new") * F.col("md_new"), 12).cast(
                    "decimal(28,12)"
                )
            ).alias("nrm2"),
            F.sum(
                F.round(
                    (F.col("md_new") - F.col("md_old"))
                    * (F.col("md_new") - F.col("md_old")),
                    12,
                ).cast("decimal(28,12)")
            ).alias("shift2"),
        )
    )
    sz = asg.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_assigned")
    )
    return (
        sz.join(agg, "cid")
        .select(
            "cid",
            "n_assigned",
            F.round(F.sqrt(F.col("nrm2").cast("double")), 6).alias(
                "new_norm"
            ),
            F.round(F.sqrt(F.col("shift2").cast("double")), 6).alias(
                "shift"
            ),
        )
        .orderBy("cid")
    )


_X342_ORACLE = """
WITH tok AS (
  SELECT source, t FROM (
    SELECT source, unnest(string_split(lower(text), ' ')) AS t
    FROM documents
    WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
  ) WHERE length(t) > 0
),
cnt AS (
  SELECT source, t, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
),
ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
vv AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM cnt),
spine AS (
  SELECT s.source, w.t, s.n, vv.v,
         COALESCE(c.c, 0) + 1 AS num
  FROM ns s
  CROSS JOIN (SELECT DISTINCT t FROM cnt) w
  CROSS JOIN vv
  LEFT JOIN cnt c ON c.source = s.source AND c.t = w.t
),
ce AS (
  SELECT p.source AS s1, q.source AS s2,
         ROUND(CAST(SUM(CAST(ROUND(
             -(p.num / CAST(p.n + p.v AS DOUBLE))
             * ln(q.num / CAST(q.n + q.v AS DOUBLE)), 12)
           AS DECIMAL(28,12))) AS DOUBLE), 6) AS cross_entropy
  FROM spine p JOIN spine q ON p.t = q.t
  GROUP BY 1, 2
)
SELECT a.s1, a.s2, a.cross_entropy,
       ROUND(a.cross_entropy - b.cross_entropy, 6) AS kl
FROM ce a JOIN ce b ON a.s1 = b.s1 AND b.s2 = a.s1
ORDER BY a.s1, a.s2
"""


@register(
    "x342_lm_divergence",
    _X342_ORACLE,
    doc="unigram-LM cross-entropy and KL divergence matrix between "
        "five sources (Laplace-smoothed over the shared vocabulary): "
        "H(s1, s2) = -sum p(t|s1) ln p(t|s2), KL = H(s1,s2) - "
        "H(s1,s1) -- the source-similarity numbers that drive "
        "mixture design (x38/x46) and flag near-duplicate crawls at "
        "the DISTRIBUTION level where doc-level dedup (x01-x06) sees "
        "nothing. Determinism: smoothed probabilities are exact "
        "(c+1)/(n+V) integer ratios evaluated once in double; each "
        "vocab term rounds 12 into DECIMAL(28,12) before per-pair "
        "sums. Scale: token counts are one hash-groupBy; the spine "
        "is vocab x 5 sources and the pair join is vocab-keyed "
        "(sources^2 fan-out per token, never corpus-sized)",
)
def x342_lm_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    srcs = ["src0", "src1", "src2", "src3", "src4"]
    tok = (
        docs.filter(F.col("source").isin(srcs))
        .select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("t")
        )
        .filter(F.length("t") > 0)
    )
    cnt = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ns = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    vv = cnt.agg(F.countDistinct("t").cast("long").alias("v"))
    vocab = cnt.select("t").distinct()
    spine = (
        ns.crossJoin(vocab)
        .crossJoin(F.broadcast(vv))
        .join(cnt, ["source", "t"], "left")
        .select(
            "source",
            "t",
            "n",
            "v",
            (F.coalesce(F.col("c"), F.lit(0)) + 1).alias("num"),
        )
    )
    p = spine.select(
        F.col("source").alias("s1"),
        "t",
        (F.col("num") / (F.col("n") + F.col("v")).cast("double")).alias(
            "p1"
        ),
    )
    q = spine.select(
        F.col("source").alias("s2"),
        "t",
        (F.col("num") / (F.col("n") + F.col("v")).cast("double")).alias(
            "p2"
        ),
    )
    ce = (
        p.join(q, "t")
        .select(
            "s1",
            "s2",
            F.round(-F.col("p1") * F.log("p2"), 12)
            .cast("decimal(28,12)")
            .alias("term"),
        )
        .groupBy("s1", "s2")
        .agg(F.round(F.sum("term").cast("double"), 6).alias("cross_entropy"))
    )
    self_ce = ce.filter(F.col("s1") == F.col("s2")).select(
        F.col("s1").alias("s1x"),
        F.col("cross_entropy").alias("h_self"),
    )
    return (
        ce.join(self_ce, ce.s1 == self_ce.s1x)
        .select(
            "s1",
            "s2",
            "cross_entropy",
            F.round(F.col("cross_entropy") - F.col("h_self"), 6).alias(
                "kl"
            ),
        )
        .orderBy("s1", "s2")
    )


_X343_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1
),
tr AS (
  SELECT d, cents,
         CASE WHEN count(*) OVER w = 7
              THEN ROUND(SUM(cents) OVER w / 7.0 / 100, 4)
              ELSE NULL END AS trend
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
resid AS (
  SELECT d, cents, trend,
         CAST(isodow(d) AS BIGINT) AS dow,
         ROUND(cents / 100.0 - trend, 4) AS detrended
  FROM tr
),
seas AS (
  SELECT dow,
         ROUND(CAST(SUM(CAST(ROUND(detrended, 4) AS DECIMAL(18,4)))
                    AS DOUBLE) / count(*), 4) AS seasonal
  FROM resid WHERE detrended IS NOT NULL GROUP BY 1
)
SELECT r.d AS day, ROUND(r.cents / 100.0, 2) AS revenue, r.dow,
       r.trend, s.seasonal,
       ROUND(r.cents / 100.0 - r.trend - s.seasonal, 4) AS residual
FROM resid r JOIN seas s ON r.dow = s.dow
WHERE r.trend IS NOT NULL
ORDER BY r.d
"""


@register(
    "x343_seasonal_decomposition",
    _X343_ORACLE,
    doc="additive seasonal decomposition of daily event revenue "
        "(classical decompose-lite): trend = 7-day centered moving "
        "average (full windows only), seasonal = per-ISO-weekday mean "
        "of the detrended series, residual = value - trend - "
        "seasonal -- x288's seasonality index extended to the full "
        "trend/seasonal/residual split anomaly pipelines subtract "
        "before alerting (x77/x289 fire on residuals, not raw). "
        "Determinism: daily cents are exact BIGINTs, the MA divides "
        "an exact 7-day sum once, detrended values round 4 into "
        "DECIMAL(18,4) before the per-dow mean. Scale: one corpus "
        "pass to the day-cardinality aggregate; all windows ride it "
        "under the x81/x292 bounded contract",
)
def x343_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.col("ts").cast("date").alias("d"),
            F.round(F.col("value") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "cents",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.round(F.sum("cents").over(w) / 7.0 / 100, 4),
        ).alias("trend"),
    )
    resid = tr.select(
        "d",
        "cents",
        "trend",
        F.dayofweek("d").alias("dow_us"),
        F.round(F.col("cents") / 100.0 - F.col("trend"), 4).alias(
            "detrended"
        ),
    ).withColumn(
        # ISO weekday (Mon=1..Sun=7) from Spark's US dayofweek (Sun=1)
        "dow",
        F.when(F.col("dow_us") == 1, 7).otherwise(
            F.col("dow_us") - 1
        ).cast("long"),
    )
    seas = (
        resid.filter(F.col("detrended").isNotNull())
        .groupBy("dow")
        .agg(
            F.round(
                F.sum(
                    F.round("detrended", 4).cast("decimal(18,4)")
                ).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("seasonal")
        )
    )
    return (
        resid.join(F.broadcast(seas), "dow")
        .filter(F.col("trend").isNotNull())
        .select(
            F.col("d").alias("day"),
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            "dow",
            "trend",
            "seasonal",
            F.round(
                F.col("cents") / 100.0 - F.col("trend") - F.col("seasonal"),
                4,
            ).alias("residual"),
        )
        .orderBy("day")
    )


_X344_ORACLE = """
WITH pos AS (
  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
np AS (SELECT CAST(max(p_partkey) AS BIGINT) AS n_parts FROM part),
users AS (SELECT DISTINCT u FROM pos),
cand AS (
  SELECT users.u, k.k,
         1 + CAST(concat('0x', substr(md5(concat(CAST(users.u AS VARCHAR),
               ':neg:', CAST(k.k AS VARCHAR))), 1, 8)) AS BIGINT)
             % np.n_parts AS p
  FROM users CROSS JOIN (SELECT unnest(range(0, 3)) AS k) k
  CROSS JOIN np
),
hit AS (
  SELECT c.u, c.k, c.p,
         CASE WHEN pos.u IS NULL THEN 0 ELSE 1 END AS is_pos
  FROM cand c LEFT JOIN pos ON c.u = pos.u AND c.p = pos.p
)
SELECT CAST((SELECT count(*) FROM users) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(SUM(is_pos) AS BIGINT) AS n_collisions,
       ROUND(SUM(is_pos) / CAST(count(*) AS DOUBLE), 6)
         AS collision_rate,
       CAST(SUM(1 - is_pos) AS BIGINT) AS n_negatives
FROM hit
"""


@register(
    "x344_negative_sampling",
    _X344_ORACLE,
    doc="deterministic uniform negative sampling for recommender / "
        "contrastive training: 3 candidate parts per purchasing "
        "customer drawn by md5(user:neg:k) modulo the part-id domain, "
        "anti-checked against the positive set -- reporting candidate "
        "count, positive-collision count/rate (the quantity that "
        "decides between reject-resample and loss masking), and the "
        "surviving negatives. No RNG state: candidates are a pure "
        "row-local hash function, so every retry/engine reproduces "
        "the same sample (x328's streaming-bootstrap property). "
        "Scale: candidate generation is map-side off the distinct-"
        "user table; the collision check is one (user, part) "
        "equi-join against the positives -- never a domain spine",
)
def x344_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    pos = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    np_ = part.agg(F.max("p_partkey").cast("long").alias("n_parts"))
    users = pos.select("u").distinct()
    cand = (
        users.select(
            "u", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("k")
        )
        .crossJoin(F.broadcast(np_))
        .select(
            "u",
            "k",
            (
                1
                + F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("u").cast("string"),
                                F.lit(":neg:"),
                                F.col("k").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n_parts")
            ).alias("p"),
        )
    )
    hit = cand.join(
        pos.withColumn("is_pos", F.lit(1)), ["u", "p"], "left"
    ).select("u", "k", F.coalesce("is_pos", F.lit(0)).alias("is_pos"))
    nu = users.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    return hit.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum("is_pos").cast("long").alias("n_collisions"),
        F.round(
            F.sum("is_pos") / F.count(F.lit(1)).cast("double"), 6
        ).alias("collision_rate"),
        F.sum(1 - F.col("is_pos")).cast("long").alias("n_negatives"),
    ).crossJoin(F.broadcast(nu)).select(
        "n_users",
        "n_candidates",
        "n_collisions",
        "collision_rate",
        "n_negatives",
    )


def _x345_oracle(iterations: int = 2, top_k: int = 20) -> str:
    ctes = [
        """ed AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)""",
        "h0 AS MATERIALIZED (SELECT u, CAST(1.0 AS DOUBLE) AS h "
        "FROM (SELECT DISTINCT u FROM ed))",
    ]
    for t in range(1, iterations + 1):
        ctes.append(
            f"""ar{t} AS MATERIALIZED (
  SELECT ed.p, SUM(CAST(ROUND(h.h, 12) AS DECIMAL(28,12))) AS s
  FROM ed JOIN h{t - 1} h ON ed.u = h.u GROUP BY ed.p
)"""
        )
        ctes.append(
            f"""a{t} AS MATERIALIZED (
  SELECT p, ROUND(CAST(s AS DOUBLE) /
           CAST((SELECT SUM(s) FROM ar{t}) AS DOUBLE), 12) AS a
  FROM ar{t}
)"""
        )
        ctes.append(
            f"""hr{t} AS MATERIALIZED (
  SELECT ed.u, SUM(CAST(ROUND(a.a, 12) AS DECIMAL(28,12))) AS s
  FROM ed JOIN a{t} a ON ed.p = a.p GROUP BY ed.u
)"""
        )
        ctes.append(
            f"""h{t} AS MATERIALIZED (
  SELECT u, ROUND(CAST(s AS DOUBLE) /
           CAST((SELECT SUM(s) FROM hr{t}) AS DOUBLE), 12) AS h
  FROM hr{t}
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(p AS BIGINT) AS part_id, ROUND(a, 8) AS authority
FROM a{iterations}
ORDER BY a DESC, p LIMIT {top_k}"""
    )


@register(
    "x345_hits_authorities",
    _x345_oracle(),
    doc="HITS hubs-and-authorities over the customer-part purchase "
        "bipartite graph, 2 mutual-reinforcement iterations "
        "(Kleinberg; L1-normalized for cross-engine exactness instead "
        "of the classical L2 -- same ranking, documented): authority "
        "of a part = sum of its buyers' hub scores, hub of a customer "
        "= sum of bought parts' authorities -- the 'respected items "
        "vs discerning buyers' dual that PageRank (x104) collapses. "
        "Determinism: contributions round 12 into DECIMAL(28,12) "
        "before edge-sums; normalizers are DECIMAL sums divided once "
        "in double. Scale: the edge list is the only corpus-sized "
        "table (one distinct); each iteration is two edge-keyed "
        "equi-join aggregates -- node-sized state, x104's fixed-depth "
        "shape on a bipartite graph",
)
def x345_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ed = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint()
    )
    h = ed.select("u").distinct().select(
        "u", F.lit(1.0).cast("double").alias("h")
    )
    a = None
    for _ in range(2):
        ar = (
            ed.join(h, "u")
            .select(
                "p",
                F.round("h", 12).cast("decimal(28,12)").alias("c"),
            )
            .groupBy("p")
            .agg(F.sum("c").alias("s"))
        )
        atot = ar.agg(F.sum("s").alias("t"))
        a = ar.crossJoin(F.broadcast(atot)).select(
            "p",
            F.round(
                F.col("s").cast("double") / F.col("t").cast("double"),
                12,
            ).alias("a"),
        )
        hr = (
            ed.join(a, "p")
            .select(
                "u",
                F.round("a", 12).cast("decimal(28,12)").alias("c"),
            )
            .groupBy("u")
            .agg(F.sum("c").alias("s"))
        )
        htot = hr.agg(F.sum("s").alias("t"))
        h = hr.crossJoin(F.broadcast(htot)).select(
            "u",
            F.round(
                F.col("s").cast("double") / F.col("t").cast("double"),
                12,
            ).alias("h"),
        )
    return (
        a.select(
            F.col("p").cast("long").alias("part_id"),
            F.round("a", 8).alias("authority"),
        )
        .orderBy(F.desc("authority"), "part_id")
        .limit(20)
    )


_X346_ORACLE = """
WITH d AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
              ':shuffle')), 1, 8)) AS BIGINT) % 32 AS shard,
         substr(md5(concat(CAST(doc_id AS VARCHAR), ':shuffle')), 9, 8)
           AS ord
  FROM documents
),
seq AS (
  SELECT source, shard,
         LAG(source) OVER (PARTITION BY shard ORDER BY ord, doc_id)
           AS prev_source
  FROM d
),
obs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_adjacent,
         CAST(SUM(CASE WHEN source = prev_source THEN 1 ELSE 0 END)
              AS BIGINT) AS n_same
  FROM seq WHERE prev_source IS NOT NULL
),
mix AS (
  SELECT SUM(CAST(ROUND((cnt / CAST(tot AS DOUBLE))
                        * (cnt / CAST(tot AS DOUBLE)), 12)
                  AS DECIMAL(28,12))) AS expected
  FROM (SELECT count(*) AS cnt, SUM(count(*)) OVER () AS tot
        FROM d GROUP BY source)
)
SELECT o.n_adjacent, o.n_same,
       ROUND(o.n_same / CAST(o.n_adjacent AS DOUBLE), 6) AS same_frac,
       ROUND(CAST(m.expected AS DOUBLE), 6) AS expected_frac,
       ROUND((o.n_same / CAST(o.n_adjacent AS DOUBLE))
             / CAST(m.expected AS DOUBLE), 4) AS clumping_ratio
FROM obs o CROSS JOIN mix m
"""


@register(
    "x346_shuffle_mixing",
    _X346_ORACLE,
    doc="shuffle-quality audit for training-batch mixing: after "
        "x42's deterministic md5 shard shuffle, the fraction of "
        "adjacent same-source pairs within each shard vs the "
        "perfectly-mixed expectation sum(p_s^2) -- clumping_ratio "
        "~1.0 means the shuffle actually decorrelated sources "
        "(poorly mixed batches are a real LLM-training regression: "
        "consecutive same-crawl documents gradient-correlate). "
        "Adjacency comes from lag() windows PARTITIONED BY SHARD -- "
        "per-shard parallelism, shard count scales with the cluster, "
        "never a global order. Exact integer pair counts; expected "
        "fraction from round-12 DECIMAL share squares",
)
def x346_shuffle_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle")))
    d = docs.select(
        "doc_id",
        "source",
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 32).alias(
            "shard"
        ),
        F.substring(h, 9, 8).alias("ord"),
    )
    w = Window.partitionBy("shard").orderBy("ord", "doc_id")
    seq = d.select(
        "source", F.lag("source").over(w).alias("prev_source")
    )
    obs = seq.filter(F.col("prev_source").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_adjacent"),
        F.sum(
            F.when(F.col("source") == F.col("prev_source"), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("n_same"),
    )
    shares = d.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    tot = shares.agg(F.sum("cnt").alias("tot"))
    mix = (
        shares.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("cnt") / F.col("tot").cast("double"))
                * (F.col("cnt") / F.col("tot").cast("double")),
                12,
            )
            .cast("decimal(28,12)")
            .alias("sq")
        )
        .agg(F.sum("sq").alias("expected"))
    )
    return obs.crossJoin(F.broadcast(mix)).select(
        "n_adjacent",
        "n_same",
        F.round(
            F.col("n_same") / F.col("n_adjacent").cast("double"), 6
        ).alias("same_frac"),
        F.round(F.col("expected").cast("double"), 6).alias(
            "expected_frac"
        ),
        F.round(
            (F.col("n_same") / F.col("n_adjacent").cast("double"))
            / F.col("expected").cast("double"),
            4,
        ).alias("clumping_ratio"),
    )


_X347_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN substr(md5(concat(CAST(event_id AS VARCHAR),
              ':tsplit')), 1, 4) < '4000' THEN 1 ELSE 0 END AS is_test
  FROM events
),
test_start AS (
  SELECT user_id, min(ts) AS t0
  FROM flagged WHERE is_test = 1 GROUP BY 1
),
train AS (
  SELECT f.user_id,
         CAST(count(*) AS BIGINT) AS n_train,
         CAST(SUM(CASE WHEN f.ts > t.t0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_after
  FROM flagged f JOIN test_start t ON f.user_id = t.user_id
  WHERE f.is_test = 0
  GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN n_after > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_users_leaking,
       CAST(SUM(n_train) AS BIGINT) AS n_train_events,
       CAST(SUM(n_after) AS BIGINT) AS n_train_after_test,
       ROUND(SUM(n_after) / CAST(SUM(n_train) AS DOUBLE), 6)
         AS leak_fraction
FROM train
"""


@register(
    "x347_time_leakage",
    _X347_ORACLE,
    doc="temporal-leakage audit of a hash-random train/test split "
        "(x18's md5 split at 25%): per user, how much TRAINING data "
        "postdates the user's first test event -- the leakage a "
        "random split silently injects into any time-causal task "
        "(churn, next-event, conversion), which a time-based split "
        "eliminates by construction. Complements x146/x297 "
        "(feature/near-dup leakage) with the time axis. Exact "
        "integer counts off one user-key min-aggregate + one "
        "user-key join (same partitioning reused); the md5 "
        "threshold is x18's proven hex-prefix recipe",
)
def x347_time_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    flagged = events.select(
        "user_id",
        "ts",
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"), F.lit(":tsplit")
                    )
                ),
                1,
                4,
            )
            < "4000",
            1,
        )
        .otherwise(0)
        .alias("is_test"),
    )
    test_start = (
        flagged.filter(F.col("is_test") == 1)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    train = (
        flagged.filter(F.col("is_test") == 0)
        .join(test_start, "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            F.sum(F.when(F.col("ts") > F.col("t0"), 1).otherwise(0))
            .cast("long")
            .alias("n_after"),
        )
    )
    return train.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("n_after") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_users_leaking"),
        F.sum("n_train").cast("long").alias("n_train_events"),
        F.sum("n_after").cast("long").alias("n_train_after_test"),
        F.round(
            F.sum("n_after") / F.sum("n_train").cast("double"), 6
        ).alias("leak_fraction"),
    )


_X348_ORACLE = """
WITH d AS (
  SELECT LEAST(CAST(n_chars // 200 AS BIGINT), 9) AS bkt,
         CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
              ':sir')), 1, 8)) AS BIGINT) AS u
  FROM documents
),
cnt AS (SELECT bkt, CAST(count(*) AS BIGINT) AS n_b FROM d GROUP BY 1),
tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n FROM cnt),
w AS (
  SELECT c.bkt, c.n_b, t.n,
         0.1 * t.n / c.n_b AS wt
  FROM cnt c CROSS JOIN tot t
),
mx AS (SELECT max(wt) AS mw FROM w),
thr AS (
  SELECT w.bkt, w.n_b, w.n,
         CAST(FLOOR((w.wt / mx.mw) * 4294967296) AS BIGINT) AS cut
  FROM w CROSS JOIN mx
),
acc AS (
  SELECT d.bkt, CAST(SUM(CASE WHEN d.u < thr.cut THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_after
  FROM d JOIN thr ON d.bkt = thr.bkt GROUP BY 1
),
at AS (SELECT CAST(SUM(n_after) AS BIGINT) AS na FROM acc)
SELECT t.bkt AS len_bucket, t.n_b AS n_before,
       ROUND(t.n_b / CAST(t.n AS DOUBLE), 6) AS share_before,
       a.n_after,
       ROUND(a.n_after / CAST(att.na AS DOUBLE), 6) AS share_after,
       ROUND(a.n_after / CAST(t.n_b AS DOUBLE), 6) AS accept_rate
FROM thr t JOIN acc a ON t.bkt = a.bkt CROSS JOIN at att
ORDER BY t.bkt
"""


@register(
    "x348_importance_resampling",
    _X348_ORACLE,
    doc="deterministic sampling-importance-resampling toward a UNIFORM "
        "length-bucket target: per-bucket weight w = target/actual, "
        "acceptance w/max(w) (the heaviest bucket keeps everything), "
        "accept iff the 32-bit md5(doc:sir) uniform clears "
        "floor(a*2^32) -- the distribution-matching resample curation "
        "pipelines use to fix length (or language/source) imbalance "
        "without up-weighting losses. Determinism: thresholds are "
        "exact BIGINTs from ratios of exact counts (the only doubles "
        "are w/max(w), identical both engines); accept decisions are "
        "integer comparisons. Scale: two corpus passes (count, "
        "accept-count) with a 10-row broadcast between -- no "
        "shuffle of the corpus itself",
)
def x348_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.least(F.floor(F.col("n_chars") / 200), F.lit(9))
        .cast("long")
        .alias("bkt"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit(":sir"))
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("u"),
    )
    cnt = d.groupBy("bkt").agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    tot = cnt.agg(F.sum("n_b").cast("long").alias("n"))
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "bkt", "n_b", "n", (0.1 * F.col("n") / F.col("n_b")).alias("wt")
    )
    mx = w.agg(F.max("wt").alias("mw"))
    thr = w.crossJoin(F.broadcast(mx)).select(
        "bkt",
        "n_b",
        "n",
        F.floor((F.col("wt") / F.col("mw")) * F.lit(4294967296))
        .cast("long")
        .alias("cut"),
    )
    acc = (
        d.join(F.broadcast(thr.select("bkt", "cut")), "bkt")
        .groupBy("bkt")
        .agg(
            F.sum(F.when(F.col("u") < F.col("cut"), 1).otherwise(0))
            .cast("long")
            .alias("n_after")
        )
    )
    at = acc.agg(F.sum("n_after").cast("long").alias("na"))
    return (
        thr.join(acc, "bkt")
        .crossJoin(F.broadcast(at))
        .select(
            F.col("bkt").alias("len_bucket"),
            F.col("n_b").alias("n_before"),
            F.round(F.col("n_b") / F.col("n").cast("double"), 6).alias(
                "share_before"
            ),
            "n_after",
            F.round(
                F.col("n_after") / F.col("na").cast("double"), 6
            ).alias("share_after"),
            F.round(
                F.col("n_after") / F.col("n_b").cast("double"), 6
            ).alias("accept_rate"),
        )
        .orderBy("len_bucket")
    )


_X349_ORACLE = """
WITH scored AS (
  SELECT CAST(FLOOR(ROUND(CAST(len(list_filter(
                string_split(lower(text), ' '),
                t -> t IN (%s))) AS DOUBLE)
              / len(string_split(lower(text), ' ')), 4)
              * 10000 + 0.5) AS BIGINT) AS p_s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
per AS (
  SELECT p_s, CAST(count(*) AS BIGINT) AS n_s,
         CAST(SUM(pos) AS BIGINT) AS pos_s
  FROM scored GROUP BY 1
),
cum AS (
  SELECT p_s, n_s, pos_s,
         SUM(n_s) OVER (ORDER BY p_s) - n_s AS cum_before
  FROM per
),
agg AS (
  SELECT CAST(SUM(pos_s) AS BIGINT) AS n_pos,
         CAST(SUM(n_s - pos_s) AS BIGINT) AS n_neg,
         CAST(SUM(pos_s * (2 * cum_before + n_s + 1)) AS BIGINT) AS r2
  FROM cum
)
SELECT n_pos, n_neg,
       ROUND((r2 - n_pos * (n_pos + 1))
             / (2.0 * n_pos * n_neg), 6) AS auc,
       ROUND((r2 - n_pos * (n_pos + 1))
             / (1.0 * n_pos * n_neg) - 1, 6) AS gini
FROM agg
""" % _STOP_EN


@register(
    "x349_auc_mann_whitney",
    _X349_ORACLE,
    doc="exact ROC AUC for x315's stopword-ratio scorer against the "
        "lang label via the Mann-Whitney rank-sum identity with "
        "MIDRANKS for ties (AUC = (R+ - n+(n+1)/2) / (n+ n-)) -- the "
        "threshold-free discrimination number completing the "
        "classifier-audit suite (x315 calibration, x339 Brier, x317 "
        "retrieval). Tie handling is exact: 2*midrank = 2*cum_before "
        "+ n_s + 1 keeps EVERYTHING integer until one final division "
        "(no float rank averaging). Scale: one corpus pass to the "
        "score-domain aggregate (<=10001 rows, bounded); the "
        "cumulative window rides it under the x340 plan-gated "
        "contract",
)
def x349_auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    p_s = F.floor(
        text.stop_ratio_column("text") * 10000 + F.lit(0.5)
    ).cast("long")
    scored = docs.select(
        p_s.alias("p_s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    per = scored.groupBy("p_s").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum("pos").cast("long").alias("pos_s"),
    )
    w = Window.orderBy("p_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "p_s",
        "n_s",
        "pos_s",
        (F.sum("n_s").over(w) - F.col("n_s")).alias("cum_before"),
    )
    agg = cum.agg(
        F.sum("pos_s").cast("long").alias("n_pos"),
        F.sum(F.col("n_s") - F.col("pos_s")).cast("long").alias("n_neg"),
        F.sum(
            F.col("pos_s")
            * (2 * F.col("cum_before") + F.col("n_s") + 1)
        )
        .cast("long")
        .alias("r2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            (F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1))
            / (2.0 * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
        F.round(
            (F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1))
            / (1.0 * F.col("n_pos") * F.col("n_neg"))
            - 1,
            6,
        ).alias("gini"),
    )


_X350_ORACLE = """
WITH scored AS (
  SELECT CAST(FLOOR(ROUND(CAST(len(list_filter(
                string_split(lower(text), ' '),
                t -> t IN (%s))) AS DOUBLE)
              / len(string_split(lower(text), ' ')), 4)
              * 10000 + 0.5) AS BIGINT) AS p_s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
per AS (
  SELECT p_s, CAST(count(*) AS BIGINT) AS n_s,
         CAST(SUM(pos) AS BIGINT) AS pos_s
  FROM scored GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(pos_s) AS BIGINT) AS n_pos,
         CAST(SUM(n_s - pos_s) AS BIGINT) AS n_neg
  FROM per
),
cum AS (
  SELECT p_s,
         CAST(SUM(pos_s) OVER (ORDER BY p_s DESC) AS BIGINT) AS tp,
         CAST(SUM(n_s) OVER (ORDER BY p_s DESC) AS BIGINT) AS pred_pos
  FROM per
),
m AS (
  SELECT c.p_s AS threshold, c.tp, c.pred_pos - c.tp AS fp,
         t.n_pos, t.n_neg,
         ROUND(c.tp / CAST(c.pred_pos AS DOUBLE), 6) AS precision_,
         ROUND(c.tp / CAST(t.n_pos AS DOUBLE), 6) AS recall_,
         ROUND(2.0 * c.tp / (c.pred_pos + t.n_pos), 8) AS f1,
         ROUND(c.tp / CAST(t.n_pos AS DOUBLE)
               - (c.pred_pos - c.tp) / CAST(t.n_neg AS DOUBLE), 8)
           AS youden
  FROM cum c CROSS JOIN tot t
),
bf AS (
  SELECT 'best_f1' AS metric, threshold, tp, fp, precision_, recall_,
         f1, youden
  FROM m QUALIFY row_number() OVER (ORDER BY f1 DESC, threshold) = 1
),
bj AS (
  SELECT 'best_youden' AS metric, threshold, tp, fp, precision_,
         recall_, f1, youden
  FROM m QUALIFY row_number() OVER (ORDER BY youden DESC, threshold) = 1
)
SELECT * FROM bf UNION ALL SELECT * FROM bj ORDER BY metric
""" % _STOP_EN


@register(
    "x350_threshold_sweep",
    _X350_ORACLE,
    doc="full operating-point sweep for x315's scorer: every distinct "
        "score is a candidate threshold (predict positive iff score "
        ">= t); suffix-cumulative TP/FP from ONE score-domain "
        "aggregate give precision/recall/F1 (exact 2TP/(P+n_pos) "
        "form) and Youden J at every point; report the best-F1 and "
        "best-Youden operating points (deterministic low-threshold "
        "tie-break on round-8 scores) -- how a quality filter's "
        "cutoff should actually be chosen, completing x315/x339/"
        "x349. Scale: the sweep costs ONE pass + windows over the "
        "<=10001-row bounded score aggregate -- no per-threshold "
        "re-scan, no model in the loop",
)
def x350_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    p_s = F.floor(
        text.stop_ratio_column("text") * 10000 + F.lit(0.5)
    ).cast("long")
    scored = docs.select(
        p_s.alias("p_s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    per = scored.groupBy("p_s").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum("pos").cast("long").alias("pos_s"),
    )
    tot = per.agg(
        F.sum("pos_s").cast("long").alias("n_pos"),
        F.sum(F.col("n_s") - F.col("pos_s")).cast("long").alias("n_neg"),
    )
    wd = Window.orderBy(F.desc("p_s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "p_s",
        F.sum("pos_s").over(wd).cast("long").alias("tp"),
        F.sum("n_s").over(wd).cast("long").alias("pred_pos"),
    )
    m = cum.crossJoin(F.broadcast(tot)).select(
        F.col("p_s").alias("threshold"),
        "tp",
        (F.col("pred_pos") - F.col("tp")).alias("fp"),
        F.round(F.col("tp") / F.col("pred_pos").cast("double"), 6).alias(
            "precision_"
        ),
        F.round(F.col("tp") / F.col("n_pos").cast("double"), 6).alias(
            "recall_"
        ),
        F.round(
            2.0 * F.col("tp") / (F.col("pred_pos") + F.col("n_pos")), 8
        ).alias("f1"),
        F.round(
            F.col("tp") / F.col("n_pos").cast("double")
            - (F.col("pred_pos") - F.col("tp"))
            / F.col("n_neg").cast("double"),
            8,
        ).alias("youden"),
    )
    wf = Window.orderBy(F.desc("f1"), "threshold")
    wy = Window.orderBy(F.desc("youden"), "threshold")
    bf = (
        m.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .select(F.lit("best_f1").alias("metric"), "*")
    )
    bj = (
        m.withColumn("rn", F.row_number().over(wy))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .select(F.lit("best_youden").alias("metric"), "*")
    )
    return bf.union(bj).orderBy("metric")


_X351_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 4 = 0
),
items AS (SELECT DISTINCT l_orderkey, l_partkey FROM li),
p AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
),
edges AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
br AS (SELECT p_partkey, p_brand FROM part),
lab AS (
  SELECT e.u, e.v, bu.p_brand AS cu, bv.p_brand AS cv
  FROM edges e
  JOIN br bu ON e.u = bu.p_partkey
  JOIN br bv ON e.v = bv.p_partkey
),
m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM lab),
perc AS (
  SELECT cu AS community,
         CAST(SUM(CASE WHEN cu = cv THEN 1 ELSE 0 END) AS BIGINT)
           AS a_in,
         CAST(count(*) AS BIGINT) AS d_c
  FROM lab GROUP BY 1
),
terms AS (
  SELECT p.community, p.a_in, p.d_c, t.m2,
         ROUND(p.a_in / CAST(t.m2 AS DOUBLE)
               - (p.d_c / CAST(t.m2 AS DOUBLE))
                 * (p.d_c / CAST(t.m2 AS DOUBLE)), 12) AS contrib
  FROM perc p CROSS JOIN m2 t
),
q AS (
  SELECT ROUND(CAST(SUM(CAST(contrib AS DECIMAL(28,12))) AS DOUBLE), 6)
    AS q_total
  FROM terms
)
SELECT t.community, t.a_in / 2 AS within_edges, t.d_c AS degree_sum,
       ROUND(t.contrib, 8) AS contribution, q.q_total
FROM terms t CROSS JOIN q
ORDER BY t.community
"""


@register(
    "x351_brand_modularity",
    _X351_ORACLE,
    doc="Newman modularity of the BRAND partition over the co-purchase "
        "subgraph (x302's partkey%4 slice): Q = sum_c [A_c/2m - "
        "(d_c/2m)^2] with communities = p_brand -- attribute "
        "assortativity: does brand structure the purchase graph, and "
        "which brand contributes what (the quality readout for any "
        "community assignment; here scoring a KNOWN attribute "
        "partition, the same formula scores x302's learned labels). "
        "Determinism: within-edge and degree counts are exact BIGINTs "
        "off the symmetric edge list; per-community terms round 12 "
        "into DECIMAL before the order-free Q sum. Scale: edge "
        "derivation is the bounded per-order HOF expansion; labeling "
        "is two broadcast-dim joins; everything after is "
        "community-cardinality arithmetic",
)
def x351_brand_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 4 == 0
    )
    part = load_table(spark, sf_dir, "part")
    edges = graph.symmetric_copurchase_edges(li)
    br = part.select("p_partkey", "p_brand")
    lab = (
        edges.join(
            F.broadcast(br.withColumnRenamed("p_brand", "cu")),
            edges.u == F.col("p_partkey"),
        )
        .drop("p_partkey")
        .join(
            F.broadcast(br.withColumnRenamed("p_brand", "cv")),
            F.col("v") == F.col("p_partkey"),
        )
        .select("cu", "cv")
    )
    m2 = lab.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    perc = lab.groupBy(F.col("cu").alias("community")).agg(
        F.sum(F.when(F.col("cu") == F.col("cv"), 1).otherwise(0))
        .cast("long")
        .alias("a_in"),
        F.count(F.lit(1)).cast("long").alias("d_c"),
    )
    terms = perc.crossJoin(F.broadcast(m2)).select(
        "community",
        "a_in",
        "d_c",
        F.round(
            F.col("a_in") / F.col("m2").cast("double")
            - (F.col("d_c") / F.col("m2").cast("double"))
            * (F.col("d_c") / F.col("m2").cast("double")),
            12,
        ).alias("contrib"),
    )
    q = terms.agg(
        F.round(
            F.sum(F.col("contrib").cast("decimal(28,12)")).cast("double"),
            6,
        ).alias("q_total")
    )
    return (
        terms.crossJoin(F.broadcast(q))
        .select(
            "community",
            (F.col("a_in") / 2).cast("long").alias("within_edges"),
            F.col("d_c").alias("degree_sum"),
            F.round("contrib", 8).alias("contribution"),
            "q_total",
        )
        .orderBy("community")
    )


def _x352_oracle() -> str:
    edge_ctes = [
        """ft AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '),
                     t -> regexp_matches(t, '^[a-z]{4,}$')) AS ft
  FROM documents
)""",
        """adj AS (
  SELECT (p).a AS a, (p).b AS b FROM (
    SELECT unnest(list_transform(range(1, len(ft)),
                  i -> struct_pack(a := ft[i], b := ft[i + 1]))) AS p
    FROM ft
  )
)""",
        """pr AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
  FROM adj WHERE a != b
)""",
        "edges AS (SELECT u, v FROM pr UNION ALL SELECT v, u FROM pr)",
    ]
    seed_cte = (
        "seeds AS (SELECT u, CAST(0.2 AS DOUBLE) AS w FROM "
        "(SELECT u, count(*) AS dg FROM edges GROUP BY u "
        "ORDER BY dg DESC, u LIMIT 5))"
    )
    return graph.ppr_sql_over_edges(
        edge_ctes, seed_cte, iterations=3, top_k=20,
        node_select="u AS token",
    )


@register(
    "x352_ppr_related_terms",
    _x352_oracle(),
    doc="personalized PageRank on x324's word co-occurrence graph, "
        "teleporting to the 5 highest-degree tokens (weight 0.2 "
        "each): rank mass concentrates in the seeds' neighborhood, "
        "surfacing RELATED terms -- the random-walk-with-restart "
        "query-expansion primitive (vs x324's global importance). "
        "Exercises graph.personalized_pagerank: same node-sized "
        "state, shuffle_hash iteration joins, round-12 DECIMAL "
        "contributions as x104, with the teleport vector replacing "
        "the uniform 1/n term; the oracle replays through "
        "ppr_sql_over_edges, the seeded sibling of the proven "
        "pagerank CTE template. Seeds chosen deterministically "
        "(degree desc, token asc)",
)
def x352_ppr_related_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    edges = _word_cooccurrence_edges(docs).localCheckpoint(eager=False)
    seeds = (
        edges.groupBy("u")
        .agg(F.count(F.lit(1)).alias("dg"))
        .orderBy(F.desc("dg"), "u")
        .limit(5)
        .select("u", F.lit(0.2).cast("double").alias("w"))
    )
    pr = graph.personalized_pagerank(
        edges, seeds, iterations=3, damping=0.85, materialize=False
    )
    return (
        pr.join(seeds.select("u", F.lit(1).alias("s")),
                pr.node == F.col("u"), "left")
        .select(
            F.col("node").alias("token"),
            F.coalesce(F.col("s"), F.lit(0)).cast("int").alias("is_seed"),
            F.round("rank", 8).alias("rank"),
        )
        .orderBy(F.desc("rank"), "token")
        .limit(20)
    )


_X353_ORACLE = """
WITH o AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS pts
  FROM events
),
f AS (
  SELECT user_id, ts,
         CASE WHEN pts IS NULL
                OR epoch_us(ts) - epoch_us(pts) >= 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM o
),
s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@register(
    "x353_native_session_window",
    _X353_ORACLE,
    doc="Spark's native batch session_window(ts, '30 minutes') "
        "grouping, hash-pinned to the classic lag-gap sessionization "
        "(x21's shape: break when the gap >= 30 min, end = last event "
        "+ gap; session_window's [start, end) half-open boundary is "
        "exactly the >= break) -- the API-parity entry proving the "
        "built-in dynamic-gap operator computes the SAME sessions as "
        "the portable SQL formulation, batch side of the x48 "
        "streaming session window. One user-key shuffle either way; "
        "per-user window parallelism is the documented contract",
)
def x353_native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


_X354_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id,
         MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prev_max
  FROM events
),
lateness AS (
  SELECT CASE WHEN prev_max IS NULL THEN NULL
              ELSE epoch_us(prev_max) - epoch_us(ts) END AS late_us
  FROM seq
),
d AS (SELECT unnest([60, 300, 3600]) AS delay_seconds)
SELECT d.delay_seconds,
       CAST(count(l.late_us) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN l.late_us > CAST(d.delay_seconds AS BIGINT)
                          * 1000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       ROUND(SUM(CASE WHEN l.late_us > CAST(d.delay_seconds AS BIGINT)
                           * 1000000 THEN 1 ELSE 0 END)
             / CAST(count(l.late_us) AS DOUBLE), 6) AS late_share
FROM d CROSS JOIN lateness l
WHERE l.late_us IS NOT NULL
GROUP BY d.delay_seconds ORDER BY d.delay_seconds
"""


@register(
    "x354_watermark_lateness",
    _X354_ORACLE,
    doc="watermark-delay planning audit: per user, an event is LATE "
        "for delay D if it arrives (event_id order) more than D "
        "behind the user's running max event-time -- the share of "
        "data a streaming watermark of 1m/5m/1h would actually drop "
        "(x27/x48's withWatermark configs chosen from measurement "
        "instead of folklore). Per-USER running max windows (per-key "
        "parallel, never a global order); lateness compared in exact "
        "epoch-microsecond arithmetic (the x305 dodge around "
        "boundary-counting date_diff); the 3-delay spine is a "
        "broadcast VALUES dim. Exact integer counts, one rounded "
        "division per row",
)
def x354_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    seq = events.select(
        "ts", F.max("ts").over(w).alias("prev_max")
    ).filter(F.col("prev_max").isNotNull())
    late_us = F.expr("timestampdiff(MICROSECOND, ts, prev_max)")
    lateness = seq.select(late_us.alias("late_us"))
    d = spark.createDataFrame(
        [(60,), (300,), (3600,)], "delay_seconds int"
    )
    return (
        lateness.crossJoin(F.broadcast(d))
        .groupBy("delay_seconds")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.when(
                    F.col("late_us")
                    > F.col("delay_seconds").cast("long") * 1000000,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_late"),
            F.round(
                F.sum(
                    F.when(
                        F.col("late_us")
                        > F.col("delay_seconds").cast("long") * 1000000,
                        1,
                    ).otherwise(0)
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("late_share"),
        )
        .select(
            F.col("delay_seconds").cast("int").alias("delay_seconds"),
            "n_events",
            "n_late",
            "late_share",
        )
        .orderBy("delay_seconds")
    )


_X355_ORACLE = """
WITH o AS (
  SELECT o.o_orderkey AS k, c.c_nationkey AS nat,
         CAST(CAST(o.o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
           AS cents,
         CASE WHEN substr(md5(concat(CAST(o.o_orderkey AS VARCHAR),
              ':conf')), 1, 4) < '8000' THEN 1 ELSE 0 END AS is_cal
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS sum_g,
         CAST(count(*) AS BIGINT) AS n_g
  FROM o WHERE is_cal = 1
),
enc AS (
  SELECT nat,
         (SUM(cents) + 20 * (g.sum_g / CAST(g.n_g AS DOUBLE)))
           / (count(*) + 20) AS enc100
  FROM o CROSS JOIN g WHERE is_cal = 1 GROUP BY nat, g.sum_g, g.n_g
),
resid AS (
  SELECT o.k,
         CAST(ROUND(ABS(o.cents - e.enc100), 4) AS DECIMAL(18,4)) AS r
  FROM o JOIN enc e ON o.nat = e.nat WHERE o.is_cal = 1
),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM resid),
kq AS (
  SELECT LEAST(CAST(CEIL(0.9 * (n_cal + 1)) AS BIGINT), n_cal) AS kk,
         n_cal
  FROM nc
),
qhat AS (
  SELECT r.r AS q, kq.kk, kq.n_cal
  FROM (SELECT r, row_number() OVER (ORDER BY r, k) AS rn FROM resid) r
  JOIN kq ON r.rn = kq.kk
),
test AS (
  SELECT CAST(count(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN CAST(ROUND(ABS(o.cents - e.enc100), 4)
                             AS DECIMAL(18,4)) <= q.q
                       THEN 1 ELSE 0 END) AS BIGINT) AS covered
  FROM o JOIN enc e ON o.nat = e.nat CROSS JOIN qhat q
  WHERE o.is_cal = 0
)
SELECT q.n_cal, t.n_test, q.kk AS k_order_stat,
       ROUND(CAST(q.q AS DOUBLE) / 100, 4) AS qhat_dollars,
       ROUND(t.covered / CAST(t.n_test AS DOUBLE), 6) AS coverage,
       0.9 AS target
FROM qhat q CROSS JOIN test t
"""


@register(
    "x355_conformal_interval",
    _X355_ORACLE,
    doc="split-conformal prediction interval around x338's "
        "nation-encoded order-value predictor: calibration = md5 50% "
        "split, qhat = the ceil(0.9*(n+1))-th smallest absolute "
        "residual (EXACT order statistic), guarantee checked as "
        "empirical coverage on the held-out half -- the "
        "distribution-free uncertainty wrapper that turns ANY point "
        "predictor into a calibrated interval (finite-sample "
        "coverage >= 0.9 by exchangeability, no model assumptions). "
        "Determinism: residuals round 4 into DECIMAL(18,4) so "
        "ordering and the <= qhat comparison are exact; the k-th "
        "statistic comes from scale.global_row_number (x169's "
        "two-pass rank, plan-safe at corpus scale -- never a "
        "SinglePartition sort); encoder sums are exact cents",
)
def x355_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import scale

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    o = orders.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("c_nationkey").alias("nat"),
        (F.col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"), F.lit(":conf")
                    )
                ),
                1,
                4,
            )
            < "8000",
            1,
        )
        .otherwise(0)
        .alias("is_cal"),
    )
    cal = o.filter(F.col("is_cal") == 1)
    g = cal.agg(
        F.sum("cents").cast("long").alias("sum_g"),
        F.count(F.lit(1)).cast("long").alias("n_g"),
    )
    enc = (
        cal.groupBy("nat")
        .agg(
            F.sum("cents").cast("long").alias("sum_c"),
            F.count(F.lit(1)).cast("long").alias("n_c"),
        )
        .crossJoin(F.broadcast(g))
        .select(
            "nat",
            (
                (
                    F.col("sum_c")
                    + 20 * (F.col("sum_g") / F.col("n_g").cast("double"))
                )
                / (F.col("n_c") + 20)
            ).alias("enc100"),
        )
    )
    rexpr = F.round(F.abs(F.col("cents") - F.col("enc100")), 4).cast(
        "decimal(18,4)"
    )
    resid = cal.join(F.broadcast(enc), "nat").select(
        "k", rexpr.alias("r")
    )
    nc = resid.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    kq = nc.select(
        F.least(
            F.ceil(0.9 * (F.col("n_cal") + 1)).cast("long"),
            F.col("n_cal"),
        ).alias("kk"),
        "n_cal",
    )
    ranked = scale.global_row_number(
        resid, [F.col("r"), F.col("k")], out_col="rn"
    )
    qhat = ranked.crossJoin(F.broadcast(kq)).filter(
        F.col("rn") == F.col("kk")
    ).select(F.col("r").alias("q"), "kk", "n_cal")
    test = (
        o.filter(F.col("is_cal") == 0)
        .join(F.broadcast(enc), "nat")
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(F.when(rexpr <= F.col("q"), 1).otherwise(0))
            .cast("long")
            .alias("covered"),
        )
    )
    return qhat.crossJoin(F.broadcast(test)).select(
        "n_cal",
        "n_test",
        F.col("kk").alias("k_order_stat"),
        F.round(F.col("q").cast("double") / 100, 4).alias("qhat_dollars"),
        F.round(
            F.col("covered") / F.col("n_test").cast("double"), 6
        ).alias("coverage"),
        F.lit(0.9).alias("target"),
    )


_X356_ORACLE = """
WITH scored AS (
  SELECT CAST(FLOOR(ROUND(CAST(len(list_filter(
                string_split(lower(text), ' '),
                t -> t IN (%s))) AS DOUBLE)
              / len(string_split(lower(text), ' ')), 4)
              * 100 + 0.5) AS BIGINT) AS bin,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
per AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
         CAST(SUM(pos) AS BIGINT) AS pos_b
  FROM scored GROUP BY 1
),
cum AS (
  SELECT bin, n_b, pos_b,
         CAST(SUM(n_b) OVER (ORDER BY bin) AS BIGINT) AS cn,
         CAST(SUM(pos_b) OVER (ORDER BY bin) AS BIGINT) AS cp
  FROM per
),
pairs AS (
  SELECT j.bin AS bj, k.bin AS bk,
         (k.cp - j.cp + j.pos_b)
           / CAST(k.cn - j.cn + j.n_b AS DOUBLE) AS a
  FROM cum j JOIN cum k ON j.bin <= k.bin
),
sm AS (
  SELECT bj, bk,
         MIN(a) OVER (PARTITION BY bj ORDER BY bk DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS m
  FROM pairs
),
iso AS (SELECT bk AS bin, MAX(m) AS iso_raw FROM sm GROUP BY 1)
SELECT p.bin, p.n_b AS n, p.pos_b AS pos,
       ROUND(p.pos_b / CAST(p.n_b AS DOUBLE), 6) AS raw_rate,
       ROUND(i.iso_raw, 6) AS iso_rate
FROM per p JOIN iso i USING (bin)
ORDER BY p.bin
""" % _STOP_EN


@register(
    "x356_isotonic_calibration",
    _X356_ORACLE,
    doc="isotonic (PAV) recalibration of x315's stopword-ratio scorer "
        "against the lang label via the closed-form MINIMAX identity "
        "iso(i) = max_{j<=i} min_{k>=i} weighted-mean(y_j..y_k) -- "
        "the monotone fit PAV's sequential pooling converges to, "
        "restated as pure relational algebra (interval means from "
        "inclusive prefix sums, one suffix-min window per start bin, "
        "one max-groupBy): the standard score->probability mapping "
        "that FIXES the miscalibration x315 measures. Determinism: "
        "interval means are single IEEE divisions of exact BIGINT "
        "prefix-sum differences (engine-identical doubles), min/max "
        "compare those; rates round 6 only at output. Scale: one "
        "corpus pass to the <=101-row calibration-bin aggregate; the "
        "O(bins^2) pair frame (~5k rows) and its windows are "
        "aggregate-sized -- the corpus is never touched again, and "
        "the j<=k expansion is a broadcast nested-loop over the tiny "
        "frame, never a corpus join",
)
def x356_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    b = F.floor(
        text.stop_ratio_column("text") * 100 + F.lit(0.5)
    ).cast("long")
    scored = docs.select(
        b.alias("bin"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    per = scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("pos").cast("long").alias("pos_b"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "bin",
        "n_b",
        "pos_b",
        F.sum("n_b").over(w).cast("long").alias("cn"),
        F.sum("pos_b").over(w).cast("long").alias("cp"),
    )
    j = cum.select(
        F.col("bin").alias("bj"),
        F.col("n_b").alias("nj"),
        F.col("pos_b").alias("pj"),
        F.col("cn").alias("cnj"),
        F.col("cp").alias("cpj"),
    )
    k = cum.select(
        F.col("bin").alias("bk"),
        F.col("cn").alias("cnk"),
        F.col("cp").alias("cpk"),
    )
    pairs = j.join(F.broadcast(k), F.col("bj") <= F.col("bk")).select(
        "bj",
        "bk",
        (
            (F.col("cpk") - F.col("cpj") + F.col("pj"))
            / (F.col("cnk") - F.col("cnj") + F.col("nj")).cast("double")
        ).alias("a"),
    )
    wsm = Window.partitionBy("bj").orderBy(F.desc("bk")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sm = pairs.select("bj", "bk", F.min("a").over(wsm).alias("m"))
    iso = sm.groupBy(F.col("bk").alias("bin")).agg(
        F.max("m").alias("iso_raw")
    )
    return (
        per.join(iso, "bin")
        .select(
            "bin",
            F.col("n_b").alias("n"),
            F.col("pos_b").alias("pos"),
            F.round(
                F.col("pos_b") / F.col("n_b").cast("double"), 6
            ).alias("raw_rate"),
            F.round("iso_raw", 6).alias("iso_rate"),
        )
        .orderBy("bin")
    )


@register(
    "x357_kendall_tau",
    """WITH pn AS (
         SELECT n.n_name AS nation,
                CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents,
                CAST(count(*) AS BIGINT) AS n_orders
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY 1
       ),
       p AS (
         SELECT CASE WHEN (a.rev_cents - b.rev_cents)
                          * (a.n_orders - b.n_orders) > 0
                     THEN 1 ELSE 0 END AS conc,
                CASE WHEN (a.rev_cents - b.rev_cents)
                          * (a.n_orders - b.n_orders) < 0
                     THEN 1 ELSE 0 END AS disc,
                CASE WHEN a.rev_cents = b.rev_cents THEN 1 ELSE 0
                  END AS tx,
                CASE WHEN a.n_orders = b.n_orders THEN 1 ELSE 0
                  END AS ty
         FROM pn a JOIN pn b ON a.nation < b.nation
       ),
       s AS (
         SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(SUM(conc) AS BIGINT) AS concordant,
                CAST(SUM(disc) AS BIGINT) AS discordant,
                CAST(SUM(tx) AS BIGINT) AS ties_x,
                CAST(SUM(ty) AS BIGINT) AS ties_y
         FROM p
       )
       SELECT n_pairs, concordant, discordant, ties_x, ties_y,
              ROUND((concordant - discordant)
                    / sqrt((n_pairs - ties_x)
                           * CAST(n_pairs - ties_y AS DOUBLE)),
                    6) AS tau_b
       FROM s""",
    doc="Kendall tau-b rank correlation between two KPI orderings of "
        "the nations (total revenue vs order count) with exact tie "
        "corrections -- the ordinal-association member of the "
        "correlation suite (x147 Pearson measures linearity, x154 MI "
        "measures dependence, tau measures ORDERING agreement: do "
        "the two league tables actually rank markets the same way). "
        "Concordant/discordant/tie pair counts are exact BIGINTs off "
        "exact integer cents; the single sqrt+division happens once "
        "on identical integers. Scale: the corpus collapses to the "
        "nation-cardinality aggregate FIRST (one shuffle, broadcast "
        "dims); the O(n^2) pair scan is 300 rows of arithmetic over "
        "the 25-row frame -- rank-correlating any two metrics never "
        "touches the fact table twice",
)
def x357_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    pn = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("rev_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
    a = pn.select(
        F.col("nation").alias("na"),
        F.col("rev_cents").alias("ra"),
        F.col("n_orders").alias("oa"),
    )
    bq = pn.select(
        F.col("nation").alias("nb"),
        F.col("rev_cents").alias("rb"),
        F.col("n_orders").alias("ob"),
    )
    p = a.join(F.broadcast(bq), F.col("na") < F.col("nb")).select(
        F.when(
            (F.col("ra") - F.col("rb")) * (F.col("oa") - F.col("ob"))
            > 0,
            1,
        )
        .otherwise(0)
        .alias("conc"),
        F.when(
            (F.col("ra") - F.col("rb")) * (F.col("oa") - F.col("ob"))
            < 0,
            1,
        )
        .otherwise(0)
        .alias("disc"),
        F.when(F.col("ra") == F.col("rb"), 1).otherwise(0).alias("tx"),
        F.when(F.col("oa") == F.col("ob"), 1).otherwise(0).alias("ty"),
    )
    s = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("conc").cast("long").alias("concordant"),
        F.sum("disc").cast("long").alias("discordant"),
        F.sum("tx").cast("long").alias("ties_x"),
        F.sum("ty").cast("long").alias("ties_y"),
    )
    return s.select(
        "n_pairs",
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        F.round(
            (F.col("concordant") - F.col("discordant"))
            / F.sqrt(
                (F.col("n_pairs") - F.col("ties_x"))
                * (F.col("n_pairs") - F.col("ties_y")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


_X358_ORACLE = """
WITH u AS (
  SELECT user_id,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':ab'),
                          1, 4) < '8000'
              THEN 'treat' ELSE 'control' END AS arm,
         COALESCE(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                      THEN CAST(round(value * 100) AS BIGINT) END),
                  0) AS x,
         COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                      THEN CAST(round(value * 100) AS BIGINT) END),
                  0) AS y
  FROM events GROUP BY 1
),
pool AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0))
           AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0))
           AS sxy,
         CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DECIMAL(38,0))
           AS syy
  FROM u
),
th AS (
  SELECT n,
         CAST(sx AS DOUBLE) / n AS xbar_pool,
         ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sy AS DOUBLE))
               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                  * CAST(sx AS DOUBLE)), 8) AS theta,
         ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sy AS DOUBLE))
               * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                  * CAST(sy AS DOUBLE))
               / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sx AS DOUBLE))
                  * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                     * CAST(sy AS DOUBLE))), 6) AS var_reduction
  FROM pool
),
arms AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS users,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ax,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ay
  FROM u GROUP BY 1
)
SELECT a.arm, a.users,
       ROUND(CAST(a.ay AS DOUBLE) / a.users / 100, 4) AS mean_y,
       ROUND((CAST(a.ay AS DOUBLE) / a.users
              - t.theta * (CAST(a.ax AS DOUBLE) / a.users
                           - t.xbar_pool)) / 100, 4) AS adj_mean_y,
       t.theta, t.var_reduction
FROM arms a CROSS JOIN th t
ORDER BY a.arm
"""


@register(
    "x358_cuped_adjustment",
    _X358_ORACLE,
    doc="CUPED variance-reduced readout for x303's md5-bucket "
        "experiment: per-user PRE-period spend (days 1-15) is the "
        "covariate, experiment-period spend (days 16-30) the metric; "
        "theta = cov(X,Y)/var(X) from POOLED exact-integer moments, "
        "adjusted arm mean = ybar_a - theta*(xbar_a - xbar_pool), "
        "plus the achieved variance-reduction rho^2 -- the standard "
        "pre-experiment-data trick that shrinks experiment "
        "confidence intervals ~(1-rho^2)x at zero cost (Deng et al. "
        "2013 pattern, public). Determinism: all six moments "
        "accumulate as exact DECIMAL(38,0) integer cents (partition-"
        "order free), theta rounds 8 BEFORE use so both engines "
        "adjust with the identical scalar. Scale: one user-level "
        "aggregate over the corpus (same shuffle x303 already pays), "
        "then 1-row + arm-cardinality arithmetic -- the covariate "
        "costs NOTHING extra at 100 TB because it rides the same "
        "groupBy",
)
def x358_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    pre = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))),
            1,
            4,
        )
        < "8000",
        F.lit("treat"),
    ).otherwise(F.lit("control"))
    u = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(pre, cents)), F.lit(0))
        .cast("long")
        .alias("x"),
        F.coalesce(F.sum(F.when(~pre, cents)), F.lit(0))
        .cast("long")
        .alias("y"),
    ).withColumn("arm", arm)
    d38 = "decimal(38,0)"
    pool = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(d38)).cast(d38).alias("sx"),
        F.sum(F.col("y").cast(d38)).cast(d38).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast(d38).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).cast(d38).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).cast(d38).alias("syy"),
    )
    nD = F.col("n")
    sxD = F.col("sx").cast("double")
    syD = F.col("sy").cast("double")
    cov = nD * F.col("sxy").cast("double") - sxD * syD
    varx = nD * F.col("sxx").cast("double") - sxD * sxD
    vary = nD * F.col("syy").cast("double") - syD * syD
    th = pool.select(
        "n",
        (sxD / nD).alias("xbar_pool"),
        F.round(cov / varx, 8).alias("theta"),
        F.round(cov * cov / (varx * vary), 6).alias("var_reduction"),
    )
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("users"),
        F.sum(F.col("x").cast(d38)).cast(d38).alias("ax"),
        F.sum(F.col("y").cast(d38)).cast(d38).alias("ay"),
    )
    ybar = F.col("ay").cast("double") / F.col("users")
    xbar = F.col("ax").cast("double") / F.col("users")
    return (
        arms.crossJoin(F.broadcast(th))
        .select(
            "arm",
            "users",
            F.round(ybar / 100, 4).alias("mean_y"),
            F.round(
                (ybar - F.col("theta") * (xbar - F.col("xbar_pool")))
                / 100,
                4,
            ).alias("adj_mean_y"),
            "theta",
            "var_reduction",
        )
        .orderBy("arm")
    )


# Support>=2 co-purchase edge list (x210's graph: parts co-ordered at
# least twice, oriented u < v), shared by x359/x360/x361 -- derived once
# per session+fixture and lazily localCheckpoint'ed (edge-sized, tiny
# next to lineitem), same contract as _shared_pair_counts.
_SUPPORT2_CACHE: dict[tuple, DataFrame] = {}

_SUPPORT2_CTE = """items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pr AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
), e AS (SELECT u, v FROM pr),
sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
        FROM sym GROUP BY 1)"""


def _support2_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    e = _SUPPORT2_CACHE.get(key)
    if e is None:
        li = load_table(spark, sf_dir, "lineitem")
        buckets = (
            li.select("l_orderkey", "l_partkey")
            .groupBy("l_orderkey")
            .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        )
        ps = F.col("parts")
        e = (
            buckets.select(
                F.explode(
                    F.flatten(
                        F.transform(
                            ps,
                            lambda x, i: F.transform(
                                F.slice(ps, i + F.lit(2), F.size(ps)),
                                lambda y: F.struct(
                                    x.alias("u"), y.alias("v")
                                ),
                            ),
                        )
                    )
                ).alias("p")
            )
            .select("p.*")
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 2)
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        _SUPPORT2_CACHE[key] = e
    return e


def _sym_deg(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    sym = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    return sym, deg


_X359_ORACLE = (
    "WITH "
    + _SUPPORT2_CTE
    + """,
cand AS (
  SELECT node, deg FROM deg ORDER BY deg DESC, node LIMIT 30
),
adj AS (
  SELECT c.node AS cnode, s.v AS z
  FROM cand c JOIN sym s ON c.node = s.u
),
cp AS (
  SELECT a.cnode AS u, b.cnode AS v, a.z
  FROM adj a JOIN adj b ON a.z = b.z AND a.cnode < b.cnode
),
ne AS (
  SELECT cp.u, cp.v, cp.z FROM cp
  LEFT JOIN e ON cp.u = e.u AND cp.v = e.v
  WHERE e.u IS NULL
),
sc AS (
  SELECT ne.u, ne.v,
         CAST(count(*) AS BIGINT) AS common_neighbors,
         CAST(SUM(CAST(ROUND(1.0 / ln(d.deg), 8)
                       AS DECIMAL(28,8))) AS DECIMAL(28,8)) AS aa
  FROM ne JOIN deg d ON ne.z = d.node
  GROUP BY 1, 2
),
j AS (
  SELECT sc.u, sc.v, sc.common_neighbors,
         ROUND(CAST(sc.aa AS DOUBLE), 6) AS aa_score,
         ROUND(sc.common_neighbors
               / CAST(du.deg + dv.deg - sc.common_neighbors
                      AS DOUBLE), 6) AS jaccard
  FROM sc
  JOIN deg du ON sc.u = du.node
  JOIN deg dv ON sc.v = dv.node
)
SELECT u, v, common_neighbors, aa_score, jaccard
FROM j ORDER BY aa_score DESC, u, v LIMIT 20"""
)


@register(
    "x359_adamic_adar",
    _X359_ORACLE,
    doc="Adamic-Adar link prediction over the support>=2 co-purchase "
        "graph (x210's edge set): for NON-adjacent pairs among the "
        "top-30-degree parts, score = sum_z 1/ln(deg z) over common "
        "neighbors z (rare shared neighbors count more) plus raw "
        "common-neighbor count and neighborhood Jaccard -- 'parts "
        "that SHOULD sell together but don't yet', the "
        "recommendation/assortment-gap primitive on top of the graph "
        "x104/x210/x302 analyze. Determinism: per-neighbor terms "
        "round 8 into DECIMAL before the order-free sum (ln is the "
        "only transcendental, applied to exact integer degrees); "
        "candidate set and top-20 under total ORDER BY. Scale: the "
        "candidate restriction bounds the quadratic leg to 30 "
        "adjacency lists (broadcast-size); common neighbors come "
        "from one equi-join on the shared neighbor id, existing "
        "edges anti-join out -- the corpus-sized work is exactly "
        "x210's edge derivation, shared and checkpointed once per "
        "session",
)
def x359_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _support2_edges(spark, sf_dir)
    sym, deg = _sym_deg(e)
    cand = deg.orderBy(F.desc("deg"), "node").limit(30)
    adj = sym.join(
        F.broadcast(cand.select(F.col("node").alias("cnode"))),
        sym.u == F.col("cnode"),
    ).select("cnode", F.col("v").alias("z"))
    a = adj.select(F.col("cnode").alias("cu"), "z")
    b = adj.select(F.col("cnode").alias("cv"), F.col("z").alias("zb"))
    cp = a.join(
        b, (F.col("z") == F.col("zb")) & (F.col("cu") < F.col("cv"))
    ).select(F.col("cu").alias("u"), F.col("cv").alias("v"), "z")
    ne = cp.join(e, ["u", "v"], "left_anti")
    sc = (
        ne.join(
            deg.select(F.col("node").alias("z"), F.col("deg").alias("dz")),
            "z",
        )
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum(
                F.round(F.lit(1.0) / F.log(F.col("dz")), 8).cast(
                    "decimal(28,8)"
                )
            )
            .cast("decimal(28,8)")
            .alias("aa"),
        )
    )
    # degree lookups only for the 30 candidate nodes (broadcast-size by
    # construction), never the full node-sized degree table
    degc = cand.select("node", "deg")
    j = (
        sc.join(
            F.broadcast(
                degc.select(F.col("node").alias("u"), F.col("deg").alias("du"))
            ),
            "u",
        )
        .join(
            F.broadcast(
                degc.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
            ),
            "v",
        )
        .select(
            "u",
            "v",
            "common_neighbors",
            F.round(F.col("aa").cast("double"), 6).alias("aa_score"),
            F.round(
                F.col("common_neighbors")
                / (
                    F.col("du") + F.col("dv") - F.col("common_neighbors")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return j.orderBy(F.desc("aa_score"), "u", "v").limit(20)


_X360_ORACLE = (
    "WITH "
    + _SUPPORT2_CTE
    + """,
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
tn AS (
  SELECT x AS node, CAST(count(*) AS BIGINT) AS tri_cnt
  FROM (SELECT a AS x FROM tri UNION ALL SELECT b AS x FROM tri
        UNION ALL SELECT c AS x FROM tri) q
  GROUP BY 1
),
top AS (
  SELECT d.node, d.deg, COALESCE(t.tri_cnt, 0) AS triangles
  FROM deg d LEFT JOIN tn t ON d.node = t.node
  ORDER BY d.deg DESC, d.node LIMIT 20
)
SELECT node, deg AS degree, triangles,
       ROUND(CASE WHEN deg >= 2
                  THEN 2.0 * triangles / (deg * (deg - 1.0))
                  ELSE 0.0 END, 6) AS lcc
FROM top ORDER BY degree DESC, node"""
)


@register(
    "x360_clustering_coefficient",
    _X360_ORACLE,
    doc="local clustering coefficient for the top-20-degree parts of "
        "the support>=2 co-purchase graph: lcc = 2*triangles / "
        "(deg*(deg-1)) -- how CLIQUE-LIKE each hub's neighborhood is "
        "(x210 counts the corpus' triangles; this distributes them "
        "to nodes and normalizes by possible wedges, separating "
        "bridge hubs from community hubs). Exact BIGINT triangle "
        "counts via x210's id-orientation (each triangle credited "
        "once to each corner from the oriented list), one double "
        "division per node at the end. Scale: rides the shared "
        "checkpointed edge list; the triangle join is two edge-sized "
        "equi-joins; per-node counts one groupBy over 3x the "
        "triangle count -- never a neighborhood cross product",
)
def x360_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _support2_edges(spark, sf_dir)
    sym, deg = _sym_deg(e)
    e2 = e.select(F.col("u").alias("b2"), F.col("v").alias("c2"))
    e3 = e.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e.join(e2, e.v == e2.b2)
        .join(e3, (e.u == e3.a3) & (e2.c2 == e3.c3))
        .select(
            F.col("u").alias("a"),
            F.col("v").alias("b"),
            F.col("c2").alias("c"),
        )
    )
    tn = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("tri_cnt"))
    )
    top = (
        deg.join(tn, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("tri_cnt"), F.lit(0))
            .cast("long")
            .alias("triangles"),
        )
        .orderBy(F.desc("deg"), "node")
        .limit(20)
    )
    return top.select(
        "node",
        F.col("deg").alias("degree"),
        "triangles",
        F.round(
            F.when(
                F.col("deg") >= 2,
                2.0
                * F.col("triangles")
                / (F.col("deg") * (F.col("deg") - F.lit(1.0))),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("lcc"),
    ).orderBy(F.desc("degree"), "node")


_X361_ORACLE = (
    "WITH "
    + _SUPPORT2_CTE
    + """,
de AS (
  SELECT du.deg AS ju, dv.deg AS kv
  FROM sym s
  JOIN deg du ON s.u = du.node
  JOIN deg dv ON s.v = dv.node
),
mo AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(SUM(CAST(ju AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CAST(ju * ju AS DECIMAL(38,0))) AS DECIMAL(38,0))
           AS s2,
         CAST(SUM(CAST(ju * kv AS DECIMAL(38,0))) AS DECIMAL(38,0))
           AS s11
  FROM de
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
SELECT nn.n_nodes, CAST(mo.m / 2 AS BIGINT) AS n_edges,
       ROUND((mo.m * CAST(s11 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (mo.m * CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)), 6)
         AS assortativity
FROM mo CROSS JOIN nn"""
)


@register(
    "x361_degree_assortativity",
    _X361_ORACLE,
    doc="degree assortativity of the support>=2 co-purchase graph: "
        "Pearson correlation of endpoint degrees over the DIRECTED "
        "edge list (Newman's r; symmetric list makes source/target "
        "moments equal, so r = (M*S_jk - S_j^2)/(M*S_jj - S_j^2)) -- "
        "one number for 'do hubs link to hubs or to leaves', the "
        "structural complement of x351's attribute modularity and "
        "x108's key-skew Gini. All moments accumulate as exact "
        "DECIMAL(38,0) integer products; ONE double division at the "
        "end. Scale: two edge-sized equi-joins to attach endpoint "
        "degrees, then a 1-row aggregate -- node state never "
        "broadcasts, nothing quadratic",
)
def x361_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _support2_edges(spark, sf_dir)
    sym, deg = _sym_deg(e)
    de = (
        sym.join(
            deg.select(F.col("node").alias("u"), F.col("deg").alias("ju")),
            "u",
        )
        .join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("kv")),
            "v",
        )
        .select("ju", "kv")
    )
    d38 = "decimal(38,0)"
    mo = de.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.col("ju").cast(d38)).cast(d38).alias("s1"),
        F.sum((F.col("ju") * F.col("ju")).cast(d38)).cast(d38).alias("s2"),
        F.sum((F.col("ju") * F.col("kv")).cast(d38)).cast(d38).alias("s11"),
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    s1d = F.col("s1").cast("double")
    return (
        mo.crossJoin(F.broadcast(nn))
        .select(
            "n_nodes",
            (F.col("m") / 2).cast("long").alias("n_edges"),
            F.round(
                (F.col("m") * F.col("s11").cast("double") - s1d * s1d)
                / (F.col("m") * F.col("s2").cast("double") - s1d * s1d),
                6,
            ).alias("assortativity"),
        )
    )


_X362_ORACLE = """
WITH src AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS s
  FROM src
),
caps AS (
  SELECT source, n_tokens, 4 * n_tokens AS cap,
         CAST(row_number() OVER (ORDER BY 4 * n_tokens, source)
              AS BIGINT) AS r,
         CAST(SUM(4 * n_tokens) OVER (ORDER BY 4 * n_tokens, source)
              AS BIGINT) AS p
  FROM src
),
bound AS (
  SELECT c.r, 2 * t.total - (c.p - c.cap) AS num, t.s - c.r + 1
           AS denom
  FROM caps c CROSS JOIN tot t
  WHERE c.cap * (t.s - c.r + 1) > 2 * t.total - (c.p - c.cap)
  ORDER BY c.r LIMIT 1
),
alloc AS (
  SELECT c.source, c.n_tokens, c.cap,
         CASE WHEN b.r IS NULL OR c.r < b.r THEN CAST(c.cap AS DOUBLE)
              ELSE b.num / CAST(b.denom AS DOUBLE) END AS a,
         CASE WHEN b.r IS NULL OR c.r < b.r THEN 1 ELSE 0
           END AS capped
  FROM caps c LEFT JOIN bound b ON 1 = 1
)
SELECT source, n_tokens, cap AS cap_tokens,
       ROUND(a, 2) AS alloc_tokens,
       ROUND(a / n_tokens, 4) AS epochs,
       capped
FROM alloc ORDER BY source
"""


@register(
    "x362_unimax_allocation",
    _X362_ORACLE,
    doc="UniMax training-mixture allocation (Chung et al. 2023 "
        "pattern, public): distribute a token budget B = 2x the "
        "corpus across sources as uniformly as possible subject to a "
        "4-epoch repetition cap per source -- small sources cap out, "
        "the rest split the remainder evenly (water-filling), the "
        "principled alternative to ad-hoc mixture weights that "
        "over-repeats rare sources (x128 measures mix drift; this "
        "PRESCRIBES the mix). The waterline solves in CLOSED FORM: "
        "sort by capacity, one prefix sum, the boundary is the first "
        "rank where cap*(remaining) > budget-consumed -- an exact "
        "INTEGER inequality, no float comparisons, no iteration; "
        "tau emerges as an exact rational num/denom divided once in "
        "DOUBLE. Scale: one corpus pass to the source-cardinality "
        "aggregate; windows and the boundary probe run on <=10 rows",
)
def x362_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens")
    )
    tot = src.agg(
        F.sum("n_tokens").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("s"),
    )
    wr = Window.orderBy(F.col("cap"), F.col("source"))
    caps = src.withColumn("cap", 4 * F.col("n_tokens")).select(
        "source",
        "n_tokens",
        "cap",
        F.row_number().over(wr).cast("long").alias("r"),
        F.sum("cap")
        .over(wr.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("p"),
    )
    bound = (
        caps.crossJoin(F.broadcast(tot))
        .filter(
            F.col("cap") * (F.col("s") - F.col("r") + 1)
            > 2 * F.col("total") - (F.col("p") - F.col("cap"))
        )
        .select(
            F.col("r").alias("br"),
            (2 * F.col("total") - (F.col("p") - F.col("cap"))).alias("num"),
            (F.col("s") - F.col("r") + 1).alias("denom"),
        )
        .orderBy("br")
        .limit(1)
    )
    alloc = caps.join(F.broadcast(bound), F.lit(True), "left").select(
        "source",
        "n_tokens",
        "cap",
        F.when(
            F.col("br").isNull() | (F.col("r") < F.col("br")),
            F.col("cap").cast("double"),
        )
        .otherwise(F.col("num") / F.col("denom").cast("double"))
        .alias("a"),
        F.when(
            F.col("br").isNull() | (F.col("r") < F.col("br")), 1
        )
        .otherwise(0)
        .alias("capped"),
    )
    return alloc.select(
        "source",
        "n_tokens",
        F.col("cap").alias("cap_tokens"),
        F.round("a", 2).alias("alloc_tokens"),
        F.round(F.col("a") / F.col("n_tokens"), 4).alias("epochs"),
        "capped",
    ).orderBy("source")


_X363_ORACLE = """
WITH ov AS (
  SELECT CAST(FLOOR(o.o_totalprice / 100) AS BIGINT) AS v,
         c.c_mktsegment AS g
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
pv AS (
  SELECT v, CAST(count(*) AS BIGINT) AS n_v
  FROM ov GROUP BY 1
),
cumv AS (
  SELECT v, n_v,
         CAST(SUM(n_v) OVER (ORDER BY v) - n_v AS BIGINT) AS cb
  FROM pv
),
pvg AS (
  SELECT v, g, CAST(count(*) AS BIGINT) AS n_vg
  FROM ov GROUP BY 1, 2
),
rg AS (
  SELECT p.g,
         CAST(SUM(p.n_vg) AS BIGINT) AS n_g,
         CAST(SUM(p.n_vg * (2 * c.cb + c.n_v + 1)) AS BIGINT) AS r2g
  FROM pvg p JOIN cumv c USING (v)
  GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_v) AS BIGINT) AS n,
         CAST(SUM(n_v * n_v * n_v - n_v) AS BIGINT) AS ties
  FROM pv
),
hterm AS (
  SELECT g, n_g, r2g, t.n, t.ties,
         CAST(ROUND((r2g / 2.0) * (r2g / 2.0) / n_g, 6)
              AS DECIMAL(38,6)) AS rterm
  FROM rg CROSS JOIN tot t
),
h AS (
  SELECT MAX(n) AS n, MAX(ties) AS ties,
         CAST(count(*) AS BIGINT) AS k,
         ROUND(12.0 / (MAX(n) * (MAX(n) + 1.0))
               * CAST(SUM(rterm) AS DOUBLE)
               - 3.0 * (MAX(n) + 1), 6) AS h_raw
  FROM hterm
)
SELECT ht.g AS segment, ht.n_g,
       ROUND(ht.r2g / 2.0 / ht.n_g, 4) AS mean_rank,
       h.h_raw,
       ROUND(h.h_raw / (1.0 - h.ties
                        / (CAST(h.n AS DOUBLE) * h.n * h.n - h.n)),
             6) AS h_tie_corrected,
       h.k - 1 AS df
FROM hterm ht CROSS JOIN h
ORDER BY ht.g
"""


@register(
    "x363_kruskal_wallis",
    _X363_ORACLE,
    doc="Kruskal-Wallis H across the 5 market segments on $100-binned "
        "order totals: the nonparametric k-group location test "
        "completing the inference suite (x286 Welch t is 2-group "
        "parametric, x349 Mann-Whitney is 2-group ranks; this is "
        "k-group ranks) -- 'do segments differ in order-value "
        "DISTRIBUTION' without normality assumptions. Binning makes "
        "the value domain bounded AND is stated as part of the test "
        "(ranks of binned values, deterministic); midranks stay "
        "exact integers via x349's 2*midrank = 2*cum_before + n_v + "
        "1 identity, per-group rank sums are exact BIGINTs, the "
        "R_g^2/n_g terms round 6 into DECIMAL before the order-free "
        "sum, tie correction sum(t^3-t) exact. Scale: two "
        "corpus-pass groupBys (value domain, value x group); the "
        "cumulative window rides the <=5000-row bin aggregate (x340 "
        "contract); everything after is group-cardinality arithmetic",
)
def x363_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ov = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.floor(F.col("o_totalprice") / 100).cast("long").alias("v"),
        F.col("c_mktsegment").alias("g"),
    )
    pv = ov.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("n_v"))
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumv = pv.select(
        "v",
        "n_v",
        (F.sum("n_v").over(w) - F.col("n_v")).cast("long").alias("cb"),
    )
    pvg = ov.groupBy("v", "g").agg(
        F.count(F.lit(1)).cast("long").alias("n_vg")
    )
    rg = (
        pvg.join(cumv, "v")
        .groupBy("g")
        .agg(
            F.sum("n_vg").cast("long").alias("n_g"),
            F.sum(
                F.col("n_vg") * (2 * F.col("cb") + F.col("n_v") + 1)
            )
            .cast("long")
            .alias("r2g"),
        )
    )
    tot = pv.agg(
        F.sum("n_v").cast("long").alias("n"),
        F.sum(
            F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")
        )
        .cast("long")
        .alias("ties"),
    )
    hterm = rg.crossJoin(F.broadcast(tot)).select(
        "g",
        "n_g",
        "r2g",
        "n",
        "ties",
        F.round(
            (F.col("r2g") / 2.0) * (F.col("r2g") / 2.0) / F.col("n_g"),
            6,
        )
        .cast("decimal(38,6)")
        .alias("rterm"),
    )
    h = hterm.agg(
        F.max("n").alias("n"),
        F.max("ties").alias("ties"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.round(
            F.lit(12.0)
            / (F.max("n") * (F.max("n") + F.lit(1.0)))
            * F.sum("rterm").cast("double")
            - 3.0 * (F.max("n") + 1),
            6,
        ).alias("h_raw"),
    )
    return (
        hterm.select("g", "n_g", "r2g")
        .crossJoin(F.broadcast(h))
        .select(
            F.col("g").alias("segment"),
            "n_g",
            F.round(F.col("r2g") / 2.0 / F.col("n_g"), 4).alias(
                "mean_rank"
            ),
            "h_raw",
            F.round(
                F.col("h_raw")
                / (
                    F.lit(1.0)
                    - F.col("ties")
                    / (
                        F.col("n").cast("double")
                        * F.col("n")
                        * F.col("n")
                        - F.col("n")
                    )
                ),
                6,
            ).alias("h_tie_corrected"),
            (F.col("k") - 1).alias("df"),
        )
        .orderBy("segment")
    )


def _x364_oracle() -> str:
    head = """WITH ex AS MATERIALIZED (
  SELECT vec_id,
         CAST(unnest(range(0, len(embedding))) AS BIGINT) AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6)
              AS BIGINT) AS q
  FROM embeddings
),
sm AS MATERIALIZED (
  SELECT i, CAST(SUM(CAST(q AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS s
  FROM ex GROUP BY 1
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
pp AS MATERIALIZED (
  SELECT a.i AS ii, b.i AS jj,
         CAST(SUM(CAST(a.q AS DECIMAL(19,0))
                  * CAST(b.q AS DECIMAL(19,0))) AS DECIMAL(19,0))
           AS sqq
  FROM ex a JOIN ex b USING (vec_id)
  GROUP BY 1, 2
),
m AS MATERIALIZED (
  SELECT p.ii, p.jj,
         ROUND(CAST(CAST(t.n AS DECIMAL(19,0)) * p.sqq
                    - si.s * sj.s AS DOUBLE)
               / (t.n * (t.n - 1.0) * 1e12), 12) AS c
  FROM pp p
  JOIN sm si ON p.ii = si.i
  JOIN sm sj ON p.jj = sj.i
  CROSS JOIN nt t
),
v0 AS (SELECT i, CAST(0.125 AS DOUBLE) AS w FROM sm)"""
    steps = []
    prev = "v0"
    for it in (1, 2, 3):
        steps.append(f"""u{it} AS MATERIALIZED (
  SELECT m.ii AS i,
         CAST(SUM(CAST(ROUND(m.c * v.w, 12) AS DECIMAL(28,12)))
              AS DOUBLE) AS vu
  FROM m JOIN {prev} v ON m.jj = v.i
  GROUP BY 1
),
n{it} AS (
  SELECT sqrt(CAST(SUM(CAST(ROUND(vu * vu, 12) AS DECIMAL(28,12)))
              AS DOUBLE)) AS nrm
  FROM u{it}
),
v{it} AS MATERIALIZED (
  SELECT i, ROUND(vu / nrm, 12) AS w FROM u{it} CROSS JOIN n{it}
)""")
        prev = f"v{it}"
    tail = """tr AS (
  SELECT CAST(SUM(CAST(ROUND(c, 12) AS DECIMAL(28,12))) AS DOUBLE)
    AS trace
  FROM m WHERE ii = jj
)
SELECT v3.i AS dim, ROUND(v3.w, 6) AS loading,
       ROUND(n3.nrm, 6) AS top_eigenvalue,
       ROUND(n3.nrm / tr.trace, 6) AS explained_share
FROM v3 CROSS JOIN n3 CROSS JOIN tr
ORDER BY dim"""
    return head + ",\n" + ",\n".join(steps) + ",\n" + tail


@register(
    "x364_pca_power_iteration",
    _x364_oracle(),
    doc="FIXED-DEPTH (3-step) power-iteration sketch of the dominant "
        "principal direction of the embedding covariance -- the "
        "anisotropy audit of the embedding space: the Rayleigh "
        "readout (final iterate norm) is a LOWER bound on the top "
        "eigenvalue that converges at rate (l2/l1)^k, so "
        "explained_share near 1/d (as on this near-isotropic "
        "fixture, l2/l1=0.93 -- pytest-checked against numpy's full "
        "eigendecomposition) IS the diagnostic conclusion: no "
        "dominant direction, embedding dimensions carry balanced "
        "variance; on an anisotropic space (duplicated dims, "
        "collapsed encoder) the share spikes and the loadings name "
        "the direction. Depth is a parameter, fixed for oracle "
        "replay (x104's fixed-depth recipe): covariance "
        "entries from ONE corpus pass (per-doc coordinate pairs "
        "equi-joined on vec_id, micro-unit integer products "
        "DECIMAL-summed, scatter-matrix identity n*Sqq - Si*Sj kept "
        "exact to the single double division), then each iteration "
        "is a 4096x64 join + groupBy with round-12 DECIMAL "
        "contribution sums and an L2 renormalization -- x104's "
        "fixed-depth iterative recipe applied to a MATRIX instead "
        "of a graph. Top eigenvalue = final iterate norm (Rayleigh "
        "on the unit previous iterate), share = lambda/trace(C). "
        "Scale: corpus work is the coordinate explode (n*d rows) "
        "and the per-doc outer products (n*d^2 rows, one shuffle to "
        "d^2 cells); iterations touch only d^2-sized state -- "
        "independent of corpus size",
)
def x364_pca_power_iteration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1e6).cast("long"),
            )
        ).alias("i", "q"),
    ).localCheckpoint(eager=False)
    d19 = "decimal(19,0)"
    sm = ex.groupBy("i").agg(
        F.sum(F.col("q").cast(d19)).cast(d19).alias("s")
    )
    nt = emb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = ex.select("vec_id", F.col("i").alias("ii"), F.col("q").alias("qa"))
    b = ex.select("vec_id", F.col("i").alias("jj"), F.col("q").alias("qb"))
    pp = (
        a.join(b, "vec_id")
        .groupBy("ii", "jj")
        .agg(
            F.sum(F.col("qa").cast(d19) * F.col("qb").cast(d19))
            .cast(d19)
            .alias("sqq")
        )
    )
    m = (
        pp.join(
            F.broadcast(
                sm.select(F.col("i").alias("ii"), F.col("s").alias("si"))
            ),
            "ii",
        )
        .join(
            F.broadcast(
                sm.select(F.col("i").alias("jj"), F.col("s").alias("sj"))
            ),
            "jj",
        )
        .crossJoin(F.broadcast(nt))
        .select(
            "ii",
            "jj",
            F.round(
                (
                    F.col("n").cast(d19) * F.col("sqq")
                    - F.col("si") * F.col("sj")
                ).cast("double")
                / (F.col("n") * (F.col("n") - F.lit(1.0)) * F.lit(1e12)),
                12,
            ).alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    v = sm.select("i", F.lit(0.125).cast("double").alias("w"))
    nrm = None
    for _ in range(3):
        u = (
            m.join(F.broadcast(v), m.jj == v.i)
            .groupBy(F.col("ii").alias("i"))
            .agg(
                F.sum(
                    F.round(F.col("c") * F.col("w"), 12).cast(
                        "decimal(28,12)"
                    )
                )
                .cast("double")
                .alias("vu")
            )
        )
        nrm = u.agg(
            F.sqrt(
                F.sum(
                    F.round(F.col("vu") * F.col("vu"), 12).cast(
                        "decimal(28,12)"
                    )
                ).cast("double")
            ).alias("nrm")
        )
        v = u.crossJoin(F.broadcast(nrm)).select(
            "i", F.round(F.col("vu") / F.col("nrm"), 12).alias("w")
        )
    tr = m.filter(F.col("ii") == F.col("jj")).agg(
        F.sum(F.round("c", 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("trace")
    )
    return (
        v.crossJoin(F.broadcast(nrm))
        .crossJoin(F.broadcast(tr))
        .select(
            F.col("i").alias("dim"),
            F.round("w", 6).alias("loading"),
            F.round("nrm", 6).alias("top_eigenvalue"),
            F.round(F.col("nrm") / F.col("trace"), 6).alias(
                "explained_share"
            ),
        )
        .orderBy("dim")
    )


_X365_ORACLE = """
WITH scored AS (
  SELECT source,
         CAST(FLOOR(ROUND(CAST(len(list_filter(
                string_split(lower(text), ' '),
                t -> t IN (%s))) AS DOUBLE)
              / len(string_split(lower(text), ' ')), 4)
              * 10000 + 0.5) AS BIGINT) AS p_s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
per AS (
  SELECT p_s, CAST(count(*) AS BIGINT) AS n_s,
         CAST(SUM(pos) AS BIGINT) AS pos_s
  FROM scored GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(pos_s) AS BIGINT) AS n_pos FROM per
),
cum AS (
  SELECT p_s,
         CAST(SUM(pos_s) OVER (ORDER BY p_s DESC) AS BIGINT) AS tp,
         CAST(SUM(n_s) OVER (ORDER BY p_s DESC) AS BIGINT) AS pred_pos
  FROM per
),
thr AS (
  SELECT c.p_s AS t
  FROM cum c CROSS JOIN tot
  QUALIFY row_number() OVER (
    ORDER BY ROUND(2.0 * c.tp / (c.pred_pos + tot.n_pos), 8) DESC,
             c.p_s) = 1
),
grp AS (
  SELECT s.source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN s.p_s >= t.t THEN 1 ELSE 0 END)
           AS BIGINT) AS sel,
         CAST(SUM(s.pos) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN s.p_s >= t.t THEN s.pos ELSE 0 END)
           AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN s.p_s >= t.t AND s.pos = 0 THEN 1
                  ELSE 0 END) AS BIGINT) AS fp
  FROM scored s CROSS JOIN thr t
  GROUP BY 1
),
mx AS (
  SELECT MAX(ROUND(sel / CAST(n AS DOUBLE), 6)) AS max_rate FROM grp
)
SELECT g.source, g.n, g.sel,
       ROUND(g.sel / CAST(g.n AS DOUBLE), 6) AS selection_rate,
       ROUND(ROUND(g.sel / CAST(g.n AS DOUBLE), 6) / m.max_rate, 6)
         AS disparate_impact,
       ROUND(g.tp / CAST(g.n_pos AS DOUBLE), 6) AS tpr,
       ROUND(g.fp / CAST(g.n - g.n_pos AS DOUBLE), 6) AS fpr
FROM grp g CROSS JOIN mx m
ORDER BY g.source
""" % (_STOP_EN,)


@register(
    "x365_fairness_audit",
    _X365_ORACLE,
    doc="group-fairness audit of x315's scorer at x350's best-F1 "
        "operating point: per SOURCE, selection rate (demographic "
        "parity), disparate-impact ratio vs the most-selected group "
        "(the four-fifths-rule number), TPR and FPR (equalized "
        "odds) -- the bias readout every production quality filter "
        "needs BEFORE it gates a corpus (a filter whose selection "
        "rate collapses for one source silently rewrites the "
        "training mix x128/x362 manage). The threshold derives "
        "in-query from the same suffix-cumulative sweep as x350 "
        "(deterministic tie-break), so the audit is self-contained. "
        "Exact BIGINT confusion counts per group; divisions at "
        "output only. Scale: one corpus pass to the score-domain "
        "aggregate for the threshold + one pass to the "
        "source-cardinality confusion aggregate; the threshold "
        "rides a broadcast 1-row frame",
)
def x365_fairness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    p_s = F.floor(
        text.stop_ratio_column("text") * 10000 + F.lit(0.5)
    ).cast("long")
    scored = docs.select(
        "source",
        p_s.alias("p_s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    ).localCheckpoint(eager=False)
    per = scored.groupBy("p_s").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum("pos").cast("long").alias("pos_s"),
    )
    tot = per.agg(F.sum("pos_s").cast("long").alias("n_pos"))
    wd = Window.orderBy(F.desc("p_s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "p_s",
        F.sum("pos_s").over(wd).cast("long").alias("tp"),
        F.sum("n_s").over(wd).cast("long").alias("pred_pos"),
    )
    wf = Window.orderBy(
        F.desc(
            F.round(
                2.0 * F.col("tp") / (F.col("pred_pos") + F.col("n_pos")),
                8,
            )
        ),
        "p_s",
    )
    thr = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select(F.col("p_s").alias("t"))
    )
    sel = F.when(F.col("p_s") >= F.col("t"), 1).otherwise(0)
    grp = (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(sel).cast("long").alias("sel"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum(F.when(F.col("p_s") >= F.col("t"), F.col("pos")).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when(
                    (F.col("p_s") >= F.col("t")) & (F.col("pos") == 0), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("fp"),
        )
    )
    rate = F.round(F.col("sel") / F.col("n").cast("double"), 6)
    mx = grp.agg(F.max(rate).alias("max_rate"))
    return (
        grp.crossJoin(F.broadcast(mx))
        .select(
            "source",
            "n",
            "sel",
            rate.alias("selection_rate"),
            F.round(rate / F.col("max_rate"), 6).alias("disparate_impact"),
            F.round(F.col("tp") / F.col("n_pos").cast("double"), 6).alias(
                "tpr"
            ),
            F.round(
                F.col("fp") / (F.col("n") - F.col("n_pos")).cast("double"),
                6,
            ).alias("fpr"),
        )
        .orderBy("source")
    )


_X366_ORACLE = """
WITH p AS (
  SELECT event_id AS pid, user_id, CAST(epoch_us(ts) AS BIGINT) AS pus
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT event_id AS tid, user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS tus
  FROM events WHERE event_type IN ('view', 'click')
),
tc AS (
  SELECT p.pid, t.tid, t.event_type, t.tus
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.tus <= p.pus AND t.tus > p.pus - 86400000000
),
k AS (
  SELECT pid, CAST(count(*) AS BIGINT) AS k FROM tc GROUP BY 1
),
fl AS (
  SELECT pid,
         MIN(ROW(tus, tid)) AS first_t,
         MAX(ROW(tus, tid)) AS last_t
  FROM tc GROUP BY 1
),
credit AS (
  SELECT 'linear' AS model, tc.event_type,
         CAST(ROUND(1.0 / k.k, 8) AS DECIMAL(28,8)) AS c
  FROM tc JOIN k USING (pid)
  UNION ALL
  SELECT 'first_touch', tc.event_type, CAST(1 AS DECIMAL(28,8))
  FROM tc JOIN fl USING (pid)
  WHERE ROW(tc.tus, tc.tid) = fl.first_t
  UNION ALL
  SELECT 'last_touch', tc.event_type, CAST(1 AS DECIMAL(28,8))
  FROM tc JOIN fl USING (pid)
  WHERE ROW(tc.tus, tc.tid) = fl.last_t
)
SELECT model, event_type AS touch_type,
       CAST(count(*) AS BIGINT) AS n_touches,
       ROUND(CAST(SUM(c) AS DOUBLE), 4) AS credit
FROM credit GROUP BY 1, 2 ORDER BY model, touch_type
"""


@register(
    "x366_multitouch_attribution",
    _X366_ORACLE,
    doc="batch multi-touch conversion attribution: every purchase "
        "credits its same-user view/click touches from the trailing "
        "24 h under three industry models side by side -- linear "
        "(1/k to each touch), first-touch, last-touch -- rolled up "
        "by touch type: the marketing-analytics readout x103's "
        "stream join feeds (x103 proves the STREAM leg of "
        "view->purchase matching; this is the batch CREDIT "
        "assignment over all touch types and models at once). "
        "Determinism: linear credits round 8 into DECIMAL before "
        "the order-free sum; first/last picked by (ts, event_id) "
        "struct min/max so timestamp ties break on the id. Scale: "
        "ONE user-key interval join (touches partition by user, "
        "intervals bound state -- x103's shape), per-purchase k and "
        "first/last from one groupBy over the match table; no "
        "window over the corpus",
)
def x366_multitouch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("timestampdiff(MICROSECOND, timestamp '1970-01-01', ts)")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        us.alias("pus"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("t_user"),
        "event_type",
        us.alias("tus"),
    )
    tc = p.join(
        t,
        (p.user_id == t.t_user)
        & (F.col("tus") <= F.col("pus"))
        & (F.col("tus") > F.col("pus") - F.lit(86400000000)),
    ).select("pid", "tid", "event_type", "tus").localCheckpoint(
        eager=False
    )
    k = tc.groupBy("pid").agg(F.count(F.lit(1)).cast("long").alias("k"))
    fl = tc.groupBy("pid").agg(
        F.min(F.struct("tus", "tid")).alias("first_t"),
        F.max(F.struct("tus", "tid")).alias("last_t"),
    )
    lin = tc.join(k, "pid").select(
        F.lit("linear").alias("model"),
        "event_type",
        F.round(F.lit(1.0) / F.col("k"), 8)
        .cast("decimal(28,8)")
        .alias("c"),
    )
    ft = tc.join(fl, "pid").filter(
        F.struct("tus", "tid") == F.col("first_t")
    ).select(
        F.lit("first_touch").alias("model"),
        "event_type",
        F.lit(1).cast("decimal(28,8)").alias("c"),
    )
    lt = tc.join(fl, "pid").filter(
        F.struct("tus", "tid") == F.col("last_t")
    ).select(
        F.lit("last_touch").alias("model"),
        "event_type",
        F.lit(1).cast("decimal(28,8)").alias("c"),
    )
    return (
        lin.union(ft)
        .union(lt)
        .groupBy("model", F.col("event_type").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.round(F.sum("c").cast("double"), 4).alias("credit"),
        )
        .orderBy("model", "touch_type")
    )


_X367_ORACLE = """
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
         CAST(SUM(CASE WHEN o_orderdate IS NULL
                    OR o_orderdate < TIMESTAMP '1990-01-01'
                    OR o_orderdate >= TIMESTAMP '2006-01-01'
                  THEN 1 ELSE 0 END) AS BIGINT) AS v_date,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                    OR o_orderstatus IS NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS v_nullkey,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
           AS v_unique
  FROM orders
),
ref AS (
  SELECT CAST(count(*) AS BIGINT) AS v_ref
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
),
rules AS (
  SELECT 'custkey_not_null' AS rule, n, v_nullkey AS violations
    FROM base
  UNION ALL
  SELECT 'custkey_refs_customer', b.n, r.v_ref FROM base b, ref r
  UNION ALL
  SELECT 'orderdate_in_range', n, v_date FROM base
  UNION ALL
  SELECT 'orderkey_unique', n, v_unique FROM base
  UNION ALL
  SELECT 'status_accepted_values', n, v_status FROM base
  UNION ALL
  SELECT 'totalprice_positive', n, v_price FROM base
)
SELECT rule, n AS n_checked, violations,
       CASE WHEN violations = 0 THEN 1 ELSE 0 END AS pass
FROM rules ORDER BY rule
"""


@register(
    "x367_expectation_suite",
    _X367_ORACLE,
    doc="data-contract expectation suite over the orders feed (the "
        "Great-Expectations/dbt-test primitive as ONE query): range "
        "(totalprice > 0), domain (orderdate in the business "
        "window), accepted-values (status in O/F/P), not-null key, "
        "key UNIQUENESS (count minus distinct), and REFERENTIAL "
        "integrity to customer (anti-join count) -- each a named "
        "rule row with checked/violation counts and a pass flag, "
        "the machine-readable gate an ingestion pipeline evaluates "
        "before publishing a partition (the reference publishes "
        "blind; x54's quality rules score DOCUMENTS, this contracts "
        "the FEED). Scale: five of six rules fold into ONE "
        "conditional-aggregate corpus pass (x237's FILTER shape); "
        "uniqueness adds a distinct-count to the same pass; only "
        "referential integrity pays a join, and it is the "
        "key-distribution-friendly LEFT anti pattern",
)
def x367_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    base = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull()
                | (F.col("o_totalprice") <= 0),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("v_price"),
        F.sum(
            F.when(
                F.col("o_orderdate").isNull()
                | (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("2006-01-01").cast("timestamp")
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("v_date"),
        F.sum(
            F.when(
                ~F.col("o_orderstatus").isin("O", "F", "P")
                | F.col("o_orderstatus").isNull(),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("v_status"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("v_nullkey"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("v_unique"),
    )
    ref = (
        orders.join(
            cust.select("c_custkey"),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v_ref"))
    )
    b = base.crossJoin(F.broadcast(ref))

    def rule(name: str, col: str) -> DataFrame:
        return b.select(
            F.lit(name).alias("rule"),
            F.col("n").alias("n_checked"),
            F.col(col).alias("violations"),
        )

    rules = (
        rule("custkey_not_null", "v_nullkey")
        .union(rule("custkey_refs_customer", "v_ref"))
        .union(rule("orderdate_in_range", "v_date"))
        .union(rule("orderkey_unique", "v_unique"))
        .union(rule("status_accepted_values", "v_status"))
        .union(rule("totalprice_positive", "v_price"))
    )
    return rules.select(
        "rule",
        "n_checked",
        "violations",
        F.when(F.col("violations") == 0, 1).otherwise(0).alias("pass"),
    ).orderBy("rule")


_X368_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
              // 3600000000 AS BIGINT) AS lt,
         CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
  FROM events GROUP BY 1
),
mx AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS max_us FROM events),
lab AS (
  SELECT lt,
         CASE WHEN mx.max_us - last_us > 86400000000
              THEN 1 ELSE 0 END AS observed
  FROM u, mx
),
d AS (
  SELECT lt, CAST(SUM(observed) AS BIGINT) AS deaths,
         CAST(count(*) AS BIGINT) AS ending
  FROM lab GROUP BY lt
),
r AS (
  SELECT lt, deaths,
         CAST(SUM(ending) OVER (ORDER BY lt DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS at_risk
  FROM d
),
na AS (
  SELECT lt, deaths, at_risk,
         SUM(CAST(ROUND(CAST(deaths AS DOUBLE) / at_risk, 12)
             AS DECIMAL(28,12)))
           OVER (ORDER BY lt
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS h,
         SUM(CAST(ROUND(CAST(deaths AS DOUBLE)
                        / (CAST(at_risk AS DOUBLE) * at_risk), 12)
             AS DECIMAL(28,12)))
           OVER (ORDER BY lt
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS hv
  FROM r WHERE deaths > 0
)
SELECT lt AS lt_hours, at_risk, deaths,
       ROUND(CAST(h AS DOUBLE), 6) AS cum_hazard,
       ROUND(CAST(hv AS DOUBLE), 8) AS hazard_var,
       ROUND(exp(-CAST(h AS DOUBLE)), 4) AS survival_fh
FROM na ORDER BY lt_hours
"""


@register(
    "x368_nelson_aalen",
    _X368_ORACLE,
    doc="Nelson-Aalen cumulative hazard over x305's censored "
        "engagement lifetimes: H(t) = sum d_i/n_i with the Poisson "
        "variance sum d_i/n_i^2 and the Fleming-Harrington survival "
        "exp(-H) -- the hazard-scale twin of Kaplan-Meier (KM "
        "multiplies survival factors, NA sums hazard increments; FH "
        "is the small-sample-stabler curve, and H(t) itself is the "
        "input to hazard-ratio eyeballing). Same censoring rule, "
        "exact integer-microsecond lifetimes, same descending "
        "at-risk window; per-step d/n terms round 12 into "
        "DECIMAL(28,12) cumulative sums (x305's recipe), exp last. "
        "Scale: one user groupBy + windows over the "
        "lifetime-cardinality aggregate (x81 contract)",
)
def x368_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.min("ts").alias("first_ts"),
    ).select(
        F.expr(
            "CAST(timestampdiff(MICROSECOND, first_ts, last_ts) "
            "DIV 3600000000 AS BIGINT)"
        ).alias("lt"),
        "last_ts",
    )
    mx = ev.agg(F.max("ts").alias("max_ts"))
    lab = u.crossJoin(F.broadcast(mx)).select(
        "lt",
        F.when(
            F.expr("timestampdiff(MICROSECOND, last_ts, max_ts)")
            > F.lit(86400000000),
            1,
        )
        .otherwise(0)
        .alias("observed"),
    )
    d = lab.groupBy("lt").agg(
        F.sum("observed").cast("long").alias("deaths"),
        F.count(F.lit(1)).cast("long").alias("ending"),
    )
    wdesc = Window.orderBy(F.desc("lt")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = d.select(
        "lt",
        "deaths",
        F.sum("ending").over(wdesc).cast("long").alias("at_risk"),
    )
    wasc = Window.orderBy("lt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    na = r.filter(F.col("deaths") > 0).select(
        "lt",
        "deaths",
        "at_risk",
        F.sum(
            F.round(
                F.col("deaths").cast("double") / F.col("at_risk"), 12
            ).cast("decimal(28,12)")
        )
        .over(wasc)
        .alias("h"),
        F.sum(
            F.round(
                F.col("deaths").cast("double")
                / (F.col("at_risk").cast("double") * F.col("at_risk")),
                12,
            ).cast("decimal(28,12)")
        )
        .over(wasc)
        .alias("hv"),
    )
    return na.select(
        F.col("lt").alias("lt_hours"),
        "at_risk",
        "deaths",
        F.round(F.col("h").cast("double"), 6).alias("cum_hazard"),
        F.round(F.col("hv").cast("double"), 8).alias("hazard_var"),
        F.round(F.exp(-F.col("h").cast("double")), 4).alias(
            "survival_fh"
        ),
    ).orderBy("lt_hours")


def _x369_oracle() -> str:
    head = """WITH cells AS MATERIALIZED (
  SELECT n.n_name AS r, c.c_mktsegment AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
dims AS (
  SELECT CAST((SELECT count(DISTINCT r) FROM cells) AS BIGINT) AS nr,
         CAST((SELECT count(DISTINCT s) FROM cells) AS BIGINT) AS ns,
         CAST((SELECT SUM(n) FROM cells) AS BIGINT) AS tot
),
w0 AS (SELECT r, s, n, CAST(1.0 AS DOUBLE) AS w FROM cells)"""
    steps = []
    prev = "w0"
    for it in (1, 2):
        steps.append(f"""rm{it} AS MATERIALIZED (
  SELECT r,
         CAST(SUM(CAST(ROUND(n * w, 12) AS DECIMAL(28,12)))
              AS DOUBLE) AS rowsum
  FROM {prev} GROUP BY 1
),
wr{it} AS MATERIALIZED (
  SELECT p.r, p.s, p.n,
         ROUND(p.w * (d.tot / CAST(d.nr AS DOUBLE)) / m.rowsum, 12)
           AS w
  FROM {prev} p JOIN rm{it} m USING (r) CROSS JOIN dims d
),
cm{it} AS MATERIALIZED (
  SELECT s,
         CAST(SUM(CAST(ROUND(n * w, 12) AS DECIMAL(28,12)))
              AS DOUBLE) AS colsum
  FROM wr{it} GROUP BY 1
),
w{it} AS MATERIALIZED (
  SELECT p.r, p.s, p.n,
         ROUND(p.w * (d.tot / CAST(d.ns AS DOUBLE)) / m.colsum, 12)
           AS w
  FROM wr{it} p JOIN cm{it} m USING (s) CROSS JOIN dims d
)""")
        prev = f"w{it}"
    tail = """err AS (
  SELECT CAST(MAX(ABS(rowdev)) AS DOUBLE) AS max_row_dev FROM (
    SELECT r,
           CAST(SUM(CAST(ROUND(n * w, 12) AS DECIMAL(28,12)))
                AS DOUBLE)
           / MAX(d.tot / CAST(d.nr AS DOUBLE)) - 1.0 AS rowdev
    FROM w2 CROSS JOIN dims d GROUP BY r
  ) q
)
SELECT w2.r AS nation, w2.s AS segment, w2.n,
       ROUND(w2.w, 6) AS weight,
       ROUND(CAST(ROUND(w2.n * w2.w, 12) AS DOUBLE), 4)
         AS weighted_n,
       ROUND(e.max_row_dev, 6) AS max_row_dev
FROM w2 CROSS JOIN err e
ORDER BY nation, segment"""
    return head + ",\n" + ",\n".join(steps) + ",\n" + tail


@register(
    "x369_ipf_raking",
    _x369_oracle(),
    doc="iterative proportional fitting (raking) of the nation x "
        "segment customer contingency toward UNIFORM row and column "
        "margins, 2 fixed rounds -- the survey-weighting / "
        "dataset-reweighting primitive (make a skewed corpus match "
        "target marginals by CELL WEIGHTS instead of resampling; "
        "x348 resamples rows, this reweights strata -- the two "
        "standard distribution-matching levers). Each round is one "
        "margin groupBy + one rescale join per axis over the "
        "cell-cardinality table (x104's fixed-depth recipe on a "
        "CONTINGENCY table); weighted masses round 12 into DECIMAL "
        "before every margin sum, weights re-round 12 per rescale "
        "so both engines iterate on identical state; the residual "
        "row-margin deviation after the final COLUMN fit is "
        "reported (the convergence diagnostic). Scale: the corpus "
        "collapses to nation x segment cells in ONE pass; "
        "everything after is 125-row arithmetic",
)
def x369_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    cells = (
        cust.join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("r"), F.col("c_mktsegment").alias("s"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    dims = cells.agg(
        F.countDistinct("r").cast("long").alias("nr"),
        F.countDistinct("s").cast("long").alias("ns"),
        F.sum("n").cast("long").alias("tot"),
    )
    w = cells.withColumn("w", F.lit(1.0).cast("double"))
    mass = lambda: F.sum(
        F.round(F.col("n") * F.col("w"), 12).cast("decimal(28,12)")
    ).cast("double")
    for _ in range(2):
        rm = w.groupBy("r").agg(mass().alias("rowsum"))
        w = (
            w.join(F.broadcast(rm), "r")
            .crossJoin(F.broadcast(dims))
            .select(
                "r",
                "s",
                "n",
                F.round(
                    F.col("w")
                    * (F.col("tot") / F.col("nr").cast("double"))
                    / F.col("rowsum"),
                    12,
                ).alias("w"),
            )
        )
        cm = w.groupBy("s").agg(mass().alias("colsum"))
        w = (
            w.join(F.broadcast(cm), "s")
            .crossJoin(F.broadcast(dims))
            .select(
                "r",
                "s",
                "n",
                F.round(
                    F.col("w")
                    * (F.col("tot") / F.col("ns").cast("double"))
                    / F.col("colsum"),
                    12,
                ).alias("w"),
            )
        )
    err = (
        w.crossJoin(F.broadcast(dims))
        .groupBy("r")
        .agg(
            (
                mass()
                / F.max(F.col("tot") / F.col("nr").cast("double"))
                - F.lit(1.0)
            ).alias("rowdev")
        )
        .agg(F.max(F.abs(F.col("rowdev"))).alias("max_row_dev"))
    )
    return (
        w.crossJoin(F.broadcast(err))
        .select(
            F.col("r").alias("nation"),
            F.col("s").alias("segment"),
            "n",
            F.round("w", 6).alias("weight"),
            F.round(
                F.round(F.col("n") * F.col("w"), 12).cast("double"), 4
            ).alias("weighted_n"),
            F.round("max_row_dev", 6).alias("max_row_dev"),
        )
        .orderBy("nation", "segment")
    )


_X370_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
              // 3600000000 AS BIGINT) AS lt,
         CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':ab'),
                          1, 4) < '8000'
              THEN 1 ELSE 0 END AS g
  FROM events GROUP BY 1
),
mx AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS max_us FROM events),
lab AS (
  SELECT lt, g,
         CASE WHEN mx.max_us - last_us > 86400000000
              THEN 1 ELSE 0 END AS observed
  FROM u, mx
),
d AS (
  SELECT lt, g, CAST(SUM(observed) AS BIGINT) AS deaths,
         CAST(count(*) AS BIGINT) AS ending
  FROM lab GROUP BY 1, 2
),
lts AS (SELECT DISTINCT lt FROM d),
grid AS (
  SELECT lts.lt, gg.g
  FROM lts CROSS JOIN (SELECT 0 AS g UNION ALL SELECT 1) gg
),
f AS (
  SELECT grid.lt, grid.g,
         COALESCE(d.deaths, 0) AS deaths,
         COALESCE(d.ending, 0) AS ending
  FROM grid LEFT JOIN d USING (lt, g)
),
r AS (
  SELECT lt, g, deaths,
         CAST(SUM(ending) OVER (PARTITION BY g ORDER BY lt DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS at_risk
  FROM f
),
t AS (
  SELECT lt,
         CAST(SUM(deaths) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN g = 1 THEN deaths ELSE 0 END)
           AS BIGINT) AS d1,
         CAST(SUM(at_risk) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN g = 1 THEN at_risk ELSE 0 END)
           AS BIGINT) AS n1
  FROM r GROUP BY 1
),
agg AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
         CAST(SUM(d - d1) AS BIGINT) AS o0,
         CAST(SUM(CAST(ROUND(d * (n1 / CAST(n AS DOUBLE)), 12)
                  AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS e1,
         CAST(SUM(CASE WHEN n > 1 THEN
                  CAST(ROUND(d * (n1 / CAST(n AS DOUBLE))
                             * (1.0 - n1 / CAST(n AS DOUBLE))
                             * (n - d) / (n - 1.0), 12)
                  AS DECIMAL(28,12)) END) AS DECIMAL(28,12)) AS v
  FROM t WHERE d > 0
)
SELECT o1, o0,
       ROUND(CAST(e1 AS DOUBLE), 4) AS e1,
       ROUND(CAST(o1 + o0 - e1 AS DOUBLE), 4) AS e0,
       ROUND((o1 - CAST(e1 AS DOUBLE)) * (o1 - CAST(e1 AS DOUBLE))
             / CAST(v AS DOUBLE), 4) AS chi2,
       1 AS df
FROM agg
"""


@register(
    "x370_logrank_test",
    _X370_ORACLE,
    doc="log-rank test comparing engagement-lifetime survival between "
        "x303's treatment arms (same censoring rule as x305/x368): "
        "at every pooled event time, observed group-1 deaths vs the "
        "hypergeometric expectation d*n1/n and variance "
        "d*(n1/n)(1-n1/n)(n-d)/(n-1); chi2 = (O1-E1)^2/V with df=1 "
        "-- THE standard two-curve comparison (KM draws the curves, "
        "this tests them; completes the survival suite and welds it "
        "to the experiment suite: 'did treatment change churn "
        "TIMING', which mean-based uplift x303 can't see). Exact "
        "machinery: per-group at-risk from one PARTITIONed "
        "descending window over the (lifetime x group) grid "
        "(zero-filled so cumulative counts stay aligned), O/E/V "
        "terms round 12 into DECIMAL sums, two divisions at output. "
        "Scale: one user groupBy; windows and the grid ride the "
        "lifetime-cardinality aggregate (x81 contract)",
)
def x370_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    g = F.when(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))),
            1,
            4,
        )
        < "8000",
        1,
    ).otherwise(0)
    u = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.min("ts").alias("first_ts"),
    ).select(
        F.expr(
            "CAST(timestampdiff(MICROSECOND, first_ts, last_ts) "
            "DIV 3600000000 AS BIGINT)"
        ).alias("lt"),
        "last_ts",
        g.alias("g"),
    )
    mx = ev.agg(F.max("ts").alias("max_ts"))
    lab = u.crossJoin(F.broadcast(mx)).select(
        "lt",
        "g",
        F.when(
            F.expr("timestampdiff(MICROSECOND, last_ts, max_ts)")
            > F.lit(86400000000),
            1,
        )
        .otherwise(0)
        .alias("observed"),
    )
    d = lab.groupBy("lt", "g").agg(
        F.sum("observed").cast("long").alias("deaths"),
        F.count(F.lit(1)).cast("long").alias("ending"),
    )
    lts = d.select("lt").distinct()
    gg = lts.sparkSession.range(0, 2).select(
        F.col("id").cast("int").alias("g")
    )
    grid = lts.crossJoin(F.broadcast(gg))
    f = grid.join(d, ["lt", "g"], "left").select(
        "lt",
        "g",
        F.coalesce(F.col("deaths"), F.lit(0)).cast("long").alias("deaths"),
        F.coalesce(F.col("ending"), F.lit(0)).cast("long").alias("ending"),
    )
    wdesc = (
        Window.partitionBy("g")
        .orderBy(F.desc("lt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = f.select(
        "lt",
        "g",
        "deaths",
        F.sum("ending").over(wdesc).cast("long").alias("at_risk"),
    )
    t = r.groupBy("lt").agg(
        F.sum("deaths").cast("long").alias("d"),
        F.sum(F.when(F.col("g") == 1, F.col("deaths")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum("at_risk").cast("long").alias("n"),
        F.sum(F.when(F.col("g") == 1, F.col("at_risk")).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    frac = F.col("n1") / F.col("n").cast("double")
    agg = t.filter(F.col("d") > 0).agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum(F.col("d") - F.col("d1")).cast("long").alias("o0"),
        F.sum(
            F.round(F.col("d") * frac, 12).cast("decimal(28,12)")
        )
        .cast("decimal(28,12)")
        .alias("e1"),
        F.sum(
            F.when(
                F.col("n") > 1,
                F.round(
                    F.col("d")
                    * frac
                    * (F.lit(1.0) - frac)
                    * (F.col("n") - F.col("d"))
                    / (F.col("n") - F.lit(1.0)),
                    12,
                ).cast("decimal(28,12)"),
            )
        )
        .cast("decimal(28,12)")
        .alias("v"),
    )
    e1d = F.col("e1").cast("double")
    return agg.select(
        "o1",
        "o0",
        F.round(e1d, 4).alias("e1"),
        F.round((F.col("o1") + F.col("o0")).cast("double") - e1d, 4).alias(
            "e0"
        ),
        F.round(
            (F.col("o1") - e1d)
            * (F.col("o1") - e1d)
            / F.col("v").cast("double"),
            4,
        ).alias("chi2"),
        F.lit(1).alias("df"),
    )


_X371_ORACLE = """
WITH scored AS (
  SELECT CAST(FLOOR(ROUND(CAST(len(list_filter(
                string_split(lower(text), ' '),
                t -> t IN (%s))) AS DOUBLE)
              / len(string_split(lower(text), ' ')), 4)
              * 10000 + 0.5) AS BIGINT) AS p_s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
per AS (
  SELECT p_s, CAST(count(*) AS BIGINT) AS n_s,
         CAST(SUM(pos) AS BIGINT) AS pos_s
  FROM scored GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(pos_s) AS BIGINT) AS n_pos,
         CAST(SUM(n_s - pos_s) AS BIGINT) AS n_neg
  FROM per
),
cum AS (
  SELECT p_s, pos_s,
         CAST(SUM(pos_s) OVER (ORDER BY p_s DESC) AS BIGINT) AS tp,
         CAST(SUM(n_s) OVER (ORDER BY p_s DESC) AS BIGINT) AS pred
  FROM per
),
ap AS (
  SELECT CAST(SUM(CAST(ROUND(
           (c.pos_s / CAST(t.n_pos AS DOUBLE))
           * (c.tp / CAST(c.pred AS DOUBLE)), 10)
           AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS ap
  FROM cum c CROSS JOIN tot t WHERE c.pos_s > 0
)
SELECT t.n_pos, t.n_neg,
       ROUND(CAST(a.ap AS DOUBLE), 6) AS average_precision,
       ROUND(t.n_pos / CAST(t.n_pos + t.n_neg AS DOUBLE), 6)
         AS prevalence
FROM ap a CROSS JOIN tot t
""" % _STOP_EN


@register(
    "x371_average_precision",
    _X371_ORACLE,
    doc="average precision (area under the precision-recall curve, "
        "step form: AP = sum_k dR_k * P_k, sklearn's "
        "interpolation-free definition) for x315's scorer -- the "
        "imbalance-honest companion to x349's ROC AUC (ROC flatters "
        "a scorer when negatives dominate; AP compares against the "
        "prevalence baseline -- the random scorer's expectation, "
        "reported alongside; an anti-correlated scorer lands BELOW "
        "it, as this fixture's does). Rides the SAME "
        "suffix-cumulative score-domain machinery as x350: each "
        "distinct score contributes recall-gain x precision as an "
        "exact-integer ratio product, rounded 10 into DECIMAL "
        "before the order-free sum. Scale: one corpus pass to the "
        "<=10001-row score aggregate, one window, one 1-row "
        "aggregate",
)
def x371_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    p_s = F.floor(
        text.stop_ratio_column("text") * 10000 + F.lit(0.5)
    ).cast("long")
    scored = docs.select(
        p_s.alias("p_s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    per = scored.groupBy("p_s").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum("pos").cast("long").alias("pos_s"),
    )
    tot = per.agg(
        F.sum("pos_s").cast("long").alias("n_pos"),
        F.sum(F.col("n_s") - F.col("pos_s")).cast("long").alias("n_neg"),
    )
    wd = Window.orderBy(F.desc("p_s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "p_s",
        "pos_s",
        F.sum("pos_s").over(wd).cast("long").alias("tp"),
        F.sum("n_s").over(wd).cast("long").alias("pred"),
    )
    ap = (
        cum.filter(F.col("pos_s") > 0)
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.round(
                    (F.col("pos_s") / F.col("n_pos").cast("double"))
                    * (F.col("tp") / F.col("pred").cast("double")),
                    10,
                ).cast("decimal(28,10)")
            )
            .cast("decimal(28,10)")
            .alias("ap")
        )
    )
    return ap.crossJoin(F.broadcast(tot)).select(
        "n_pos",
        "n_neg",
        F.round(F.col("ap").cast("double"), 6).alias("average_precision"),
        F.round(
            F.col("n_pos")
            / (F.col("n_pos") + F.col("n_neg")).cast("double"),
            6,
        ).alias("prevalence"),
    )


_X372_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         CASE WHEN label < 5 THEN 'a' ELSE 'b' END AS grp
  FROM embeddings
),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 10),
d AS (
  SELECT e.vec_id, e.grp, c.cid,
         ROUND(list_dot_product(e.v, e.v)
               - 2 * list_dot_product(e.v, c.cv)
               + list_dot_product(c.cv, c.cv), 6) AS d2
  FROM e CROSS JOIN c
),
md AS (SELECT vec_id, min(d2) AS mind FROM d GROUP BY 1),
asg AS (
  SELECT d.vec_id, min(d.grp) AS grp, min(d.cid) AS cid
  FROM d JOIN md ON d.vec_id = md.vec_id AND d.d2 = md.mind
  GROUP BY 1
),
h AS (
  SELECT cid,
         CAST(SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_a,
         CAST(SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_b
  FROM asg GROUP BY 1
),
tt AS (
  SELECT CAST(SUM(n_a) AS BIGINT) AS ta,
         CAST(SUM(n_b) AS BIGINT) AS tb
  FROM h
),
terms AS (
  SELECT h.cid, h.n_a, h.n_b,
         h.n_a / CAST(t.ta AS DOUBLE) AS p,
         h.n_b / CAST(t.tb AS DOUBLE) AS q
  FROM h CROSS JOIN tt t
),
js AS (
  SELECT CAST(SUM(CAST(ROUND(
           CASE WHEN p > 0
                THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
           + CASE WHEN q > 0
                  THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END,
           12) AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS js
  FROM terms
)
SELECT t.cid, t.n_a, t.n_b,
       ROUND(t.p, 6) AS share_a, ROUND(t.q, 6) AS share_b,
       ROUND(CAST(j.js AS DOUBLE), 6) AS js_divergence
FROM terms t CROSS JOIN js j
ORDER BY t.cid
"""


@register(
    "x372_embedding_js_divergence",
    _X372_ORACLE,
    doc="Jensen-Shannon divergence between two corpus halves (label "
        "< 5 vs >= 5) IN EMBEDDING SPACE: both groups' vectors "
        "assign to x341's deterministic seed centroids (same "
        "round-6 distance + min-cid tie-break), and JS compares the "
        "two cluster-occupancy histograms -- the semantic "
        "drift/domain-shift number x250's schema drift and x128's "
        "source-mix KL cannot see (two sources can have identical "
        "metadata yet live in different embedding regions; this is "
        "the MAUVE-style discretize-then-diverge recipe in exact "
        "arithmetic). Per-cell ln terms round 12 into the order-"
        "free DECIMAL sum; zero cells contribute 0 by the 0*ln0 "
        "convention; JS is symmetric and bounded by ln 2 -- both "
        "ends pytest-pinned. Scale: centroids broadcast, assignment "
        "map-side, histograms are k-cell aggregates",
)
def x372_embedding_js_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
        F.when(F.col("label") < 5, "a").otherwise("b").alias("grp"),
    )
    c = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    d = e.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "grp",
        "cid",
        F.round(
            dot(F.col("v"), F.col("v"))
            - 2 * dot(F.col("v"), F.col("cv"))
            + dot(F.col("cv"), F.col("cv")),
            6,
        ).alias("d2"),
    )
    asg = d.groupBy("vec_id").agg(
        F.min("grp").alias("grp"),
        F.min(F.struct("d2", "cid")).getField("cid").alias("cid"),
    )
    h = asg.groupBy("cid").agg(
        F.sum(F.when(F.col("grp") == "a", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("grp") == "b", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    tt = h.agg(
        F.sum("n_a").cast("long").alias("ta"),
        F.sum("n_b").cast("long").alias("tb"),
    )
    terms = h.crossJoin(F.broadcast(tt)).select(
        "cid",
        "n_a",
        "n_b",
        (F.col("n_a") / F.col("ta").cast("double")).alias("p"),
        (F.col("n_b") / F.col("tb").cast("double")).alias("q"),
    )
    mmid = (F.col("p") + F.col("q")) / 2
    term = F.when(
        F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / mmid)
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("q") > 0, 0.5 * F.col("q") * F.log(F.col("q") / mmid)
    ).otherwise(F.lit(0.0))
    js = terms.agg(
        F.sum(F.round(term, 12).cast("decimal(28,12)"))
        .cast("decimal(28,12)")
        .alias("js")
    )
    return (
        terms.crossJoin(F.broadcast(js))
        .select(
            "cid",
            "n_a",
            "n_b",
            F.round("p", 6).alias("share_a"),
            F.round("q", 6).alias("share_b"),
            F.round(F.col("js").cast("double"), 6).alias("js_divergence"),
        )
        .orderBy("cid")
    )


_X373_ORACLE = """
WITH k AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           AS BIGINT) AS nv,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS np
  FROM events GROUP BY 1
),
act AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(SUM(nv * np) AS BIGINT) AS predicted_pairs
  FROM k WHERE nv > 0 AND np > 0
),
samp AS (
  SELECT CAST(count(*) AS BIGINT) AS sampled_keys,
         CAST(COALESCE(SUM(nv * np), 0) * 64 AS BIGINT)
           AS sample_estimate
  FROM k
  WHERE nv > 0 AND np > 0
    AND substr(md5(CAST(user_id AS VARCHAR) || ':cbo'), 1, 2) < '04'
)
SELECT a.n_keys, a.predicted_pairs, s.sampled_keys,
       s.sample_estimate,
       ROUND(ABS(s.sample_estimate - a.predicted_pairs)
             / CAST(a.predicted_pairs AS DOUBLE), 4) AS rel_error
FROM act a CROSS JOIN samp s
"""


@register(
    "x373_join_size_estimation",
    _X373_ORACLE,
    doc="join-cardinality estimation audit -- the cost-based-"
        "optimizer primitive made measurable: the view x purchase "
        "self-join's output size computed EXACTLY from one key-"
        "histogram pass (sum over users of views*purchases -- the "
        "join never materializes: at 100 TB you size the shuffle "
        "BEFORE paying it), beside the 1/64 key-sample estimate "
        "(md5 bucket, the deterministic stand-in for CBO's sampled "
        "statistics) with its realized relative error -- the number "
        "that tells you how much to trust sampled stats on a skewed "
        "key distribution (x108's Gini says skew exists; this "
        "prices what skew does to estimation). All exact BIGINTs; "
        "one corpus groupBy, two 1-row aggregates. The pytest gate "
        "materializes the join at sf0.001 and confirms the "
        "histogram identity",
)
def x373_join_size_estimation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("nv"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("np"),
    ).filter((F.col("nv") > 0) & (F.col("np") > 0))
    act = k.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.col("nv") * F.col("np"))
        .cast("long")
        .alias("predicted_pairs"),
    )
    samp = k.filter(
        F.substring(
            F.md5(
                F.concat(F.col("user_id").cast("string"), F.lit(":cbo"))
            ),
            1,
            2,
        )
        < "04"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("sampled_keys"),
        (F.coalesce(F.sum(F.col("nv") * F.col("np")), F.lit(0)) * 64)
        .cast("long")
        .alias("sample_estimate"),
    )
    return act.crossJoin(F.broadcast(samp)).select(
        "n_keys",
        "predicted_pairs",
        "sampled_keys",
        "sample_estimate",
        F.round(
            F.abs(F.col("sample_estimate") - F.col("predicted_pairs"))
            / F.col("predicted_pairs").cast("double"),
            4,
        ).alias("rel_error"),
    )


_X374_ORACLE = """
WITH t AS (
  SELECT doc_id, source, lower(text) AS lt,
         CAST(length(lower(text)) AS BIGINT) AS len
  FROM documents
),
g AS (
  SELECT doc_id, (p).pos AS pos, (p).g AS gram
  FROM t, LATERAL (
    SELECT unnest(list_transform(range(1, len - 28),
             i -> struct_pack(pos := i, g := substr(lt, i, 30)))) AS p
  )
  WHERE len >= 30
),
rep AS (
  SELECT gram FROM g GROUP BY 1
  HAVING count(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT g.doc_id, g.pos FROM g JOIN rep USING (gram)
),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(MAX(pos + 29) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                -1)
              THEN 1 ELSE 0 END AS new_island
  FROM hits
),
grp AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
  FROM isl
),
spans AS (
  SELECT doc_id, isl_id,
         MIN(pos) AS s, MAX(pos) + 29 AS e
  FROM grp GROUP BY 1, 2
),
per_doc AS (
  SELECT t.doc_id, t.source, t.len,
         CAST(COALESCE(SUM(sp.e - sp.s + 1), 0) AS BIGINT) AS dup_chars
  FROM t LEFT JOIN spans sp ON t.doc_id = sp.doc_id
  GROUP BY 1, 2, 3
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN dup_chars > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_dup,
       CAST(SUM(dup_chars) AS BIGINT) AS total_dup_chars,
       ROUND(CAST(SUM(CAST(ROUND(dup_chars / CAST(len AS DOUBLE), 6)
                  AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4)
         AS mean_dup_fraction
FROM per_doc GROUP BY 1 ORDER BY source
"""


@register(
    "x374_substring_dedup_spans",
    _X374_ORACLE,
    doc="exact-substring duplication audit (the Lee et al. 2022 "
        "'Deduplicating Training Data' METHOD family, public): "
        "character 30-grams repeated across >= 2 DISTINCT documents "
        "mark duplicated spans; per doc, overlapping hits merge "
        "into maximal islands (x149's interval-island recipe, "
        "per-doc windows) and the duplicated-character fraction "
        "rolls up per source -- catches the copied PARAGRAPH inside "
        "otherwise-distinct documents that whole-doc hashing (x01) "
        "and shingle Jaccard (x03) both miss, which is exactly the "
        "memorization-risk span a substring dedup pass would CUT. "
        "Determinism: island merging is exact integer position "
        "arithmetic; per-doc fractions round 6 into DECIMAL before "
        "the source mean. Scale: the gram explode is corpus-chars-"
        "sized (the price every suffix-array method pays once), the "
        "repeated-gram filter is one groupBy with an early "
        "HAVING, hits re-join on the gram equi-key, and islands "
        "need only per-doc windows -- per-key parallel, no "
        "corpus-wide sort. Short docs (< 30 chars) are span-free by "
        "construction (the sequence guard x274 documents)",
)
def x374_substring_dedup_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.lower(F.col("text")).alias("lt"),
        F.length(F.lower(F.col("text"))).cast("long").alias("len"),
    ).localCheckpoint(eager=False)
    lt = F.col("lt")
    g = (
        t.filter(F.col("len") >= 30)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("len") - 29),
                    lambda i: F.struct(
                        i.alias("pos"),
                        lt.substr(i, F.lit(30)).alias("g"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.pos").alias("pos"), F.col("p.g").alias("gram"))
    )
    rep = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    hits = g.join(rep, "gram").select("doc_id", "pos")
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = hits.select(
        "doc_id",
        "pos",
        F.when(
            F.col("pos")
            > F.coalesce(F.max(F.col("pos") + 29).over(wprev), F.lit(-1)),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = isl.select(
        "doc_id",
        "pos",
        F.sum("new_island").over(wrun).alias("isl_id"),
    )
    spans = grp.groupBy("doc_id", "isl_id").agg(
        F.min("pos").alias("s"), (F.max("pos") + 29).alias("e")
    )
    per_doc = (
        t.join(spans, "doc_id", "left")
        .groupBy("doc_id", "source", "len")
        .agg(
            F.coalesce(F.sum(F.col("e") - F.col("s") + 1), F.lit(0))
            .cast("long")
            .alias("dup_chars")
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("dup_chars") > 0, 1).otherwise(0))
            .cast("long")
            .alias("docs_with_dup"),
            F.sum("dup_chars").cast("long").alias("total_dup_chars"),
            F.round(
                F.sum(
                    F.round(
                        F.col("dup_chars") / F.col("len").cast("double"),
                        6,
                    ).cast("decimal(18,6)")
                ).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mean_dup_fraction"),
        )
        .orderBy("source")
    )


def _x375_hex3_sql(col: str, salt: str) -> str:
    """DuckDB: last-3-hex-chars of md5(col || salt) as 0..4095 via
    strpos position math (no conv() in DuckDB -- x312's recipe)."""
    h = f"md5(CAST({col} AS VARCHAR) || '{salt}')"
    d = "'0123456789abcdef'"
    return (
        f"((strpos({d}, substr({h}, 30, 1)) - 1) * 256"
        f" + (strpos({d}, substr({h}, 31, 1)) - 1) * 16"
        f" + (strpos({d}, substr({h}, 32, 1)) - 1))"
    )


_X375_ORACLE = f"""
WITH rows_h AS (
  SELECT user_id,
         {_x375_hex3_sql('user_id', ':cm0')} % 1024 AS c0,
         {_x375_hex3_sql('user_id', ':cm1')} % 1024 AS c1,
         {_x375_hex3_sql('user_id', ':cm2')} % 1024 AS c2,
         {_x375_hex3_sql('user_id', ':cm3')} % 1024 AS c3
  FROM events
),
cms AS (
  SELECT j, cell, CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT 0 AS j, c0 AS cell FROM rows_h
    UNION ALL SELECT 1, c1 FROM rows_h
    UNION ALL SELECT 2, c2 FROM rows_h
    UNION ALL SELECT 3, c3 FROM rows_h
  ) q GROUP BY 1, 2
),
exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         MIN(c0) AS c0, MIN(c1) AS c1, MIN(c2) AS c2, MIN(c3) AS c3
  FROM rows_h GROUP BY user_id
  ORDER BY n DESC, user_id LIMIT 20
),
est AS (
  SELECT e.user_id, e.n,
         LEAST(m0.cnt, m1.cnt, m2.cnt, m3.cnt) AS estimate
  FROM exact e
  JOIN cms m0 ON m0.j = 0 AND m0.cell = e.c0
  JOIN cms m1 ON m1.j = 1 AND m1.cell = e.c1
  JOIN cms m2 ON m2.j = 2 AND m2.cell = e.c2
  JOIN cms m3 ON m3.j = 3 AND m3.cell = e.c3
)
SELECT user_id, n AS exact_count, estimate,
       estimate - n AS overestimate,
       ROUND((estimate - n) / CAST(n AS DOUBLE), 4) AS rel_error
FROM est ORDER BY exact_count DESC, user_id
"""


@register(
    "x375_count_min_sketch",
    _X375_ORACLE,
    doc="deterministic count-min sketch audit (depth 4 x width 1024, "
        "md5-derived row hashes): per-user event counts estimated as "
        "the MIN over the four hashed cells, reported for the top-20 "
        "exact heavy hitters beside truth -- the mergeable fixed-"
        "memory frequency structure completing the sketch family "
        "(x16/x261 HLL count distinct things, x272 finds heavy "
        "hitters, CMS answers POINT queries on any key; its "
        "one-sided error -- estimate >= exact, ALWAYS -- is emitted "
        "as a column and pytest-pinned). The 4x1024 table builds in "
        "one conditional-explode groupBy (4 map-side partial-agg "
        "cells per event, mergeable across partitions/days exactly "
        "like production CMS shards); estimates are four "
        "broadcast-sized lookups. Scale: sketch size is CONSTANT in "
        "corpus size -- that is the whole point",
)
def x375_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def cell(j: int):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"),
                            F.lit(f":cm{j}"),
                        )
                    ),
                    30,
                    3,
                ),
                16,
                10,
            ).cast("long")
            % 1024
        )

    rows_h = ev.select(
        "user_id",
        cell(0).alias("c0"),
        cell(1).alias("c1"),
        cell(2).alias("c2"),
        cell(3).alias("c3"),
    ).localCheckpoint(eager=False)
    cms = (
        rows_h.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.col(f"c{j}").alias("cell"),
                        )
                        for j in range(4)
                    ]
                )
            ).alias("p")
        )
        .groupBy(F.col("p.j").alias("j"), F.col("p.cell").alias("cell"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    exact = (
        rows_h.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("c0").alias("c0"),
            F.min("c1").alias("c1"),
            F.min("c2").alias("c2"),
            F.min("c3").alias("c3"),
        )
        .orderBy(F.desc("n"), "user_id")
        .limit(20)
    )
    est = exact
    for j in range(4):
        mj = cms.filter(F.col("j") == j).select(
            F.col("cell").alias(f"mc{j}"), F.col("cnt").alias(f"cnt{j}")
        )
        est = est.join(
            F.broadcast(mj), F.col(f"c{j}") == F.col(f"mc{j}")
        )
    return est.select(
        "user_id",
        F.col("n").alias("exact_count"),
        F.least(*[F.col(f"cnt{j}") for j in range(4)]).alias("estimate"),
        (
            F.least(*[F.col(f"cnt{j}") for j in range(4)]) - F.col("n")
        ).alias("overestimate"),
        F.round(
            (
                F.least(*[F.col(f"cnt{j}") for j in range(4)])
                - F.col("n")
            )
            / F.col("n").cast("double"),
            4,
        ).alias("rel_error"),
    ).orderBy(F.desc("exact_count"), "user_id")


_X376_ORACLE = """
WITH dt AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(string_split(lower(text), ' ')) - 1),
           i -> array_to_string(list_slice(
                  string_split(lower(text), ' '), i, i + 2), ' ')))
           AS toks
  FROM documents
  WHERE len(string_split(lower(text), ' ')) >= 3
),
sz AS MATERIALIZED (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS s FROM dt
),
tk AS MATERIALIZED (SELECT doc_id, unnest(toks) AS tok FROM dt),
df AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tk GROUP BY 1
),
arr AS MATERIALIZED (
  SELECT tk.doc_id, list(tk.tok ORDER BY df.df, tk.tok) AS arr
  FROM tk JOIN df USING (tok) GROUP BY tk.doc_id
),
pre AS MATERIALIZED (
  SELECT a.doc_id,
         unnest(list_slice(a.arr, 1,
                s.s - ((3 * s.s + 4) // 5) + 1)) AS tok
  FROM arr a JOIN sz s USING (doc_id)
),
cand AS MATERIALIZED (
  SELECT DISTINCT p1.doc_id AS ia, p2.doc_id AS ib
  FROM pre p1 JOIN pre p2
    ON p1.tok = p2.tok AND p1.doc_id < p2.doc_id
),
ov AS MATERIALIZED (
  SELECT c.ia, c.ib, CAST(count(*) AS BIGINT) AS inter
  FROM cand c
  JOIN tk a ON a.doc_id = c.ia
  JOIN tk b ON b.doc_id = c.ib AND b.tok = a.tok
  GROUP BY 1, 2
),
v AS (
  SELECT o.ia, o.ib, o.inter, sa.s AS ssa, sb.s AS ssb
  FROM ov o
  JOIN sz sa ON o.ia = sa.doc_id
  JOIN sz sb ON o.ib = sb.doc_id
)
SELECT ia AS id_a, ib AS id_b, inter,
       ROUND(inter / CAST(ssa + ssb - inter AS DOUBLE), 6) AS jaccard
FROM v
WHERE inter / CAST(ssa + ssb - inter AS DOUBLE) >= 0.6
ORDER BY id_a, id_b
"""


@register(
    "x376_prefix_filter_simjoin",
    _X376_ORACLE,
    doc="prefix-filtered set-similarity self-join (the AllPairs/"
        "PPJoin family, Bayardo/Xiao et al., public) over 3-shingle "
        "SETS: shingle Jaccard >= 0.6 pairs found by blocking ONLY "
        "on each doc's prefix -- its (s - ceil(0.6 s) + 1) globally-"
        "RAREST shingles (frequency-ascending total order) -- with "
        "the prefix-filter lemma's guarantee that qualifying pairs "
        "share a prefix shingle (pytest proves completeness against "
        "the brute-force pair set). The third blocking family in "
        "the dedup suite: x03 posts EVERY shingle (pair cost = sum "
        "of df^2 over all shingles), x40 hashes into MinHash bands "
        "(approximate), this posts only each doc's rare TAIL -- "
        "exact answers at a fraction of x03's join cost, and "
        "measured necessary on THIS corpus: the same filter on raw "
        "token sets degenerates to 88M candidates (24 distinct "
        "prefix tokens, hottest bucket 3838 docs) where shingle "
        "sets yield 312k (hottest bucket 10) -- the blocking DOMAIN "
        "is the scale decision, exactly as at 100 TB. Exact integer "
        "prefix lengths (ceil(0.6 s) as (3s+4) DIV 5 -- no float "
        "ceil), exact intersect verify, single-division Jaccard "
        "filter identical cross-engine. Scale: one shingle explode "
        "+ df groupBy, per-doc sort row-local, candidate join keys "
        "on rare shingles by construction",
)
def x376_prefix_filter_simjoin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # checkpoint the shingle ARRAYS once: sizes, postings, df, the
    # rarity sort and both verify sides all derive from this -- without
    # it the shingle expression re-evaluates per consumer
    dt = (
        dedup.shingle_arrays(docs, "doc_id", "text", k=3)
        .select(F.col("doc").alias("doc_id"), F.col("sh").alias("toks"))
        .localCheckpoint(eager=False)
    )
    sz = dt.select("doc_id", F.size("toks").cast("long").alias("s"))
    # the shingle postings feed the df groupBy, the per-doc rarity
    # sort AND both sides of the overlap-count verify: checkpoint once
    tk = dt.select(
        "doc_id", F.explode("toks").alias("tok")
    ).localCheckpoint(eager=False)
    df = tk.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    arr = (
        tk.join(df, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("df", "tok"))
                ),
                lambda x: x.getField("tok"),
            ).alias("arr")
        )
    )
    pre = (
        arr.join(sz, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.slice(
                    F.col("arr"),
                    F.lit(1),
                    (
                        F.col("s")
                        - ((3 * F.col("s") + 4) / 5).cast("long")
                        + 1
                    ).cast("int"),
                )
            ).alias("tok"),
        )
        # prefix postings feed both sides of the candidate self-join
        .localCheckpoint(eager=False)
    )
    p2 = pre.select(
        F.col("doc_id").alias("ib"), F.col("tok").alias("tok2")
    )
    cand = (
        pre.join(
            p2,
            (F.col("tok") == F.col("tok2"))
            & (F.col("doc_id") < F.col("ib")),
        )
        .select(F.col("doc_id").alias("ia"), "ib")
        .distinct()
    )
    # PPJoin-style verify: overlap counted on the POSTINGS equi-join
    # restricted to candidate pairs -- never a per-pair array
    # intersect (measured ~3x cheaper at sf0.1: per-pair arrays
    # materialize the token lists for every candidate, the postings
    # hash-join streams)
    tka = tk.select(F.col("doc_id").alias("ia"), "tok")
    tkb = tk.select(
        F.col("doc_id").alias("ibb"), F.col("tok").alias("tok2")
    )
    ov = (
        cand.join(tka, "ia")
        .join(
            tkb,
            (F.col("ibb") == F.col("ib"))
            & (F.col("tok2") == F.col("tok")),
        )
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    v = (
        ov.join(
            sz.select(F.col("doc_id").alias("ia"), F.col("s").alias("ssa")),
            "ia",
        )
        .join(
            sz.select(F.col("doc_id").alias("ib"), F.col("s").alias("ssb")),
            "ib",
        )
    )
    jac = F.col("inter") / (
        F.col("ssa") + F.col("ssb") - F.col("inter")
    ).cast("double")
    return (
        v.filter(jac >= 0.6)
        .select(
            F.col("ia").alias("id_a"),
            F.col("ib").alias("id_b"),
            "inter",
            F.round(jac, 6).alias("jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


_X377_ORACLE = """
WITH tok AS (
  SELECT doc_id, source, lang, unnest(string_split(lower(text), ' '))
           AS w
  FROM documents
),
lm AS (
  SELECT w,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_t,
         CAST(count(*) AS BIGINT) AS cnt_s
  FROM tok GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(cnt_t) AS BIGINT) AS n_t,
         CAST(SUM(cnt_s) AS BIGINT) AS n_s,
         CAST(count(*) AS BIGINT) AS v
  FROM lm
),
ds AS (
  SELECT t.doc_id, t.source,
         CAST(SUM(CAST(ROUND(ln(
           ((l.cnt_t + 1) * (o.n_s + o.v))
           / CAST((l.cnt_s + 1) * (o.n_t + o.v) AS DOUBLE)), 8)
           AS DECIMAL(28,8))) AS DECIMAL(28,8)) AS score
  FROM tok t JOIN lm l USING (w) CROSS JOIN tot o
  GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(score) AS DOUBLE) / count(*), 4) AS mean_score,
       CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_positive,
       ROUND(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS positive_share
FROM ds GROUP BY 1 ORDER BY source
"""


@register(
    "x377_dsir_importance",
    _X377_ORACLE,
    doc="DSIR-style importance scores (Xie et al. 2023 pattern, "
        "public): per-doc sum of unigram log-ratios ln(p_target/"
        "p_source) between the TARGET distribution (en docs, the "
        "quality exemplar) and the full-corpus source distribution, "
        "Laplace-smoothed over the shared vocab -- the "
        "importance-resampling SCORE that decides which raw docs "
        "look like the target domain (x348 resamples by length, "
        "x342 compares sources pairwise; this scores every DOC for "
        "selection), rolled up per source as mean score + "
        "positive-importance share: which sources DSIR would "
        "upweight. Determinism: each token's log-ratio is ONE ln of "
        "an exact-integer ratio ((c_t+1)(N_s+V))/((c_s+1)(N_t+V)) "
        "rounded 8 into DECIMAL before the per-doc sum -- "
        "engine-identical, partition-order free. Scale: one token "
        "explode, the LM is a token-keyed aggregate joined back on "
        "the token equi-key (x342's shape), doc scores partial-"
        "aggregate into the source rollup",
)
def x377_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    ).localCheckpoint(eager=False)
    lm = tok.groupBy("w").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("cnt_t"),
        F.count(F.lit(1)).cast("long").alias("cnt_s"),
    )
    tot = lm.agg(
        F.sum("cnt_t").cast("long").alias("n_t"),
        F.sum("cnt_s").cast("long").alias("n_s"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    ds = (
        tok.join(lm, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(
            F.sum(
                F.round(
                    F.log(
                        (
                            (F.col("cnt_t") + 1)
                            * (F.col("n_s") + F.col("v"))
                        )
                        / (
                            (F.col("cnt_s") + 1)
                            * (F.col("n_t") + F.col("v"))
                        ).cast("double")
                    ),
                    8,
                ).cast("decimal(28,8)")
            )
            .cast("decimal(28,8)")
            .alias("score")
        )
    )
    return (
        ds.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum("score").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_score"),
            F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_positive"),
            F.round(
                F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("positive_share"),
        )
        .orderBy("source")
    )


_X378_ORACLE = """
WITH t AS (
  SELECT p.p_brand AS brand,
         CASE WHEN l.l_returnflag = 'R' THEN 'R' ELSE 'K' END AS grp,
         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
m AS (
  SELECT brand, grp, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
           AS DECIMAL(38,0)) AS s2
  FROM t GROUP BY 1, 2
),
w AS (
  SELECT brand,
         MAX(CASE WHEN grp = 'R' THEN n END) AS na,
         MAX(CASE WHEN grp = 'R' THEN CAST(s1 AS DOUBLE) END) AS sa1,
         MAX(CASE WHEN grp = 'R' THEN CAST(s2 AS DOUBLE) END) AS sa2,
         MAX(CASE WHEN grp = 'K' THEN n END) AS nb,
         MAX(CASE WHEN grp = 'K' THEN CAST(s1 AS DOUBLE) END) AS sb1,
         MAX(CASE WHEN grp = 'K' THEN CAST(s2 AS DOUBLE) END) AS sb2
  FROM m GROUP BY brand
),
z AS (
  SELECT brand,
         ROUND((sa1 / na - sb1 / nb)
               / sqrt((sa2 / na - (sa1 / na) * (sa1 / na)) / (na - 1)
                      + (sb2 / nb - (sb1 / nb) * (sb1 / nb))
                        / (nb - 1)), 4) AS z_stat
  FROM w WHERE na > 1 AND nb > 1
),
p AS (
  SELECT brand, z_stat,
         CAST(ROUND(2.0 / (1.0 + exp(1.702 * abs(z_stat))), 8)
           AS DECIMAL(18,8)) AS p_val
  FROM z
),
r AS (
  SELECT brand, z_stat, p_val,
         CAST(row_number() OVER (ORDER BY p_val, brand) AS BIGINT)
           AS rnk,
         CAST(count(*) OVER () AS BIGINT) AS m_tests
  FROM p
),
cut AS (
  SELECT COALESCE(MAX(CASE WHEN CAST(p_val AS DOUBLE)
                              <= 0.10 * rnk / m_tests
                       THEN rnk END), 0) AS k_star
  FROM r
)
SELECT r.brand, r.z_stat, CAST(r.p_val AS DOUBLE) AS p_val, r.rnk,
       ROUND(0.10 * r.rnk / r.m_tests, 8) AS bh_threshold,
       CASE WHEN r.rnk <= c.k_star THEN 1 ELSE 0 END AS rejected
FROM r CROSS JOIN cut c
ORDER BY r.rnk
"""


@register(
    "x378_benjamini_hochberg",
    _X378_ORACLE,
    doc="Benjamini-Hochberg FDR step-up over the per-brand Welch z "
        "family -- the multiple-testing correction the per-test "
        "entries (x286 Welch, x148 chi2, x363 Kruskal-Wallis) all "
        "stop short of: 25 simultaneous brand-level tests of "
        "returned-vs-kept price at alpha=0.10 would expect ~2.5 "
        "false positives under naive thresholding; BH finds the "
        "largest rank k with p_(k) <= k/m*alpha and rejects ranks "
        "<= k (step-UP: rejected tests can individually sit above "
        "their own threshold). p from the logistic approximation of "
        "the normal CDF 2/(1+exp(1.702|z|)) on the ROUNDED z -- one "
        "transcendental per 25-row aggregate, x377's round-8-"
        "then-DECIMAL precedent, so rank ties are impossible and "
        "the step-up cut is engine-exact. Scale: the test family is "
        "a brand-cardinality aggregate of exact integer moment sums "
        "(x286's DECIMAL(38,0) contract); every window runs over "
        "those 25 rows -- the corpus pays one join + one groupBy",
)
def x378_benjamini_hochberg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    t = li.join(
        F.broadcast(pt.select("p_partkey", "p_brand")),
        li["l_partkey"] == pt["p_partkey"],
    ).select(
        F.col("p_brand").alias("brand"),
        F.when(F.col("l_returnflag") == "R", "R")
        .otherwise("K")
        .alias("grp"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("c"),
    )
    cd = F.col("c").cast("decimal(19,0)")
    m = t.groupBy("brand", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cd).cast("decimal(38,0)").alias("s1"),
        F.sum(cd * cd).cast("decimal(38,0)").alias("s2"),
    )
    w = m.groupBy("brand").agg(
        F.max(F.when(F.col("grp") == "R", F.col("n"))).alias("na"),
        F.max(
            F.when(F.col("grp") == "R", F.col("s1").cast("double"))
        ).alias("sa1"),
        F.max(
            F.when(F.col("grp") == "R", F.col("s2").cast("double"))
        ).alias("sa2"),
        F.max(F.when(F.col("grp") == "K", F.col("n"))).alias("nb"),
        F.max(
            F.when(F.col("grp") == "K", F.col("s1").cast("double"))
        ).alias("sb1"),
        F.max(
            F.when(F.col("grp") == "K", F.col("s2").cast("double"))
        ).alias("sb2"),
    )
    z = w.filter((F.col("na") > 1) & (F.col("nb") > 1)).selectExpr(
        "brand",
        """ROUND((sa1 / na - sb1 / nb)
                 / sqrt((sa2 / na - (sa1 / na) * (sa1 / na)) / (na - 1)
                        + (sb2 / nb - (sb1 / nb) * (sb1 / nb))
                          / (nb - 1)), 4) AS z_stat""",
    )
    p = z.withColumn(
        "p_val",
        F.round(
            F.lit(2.0) / (F.lit(1.0) + F.exp(1.702 * F.abs("z_stat"))),
            8,
        ).cast("decimal(18,8)"),
    )
    # rank window over the 25-row brand aggregate -- bounded contract
    r = p.withColumn(
        "rnk",
        F.row_number()
        .over(Window.orderBy("p_val", "brand"))
        .cast("long"),
    ).withColumn(
        "m_tests",
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long"),
    )
    cut = r.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_val").cast("double")
                    <= 0.10 * F.col("rnk") / F.col("m_tests"),
                    F.col("rnk"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("k_star")
    )
    return (
        r.crossJoin(F.broadcast(cut))
        .select(
            "brand",
            "z_stat",
            F.col("p_val").cast("double").alias("p_val"),
            "rnk",
            F.round(0.10 * F.col("rnk") / F.col("m_tests"), 8).alias(
                "bh_threshold"
            ),
            F.when(F.col("rnk") <= F.col("k_star"), 1)
            .otherwise(0)
            .alias("rejected"),
        )
        .orderBy("rnk")
    )


_X379_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents
),
topw AS (
  SELECT w FROM (
    SELECT w, count(*) AS cnt FROM tok GROUP BY 1
  ) ORDER BY cnt DESC, w LIMIT 30
),
srcs AS (SELECT DISTINCT source FROM tok),
tots AS (
  SELECT source, CAST(count(*) AS BIGINT) AS tot FROM tok GROUP BY 1
),
cnts AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS cnt
  FROM tok WHERE w IN (SELECT w FROM topw) GROUP BY 1, 2
),
freq AS (
  SELECT s.source, t.w,
         CAST(ROUND(COALESCE(c.cnt, 0) * 1000000.0 / o.tot, 8)
           AS DECIMAL(20,8)) AS f
  FROM srcs s CROSS JOIN topw t
  JOIN tots o ON o.source = s.source
  LEFT JOIN cnts c ON c.source = s.source AND c.w = t.w
),
stats AS (
  SELECT w,
         CAST(SUM(f) AS DECIMAL(28,8)) AS sf,
         CAST(SUM(CAST(f AS DECIMAL(28,8)) * CAST(f AS DECIMAL(28,8)))
           AS DECIMAL(38,8)) AS sf2,
         CAST(count(*) AS BIGINT) AS ns
  FROM freq GROUP BY 1
),
zs AS (
  SELECT q.source, q.w,
         CAST(ROUND((CAST(q.f AS DOUBLE) - CAST(s.sf AS DOUBLE) / s.ns)
               / sqrt(CAST(s.sf2 AS DOUBLE) / s.ns
                      - (CAST(s.sf AS DOUBLE) / s.ns)
                        * (CAST(s.sf AS DOUBLE) / s.ns)), 6)
           AS DECIMAL(18,6)) AS z
  FROM freq q JOIN stats s ON q.w = s.w
  WHERE CAST(s.sf2 AS DOUBLE) / s.ns
        - (CAST(s.sf AS DOUBLE) / s.ns) * (CAST(s.sf AS DOUBLE) / s.ns)
        > 0
)
SELECT a.source AS source_a, b.source AS source_b,
       ROUND(CAST(SUM(CAST(abs(a.z - b.z) AS DECIMAL(18,6)))
                    AS DOUBLE) / count(*), 4) AS delta
FROM zs a JOIN zs b ON a.w = b.w AND a.source < b.source
GROUP BY 1, 2 ORDER BY source_a, source_b
"""


@register(
    "x379_burrows_delta",
    _X379_ORACLE,
    doc="Burrows' Delta stylometric distance between sources (the "
        "standard authorship-attribution measure, public since "
        "Burrows 2002): the 30 highest-frequency corpus words play "
        "the function-word role, per-source rates normalize to "
        "occurrences-per-million, each word z-scores across the 20 "
        "sources (population std), and Delta(a,b) = mean |z_a - z_b| "
        "over the word panel -- near-0 pairs share register/style "
        "(dedup-adjacent signal on template corpora), large pairs "
        "diverge. Missing words materialize as explicit rate-0 rows "
        "via the sources x top-words frame (a LEFT JOIN on the "
        "counts -- absence is data, not a dropped row); zero-"
        "variance words drop from the panel on BOTH sides (a z "
        "would divide by 0 -- NULL in Spark, inf in DuckDB: the "
        "guard is the determinism fix, not cosmetics). Determinism: "
        "rates round-8 into DECIMAL, moment sums accumulate in "
        "DECIMAL (exact), the one sqrt runs per 30-row word panel, "
        "z rounds 6 into DECIMAL before the pairwise |diff| sum. "
        "Scale: one token explode feeds a vocab groupBy; top-30 is "
        "a TakeOrdered (no global sort); everything after is "
        "30 x 20 = 600 aggregate rows -- the pair join is "
        "aggregate x aggregate, never corpus-sized",
)
def x379_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    ).localCheckpoint(eager=False)
    topw = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(30)
        .select("w")
    )
    srcs = tok.select("source").distinct()
    tots = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("tot")
    )
    cnts = (
        tok.join(F.broadcast(topw), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    freq = (
        srcs.crossJoin(F.broadcast(topw))
        .join(tots, "source")
        .join(cnts, ["source", "w"], "left")
        .select(
            "source",
            "w",
            F.round(
                F.coalesce(F.col("cnt"), F.lit(0))
                * 1000000.0
                / F.col("tot"),
                8,
            )
            .cast("decimal(20,8)")
            .alias("f"),
        )
    )
    fd = F.col("f").cast("decimal(28,8)")
    stats = freq.groupBy("w").agg(
        F.sum("f").cast("decimal(28,8)").alias("sf"),
        F.sum(fd * fd).cast("decimal(38,8)").alias("sf2"),
        F.count(F.lit(1)).cast("long").alias("ns"),
    )
    var = (
        F.col("sf2").cast("double") / F.col("ns")
        - (F.col("sf").cast("double") / F.col("ns"))
        * (F.col("sf").cast("double") / F.col("ns"))
    )
    zs = (
        freq.join(stats.filter(var > 0), "w")
        .selectExpr(
            "source",
            "w",
            """CAST(ROUND((CAST(f AS DOUBLE) - CAST(sf AS DOUBLE) / ns)
                    / sqrt(CAST(sf2 AS DOUBLE) / ns
                           - (CAST(sf AS DOUBLE) / ns)
                             * (CAST(sf AS DOUBLE) / ns)), 6)
               AS DECIMAL(18,6)) AS z""",
        )
        .localCheckpoint(eager=False)
    )
    a = zs.select(
        F.col("source").alias("source_a"), "w", F.col("z").alias("za")
    )
    b = zs.select(
        F.col("source").alias("source_b"),
        F.col("w").alias("w2"),
        F.col("z").alias("zb"),
    )
    return (
        a.join(
            b,
            (F.col("w") == F.col("w2"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.round(
                F.sum(
                    F.abs(F.col("za") - F.col("zb")).cast(
                        "decimal(18,6)"
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("delta")
        )
        .orderBy("source_a", "source_b")
    )


_X380_ORACLE = """
WITH d AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
           string_split(lower(text), ' '))), ' ')) AS c,
         md5(lower(text)) AS t
  FROM documents
),
cell AS (
  SELECT c, t, CAST(count(*) AS BIGINT) AS n_ct
  FROM d GROUP BY 1, 2
),
cs AS (SELECT c, CAST(count(*) AS BIGINT) AS n_c FROM d GROUP BY 1),
ts AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t FROM d GROUP BY 1),
acc AS (
  SELECT CAST(SUM(CAST(ROUND(e.n_ct * e.n_ct
                             / CAST(c.n_c AS DOUBLE), 8)
                    AS DECIMAL(28,8))) AS DECIMAL(28,8)) AS sp,
         CAST(SUM(CAST(ROUND(e.n_ct * e.n_ct
                             / CAST(t.n_t AS DOUBLE), 8)
                    AS DECIMAL(28,8))) AS DECIMAL(28,8)) AS sr,
         CAST(SUM(e.n_ct) AS BIGINT) AS n
  FROM cell e JOIN cs c ON e.c = c.c JOIN ts t ON e.t = t.t
)
SELECT n AS n_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM cs) AS n_pred_clusters,
       (SELECT CAST(count(*) AS BIGINT) FROM ts) AS n_true_clusters,
       ROUND(CAST(sp AS DOUBLE) / n, 6) AS bcubed_precision,
       ROUND(CAST(sr AS DOUBLE) / n, 6) AS bcubed_recall,
       ROUND(2 * (CAST(sp AS DOUBLE) / n) * (CAST(sr AS DOUBLE) / n)
             / (CAST(sp AS DOUBLE) / n + CAST(sr AS DOUBLE) / n), 6)
         AS bcubed_f1
FROM acc
"""


@register(
    "x380_bcubed_clusters",
    _X380_ORACLE,
    doc="B-cubed extrinsic clustering evaluation (Bagga & Baldwin "
        "1998; the metric of record for dedup-cluster quality, "
        "Amigo et al. 2009): PREDICTED clusters = x02's sorted-"
        "distinct-token-bag fingerprint, TRUTH = x01's exact lowered"
        "-text hash; per-item precision n_ct/|c| and recall n_ct/"
        "|t| averaged over items collapse to the contingency-cell "
        "identity sum n_ct^2/|c| (resp /|t|) / N -- so the whole "
        "metric is three groupBys and two key joins, NO per-item "
        "iteration. x322 measures pairwise method agreement; this "
        "scores a clustering against truth with the metric that "
        "(unlike pair-F1) does not let one giant cluster dominate. "
        "Determinism: cell terms round-8 into DECIMAL before the "
        "sum (partition-order free), counts exact. Scale: clusters "
        "are md5-keyed groupBys (cannot skew); the cell join is "
        "key-partitioned aggregate x aggregate",
)
def x380_bcubed_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.array_sort(
                    F.array_distinct(
                        F.split(F.lower(F.col("text")), " ")
                    )
                ),
                " ",
            )
        ).alias("c"),
        F.md5(F.lower(F.col("text"))).alias("t"),
    ).localCheckpoint(eager=False)
    cell = d.groupBy("c", "t").agg(
        F.count(F.lit(1)).cast("long").alias("n_ct")
    )
    cs = d.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("n_c"))
    ts = d.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n_t"))
    acc = (
        cell.join(cs, "c")
        .join(ts, "t")
        .agg(
            F.sum(
                F.round(
                    F.col("n_ct")
                    * F.col("n_ct")
                    / F.col("n_c").cast("double"),
                    8,
                ).cast("decimal(28,8)")
            )
            .cast("decimal(28,8)")
            .alias("sp"),
            F.sum(
                F.round(
                    F.col("n_ct")
                    * F.col("n_ct")
                    / F.col("n_t").cast("double"),
                    8,
                ).cast("decimal(28,8)")
            )
            .cast("decimal(28,8)")
            .alias("sr"),
            F.sum("n_ct").cast("long").alias("n"),
        )
    )
    npred = cs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pred_clusters")
    )
    ntrue = ts.agg(
        F.count(F.lit(1)).cast("long").alias("n_true_clusters")
    )
    pcol = F.col("sp").cast("double") / F.col("n")
    rcol = F.col("sr").cast("double") / F.col("n")
    return (
        acc.crossJoin(F.broadcast(npred))
        .crossJoin(F.broadcast(ntrue))
        .select(
            F.col("n").alias("n_docs"),
            "n_pred_clusters",
            "n_true_clusters",
            F.round(pcol, 6).alias("bcubed_precision"),
            F.round(rcol, 6).alias("bcubed_recall"),
            F.round(2 * pcol * rcol / (pcol + rcol), 6).alias(
                "bcubed_f1"
            ),
        )
    )


_X381_ORACLE = """
WITH d AS (
  SELECT source,
         len(string_split(lower(text), ' ')) AS nw,
         length(replace(text, ' ', '')) AS lc,
         len(list_filter(list_distinct(string_split(lower(text), ' ')),
             t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is')))
           AS nstop,
         len(list_distinct(string_split(lower(text), ' '))) AS nd,
         list_max(list_transform(
           list_distinct(string_split(lower(text), ' ')),
           t -> len(list_filter(string_split(lower(text), ' '),
                                x -> x = t)))) AS topc
  FROM documents
),
r AS (
  SELECT source,
         CASE WHEN nw BETWEEN 30 AND 90 THEN 1 ELSE 0 END AS ok_wc,
         CASE WHEN lc >= 4 * nw AND lc <= 5 * nw THEN 1 ELSE 0 END
           AS ok_mwl,
         CASE WHEN nstop >= 2 THEN 1 ELSE 0 END AS ok_stop,
         CASE WHEN 5 * nd > 3 * nw THEN 1 ELSE 0 END AS ok_dup,
         CASE WHEN 8 * topc <= nw THEN 1 ELSE 0 END AS ok_top
  FROM d
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(1 - ok_wc) AS BIGINT) AS fail_word_count,
       CAST(SUM(1 - ok_mwl) AS BIGINT) AS fail_mean_word_len,
       CAST(SUM(1 - ok_stop) AS BIGINT) AS fail_stopwords,
       CAST(SUM(1 - ok_dup) AS BIGINT) AS fail_dup_tokens,
       CAST(SUM(1 - ok_top) AS BIGINT) AS fail_top_token,
       CAST(SUM(ok_wc * ok_mwl * ok_stop * ok_dup * ok_top) AS BIGINT)
         AS pass_all,
       ROUND(SUM(ok_wc * ok_mwl * ok_stop * ok_dup * ok_top)
             / CAST(count(*) AS DOUBLE), 4) AS pass_rate
FROM r GROUP BY source ORDER BY source
"""


@register(
    "x381_gopher_rules",
    _X381_ORACLE,
    doc="Gopher-style rule-based quality funnel (Rae et al. 2021 "
        "family, thresholds fit to this corpus so every rule "
        "discriminates): word count in [30,90], mean word length in "
        "[4,5], >=2 distinct English stopwords, duplicate-token "
        "fraction < 0.4, top-unigram share <= 1/8 -- reported per "
        "source as PER-RULE fail counts plus the conjunction "
        "survivor count (x11 scores docs, x119 ensembles scores; "
        "this is the named REJECTION-BREAKDOWN gate a curation run "
        "reads to see WHY docs died). Every rule is an integer "
        "cross-multiplication (4*nw <= chars <= 5*nw, 5*distinct > "
        "3*nw, 8*topcnt <= nw) -- no float boundary can disagree "
        "between engines; the top-unigram count is a distinct x "
        "occurrences HOF fold, O(nw * distinct) per doc, row-local. "
        "Scale: one expression-only pass, one source groupBy; no "
        "joins, no windows, map-side partials",
)
def x381_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    dtoks = F.array_distinct(toks)
    stop = list(text.LANG_STOPWORDS["en"])
    d = docs.select(
        "source",
        F.size(toks).alias("nw"),
        F.length(F.regexp_replace(F.col("text"), " ", "")).alias("lc"),
        F.size(F.filter(dtoks, lambda t: t.isin(*stop))).alias("nstop"),
        F.size(dtoks).alias("nd"),
        F.array_max(
            F.transform(
                dtoks,
                lambda t: F.size(F.filter(toks, lambda x: x == t)),
            )
        ).alias("topc"),
    )
    r = d.select(
        "source",
        F.when(F.col("nw").between(30, 90), 1).otherwise(0).alias("ok_wc"),
        F.when(
            (F.col("lc") >= 4 * F.col("nw"))
            & (F.col("lc") <= 5 * F.col("nw")),
            1,
        )
        .otherwise(0)
        .alias("ok_mwl"),
        F.when(F.col("nstop") >= 2, 1).otherwise(0).alias("ok_stop"),
        F.when(5 * F.col("nd") > 3 * F.col("nw"), 1)
        .otherwise(0)
        .alias("ok_dup"),
        F.when(8 * F.col("topc") <= F.col("nw"), 1)
        .otherwise(0)
        .alias("ok_top"),
    )
    allok = (
        F.col("ok_wc")
        * F.col("ok_mwl")
        * F.col("ok_stop")
        * F.col("ok_dup")
        * F.col("ok_top")
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(1 - F.col("ok_wc")).cast("long").alias("fail_word_count"),
            F.sum(1 - F.col("ok_mwl"))
            .cast("long")
            .alias("fail_mean_word_len"),
            F.sum(1 - F.col("ok_stop")).cast("long").alias("fail_stopwords"),
            F.sum(1 - F.col("ok_dup")).cast("long").alias("fail_dup_tokens"),
            F.sum(1 - F.col("ok_top")).cast("long").alias("fail_top_token"),
            F.sum(allok).cast("long").alias("pass_all"),
            F.round(
                F.sum(allok) / F.count(F.lit(1)).cast("double"), 4
            ).alias("pass_rate"),
        )
        .orderBy("source")
    )


_X382_ORACLE = """
WITH j AS (
  SELECT p.p_brand AS brand, l.l_quantity AS q, l.l_extendedprice AS pr
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
rk AS (
  SELECT brand,
         2 * rank() OVER (PARTITION BY brand ORDER BY q)
           + count(*) OVER (PARTITION BY brand, q) - 1 AS dq,
         2 * rank() OVER (PARTITION BY brand ORDER BY pr)
           + count(*) OVER (PARTITION BY brand, pr) - 1 AS dp
  FROM j
),
m AS (
  SELECT brand, CAST(count(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(dq AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(dp AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(dq AS HUGEINT) * dq) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(dp AS HUGEINT) * dp) AS HUGEINT) AS syy,
         CAST(SUM(CAST(dq AS HUGEINT) * dp) AS HUGEINT) AS sxy
  FROM rk GROUP BY brand
)
SELECT brand, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
         AS rho
FROM m ORDER BY brand
"""


@register(
    "x382_spearman_rho",
    _X382_ORACLE,
    doc="Spearman rank correlation with EXACT midranks, per brand, "
        "between line quantity and extended price -- the monotone-"
        "association companion to x357's Kendall tau-b (tau counts "
        "concordant pairs; rho is Pearson on ranks, far cheaper: two "
        "windows vs a pair join) and to x147's Pearson (which a "
        "single outlier can saturate). Midranks handle the massive "
        "quantity ties exactly via the doubled-rank identity 2*mid "
        "= 2*rank + tiecount - 1 (integers, no .5 floats); all five "
        "moment sums accumulate in DECIMAL(38,0)/HUGEINT (exact), "
        "the single division+sqrt runs per 25-row brand aggregate "
        "in DOUBLE on identical integers -- engine-exact. Scale: "
        "two rank windows sharing the brand partition key (one "
        "shuffle), then a brand groupBy; no pair materialization",
)
def x382_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(pt.select("p_partkey", "p_brand")),
        li["l_partkey"] == pt["p_partkey"],
    ).select(
        F.col("p_brand").alias("brand"),
        F.col("l_quantity").alias("q"),
        F.col("l_extendedprice").alias("pr"),
    )
    rk = j.select(
        "brand",
        (
            2 * F.rank().over(Window.partitionBy("brand").orderBy("q"))
            + F.count(F.lit(1)).over(Window.partitionBy("brand", "q"))
            - 1
        )
        .cast("long")
        .alias("dq"),
        (
            2 * F.rank().over(Window.partitionBy("brand").orderBy("pr"))
            + F.count(F.lit(1)).over(Window.partitionBy("brand", "pr"))
            - 1
        )
        .cast("long")
        .alias("dp"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = rk.groupBy("brand").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("dq"))).cast("decimal(38,0)").alias("sx"),
        F.sum(dec(F.col("dp"))).cast("decimal(38,0)").alias("sy"),
        F.sum(dec(F.col("dq") * F.col("dq")))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(dec(F.col("dp") * F.col("dp")))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(dec(F.col("dq") * F.col("dp")))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    return m.selectExpr(
        "brand",
        "CAST(n AS BIGINT) AS n",
        """ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
           AS rho""",
    ).orderBy("brand")


_X383_ORACLE = """
WITH t AS (
  SELECT string_split(lower(text), ' ') AS toks FROM documents
  WHERE len(string_split(lower(text), ' ')) >= 2
),
bg AS (
  SELECT unnest(list_transform(
           range(1, len(toks)),
           i -> array_to_string(toks[i:i+1], ' '))) AS g
  FROM t
),
big AS (
  SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2,
         CAST(count(*) AS BIGINT) AS c12
  FROM bg GROUP BY 1, 2
),
ctx AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n1f
  FROM big GROUP BY w1
),
bwd AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM big GROUP BY w2
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS ntypes FROM big)
SELECT b.w1, b.w2, b.c12,
       ROUND(CAST(b.c12 AS DOUBLE) / c.c1, 8) AS p_mle,
       ROUND(CAST(GREATEST(4 * b.c12 - 3, 0) * n.ntypes
                  + 3 * c.n1f * d.n1b AS DOUBLE)
             / (4.0 * c.c1 * n.ntypes), 8) AS p_kn
FROM big b JOIN ctx c ON b.w1 = c.w1
JOIN bwd d ON b.w2 = d.w2 CROSS JOIN nt n
ORDER BY b.c12 DESC, b.w1, b.w2 LIMIT 20
"""


@register(
    "x383_kneser_ney",
    _X383_ORACLE,
    doc="interpolated Kneser-Ney bigram probabilities (Kneser & Ney "
        "1995, the smoothing KenLM popularized for corpus LM "
        "scoring), discount D=3/4, for the 20 highest-count bigrams "
        "beside their MLE: P_KN = max(c12-D,0)/c1 + D*N1+(w1.)/c1 * "
        "N1+(.w2)/Ntypes -- the CONTINUATION-count correction x52's "
        "MLE model lacks ('san francisco' gives 'francisco' high "
        "MLE unigram mass but low continuation mass). The whole "
        "probability evaluates as ONE integer rational: (max(4*c12-3"
        ",0)*Nt + 3*N1f*N1b) / (4*c1*Nt) -- D=3/4 clears the only "
        "fraction, so both engines divide identical int64s (no "
        "float accumulation anywhere); pytest proves the model "
        "normalizes: sum over the full vocab of P_KN(.|w1) = 1 "
        "exactly (seen mass + continuation mass). Scale: counts are "
        "three reuses of one bigram-type aggregate (type-, not "
        "instance-cardinality); joins are aggregate x aggregate on "
        "w1/w2 keys; Ntypes broadcasts",
)
def x383_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    # one bigram string per position; slice-zip (HOF-CSE-safe)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    bg = (
        docs.filter(F.size(toks) >= 2)
        .select(F.explode(bigrams).alias("g"))
    )
    big = (
        bg.select(
            F.split(F.col("g"), " ").getItem(0).alias("w1"),
            F.split(F.col("g"), " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .localCheckpoint(eager=False)
    )
    ctx = big.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    bwd = big.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1b")
    )
    nt = big.agg(F.count(F.lit(1)).cast("long").alias("ntypes"))
    return (
        big.join(ctx, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(nt))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(F.col("c12").cast("double") / F.col("c1"), 8).alias(
                "p_mle"
            ),
            F.round(
                (
                    F.greatest(4 * F.col("c12") - 3, F.lit(0)).cast("long")
                    * F.col("ntypes")
                    + 3 * F.col("n1f") * F.col("n1b")
                ).cast("double")
                / (4.0 * F.col("c1") * F.col("ntypes")),
                8,
            ).alias("p_kn"),
        )
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(20)
    )


_X384_ORACLE = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN b.v > a.v THEN 1
                       WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM d a JOIN d b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY 1
),
n AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM d GROUP BY 1
),
ties AS (
  SELECT event_type,
         CAST(COALESCE(SUM(tg * (tg - 1) * (2 * tg + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (
    SELECT event_type, v, CAST(count(*) AS BIGINT) AS tg
    FROM d GROUP BY 1, 2 HAVING count(*) > 1
  ) GROUP BY 1
)
SELECT n.event_type, n.n_days, s.s_stat,
       n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
         - COALESCE(t.tie_term, 0) AS var18,
       ROUND(CASE
         WHEN s.s_stat > 0 THEN (s.s_stat - 1)
           / sqrt((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                   - COALESCE(t.tie_term, 0)) / 18.0)
         WHEN s.s_stat < 0 THEN (s.s_stat + 1)
           / sqrt((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                   - COALESCE(t.tie_term, 0)) / 18.0)
         ELSE 0.0 END, 6) AS z_mk
FROM n JOIN s ON n.event_type = s.event_type
LEFT JOIN ties t ON n.event_type = t.event_type
ORDER BY n.event_type
"""


@register(
    "x384_mann_kendall",
    _X384_ORACLE,
    doc="Mann-Kendall trend test per event type over the daily "
        "revenue series: S = sum of sign(v_j - v_i) over all day "
        "pairs i<j, tie-corrected variance 18V = n(n-1)(2n+5) - "
        "sum t(t-1)(2t+5), continuity-corrected z -- the "
        "DISTRIBUTION-FREE monotone-trend test beside x198's "
        "parametric least-squares fit and x309's Theil-Sen slope "
        "estimate (MK answers 'is there a trend', Theil-Sen 'how "
        "steep'); a single outlier day moves S by at most n-1. "
        "Determinism: daily values are exact cent sums (round-then-"
        "BIGINT), S/var18 pure integers, the one sqrt+division runs "
        "per 5-row type aggregate. Scale: the pair join is "
        "aggregate x aggregate (day-cardinality, C(30,2) pairs per "
        "type -- bounded by the day domain, never by events); the "
        "corpus pays one groupBy",
)
def x384_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("v")
        )
        .localCheckpoint(eager=False)
    )
    a = d.select(
        "event_type", F.col("day").alias("di"), F.col("v").alias("vi")
    )
    b = d.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("dj"),
        F.col("v").alias("vj"),
    )
    s = (
        a.join(
            b,
            (F.col("event_type") == F.col("et2"))
            & (F.col("di") < F.col("dj")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("vj") > F.col("vi"), 1)
                .when(F.col("vj") < F.col("vi"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    ties = (
        d.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("tg"))
        .filter(F.col("tg") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tg") * (F.col("tg") - 1) * (2 * F.col("tg") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    var18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.coalesce(F.col("tie_term"), F.lit(0))
    ).cast("long")
    return (
        n.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            var18.alias("var18"),
            F.round(
                F.when(
                    F.col("s_stat") > 0,
                    (F.col("s_stat") - 1) / F.sqrt(var18 / F.lit(18.0)),
                )
                .when(
                    F.col("s_stat") < 0,
                    (F.col("s_stat") + 1) / F.sqrt(var18 / F.lit(18.0)),
                )
                .otherwise(0.0),
                6,
            ).alias("z_mk"),
        )
        .orderBy("event_type")
    )
