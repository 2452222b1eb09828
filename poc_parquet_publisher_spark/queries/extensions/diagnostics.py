"""Extension entries x472+: the round-7 continuation wave --
corpus-measurement diagnostics that close remaining blind spots of
the x430-x471 inference wave: linear intrinsic dimensionality (the
spectral complement to x439's fractal two-NN estimator), annotation
reliability under MISSING ratings (where x298/x391 require complete
panels), and frequency-weighted similarity grains the set-based dedup
tiers (x03/x40/x376) cannot see.

Engine-exactness recipes follow the proven registry contracts
(SURVEY.md section 5.3): power-of-two quantization (IEEE-exact
multiply then floor) turns float payloads into integers before any
cross-row sum; sums accumulate in DECIMAL(38,0); divisions happen in
DOUBLE with fixed operand order; ROUND guards every emitted float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...catalog import load_table
from .. import register


_X472_ORACLE = """
WITH q AS (
  SELECT vec_id,
         list_transform(
           embedding,
           v -> CAST(floor(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)
         ) AS qv
  FROM embeddings
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
pos AS (
  SELECT vec_id, t.j, qv[t.j] AS x
  FROM q, UNNEST(range(1, 65)) AS t(j)
),
marg AS (
  SELECT j, CAST(SUM(x) AS HUGEINT) AS s FROM pos GROUP BY 1
),
pairs AS (
  SELECT a.j AS j, b.j AS k,
         CAST(SUM(a.x * b.x) AS HUGEINT) AS p
  FROM pos a
  JOIN pos b ON a.vec_id = b.vec_id AND a.j <= b.j
  GROUP BY 1, 2
),
cov AS (
  SELECT p.j, p.k,
         CAST(floor(
           CAST(CAST(t.n AS HUGEINT) * p.p
                - mj.s * mk.s AS DOUBLE)
           / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE))
           / 1099511627776.0
           * 1000000000.0
         ) AS BIGINT) AS c
  FROM pairs p
  JOIN marg mj ON mj.j = p.j
  JOIN marg mk ON mk.j = p.k
  CROSS JOIN tot t
),
moments AS (
  SELECT
    CAST(SUM(CASE WHEN j = k THEN c ELSE 0 END)
         AS HUGEINT) AS tr_q,
    CAST(SUM(c * c * (CASE WHEN j = k THEN 1 ELSE 2 END))
         AS HUGEINT) AS fb_q
  FROM cov
)
SELECT
  CAST(64 AS BIGINT) AS dim,
  ROUND(CAST(tr_q AS DOUBLE) / 1000000000.0, 6) AS trace_cov,
  ROUND(CAST(fb_q AS DOUBLE) / 1e18, 9) AS frob2_cov,
  ROUND((CAST(tr_q AS DOUBLE) / 1000000000.0)
        * (CAST(tr_q AS DOUBLE) / 1000000000.0)
        / (CAST(fb_q AS DOUBLE) / 1e18), 4) AS participation_ratio,
  ROUND((CAST(tr_q AS DOUBLE) / 1000000000.0)
        * (CAST(tr_q AS DOUBLE) / 1000000000.0)
        / (CAST(fb_q AS DOUBLE) / 1e18) / 64.0, 6) AS pr_over_d
FROM moments
"""


@register(
    "x472_participation_ratio",
    _X472_ORACLE,
    doc="linear intrinsic dimensionality of the embedding cloud via "
        "the participation ratio PR = tr(C)^2 / ||C||_F^2 of the "
        "covariance matrix -- the eigenvalue-spread summary "
        "((sum lambda)^2 / sum lambda^2) that needs NO "
        "eigendecomposition because tr(C) and ||C||_F^2 are plain "
        "moment sums: the spectral complement to x439's two-NN "
        "fractal dimension (x439 measures the manifold the points "
        "LIE on, PR measures how many principal axes carry variance "
        "-- a PCA-truncation (x364) and JL-target (x229) sizing "
        "input). Exactness: coordinates quantize by IEEE-exact "
        "2^20 multiply-then-floor (x228's recipe), so S_j and "
        "S_jk are exact DECIMAL integer sums; each covariance cell "
        "is one fixed-order DOUBLE division re-quantized to 1e-9 "
        "before squaring, so the d^2 moment sums are again exact "
        "integers. Scale: per-row local pair expansion (d(d+1)/2 "
        "structs) feeds ONE hash aggregate with d^2-bounded state "
        "-- map-side combine shrinks the shuffle to 2080 keys per "
        "partition regardless of corpus size; everything after is "
        "a 64-row broadcast join",
)
def x472_participation_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        F.transform(
            "embedding",
            lambda v: F.floor(
                v.cast("double") * F.lit(1048576.0)
            ).cast("long"),
        ).alias("qv")
    )
    tot = q.agg(F.count(F.lit(1)).cast("long").alias("n"))
    marg = (
        q.select(F.posexplode("qv").alias("j", "x"))
        .groupBy("j")
        .agg(F.sum(F.col("x").cast("decimal(38,0)")).alias("s"))
    )
    pairs = (
        q.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, 63), j -> "
                    "transform(sequence(j, 63), k -> "
                    "struct(j as j, k as k, qv[j] * qv[k] as xp))))"
                )
            ).alias("e")
        )
        .select("e.j", "e.k", "e.xp")
        .groupBy("j", "k")
        .agg(F.sum(F.col("xp").cast("decimal(38,0)")).alias("p"))
    )
    mj = marg.select(F.col("j").alias("jj"), F.col("s").alias("sj"))
    mk = marg.select(F.col("j").alias("kk"), F.col("s").alias("sk"))
    cov = (
        pairs.join(F.broadcast(mj), F.col("j") == F.col("jj"))
        .join(F.broadcast(mk), F.col("k") == F.col("kk"))
        .crossJoin(F.broadcast(tot))
        .select(
            "j",
            "k",
            F.floor(
                (
                    F.col("n").cast("decimal(38,0)") * F.col("p")
                    - F.col("sj") * F.col("sk")
                ).cast("double")
                / (F.col("n").cast("double") * F.col("n").cast("double"))
                / F.lit(1099511627776.0)
                * F.lit(1000000000.0)
            )
            .cast("long")
            .alias("c"),
        )
    )
    mom = cov.agg(
        F.sum(
            F.when(F.col("j") == F.col("k"), F.col("c")).otherwise(
                F.lit(0)
            )
        )
        .cast("decimal(38,0)")
        .alias("tr_q"),
        F.sum(
            F.col("c")
            * F.col("c")
            * F.when(F.col("j") == F.col("k"), F.lit(1)).otherwise(
                F.lit(2)
            )
        )
        .cast("decimal(38,0)")
        .alias("fb_q"),
    )
    tr = F.col("tr_q").cast("double") / F.lit(1000000000.0)
    fb = F.col("fb_q").cast("double") / F.lit(1e18)
    return mom.select(
        F.lit(64).cast("long").alias("dim"),
        F.round(tr, 6).alias("trace_cov"),
        F.round(fb, 9).alias("frob2_cov"),
        F.round(tr * tr / fb, 4).alias("participation_ratio"),
        F.round(tr * tr / fb / F.lit(64.0), 6).alias("pr_over_d"),
    )


_X473_ORACLE = """
WITH r AS (
  SELECT
    doc_id,
    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS r1,
    CASE WHEN len(string_split(text, ' ')) < 5 THEN NULL
         WHEN text LIKE '% the %' THEN 1 ELSE 0 END AS r2,
    CASE WHEN length(text) < 30 THEN NULL
         WHEN length(regexp_replace(text, '[^0-9]', '', 'g')) * 20
              <= length(text) THEN 1 ELSE 0 END AS r3
  FROM documents
),
long_r AS (
  SELECT doc_id, 1 AS rater, r1 AS val FROM r WHERE r1 IS NOT NULL
  UNION ALL
  SELECT doc_id, 2 AS rater, r2 AS val FROM r WHERE r2 IS NOT NULL
  UNION ALL
  SELECT doc_id, 3 AS rater, r3 AS val FROM r WHERE r3 IS NOT NULL
),
units AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS m
  FROM long_r GROUP BY 1 HAVING count(*) >= 2
),
coinc AS (
  SELECT a.val AS c, b.val AS k,
         CAST(SUM(2 // (u.m - 1)) AS HUGEINT) AS o2
  FROM long_r a
  JOIN long_r b ON a.doc_id = b.doc_id AND a.rater <> b.rater
  JOIN units u ON u.doc_id = a.doc_id
  GROUP BY 1, 2
),
margin AS (
  SELECT c, CAST(SUM(o2) AS HUGEINT) AS n2 FROM coinc GROUP BY 1
),
sums AS (
  SELECT
    (SELECT CAST(SUM(o2) AS HUGEINT) FROM coinc
     WHERE c <> k) AS do2,
    (SELECT CAST(SUM(a.n2 * b.n2) AS HUGEINT)
     FROM margin a, margin b WHERE a.c <> b.c) AS de2,
    (SELECT CAST(SUM(n2) AS HUGEINT) FROM margin) AS ntot2,
    (SELECT CAST(count(*) AS BIGINT) FROM units) AS n_units,
    (SELECT CAST(SUM(m) AS BIGINT) FROM units) AS n_ratings
)
SELECT
  n_units, n_ratings,
  ROUND(CAST(do2 AS DOUBLE) / CAST(ntot2 AS DOUBLE), 6)
    AS observed_disagreement,
  ROUND(CAST(de2 AS DOUBLE)
        / (CAST(ntot2 AS DOUBLE) * (CAST(ntot2 AS DOUBLE) - 2.0)), 6)
    AS expected_disagreement,
  ROUND(1.0 - CAST(do2 AS DOUBLE)
              * (CAST(ntot2 AS DOUBLE) - 2.0)
              / CAST(de2 AS DOUBLE), 6) AS krippendorff_alpha
FROM sums
"""


@register(
    "x473_krippendorff_alpha",
    _X473_ORACLE,
    doc="Krippendorff's alpha (nominal) over three deterministic "
        "quality raters of which two ABSTAIN on short texts -- the "
        "reliability coefficient for ragged annotation panels that "
        "x298 (Cohen, exactly 2 raters) and x391 (Fleiss, complete "
        "panels only) cannot produce, and the one a crowd-labeling "
        "pipeline with per-item rater dropout actually needs. "
        "Exactness: with unit sizes m in {2,3}, every coincidence "
        "cell scaled by 2 is an exact integer (2/(m-1) in {1,2}), "
        "so Do, De, and the marginals are DECIMAL integer sums and "
        "alpha = 1 - Do2*(N2-2)/De2 is ONE double division. "
        "Raters: length gate, '% the %' stopword gate (abstains "
        "under 5 tokens), digit-ratio gate via the integer cross "
        "product digits*20 <= chars (abstains under 30 chars). "
        "Scale: ratings are per-row local expressions; the pair "
        "expansion is in-row over a <=3-element array (no join); "
        "one 2x2-keyed hash aggregate ends the plan",
)
def x473_krippendorff_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    r1 = F.when(F.col("n_chars") >= 200, F.lit(1)).otherwise(F.lit(0))
    r2 = F.when(
        F.size(F.split(F.col("text"), " ")) < 5, F.lit(None)
    ).otherwise(
        F.when(F.col("text").like("% the %"), F.lit(1)).otherwise(
            F.lit(0)
        )
    )
    r3 = F.when(
        F.length("text") < 30, F.lit(None)
    ).otherwise(
        F.when(
            F.length(F.regexp_replace("text", "[^0-9]", "")) * 20
            <= F.length("text"),
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    vals = docs.select(
        F.filter(
            F.array(
                r1.cast("int"), r2.cast("int"), r3.cast("int")
            ),
            lambda x: x.isNotNull(),
        ).alias("vals")
    ).filter(F.size("vals") >= 2)
    # In-row ordered-pair expansion: every (i, j) index pair with
    # i != j contributes 2/(m-1) (an exact integer for m in {2,3})
    # to coincidence cell (vals[i], vals[j]).
    coinc = (
        vals.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform("
                    "sequence(0, size(vals) - 1), i -> "
                    "transform(sequence(0, size(vals) - 1), j -> "
                    "if(i != j, struct(vals[i] as c, vals[j] as k, "
                    "2 div (size(vals) - 1) as w), null)))), "
                    "x -> x is not null)"
                )
            ).alias("e")
        )
        .select("e.c", "e.k", "e.w")
        .groupBy("c", "k")
        .agg(F.sum(F.col("w").cast("decimal(38,0)")).alias("o2"))
    )
    margin = coinc.groupBy("c").agg(
        F.sum("o2").cast("decimal(38,0)").alias("n2")
    )
    do2 = coinc.filter(F.col("c") != F.col("k")).agg(
        F.sum("o2").cast("decimal(38,0)").alias("do2")
    )
    de2 = (
        margin.alias("a")
        .crossJoin(F.broadcast(margin.alias("b")))
        .filter(F.col("a.c") != F.col("b.c"))
        .agg(
            F.sum(F.col("a.n2") * F.col("b.n2"))
            .cast("decimal(38,0)")
            .alias("de2")
        )
    )
    ntot = margin.agg(
        F.sum("n2").cast("decimal(38,0)").alias("ntot2")
    )
    counts = vals.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(F.size("vals")).cast("long").alias("n_ratings"),
    )
    ntot_d = F.col("ntot2").cast("double")
    return (
        counts.crossJoin(F.broadcast(do2))
        .crossJoin(F.broadcast(de2))
        .crossJoin(F.broadcast(ntot))
        .select(
            "n_units",
            "n_ratings",
            F.round(
                F.col("do2").cast("double") / ntot_d, 6
            ).alias("observed_disagreement"),
            F.round(
                F.col("de2").cast("double")
                / (ntot_d * (ntot_d - F.lit(2.0))),
                6,
            ).alias("expected_disagreement"),
            F.round(
                F.lit(1.0)
                - F.col("do2").cast("double")
                * (ntot_d - F.lit(2.0))
                / F.col("de2").cast("double"),
                6,
            ).alias("krippendorff_alpha"),
        )
    )
