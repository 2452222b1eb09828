"""Extension entries x544/x546+ (round-8 wave): time-series structure
diagnostics that extend the x503-x512 battery -- the ORDINAL-pattern
complexity lens (permutation entropy: distribution-free, outlier-
immune, where x512's Hurst is moment-based), and the AR-order
identification panel (Yule-Walker AR(2) + partial autocorrelations
via Durbin-Levinson) that turns x510's raw ACF into the
'which lags matter DIRECTLY' answer model selection needs.

Engine-exactness recipes follow the proven registry contracts
(SURVEY.md section 5.3): daily revenue quantizes to exact integer
cents; pattern counts are exact integers; ACFs reuse x510's
n-scaled integer centering identity and round BEFORE any derived
algebra so both engines run the identical double expression;
calendar equi-joins pair lagged days (gap days drop pairs, stated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...catalog import load_table
from .. import register


_X544_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1
),
tri AS (
  SELECT a.y AS y0, b.y AS y1, c.y AS y2
  FROM daily a
  JOIN daily b ON b.day = a.day + 1
  JOIN daily c ON c.day = a.day + 2
),
pat AS (
  SELECT CASE
    WHEN y0 <= y1 AND y1 <= y2 THEN '012'
    WHEN y0 <= y1 AND y1 > y2 AND y0 <= y2 THEN '021'
    WHEN y0 <= y1 AND y1 > y2 AND y0 > y2 THEN '201'
    WHEN y0 > y1 AND y0 <= y2 THEN '102'
    WHEN y0 > y1 AND y0 > y2 AND y1 <= y2 THEN '120'
    ELSE '210' END AS p
  FROM tri
),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN p = '012' THEN 1 ELSE 0 END) AS BIGINT) AS c012,
    CAST(SUM(CASE WHEN p = '021' THEN 1 ELSE 0 END) AS BIGINT) AS c021,
    CAST(SUM(CASE WHEN p = '102' THEN 1 ELSE 0 END) AS BIGINT) AS c102,
    CAST(SUM(CASE WHEN p = '120' THEN 1 ELSE 0 END) AS BIGINT) AS c120,
    CAST(SUM(CASE WHEN p = '201' THEN 1 ELSE 0 END) AS BIGINT) AS c201,
    CAST(SUM(CASE WHEN p = '210' THEN 1 ELSE 0 END) AS BIGINT) AS c210
  FROM pat
)
SELECT n AS n_triples, c012, c021, c102, c120, c201, c210,
  ROUND(-(
    (CASE WHEN c012 = 0 THEN 0.0 ELSE (CAST(c012 AS DOUBLE) / n)
          * ln(CAST(c012 AS DOUBLE) / n) END)
    + (CASE WHEN c021 = 0 THEN 0.0 ELSE (CAST(c021 AS DOUBLE) / n)
            * ln(CAST(c021 AS DOUBLE) / n) END)
    + (CASE WHEN c102 = 0 THEN 0.0 ELSE (CAST(c102 AS DOUBLE) / n)
            * ln(CAST(c102 AS DOUBLE) / n) END)
    + (CASE WHEN c120 = 0 THEN 0.0 ELSE (CAST(c120 AS DOUBLE) / n)
            * ln(CAST(c120 AS DOUBLE) / n) END)
    + (CASE WHEN c201 = 0 THEN 0.0 ELSE (CAST(c201 AS DOUBLE) / n)
            * ln(CAST(c201 AS DOUBLE) / n) END)
    + (CASE WHEN c210 = 0 THEN 0.0 ELSE (CAST(c210 AS DOUBLE) / n)
            * ln(CAST(c210 AS DOUBLE) / n) END)
  ) / ln(6.0), 6) AS norm_perm_entropy
FROM c
"""


@register(
    "x544_permutation_entropy",
    _X544_ORACLE,
    doc="Bandt-Pompe permutation entropy (order 3) of daily revenue: "
        "classify every consecutive-calendar day triple by the "
        "ordinal pattern of its values (ties broken by time index, "
        "the BP convention: (y_i,i) keys give a total order, so "
        "exactly one of the 6 patterns holds) and report the "
        "normalized Shannon entropy of the pattern distribution -- "
        "1.0 = patterns equiprobable (complex/noisy), low = a few "
        "motifs dominate (deterministic structure); the ordinal, "
        "outlier-immune complexity lens beside x488's turning-point "
        "count (one pattern statistic), x512's moment-based Hurst "
        "and x510's linear-only ACF. Exactness: pattern counts are "
        "exact integers off integer-cent comparisons; the 6-term "
        "entropy sum is one fixed-order double expression with "
        "explicit 0*ln(0)=0 guards, round 6. Scale: one day-grain "
        "aggregate + two calendar equi-joins (gap days drop "
        "triples, stated), then a 1-row fold",
)
def x544_permutation_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("long"))
        .cast("long")
        .alias("y")
    )
    a = daily.select(F.col("day").alias("d0"), F.col("y").alias("y0"))
    b = daily.select(F.col("day").alias("d1"), F.col("y").alias("y1"))
    c = daily.select(F.col("day").alias("d2"), F.col("y").alias("y2"))
    tri = a.join(b, F.col("d1") == F.date_add("d0", 1)).join(
        c, F.col("d2") == F.date_add("d0", 2)
    )
    y0, y1, y2 = F.col("y0"), F.col("y1"), F.col("y2")
    pat = tri.select(
        F.when((y0 <= y1) & (y1 <= y2), "012")
        .when((y0 <= y1) & (y1 > y2) & (y0 <= y2), "021")
        .when((y0 <= y1) & (y1 > y2) & (y0 > y2), "201")
        .when((y0 > y1) & (y0 <= y2), "102")
        .when((y0 > y1) & (y0 > y2) & (y1 <= y2), "120")
        .otherwise("210")
        .alias("p")
    )
    cnt = lambda s: (  # noqa: E731
        F.sum(F.when(F.col("p") == s, 1).otherwise(0))
        .cast("long")
        .alias("c" + s)
    )
    cdf = pat.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        cnt("012"),
        cnt("021"),
        cnt("102"),
        cnt("120"),
        cnt("201"),
        cnt("210"),
    )
    nd = F.col("n").cast("double")

    def term(s: str):
        cd = F.col("c" + s).cast("double")
        return F.when(F.col("c" + s) == 0, F.lit(0.0)).otherwise(
            (cd / nd) * F.log(cd / nd)
        )

    ent = -(
        term("012")
        + term("021")
        + term("102")
        + term("120")
        + term("201")
        + term("210")
    ) / F.log(F.lit(6.0))
    return cdf.select(
        F.col("n").alias("n_triples"),
        "c012",
        "c021",
        "c102",
        "c120",
        "c201",
        "c210",
        F.round(ent, 6).alias("norm_perm_entropy"),
    )


_X546_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(y) AS HUGEINT) AS s
  FROM daily
),
c AS (
  SELECT d.day, CAST(t.n AS HUGEINT) * d.y - t.s AS cv
  FROM daily d, tot t
),
den AS (SELECT CAST(SUM(cv * cv) AS HUGEINT) AS d2 FROM c),
lags AS (SELECT * FROM (VALUES (1), (2), (3)) AS l(lag)),
num AS (
  SELECT l.lag, CAST(SUM(a.cv * b.cv) AS HUGEINT) AS nk
  FROM lags l
  JOIN c a ON TRUE
  JOIN c b ON b.day = a.day + CAST(l.lag AS INTEGER)
  GROUP BY 1
),
r AS (
  SELECT
    MAX(CASE WHEN lag = 1 THEN ROUND(CAST(nk AS DOUBLE)
         / CAST(den.d2 AS DOUBLE), 10) END) AS r1,
    MAX(CASE WHEN lag = 2 THEN ROUND(CAST(nk AS DOUBLE)
         / CAST(den.d2 AS DOUBLE), 10) END) AS r2,
    MAX(CASE WHEN lag = 3 THEN ROUND(CAST(nk AS DOUBLE)
         / CAST(den.d2 AS DOUBLE), 10) END) AS r3
  FROM num, den
),
dl AS (
  SELECT r1, r2, r3,
         r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
         (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2
  FROM r
)
SELECT ROUND(r1, 6) AS acf1, ROUND(r2, 6) AS acf2,
       ROUND(r3, 6) AS acf3,
       ROUND(r1, 6) AS pacf1,
       ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6) AS pacf2,
       ROUND((r3 - phi1 * r2 - phi2 * r1)
             / (1.0 - phi1 * r1 - phi2 * r2), 6) AS pacf3,
       ROUND(phi1, 6) AS ar2_phi1,
       ROUND(phi2, 6) AS ar2_phi2,
       ROUND(1.0 - phi1 * r1 - phi2 * r2, 6)
         AS ar2_innovation_ratio
FROM dl
"""


@register(
    "x546_yule_walker_pacf",
    _X546_ORACLE,
    doc="Yule-Walker AR(2) fit + partial autocorrelations (lags 1-3) "
        "of daily revenue via the Durbin-Levinson recursion: pacf2 "
        "= (r2-r1^2)/(1-r1^2), AR(2) coefficients phi1 = "
        "r1(1-r2)/(1-r1^2), phi2 = pacf2, pacf3 from the stage-2 "
        "coefficients, plus the innovation-variance ratio 1 - "
        "phi1*r1 - phi2*r2 (share of variance the AR(2) does NOT "
        "explain) -- the ORDER-identification panel that turns "
        "x510's raw ACF into 'which lags matter DIRECTLY' (an "
        "AR(1) has r2 = r1^2 exactly; pacf2 is the excess), the "
        "model-selection companion x484 (DW), x510 (whiteness) "
        "and x511 (VR) stop short of. Exactness: autocovariances "
        "reuse x510's n-scaled integer-centering identity (exact "
        "HUGEINT/DECIMAL sums, n^2 cancels in r_k); each r_k "
        "rounds 10 BEFORE the recursion so both engines run the "
        "identical fixed-order double algebra; calendar equi-join "
        "lag pairing (gap days drop pairs, stated). Scale: one "
        "day-grain aggregate, 3 day-domain equi-joins, constant "
        "algebra",
)
def x546_yule_walker_pacf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("long"))
        .cast("long")
        .alias("y")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("s"),
    )
    c = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        (F.col("n").cast("decimal(38,0)") * F.col("y") - F.col("s"))
        .cast("decimal(38,0)")
        .alias("cv"),
    ).localCheckpoint(eager=False)
    den = c.agg(
        F.sum(F.col("cv") * F.col("cv"))
        .cast("decimal(38,0)")
        .alias("d2")
    )
    lags = spark.createDataFrame([(k,) for k in (1, 2, 3)], "lag int")
    a = c.select(F.col("day").alias("da"), F.col("cv").alias("ca"))
    b = c.select(F.col("day").alias("db"), F.col("cv").alias("cb"))
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.expr("date_add(da, lag)"))
        .groupBy("lag")
        .agg(
            F.sum(F.col("ca") * F.col("cb"))
            .cast("decimal(38,0)")
            .alias("nk")
        )
    )
    acf = F.round(
        F.col("nk").cast("double") / F.col("d2").cast("double"), 10
    )
    r = (
        num.crossJoin(F.broadcast(den))
        .select("lag", acf.alias("acf"))
        .agg(
            F.max(F.when(F.col("lag") == 1, F.col("acf"))).alias("r1"),
            F.max(F.when(F.col("lag") == 2, F.col("acf"))).alias("r2"),
            F.max(F.when(F.col("lag") == 3, F.col("acf"))).alias("r3"),
        )
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    return r.select(
        F.round(r1, 6).alias("acf1"),
        F.round(r2, 6).alias("acf2"),
        F.round(r3, 6).alias("acf3"),
        F.round(r1, 6).alias("pacf1"),
        F.round((r2 - r1 * r1) / (1.0 - r1 * r1), 6).alias("pacf2"),
        F.round(
            (r3 - phi1 * r2 - phi2 * r1)
            / (1.0 - phi1 * r1 - phi2 * r2),
            6,
        ).alias("pacf3"),
        F.round(phi1, 6).alias("ar2_phi1"),
        F.round(phi2, 6).alias("ar2_phi2"),
        F.round(1.0 - phi1 * r1 - phi2 * r2, 6).alias(
            "ar2_innovation_ratio"
        ),
    )
