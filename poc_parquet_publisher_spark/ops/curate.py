"""End-to-end corpus curation: the composed pre-training data pipeline.

One call chains the individual operators this package provides --
scrub -> quality gate -> language gate -> exact dedup -> near-dup
removal -> split assignment -- in the order a production pipeline runs
them (cheap narrow filters first so every later shuffle sees fewer
rows; the near-dup join, the only expensive stage, runs last on the
already-shrunk corpus).

Everything stays a DataFrame plan end to end: one action materializes
the curated corpus, and Catalyst fuses the narrow stages into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, sampling, text


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    min_alpha_ratio: float = 0.05,
    languages: tuple[str, ...] = ("en",),
    near_dup_jaccard: float = 0.8,
    test_fraction: float = 0.05,
) -> DataFrame:
    """Returns (id, scrubbed text, pred_lang, split) for surviving docs.

    Survivorship rules: PII/URL spans scrubbed; token count within
    [min_tokens, max_tokens] and alpha ratio >= threshold; predicted
    language in ``languages``; exactly-duplicate texts keep the smallest
    id; each near-duplicate cluster (connected component of shingle-
    Jaccard >= threshold pairs) keeps only its smallest id. Split
    assignment is a pure
    hash of the id, so reruns and rescales never reshuffle the holdout.
    """
    scrubbed = text.scrub(docs, id_col, text_col).withColumnRenamed(
        "scrubbed", text_col
    )

    # quality + language gates are row-local expressions: compute them
    # INLINE in one projection (no id-joins -- a join per gate would put
    # two full shuffles in front of a narrow filter)
    n_toks = F.size(F.split(F.lower(F.col(text_col)), " ")).cast("long")
    alpha = F.length(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", "")
    )
    alpha_ratio = alpha.cast("double") / F.length(text_col).cast("double")
    kept = (
        scrubbed.withColumn("pred_lang", text.lang_pred_column(text_col))
        .filter(
            (n_toks >= min_tokens)
            & (n_toks <= max_tokens)
            & (alpha_ratio >= min_alpha_ratio)
            & F.col("pred_lang").isin(*languages)
        )
        .select(id_col, text_col, "pred_lang")
        # the gated corpus feeds three consumers (pair generation, the
        # exact-dedup probe, the final anti-join); materialize it once
        # instead of re-running scrub+gates per consumer. At cluster
        # scale this is the standard persist-the-reused-intermediate
        # call: the gated corpus is already the post-filter survivor
        # set, far smaller than the input scan.
        .localCheckpoint()
    )

    # exact dedup: smallest id per identical text survives. Measured
    # alternative (min(id) over a text-hash window, one shuffle instead
    # of agg+semi-join): identical wall at sf0.1 -- the pipeline cost is
    # stage count, not this join -- and strictly worse under skew: a
    # heavily-duplicated text serializes into one window partition,
    # while the agg's map-side combine + AQE skew-join absorb it.
    survivors = dedup.exact_dedup(kept, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    kept = kept.join(survivors, id_col, "left_semi")

    # near-dup removal, transitively: connected components over the
    # qualifying pairs, keep only each cluster's minimum id. (Greedy
    # per-pair dropping is wrong under chains: dropping b of (a,b) and
    # (b,c) leaves both a and c alive even though a~b~c.)
    pairs = dedup.ngram_jaccard_pairs(
        kept, id_col, text_col, k=3, threshold=near_dup_jaccard
    )
    drop = (
        dedup.duplicate_clusters(pairs)
        .filter(F.col("node") != F.col("rep"))
        .select(F.col("node").alias(id_col))
    )
    kept = kept.join(drop, id_col, "left_anti")

    return sampling.deterministic_split(
        kept, id_col, test_fraction=test_fraction
    )
