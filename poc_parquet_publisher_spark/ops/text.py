"""Text analysis operators: language-ID, quality scoring, token counting,
fingerprinting. All pure built-in expressions (narrow, shuffle-free,
whole-stage-codegen) -- at 100 TB these run at parquet-scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-vote heuristic.
# Order matters: ties resolve to the earlier language.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "fr": ("le", "les", "des", "et", "une", "pour", "dans"),
    "de": ("der", "die", "das", "und", "ist", "von", "nicht"),
}

TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _toks(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(c), " ")


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    toks = _toks(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0)
        )
        .cast("long")
        .alias("n_re_tokens"),
        F.octet_length(text_col).cast("long").alias("n_bytes"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: length, mean token length, stopword
    ratio, alpha ratio. Round(4) doubles for oracle determinism."""
    toks = _toks(text_col)
    n_toks = F.size(toks).cast("long")
    non_space_len = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    stop = _count_in(toks, LANG_STOPWORDS["en"])
    alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", ""))
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars_m"),
        n_toks.alias("n_toks"),
        F.round(non_space_len.cast("double") / n_toks, 4).alias("avg_tok_len"),
        F.round(stop.cast("double") / n_toks, 4).alias("stop_ratio"),
        F.round(
            alpha.cast("double") / F.length(text_col).cast("double"), 4
        ).alias("alpha_ratio"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-vote language ID: per-language hit counts + argmax.

    Ties break in LANG_STOPWORDS declaration order (en first), which the
    matching oracle SQL reproduces with the same CASE ladder.
    """
    toks = _toks(text_col)
    scores = {
        lang: _count_in(toks, words) for lang, words in LANG_STOPWORDS.items()
    }
    langs = list(LANG_STOPWORDS)
    pred = F.lit(langs[-1])
    # build the CASE ladder back-to-front so earlier languages win ties
    for i in range(len(langs) - 1, -1, -1):
        cond = None
        for j in range(i + 1, len(langs)):
            c = F.col(f"score_{langs[i]}") >= F.col(f"score_{langs[j]}")
            cond = c if cond is None else (cond & c)
        if cond is None:
            continue
        pred = F.when(cond, F.lit(langs[i])).otherwise(pred)
    scored = df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
    )
    return scored.withColumn("pred_lang", pred)


def lang_id_oracle_sql(source: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB SQL mirroring ``lang_id`` exactly (same CASE ladder)."""
    langs = list(LANG_STOPWORDS)
    score_cols = []
    for lang in langs:
        inlist = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        score_cols.append(
            "CAST(len(list_filter(string_split(lower(text), ' '), "
            f"t -> t IN ({inlist}))) AS BIGINT) AS score_{lang}"
        )
    whens = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"score_{lang} >= score_{other}" for other in langs[i + 1 :]
        )
        whens.append(f"WHEN {conds} THEN '{lang}'")
    case = f"CASE {' '.join(whens)} ELSE '{langs[-1]}' END AS pred_lang"
    return (
        f"SELECT {id_col}, {', '.join(f'score_{lang}' for lang in langs)}, {case} "
        f"FROM (SELECT {id_col}, {', '.join(score_cols)} FROM {source}) "
        f"ORDER BY {id_col}"
    )


def rolling_fingerprint(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """Per-document rolling-hash fingerprint (winnowing-style).

    md5 each ``window``-token shingle, keep the per-document minimum hash
    as the document fingerprint (a 1-sample winnow). Expression-only.
    Tokens are bound as an attribute before the transform so split() runs
    once per row, not once per shingle position (the HOF-lambda CSE trap;
    see ops/dedup.py shingles()).
    """
    toks = F.col("__toks")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0))),
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(window)]
            )
        ),
    )
    return (
        df.select(F.col(id_col), _toks(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.array_min(sh).alias("min_shingle_hash"),
        )
    )


def rolling_fingerprint_oracle_sql(
    source: str = "documents", id_col: str = "doc_id", window: int = 8
) -> str:
    """DuckDB SQL mirroring ``rolling_fingerprint``.

    Spark's concat_ws skips the nulls element_at yields past the array
    end; DuckDB's slice truncates at the list end -- identical shingle
    text for documents shorter than the window either way.
    """
    return (
        f"WITH t AS (SELECT {id_col}, string_split(lower(text), ' ') AS toks"
        f" FROM {source}) "
        f"SELECT {id_col}, list_min(list_transform("
        f"range(1, greatest(len(toks) - {window} + 1, 1) + 1), "
        f"i -> md5(array_to_string(toks[i:i+{window - 1}], ' ')))) "
        f"AS min_shingle_hash FROM t ORDER BY {id_col}"
    )
