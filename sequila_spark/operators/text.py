"""Text-analysis operators for large-scale training-data pipelines:
language-ID (character-n-gram heuristic), quality scoring, token counting,
document fingerprinting.

These extend the reference's surface (BASELINE.json north star) — no
reference counterpart.  Everything is native Catalyst expressions (no Python
in the hot path) and every computation is deterministic and expressible in
ANSI SQL, so the DuckDB oracle can replicate it exactly:

 - counts are exact integers; every ratio is a single IEEE division;
 - fingerprints use md5 (identical across engines) and fixed-size character
   shingles.

At 100 TB these are embarrassingly parallel map-side projections — no
shuffle at all unless the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish token pattern: letter runs, digit runs, single non-alnum glyphs.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Language profiles: character bigrams whose frequency ranks differ between
# the target languages.  Deterministic heuristic — scores are occurrence
# counts; argmax with fixed-order tie-break (alphabetical language order).
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["ei", "ch", "de", "un", "sch"],
    "en": ["th", "he", "ing", " a ", "er"],
    "es": ["os", "la", "el", "ión", "es"],
    "fr": ["le", "ou", "es", "ai", "qu"],
    "zh": ["zh", "sh", "xi", "ng", "wa"],
}


def occurrences(col: Column, needle: str) -> Column:
    """Non-overlapping occurrence count of a literal substring — computed as
    a length delta so it stays a native expression (same formula as the
    DuckDB oracle)."""
    n = len(needle)
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / n
    ).cast("int")


def occurrences_sql(expr: str, needle: str) -> str:
    n = len(needle)
    esc = needle.replace("'", "''")
    return f"CAST((LENGTH({expr}) - LENGTH(REPLACE({expr}, '{esc}', ''))) / {n} AS INT)"


def ws_token_count(col: Column) -> Column:
    """Whitespace token count."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_token_count(col: Column) -> Column:
    """Count of TOKEN_PATTERN matches (letters / digits / punct glyphs)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), F.lit(0)))


def quality_metrics(col: Column) -> dict[str, Column]:
    """Quality-scoring signals: length, punctuation/digit/space/upper ratios,
    mean token length, stopword-ish ratio.  Ratios are exact-int / exact-int
    single divisions."""
    n = F.length(col)
    n_nospace = F.length(F.regexp_replace(col, r"\s", ""))
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    n_upper = F.length(F.regexp_replace(col, r"[^A-Z]", ""))
    n_punct = n_nospace - n_alpha - n_digit
    tokens = ws_token_count(col)
    # guarded denominators: empty/whitespace-only text yields 0-valued
    # ratios instead of 0/0 NaNs (counts stay exact)
    n_d = F.greatest(n, F.lit(1))
    tokens_d = F.greatest(tokens, F.lit(1))
    stop_hits = sum(
        (occurrences(F.concat(F.lit(" "), F.lower(col), F.lit(" ")), f" {w} ")
        for w in ("the", "a", "of", "and")),
        F.lit(0),
    )
    return {
        "n_chars": n.cast("int"),
        "n_tokens": tokens.cast("int"),
        "punct_ratio": (n_punct.cast("double") / n_d),
        "digit_ratio": (n_digit.cast("double") / n_d),
        "upper_ratio": (n_upper.cast("double") / n_d),
        "mean_token_len": (n_nospace.cast("double") / tokens_d),
        "stop_ratio": (stop_hits.cast("double") / tokens_d),
    }


def quality_score(col: Column) -> Column:
    """Composite [~0..1] quality score: rewards stopword presence and sane
    token length, penalizes digit/punct density.  Fixed operand order keeps
    the float bit-stable across engines."""
    m = quality_metrics(col)
    return (
        F.lit(0.5)
        + m["stop_ratio"] * 2.0
        - m["punct_ratio"] * 1.0
        - m["digit_ratio"] * 1.0
    )


def lang_scores(col: Column) -> dict[str, Column]:
    low = F.lower(col)
    return {
        lang: sum((occurrences(low, g) for g in grams), F.lit(0)).cast("int")
        for lang, grams in LANG_PROFILES.items()
    }


def lang_id(col: Column) -> Column:
    """Predicted language = argmax of profile scores, ties broken by
    alphabetical language order (deterministic).

    Shape matters: the obvious running-max chain (best = when(s_k > best,
    s_k).otherwise(best)) embeds each earlier score expression TWICE per
    level — the tree doubles per language and the early profiles' replace()
    scans evaluate up to 2^(k-1) times (measured as the dominant leg of
    text_features).  greatest() + first-equal CASE references each score
    at most twice, and the first equal match in alphabetical order is
    exactly the strict-greater chain's winner."""
    scores = lang_scores(col)
    langs = sorted(scores)  # alphabetical = tie-break order
    m = F.greatest(*[scores[lang] for lang in langs])
    best_lang = F.when(scores[langs[0]] == m, F.lit(langs[0]))
    for lang in langs[1:-1]:
        best_lang = best_lang.when(scores[lang] == m, F.lit(lang))
    return best_lang.otherwise(F.lit(langs[-1]))


def lang_id_sql(expr: str) -> str:
    """DuckDB-side replica of lang_id (same argmax + tie-break)."""
    langs = sorted(LANG_PROFILES)
    score = {
        lang: " + ".join(occurrences_sql(f"LOWER({expr})", g) for g in LANG_PROFILES[lang])
        for lang in langs
    }
    sql_best = f"'{langs[0]}'"
    sql_score = f"({score[langs[0]]})"
    for lang in langs[1:]:
        s = f"({score[lang]})"
        sql_best = f"CASE WHEN {s} > {sql_score} THEN '{lang}' ELSE {sql_best} END"
        sql_score = f"CASE WHEN {s} > {sql_score} THEN {s} ELSE {sql_score} END"
    return sql_best


def doc_fingerprint(col: Column) -> Column:
    """Whole-document md5 (identical across engines)."""
    return F.md5(col)


def shingle_fingerprint(col_name: str, k: int = 16) -> Column:
    """Winnowing-style rolling fingerprint: minimum md5 over all k-char
    shingles of column ``col_name`` — robust to local edits.  Implemented via
    F.expr because the lambda needs substr with a variable start."""
    return F.expr(
        f"array_min(transform(sequence(1, greatest(length({col_name}) - {k - 1}, 1)),"
        f" i -> md5(substr({col_name}, i, {k}))))"
    )


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop projection of all text-analysis columns."""
    c = F.col(text_col)
    m = quality_metrics(c)
    # quality inlined from the SAME metrics dict (quality_score(c) would
    # build a second identical metrics tree in this projection)
    quality = (
        F.lit(0.5)
        + m["stop_ratio"] * 2.0
        - m["punct_ratio"] * 1.0
        - m["digit_ratio"] * 1.0
    )
    return df.select(
        "*",
        m["n_tokens"].alias("ws_tokens"),
        bpe_token_count(c).alias("bpe_tokens"),
        quality.alias("quality"),
        lang_id(c).alias("lang_pred"),
        doc_fingerprint(c).alias("fp_md5"),
        shingle_fingerprint(text_col).alias("fp_shingle"),
    )
