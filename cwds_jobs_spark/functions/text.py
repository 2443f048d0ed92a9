"""Text analysis for training-data pipelines — all native column
expressions (JVM-side, codegen) unless noted.

These are the operations a 100 TB corpus pipeline runs per document:
token counting, language ID, quality scoring, fingerprinting.  Every
function returns a ``Column`` so Catalyst can fuse them into one
projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small per-language stopword probes for the n-gram/stopword heuristic
_LANG_PROBES = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "fr": ["le", "la", "les", "des", "est", "dans", "une", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
}


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    t = F.trim(_c(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def word_token_count(col: str | Column) -> Column:
    """BPE-ish token proxy: word pieces + standalone punctuation."""
    return F.regexp_count(_c(col), F.lit(r"\w+|[^\w\s]")).cast("long")


def _probe_score(col: Column, words: list[str]) -> Column:
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.regexp_count(col, F.lit(pat)).cast("double")


def lang_scores(col: str | Column) -> Column:
    """array<struct<score,lang>> of stopword-probe hits per language."""
    c = _c(col)
    return F.array(
        *[
            F.struct(
                _probe_score(c, ws).alias("score"), F.lit(lang).alias("lang")
            )
            for lang, ws in _LANG_PROBES.items()
        ]
    )


def lang_id(col: str | Column) -> Column:
    """Argmax language; 'und' when no probe hits."""
    best = F.array_max(lang_scores(col))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def punct_ratio(col: str | Column) -> Column:
    c = _c(col)
    n = F.length(c)
    return F.when(n > 0, F.regexp_count(c, F.lit(r"[^\w\s]")) / n).otherwise(F.lit(0.0))


def stopword_ratio(col: str | Column, lang: str = "en") -> Column:
    c = _c(col)
    toks = token_count(c)
    return F.when(toks > 0, _probe_score(c, _LANG_PROBES[lang]) / toks).otherwise(
        F.lit(0.0)
    )


def quality_score(col: str | Column) -> Column:
    """Heuristic [0,1] doc quality: length band + punctuation sanity +
    stopword presence (the classic C4-style filters, condensed)."""
    c = _c(col)
    n = F.length(c).cast("double")
    len_score = F.least(n / 200.0, F.lit(1.0)) * F.when(n > 20000, 0.5).otherwise(1.0)
    p = punct_ratio(c)
    punct_score = F.when((p > 0.005) & (p < 0.2), 1.0).otherwise(0.5)
    sw = stopword_ratio(c)
    sw_score = F.when(sw > 0.05, 1.0).otherwise(F.lit(0.3))
    return F.round((0.4 * len_score + 0.3 * punct_score + 0.3 * sw_score), 6)


def repetition_ratio(col: str | Column) -> Column:
    """Duplicate-line fraction: 1 - distinct_lines/lines (the C4-style
    boilerplate signal).  Native split/array ops, no UDF."""
    c = _c(col)
    lines = F.filter(F.split(c, r"\n"), lambda x: F.trim(x) != "")
    n = F.size(lines)
    return F.when(
        n > 0, F.round(1.0 - F.size(F.array_distinct(lines)) / n, 6)
    ).otherwise(F.lit(0.0))


def mean_word_length(col: str | Column) -> Column:
    """Average token length — junk detector (too low: symbol soup, too
    high: minified blobs)."""
    c = F.trim(_c(col))
    toks = F.filter(F.split(c, r"\s+"), lambda x: x != "")
    n = F.size(toks)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return F.when(n > 0, F.round(total / n, 6)).otherwise(F.lit(0.0))


def fingerprint64(col: str | Column) -> Column:
    """Stable 64-bit document fingerprint of the canonical text."""
    from cwds_jobs_spark.functions.canon import canonical_text_col

    return F.xxhash64(canonical_text_col(_c(col)))


def fingerprint_hex(col: str | Column, n_chars: int = 16) -> Column:
    """md5-prefix fingerprint of the canonical text.  Same role as
    :func:`fingerprint64` (which is cheaper JVM-side) but with an
    exact DuckDB twin (``substr(md5(...), 1, n)``) for oracling."""
    from cwds_jobs_spark.functions.canon import canonical_text_col

    return F.substring(F.md5(canonical_text_col(_c(col))), 1, n_chars)
