"""Text functions + canonicalization (native ≡ pandas where both exist)."""

from pyspark.sql import functions as F

from cwds_jobs_spark.functions.canon import canonical_text_col, canonical_text_pandas
from cwds_jobs_spark.functions.text import (
    lang_id,
    punct_ratio,
    quality_score,
    token_count,
    word_token_count,
    fingerprint64,
)


def _docs(spark):
    rows = [
        (1, "  The   quick brown fox\tjumps over the lazy dog.  "),
        (2, "el perro que corre por la calle una y otra vez"),
        (3, ""),
        (4, None),
        (5, "x" * 100),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_canonical_native_vs_pandas(spark):
    df = _docs(spark).select(
        canonical_text_col("text").alias("a"), canonical_text_pandas("text").alias("b")
    )
    for r in df.collect():
        assert r.a == r.b


def test_token_counts(spark):
    out = {r.doc_id: (r.t, r.w) for r in _docs(spark).select(
        "doc_id", token_count("text").alias("t"), word_token_count("text").alias("w")
    ).collect()}
    assert out[1] == (9, 10)  # 9 ws tokens; '.' counts as word-piece
    assert out[3] == (0, 0)
    assert out[4][0] is None or out[4][0] == 0  # null text


def test_lang_id_heuristic(spark):
    got = {r.doc_id: r.lang for r in _docs(spark).select(
        "doc_id", lang_id("text").alias("lang")
    ).collect()}
    assert got[1] == "en" and got[2] == "es" and got[5] == "und"


def test_quality_score_bounds(spark):
    rows = _docs(spark).select(quality_score("text").alias("q")).collect()
    for r in rows:
        if r.q is not None:
            assert 0.0 <= r.q <= 1.0


def test_fingerprint_stable_under_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "a  b c"), (2, "a b\tc"), (3, "a b d")], "id long, text string"
    )
    fps = {r.id: r.fp for r in df.select("id", fingerprint64("text").alias("fp")).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_no_python_udf_in_native_path(spark):
    """The native text pipeline must stay inside codegen (no BatchEvalPython)."""
    df = _docs(spark).select(
        token_count("text"), lang_id("text"), quality_score("text"), fingerprint64("text")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
