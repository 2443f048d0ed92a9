"""Turn/text canonicalization — the per-row transform stage.

The reference's per-record transform (document assembly) is Java
service code invoked per id (jobs-facilities-cws/.../entity/
CwsChangedFacilityService.java:21-24); the BASELINE.json input_hint
mandates these run as vectorized pandas/Arrow UDFs or native column
expressions — never per-row Python.

Two implementations of the same canonical form (NFC-normalized,
whitespace-collapsed, trimmed):

- ``canonical_text_col``: pure ``pyspark.sql.functions`` — JVM-side,
  whole-stage-codegen'd; the hot path.  (No NFC: Spark has no native
  unicode-normalize; for ASCII-ish corpora this is the same result.)
- ``canonical_text_pandas``: Arrow-batched pandas UDF including NFC —
  used when the corpus needs true unicode normalization.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def canonical_text_col(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


@pandas_udf(T.StringType())
def canonical_text_pandas(s: pd.Series) -> pd.Series:
    def canon(x):
        if x is None:
            return None
        return " ".join(unicodedata.normalize("NFC", x).split())

    return s.map(canon)


def normalize_turns(df, text_col: str = "text"):
    """Canonicalize the text column in place (engine transform stage)."""
    return df.withColumn(text_col, canonical_text_col(text_col))
