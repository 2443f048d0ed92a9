"""Paginated external (REST-style) sources as DataFrames (SURVEY §2.1 S6).

The reference pulls Cognito/Perry users page-by-page through an opaque
``paginationToken`` loop (jobs-cap-users/.../iterator/
CapUsersInitialJobIterator.java:23-38; IdmServiceImpl.java:68-75) on a
reader thread pool (jobs-common/.../batch/BatchReadersPool.java:34-63).
Two Spark-first shapes cover both API styles:

- :func:`read_token_paged` — opaque-token chains are inherently
  sequential, so the driver walks the token loop but NEVER accumulates
  the dataset in memory: each page batch is spooled straight to
  parquet and the result is a normal distributed DataFrame over the
  spool.  Driver memory is O(page), table size unbounded.
- :func:`read_indexed_paged` — when the API exposes numbered pages
  (offset/limit), page *fetches themselves* are distributed: a
  ``spark.range(n_pages)`` frame is mapped through an Arrow-batched
  ``mapInPandas`` fetcher, i.e. the reader thread pool becomes
  executor tasks (readerThreadsCount → task parallelism), and fetch
  results never touch the driver.

Both return DataFrames in the caller's schema, so the rest of the
engine (union into the multi-source window, MERGE apply) is unchanged
— the "source snapshot DataFrame" generalization SURVEY.md names.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# fetch_page(token) -> (rows, next_token); next_token None = done
TokenFetcher = Callable[[str | None], tuple[list[tuple], str | None]]
# fetch_indexed(page_idx) -> rows for that page ([] = empty page)
IndexedFetcher = Callable[[int], list[tuple]]


def read_token_paged(
    spark: SparkSession,
    fetch_page: TokenFetcher,
    schema: T.StructType,
    *,
    spool_dir: str | None = None,
    pages_per_spool: int = 32,
    max_pages: int | None = None,
) -> DataFrame:
    """Drain an opaque-token page chain into a DataFrame.

    The token chain forces sequential fetches (each page's token comes
    from the previous response), but driver memory stays O(pages_per_
    spool × page): batches are flushed to a parquet spool and the
    returned DataFrame scans the spool distributed.  ``max_pages``
    bounds runaway/looping APIs.

    The spool for THIS drain is always a fresh per-invocation
    subdirectory (a caller-supplied ``spool_dir`` reused across runs
    must not union stale spools from previous drains into the result),
    and it is removed on the ``max_pages`` failure path.  The caller
    owns the successful spool's lifetime — it backs the returned
    DataFrame, so it must outlive every action on it.
    """
    root = spool_dir or tempfile.mkdtemp(prefix="paged_src_")
    spool = os.path.join(root, f"drain-{uuid.uuid4().hex[:8]}")
    os.makedirs(spool, exist_ok=True)
    buf: list[tuple] = []
    token: str | None = None
    n_pages = 0
    n_spools = 0

    def _flush():
        nonlocal buf, n_spools
        if buf:
            spark.createDataFrame(buf, schema).write.mode("overwrite").parquet(
                os.path.join(spool, f"spool-{n_spools:06d}")
            )
            n_spools += 1
            buf = []

    pages_in_buf = 0
    try:
        while True:
            rows, token = fetch_page(token)
            buf.extend(rows)
            n_pages += 1
            pages_in_buf += 1
            if pages_in_buf >= pages_per_spool:
                _flush()
                pages_in_buf = 0
            if token is None:
                break
            if max_pages is not None and n_pages >= max_pages:
                raise RuntimeError(
                    f"token-paged source exceeded max_pages={max_pages} "
                    "(looping pagination token?)"
                )
    except Exception:
        # abandon this drain's spool; never leak partial pages into a
        # reused spool_dir
        import shutil

        shutil.rmtree(spool, ignore_errors=True)
        raise
    _flush()
    if n_spools == 0:
        return spark.createDataFrame([], schema)
    return (
        spark.read.option("recursiveFileLookup", "true")
        .schema(schema)
        .parquet(spool)
    )


def read_indexed_paged(
    spark: SparkSession,
    fetch_indexed: IndexedFetcher,
    schema: T.StructType,
    n_pages: int,
    *,
    tasks: int | None = None,
) -> DataFrame:
    """Distribute numbered-page fetches across executors.

    ``spark.range(n_pages)`` → mapInPandas: each task pulls its pages
    and emits rows directly on the executor — the Spark-native form of
    the reference's reader thread pool (one future per id batch,
    BatchReadersPool.java:46-63), except results never funnel through
    the driver and parallelism is cluster-wide.
    """
    cols = [f.name for f in schema.fields]

    def fetch(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            out: list[tuple] = []
            for idx in pdf["id"]:
                out.extend(fetch_indexed(int(idx)))
            yield pd.DataFrame(out, columns=cols)

    pages = spark.range(
        0, n_pages, numPartitions=tasks or min(n_pages, 64) or 1
    )
    return pages.mapInPandas(fetch, schema=schema)
