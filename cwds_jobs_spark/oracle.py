"""Pure-Python oracle replay of a change stream (FIXTURES.md §2).

The reference asserts golden final documents after replay
(jobs-facilities-cws test CwsFacilityJobTest.java:107-120 vs
fixtures/cwsrs_{new,updated,deleted}_facility.json).  Here the golden
state is computed, not stored: sort events by ``(op_ts, lsn)`` and fold
them into a dict keyed ``(conv_id, turn_idx)`` — I/U upsert, D delete.
Comparison is order-insensitive, then per-turn text equality is
checked under stable ``(conv_id, turn_idx)`` ordering (the
BASELINE.json per-row invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def replay(events) -> dict:
    """events: iterable of Rows/dicts with conv_id/turn_idx/op/op_ts/lsn/payload."""
    rows = sorted(events, key=lambda r: (r["op_ts"], r["lsn"]))
    state: dict = {}
    for r in rows:
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "D":
            state.pop(k, None)
        else:
            state[k] = {
                c: r[c] for c in r.asDict() if c not in ("conv_id", "turn_idx", "op", "op_ts", "lsn")
            } if hasattr(r, "asDict") else {
                c: v for c, v in r.items() if c not in ("conv_id", "turn_idx", "op", "op_ts", "lsn")
            }
    return state


def table_state(df: DataFrame) -> dict:
    return {
        (r["conv_id"], r["turn_idx"]): {
            c: r[c] for c in df.columns if c not in ("conv_id", "turn_idx")
        }
        for r in df.collect()
    }


def assert_matches(df: DataFrame, expected: dict) -> None:
    got = table_state(df)
    assert set(got) == set(expected), (
        f"key sets differ: extra={sorted(set(got) - set(expected))[:5]} "
        f"missing={sorted(set(expected) - set(got))[:5]}"
    )
    # stable (conv_id, turn_idx) ordering + per-turn text equality
    for k in sorted(got):
        g, e = got[k], expected[k]
        shared = set(g) & set(e)
        assert {c: g[c] for c in shared} == {c: e[c] for c in shared}, (
            f"row mismatch at {k}: got={g} expected={e}"
        )
