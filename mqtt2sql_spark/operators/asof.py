"""As-of (nearest-earlier) join — an operator Spark lacks natively.

Two implementations, per the engine's preference order:
  * `asof_last_before` (plans/analytics.py `asof_last_click_before_purchase`)
    — pure window composition when both sides come from one stream;
  * `merge_asof_join` here — the general two-table form: cogrouped
    applyInPandas with `pd.merge_asof` per key group (Arrow-batched, one
    shuffle per side on the `by` key; each group sorts locally, which is
    exactly merge_asof's contract).

Scale: the shuffle is by `by` (e.g. user_id) — high cardinality, even
distribution; skewed keys are the caveat (a single giant user lands in
one task) — mitigate upstream with salting + two-pass merge if a key
exceeds task memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_right",
    allow_exact: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.on < left.on (or <= when allow_exact) within the same `by` group.

    Returns left columns + [f"{c}{suffix}" for c in right_cols]
    (null-extended when no earlier right row exists — LEFT ASOF).
    """
    import pandas as pd

    left_fields = left.schema.fields
    right_schema = right.select(on, *right_cols).schema
    out_fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in left_fields]
    for c in right_cols:
        dt = right_schema[c].dataType.simpleString()
        out_fields.append(f"`{c}{suffix}` {dt}")
    out_schema = ", ".join(out_fields)

    lcols = [f.name for f in left_fields]

    def merge(key, ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.sort_values(on, kind="mergesort")
        if rdf.empty:
            out = ldf.copy()
            for c in right_cols:
                out[f"{c}{suffix}"] = None
            return out
        rdf = (
            rdf[[on] + right_cols]
            .rename(columns={c: f"{c}{suffix}" for c in right_cols})
            .sort_values(on, kind="mergesort")
        )
        return pd.merge_asof(
            ldf,
            rdf,
            on=on,
            allow_exact_matches=allow_exact,
            direction="backward",
        )[lcols + [f"{c}{suffix}" for c in right_cols]]

    return (
        left.groupBy(by)
        .cogroup(right.select(by, on, *right_cols).groupBy(by))
        .applyInPandas(merge, out_schema)
    )
