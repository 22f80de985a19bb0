"""Skyline (Pareto frontier) operator — minimize over two criteria.

A row is on the skyline iff no other row dominates it, where b dominates
a when ``b.x <= a.x AND b.y <= a.y`` with at least one strict inequality
(ties on BOTH criteria are mutually non-dominating: all copies survive
unless a third row beats them).

Distributed shape (the classical two-phase skyline, e.g. Börzsönyi et
al., ICDE 2001): a partition-local sort-filter-skyline pass prunes each
partition to its local frontier (mapInPandas — Arrow-batched, no
shuffle), then the union of local frontiers — empirically tiny, O(k) —
is coalesced and swept once more for the global frontier.  The global
pass runs on the pruned set only, so the single-partition step is a
small-data step by construction, the same justification as the tiny
top-k ranking windows elsewhere in this repo.

Criteria are integer columns (callers quantize money to cents first),
so the sweep needs no float-comparison care.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _local_skyline(pdf: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Sort-filter-skyline sweep over one in-memory block.

    After sorting by (x, y), a row is dominated iff some earlier row has
    y <= row.y — except the exact-tie case: a row equal to the current
    running minimum on BOTH criteria is kept (mutual non-domination).
    Tracking (best_y, and the x that achieved it) resolves ties without
    a second pass.
    """
    if pdf.empty:
        return pdf
    pdf = pdf.sort_values([x, y], kind="mergesort")
    xs = pdf[x].to_numpy()
    ys = pdf[y].to_numpy()
    keep = []
    best_y = None  # min y seen so far (over strictly-or-equal earlier x)
    best_y_x = None  # the x value where best_y was first reached
    for i in range(len(pdf)):
        if best_y is None or ys[i] < best_y:
            best_y, best_y_x = ys[i], xs[i]
            keep.append(True)
        elif ys[i] == best_y and xs[i] == best_y_x:
            # exact duplicate of the frontier point → mutual non-domination
            keep.append(True)
        else:
            keep.append(False)
    return pdf[pd.Series(keep, index=pdf.index)]


def skyline_min_min(df: DataFrame, x: str, y: str) -> DataFrame:
    """Two-phase distributed skyline minimizing integer columns x and y."""
    schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _local_skyline(pdf, x, y)

    def glob(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        blocks = list(batches)
        if not blocks:  # empty relation → empty skyline, not a concat error
            return
        all_rows = pd.concat(blocks, ignore_index=True)
        yield _local_skyline(all_rows, x, y)

    pruned = df.mapInPandas(local, schema=schema)
    return pruned.coalesce(1).mapInPandas(glob, schema=schema)
