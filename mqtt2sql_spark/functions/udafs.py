"""Vectorized Python UDAFs (pandas_udf GROUPED_AGG).

NOTE: deliberately NO `from __future__ import annotations` here —
pandas_udf resolves the real pd.Series type hints at decoration time,
and stringified annotations from the future-import cannot be resolved
against a scope where pandas is imported locally.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("bigint")
def trimmed_mean_cents(cents: pd.Series, keys: pd.Series) -> int:
    """10%-trimmed mean of exact integer cents, (cents, key)-ordered.

    Runs as one Arrow batch per group on an executor: numpy lexsort by
    the (value, key) total order, drop n//10 rows per tail, exact
    integer sum and floor division — bit-identical to the window-rank
    formulation a SQL engine uses."""
    import numpy as np

    order = np.lexsort((keys.to_numpy(), cents.to_numpy()))
    v = cents.to_numpy()[order]
    n = len(v)
    lo = n // 10
    kept = v[lo : n - lo]
    return int(kept.sum() // len(kept))


@pandas_udf("bigint")
def trimmed_count(cents: pd.Series) -> int:
    n = len(cents)
    return int(n - 2 * (n // 10))
