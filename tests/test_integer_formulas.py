"""Pure-Python property tests for the exact-integer formulations the
round-3 analytics queries rely on (no SparkSession needed).

Each query moves a float statistic onto an all-integer surface so the
DuckDB oracle and the Spark plan agree bit-for-bit; these tests verify
the integer rearrangements against their textbook float definitions on
random inputs — the invariant that makes the cross-engine hash gate
meaningful.
"""

import math

from hypothesis import given
from hypothesis import strategies as st

from mqtt2sql_spark.plans.dedup import _LSH_CONFIGS, N_MINHASH
from mqtt2sql_spark.plans.timeseries import (
    _BOLL_N,
    _EWMA_K,
    _EWMA_TOT,
    _EWMA_W,
)

# --- Bollinger: (n*x - S)^2 > 4*(n*S2 - S^2)  <=>  |x - mean| > 2*sigma ----

counts = st.lists(
    st.integers(min_value=0, max_value=10_000),
    min_size=_BOLL_N,
    max_size=_BOLL_N,
)


@given(counts, st.integers(min_value=0, max_value=10_000))
def test_bollinger_integer_inequality_matches_float(window, x):
    n = _BOLL_N
    s = sum(window)
    s2 = sum(c * c for c in window)
    lhs = (n * x - s) ** 2 > 4 * (n * s2 - s * s)
    mean = s / n
    var = s2 / n - mean * mean
    rhs = abs(x - mean) > 2 * math.sqrt(max(var, 0.0)) + 1e-9
    # allow the float side one ulp of slack at the boundary; away from the
    # boundary both sides must agree
    boundary = abs((n * x - s) ** 2 - 4 * (n * s2 - s * s)) <= 4
    assert lhs == rhs or boundary


# --- EWMA: truncated dyadic kernel sums to 4^K - 3^K -----------------------


def test_ewma_kernel_normalizer_exact():
    assert _EWMA_TOT == 4**_EWMA_K - 3**_EWMA_K
    assert len(_EWMA_W) == _EWMA_K
    # weights are the alpha=1/4 geometric kernel over the common
    # denominator 4^K: w_k / 4^K == (1/4) * (3/4)^k
    for k, w in enumerate(_EWMA_W):
        assert w * 4 ** (k + 1) == 3**k * 4**_EWMA_K


@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=_EWMA_K, max_size=_EWMA_K))
def test_ewma_integer_matches_float_kernel(xs):
    # xs[0] is the most recent observation (k = 0)
    num = sum(x * w for x, w in zip(xs, _EWMA_W))
    exact = (num * 100) // _EWMA_TOT
    flt = sum(x * 0.25 * 0.75**k for k, x in enumerate(xs)) / (
        1 - 0.75**_EWMA_K
    )
    assert abs(exact - flt * 100) <= 2  # integer floor vs float, e2 units


# --- Haar: 4*||x||^2 == 2*e_d1 + e_d2 + e_a2 (length-4 blocks) -------------


@given(st.lists(st.integers(min_value=-1000, max_value=1000),
                min_size=4, max_size=64))
def test_haar_parseval_identity(xs):
    # pad to a multiple of 4 with zeros, exactly like absent hours
    while len(xs) % 4:
        xs = xs + [0]
    d1 = [xs[i] - xs[i + 1] for i in range(0, len(xs), 2)]
    a1 = [xs[i] + xs[i + 1] for i in range(0, len(xs), 2)]
    d2 = [a1[i] - a1[i + 1] for i in range(0, len(a1), 2)]
    a2 = [a1[i] + a1[i + 1] for i in range(0, len(a1), 2)]
    e_d1 = sum(v * v for v in d1)
    e_d2 = sum(v * v for v in d2)
    e_a2 = sum(v * v for v in a2)
    assert 2 * e_d1 + e_d2 + e_a2 == 4 * sum(v * v for v in xs)


# --- Neyman: integer allocation is feasible and near-proportional ----------


@given(st.lists(st.tuples(st.integers(min_value=1, max_value=10**6),
                          st.integers(min_value=0, max_value=10**12)),
                min_size=2, max_size=8))
def test_neyman_integer_allocation_bounds(strata):
    total = 10_000
    ws = [w for _, w in strata]
    wsum = sum(ws)
    if wsum == 0:
        return
    alloc = [total * w // wsum for w in ws]
    assert sum(alloc) <= total
    # each bucket is within 1 of the real-valued proportional share
    for w, a in zip(ws, alloc):
        assert a <= total * w / wsum < a + 1


# --- silhouette/ppm terms stay in range ------------------------------------


@given(st.integers(min_value=0, max_value=10**12),
       st.integers(min_value=0, max_value=10**12))
def test_silhouette_term_bounded(a_fp, b_fp):
    if b_fp < a_fp:
        a_fp, b_fp = b_fp, a_fp  # b is the second-nearest: b >= a
    term = (b_fp - a_fp) * 1_000_000 // max(a_fp, b_fp, 1)
    assert 0 <= term <= 1_000_000


# --- Hellinger: integer per-bin contributions bound H^2 in [0, 1] ----------


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=10**6),
                          st.integers(min_value=0, max_value=10**6)),
                min_size=1, max_size=10))
def test_hellinger_integer_contributions_bounded(bins):
    na = sum(a for a, _ in bins)
    nb = sum(b for _, b in bins)
    if na == 0 or nb == 0:
        return
    hell = 0
    for a, b in bins:
        p = a * 10**12 // na
        q = b * 10**12 // nb
        d = math.sqrt(p) - math.sqrt(q)
        hell += math.floor(d * d)
    # H^2 = hell / (2e12) in [0, 1] (integer floor keeps it under the cap)
    assert 0 <= hell <= 2 * 10**12


# --- LSH configurations exactly tile the signature -------------------------


def test_lsh_configs_tile_signature():
    for b, r in _LSH_CONFIGS:
        assert b * r == N_MINHASH
    assert len({(b, r) for b, r in _LSH_CONFIGS}) == len(_LSH_CONFIGS)
