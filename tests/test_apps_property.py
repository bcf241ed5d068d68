"""Property tests: the companion-app math operators against
independent pure-Python spec implementations (C integer semantics)
over hypothesis-generated integer matrices.

One batched Spark job per example (the matrix rides in a single
DataFrame), matching the conventions of test_properties.py.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cybersecurity_miw_spark.operators import apps

SETTINGS = settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "6")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

cell_val = st.integers(min_value=0, max_value=1000)


def square_matrix(n):
    return st.lists(
        st.lists(cell_val, min_size=n, max_size=n), min_size=n, max_size=n
    )


def c_div(num: int, den: int) -> int:
    """C integer division: truncation toward zero."""
    q = abs(num) // den
    return q if num >= 0 else -q


@SETTINGS
@given(st.integers(min_value=2, max_value=4).flatmap(
    lambda n: st.tuples(square_matrix(n), square_matrix(n))))
def test_matrix_multiply_matches_spec(spark, ab):
    a, b = ab
    n = len(a)
    a_cells = spark.createDataFrame(
        [(i, k, a[i][k]) for i in range(n) for k in range(n)],
        "i long, k long, a long",
    )
    b_cells = spark.createDataFrame(
        [(k, j, b[k][j]) for k in range(n) for j in range(n)],
        "k long, j long, b long",
    )
    got = {
        (r["i"], r["j"]): r["c"]
        for r in apps.matrix_multiply(a_cells, b_cells).collect()
    }
    want = {
        (i, j): sum(a[i][k] * b[k][j] for k in range(n))
        for i in range(n)
        for j in range(n)
    }
    assert got == want


@SETTINGS
@given(st.integers(min_value=2, max_value=4).flatmap(square_matrix))
def test_row_covariance_matches_spec(spark, m):
    """app/pca.cc:161-288 spec: integer means, integer-truncated
    pairwise covariance over the upper triangle."""
    n = len(m)
    cells = spark.createDataFrame(
        [(i, k, m[i][k]) for i in range(n) for k in range(n)],
        "i long, k long, q long",
    )
    got = {
        (r["row_i"], r["row_j"]): (r["mean_i"], r["mean_j"], r["cov"])
        for r in apps.row_covariance(cells, n_cols=n).collect()
    }
    means = [c_div(sum(row), n) for row in m]
    want = {}
    for i in range(n):
        for j in range(i, n):
            num = sum((m[i][k] - means[i]) * (m[j][k] - means[j]) for k in range(n))
            want[(i, j)] = (means[i], means[j], c_div(num, n - 1))
    assert got == want


@SETTINGS
@given(
    st.lists(st.lists(cell_val, min_size=2, max_size=2), min_size=3, max_size=8)
)
def test_kmeans_step_matches_spec(spark, pts):
    """One Lloyd iteration vs the app/kmeans.cc spec: strict-< nearest
    scan (first minimum wins) + truncated integer mean update."""
    k = 2
    cents = pts[:k]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)], "pid long, q array<long>"
    )
    got = {
        (r["cell"], r["dim"]): (r["n"], r["mean"])
        for r in apps.kmeans_step(df, cents).collect()
    }
    assign = []
    for p in pts:
        best, best_d = 0, None
        for ci, c in enumerate(cents):
            d = sum((x - y) ** 2 for x, y in zip(p, c))
            if best_d is None or d < best_d:
                best, best_d = ci, d
        assign.append(best)
    want = {}
    for ci in range(k):
        members = [p for p, a in zip(pts, assign) if a == ci]
        if not members:
            continue
        for dim in range(2):
            s = sum(p[dim] for p in members)
            want[(ci, dim)] = (len(members), c_div(s, len(members)))
    assert got == want


def test_blocked_matmul_negative_and_duplicate_cells(spark):
    """Review fixes: negative coordinates address blocks by
    floor-div/pmod (i == br*L + i_loc for any sign), and duplicate
    input coordinates accumulate exactly like the cell path's join."""
    from cybersecurity_miw_spark.operators import apps

    a = spark.createDataFrame(
        [(-1, 0, 2), (-1, 0, 3), (0, 1, 4)], ["i", "k", "a"]
    )
    b = spark.createDataFrame(
        [(0, -2, 5), (1, 3, 7)], ["k", "j", "b"]
    )
    cell = {
        (r["i"], r["j"]): r["c"]
        for r in apps.matrix_multiply(a, b).collect()
    }
    blocked = {
        (r["i"], r["j"]): r["c"]
        for r in apps.matrix_multiply_blocked(a, b, block=4).collect()
        if r["c"] != 0
    }
    # duplicate (-1,0) cells sum to 5; products: (-1,-2)=25, (0,3)=28
    assert cell == {(-1, -2): 25, (0, 3): 28}
    assert blocked == cell
