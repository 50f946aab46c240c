"""Property-based equivalence of the three normalization implementations
(hypothesis): pure-Python oracle == numpy kernel == Catalyst expression."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from georef_ar_etl_spark.functions.tokens import (
    normalize_series,
    normalize_tokens_py,
)

# elements include None: EVENT_SCHEMA permits null token elements, and both
# normalize impls must DROP them (like Catalyst's filter) — ADVICE r01
token_arrays = st.lists(
    st.one_of(
        st.integers(min_value=-100, max_value=100),
        st.just(0),
        st.none(),
    ),
    min_size=0,
    max_size=50,
)


@given(st.lists(st.one_of(st.none(), token_arrays), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_numpy_kernel_matches_python_oracle(batch):
    got = normalize_series(pd.Series(batch, dtype=object))
    for raw, out in zip(batch, got):
        want = normalize_tokens_py(raw)
        if raw is None:
            assert out is None
        else:
            assert [int(x) for x in out] == want, raw


@given(token_arrays)
@settings(max_examples=200, deadline=None)
def test_normalization_invariants(arr):
    out = normalize_tokens_py(arr)
    assert all(x is not None and x >= 0 for x in out)  # no negatives/nulls survive
    assert not out or out[-1] != 0           # no trailing padding
    # idempotent: normalizing twice changes nothing
    assert normalize_tokens_py(out) == out
    # subsequence of the non-negative non-null input
    it = iter([x for x in arr if x is not None and x >= 0])
    assert all(any(x == y for y in it) for x in out)


def test_catalyst_expr_matches_python_on_edge_cases(spark):
    cases = [
        [], [0], [0, 0], [-1], [-1, 0], [5, 0, 7, 0, 0], [0, 5], None,
        # null ELEMENTS: dropped by both impls (Catalyst filter semantics)
        [None], [1, None], [None, -1], [None, 0], [3, None, 0, None],
    ]
    from georef_ar_etl_spark.functions.tokens import with_normalized_tokens

    df = spark.createDataFrame(
        [(i, c, "update", 0) for i, c in enumerate(cases)],
        "id int, tokens array<int>, op string, n_tok int",
    )
    for impl in ("pandas", "builtin"):
        got = {
            r["id"]: (None if r["tokens"] is None else list(r["tokens"]))
            for r in with_normalized_tokens(df, impl=impl).collect()
        }
        for i, c in enumerate(cases):
            assert got[i] == normalize_tokens_py(c), (impl, c)
