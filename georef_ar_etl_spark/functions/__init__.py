"""Scalar / vectorized function library (SURVEY.md §2.7 re-expressed)."""

from georef_ar_etl_spark.functions.tokens import (  # noqa: F401
    normalize_tokens_expr,
    normalize_tokens_pandas,
    with_normalized_tokens,
)
from georef_ar_etl_spark.functions.scalar import (  # noqa: F401
    clean_string,
    doc_group,
    zero_pad,
)
