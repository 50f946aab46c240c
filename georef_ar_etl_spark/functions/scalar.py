"""Scalar column functions mirroring the reference's string/ID kernel
(SURVEY.md §2.7). All pure Catalyst expressions — codegen'd, no Python."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from georef_ar_etl_spark.schemas import GROUP_PREFIX_LEN


def clean_string(col: Column) -> Column:
    """First line only, collapse runs of whitespace, trim.

    Reference: georef_ar_etl/utils.py:190-195 (tested at
    tests/test_streets_extraction_step.py:43-56).
    """
    first_line = F.split(col, "\n").getItem(0)
    return F.trim(F.regexp_replace(first_line, r"\s+", " "))


def doc_group(col: Column, k: int = GROUP_PREFIX_LEN) -> Column:
    """Hierarchical-ID prefix extraction — parent key derivation.

    Reference: id[:2]/id[:5]/id[:8] slicing (georef_ar_etl/departments.py:118,
    streets.py:225-227, settlements.py:129-131).
    """
    return F.substring(col, 1, k)


def zero_pad(col: Column, width: int) -> Column:
    """Zero-pad numeric-ish ids (reference: str.rjust(5,'0'),
    georef_ar_etl/street_blocks.py:57-58, intersections.py:89)."""
    return F.lpad(col.cast("string"), width, "0")
