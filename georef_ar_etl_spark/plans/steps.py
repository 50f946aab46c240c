"""Spark-aware pipeline steps: dependency and size gates.

Reference parity:
* ``check_dependencies`` — CheckDependenciesStep (georef_ar_etl/
  utils.py:31-43): before a process runs, every dependency table must be
  non-empty; a missing/empty dependency aborts the process (no manifest is
  published, so the abort is invisible downstream).
* ``validate_table_size`` — ValidateTableSizeStep (georef_ar_etl/
  utils.py:94-118): assert the row count against a target with a named
  comparison operator; ``strict=False`` mirrors the reference's interactive
  mode (warn, don't fail).

Spark-first shape: the emptiness probe is ``isEmpty()`` (a limit-1 scan, the
``query(dep).first()`` analogue), and size checks prefer manifest counts
over table scans where available (see CdcEngine.assert_size) — at 100 TB a
gate must not cost a full pass over the data.
"""

from __future__ import annotations

import operator as _operator
from collections.abc import Callable, Sequence
from typing import Any

from georef_ar_etl_spark.plans.pipeline import ProcessException, Step


class DependencyError(ProcessException):
    """A dependency table is empty or unavailable."""


class TableSizeError(ProcessException):
    """A table's row count failed its size assertion."""


VALID_SIZE_OPS = ("eq", "ne", "lt", "le", "gt", "ge")


def check_dependencies(
    dependencies: Sequence[tuple[str, Any]], name: str = "check_dependencies"
) -> Step:
    """Gate step: every dependency must be a non-empty table.

    ``dependencies``: (label, provider) pairs; a provider is a DataFrame, an
    object with ``.state()`` (CdcEngine / SnapshotTable), or a callable
    ``ctx -> DataFrame`` resolved at run time (the reference resolves table
    names late the same way, utils.py:36-38).
    """

    def fn(value: Any, ctx: dict) -> Any:
        for label, dep in dependencies:
            df = dep(ctx) if callable(dep) and not hasattr(dep, "state") else dep
            if hasattr(df, "state"):
                df = df.state()
            if df is None or df.isEmpty():
                raise DependencyError(f'dependency table "{label}" is empty')
        return value

    return Step(name, fn, reads_input=False)


def validate_table_size(
    target_size: int,
    op: str = "eq",
    strict: bool = True,
    counter: Callable[[Any], int] | None = None,
    name: str = "validate_table_size",
) -> Step:
    """Gate step: assert the flowing table's row count against a target.

    ``op`` is an ``operator`` module name (eq/ge/le/...), exactly the
    reference's API. ``counter`` overrides how the count is obtained —
    pass ``lambda eng: eng.table.latest_manifest()["total_rows"]`` to gate
    on manifest metadata without a table scan. Results are appended to
    ``ctx["size_checks"]`` (the reference writes to its report the same
    way).
    """
    if op not in VALID_SIZE_OPS:
        raise ValueError(f"unknown size operator: {op!r}")
    oper = getattr(_operator, op)

    def fn(value: Any, ctx: dict) -> Any:
        n = counter(value) if counter is not None else value.count()
        ctx.setdefault("size_checks", []).append(
            {"step": name, "count": n, "target": target_size, "op": op,
             "ok": bool(oper(n, target_size))}
        )
        if not oper(n, target_size):
            msg = (
                f"table has {n} rows; failed size validation against "
                f"target_size={target_size} with operator {op!r}"
            )
            if strict:
                raise TableSizeError(msg)
        return value

    return Step(name, fn)
