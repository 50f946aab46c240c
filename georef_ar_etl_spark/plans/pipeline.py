"""Process graph: the reference's Step framework re-expressed.

The reference organizes every ETL as a named list of Steps folded over a
value (georef_ar_etl/process.py:185-260), with two combinators —
``CompositeStep`` fan-out (same input to N sub-steps, or element-wise over a
list input, process.py:99-129) and ``StepSequence`` (process.py:140-182) —
plus ``--start/--end`` range re-entry (process.py:206-249) and
rollback-on-error (process.py:250-257).

Spark-first translation: the value flowing between steps is small metadata
(paths, DataFrames as lazy plans, manifests) — heavy data only moves inside
Spark jobs, exactly as the reference only moves row data inside Postgres.
Rollback maps to the snapshot table's manifest protocol: an aborted process
simply never publishes a manifest, so partial work is invisible.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any


class ProcessException(Exception):
    """A step failed; the process aborts (uncommitted work stays invisible)."""


@dataclass
class Step:
    """A named unit of work: fn(value, ctx) -> value.

    ``reads_input=False`` marks steps that ignore their input (the reference
    checks the initial step needs no input, process.py:236-240).
    """

    name: str
    fn: Callable[[Any, dict], Any]
    reads_input: bool = True

    def run(self, value: Any, ctx: dict) -> Any:
        return self.fn(value, ctx)


@dataclass
class CompositeStep:
    """Fan-out: scalar input → every sub-step gets it; list input of equal
    length → zipped element-wise (reference: process.py:99-129)."""

    steps: Sequence[Any]
    name: str = "composite"
    reads_input: bool = True

    def run(self, value: Any, ctx: dict) -> list[Any]:
        if isinstance(value, list):
            if len(value) != len(self.steps):
                raise ProcessException(
                    f"{self.name}: list input of {len(value)} != {len(self.steps)} sub-steps"
                )
            return [s.run(v, ctx) for s, v in zip(self.steps, value)]
        return [s.run(value, ctx) for s in self.steps]


@dataclass
class StepSequence:
    """Pipe: fold the value through sub-steps (reference: process.py:140-182)."""

    steps: Sequence[Any]
    name: str = "sequence"
    reads_input: bool = True

    def run(self, value: Any, ctx: dict) -> Any:
        for s in self.steps:
            value = s.run(value, ctx)
        return value


def first_result(name: str = "first_result") -> Step:
    """Project element 0 of a composite's output (reference: FirstResultStep,
    georef_ar_etl/utils.py:134-135)."""
    return Step(name, lambda v, ctx: v[0])


@dataclass
class Process:
    """Named step list with range re-entry.

    ``run(start, end)`` executes steps [start, end] (1-based, like the
    reference's --start/--end): re-entering later requires the caller to pass
    the value the skipped prefix would have produced (the reference does the
    same by re-reading artifacts from disk).
    """

    name: str
    steps: list[Any]
    ctx: dict = field(default_factory=dict)

    def step_names(self) -> list[str]:
        return [s.name for s in self.steps]

    def run(self, start: int = 1, end: int | None = None, initial: Any = None) -> Any:
        end = end if end is not None else len(self.steps)
        if not (1 <= start <= end <= len(self.steps)):
            raise ProcessException(f"{self.name}: invalid step range {start}..{end}")
        selected = self.steps[start - 1 : end]
        if initial is None and getattr(selected[0], "reads_input", True):
            raise ProcessException(
                f"{self.name}: step {start} ({selected[0].name}) needs an input value"
            )
        value = initial
        for s in selected:
            try:
                value = s.run(value, self.ctx)
            except ProcessException:
                raise
            except Exception as exc:  # abort: no manifest published → no-op
                raise ProcessException(f"{self.name}/{s.name}: {exc}") from exc
        return value
