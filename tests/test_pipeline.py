"""Process/Step framework (reference: process.py, tested like
tests/test_process.py, test_step_sequence.py, test_composite_step.py)."""

import pytest

from georef_ar_etl_spark.plans.pipeline import (
    CompositeStep,
    Process,
    ProcessException,
    Step,
    StepSequence,
    first_result,
)


def _s(name, f, reads_input=True):
    return Step(name, lambda v, ctx: f(v), reads_input=reads_input)


def test_sequence_folds():
    p = Process("p", [
        _s("init", lambda v: 1, reads_input=False),
        _s("double", lambda v: v * 2),
        _s("inc", lambda v: v + 1),
    ])
    assert p.run() == 3


def test_composite_fanout_scalar_and_zip():
    comp = CompositeStep([_s("a", lambda v: v + 1), _s("b", lambda v: v * 10)])
    assert comp.run(5, {}) == [6, 50]
    assert comp.run([5, 6], {}) == [6, 60]
    with pytest.raises(ProcessException):
        comp.run([1, 2, 3], {})


def test_first_result_projection():
    p = Process("p", [
        _s("init", lambda v: 7, reads_input=False),
        CompositeStep([_s("keep", lambda v: v), _s("side", lambda v: None)]),
        first_result(),
    ])
    assert p.run() == 7


def test_range_reentry_and_input_check():
    p = Process("p", [
        _s("init", lambda v: 2, reads_input=False),
        _s("sq", lambda v: v * v),
        _s("neg", lambda v: -v),
    ])
    assert p.run() == -4
    # re-enter at step 2 with the value step 1 would have produced
    assert p.run(start=2, initial=3) == -9
    with pytest.raises(ProcessException):
        p.run(start=2)  # step 2 needs input


def test_error_wrapped_as_process_exception():
    p = Process("p", [_s("boom", lambda v: 1 / 0, reads_input=False)])
    with pytest.raises(ProcessException, match="p/boom"):
        p.run()


def test_nested_sequence_in_composite():
    seq = StepSequence([_s("x", lambda v: v + 1), _s("y", lambda v: v * 3)], name="xy")
    comp = CompositeStep([seq, _s("z", lambda v: v - 1)])
    assert comp.run(1, {}) == [6, 0]
