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


# --------------------------- Spark-aware gate steps (reference utils.py)
def test_check_dependencies_step(spark):
    """CheckDependenciesStep analogue (reference utils.py:31-43): empty
    dependency → process aborts; non-empty → value flows through."""
    from georef_ar_etl_spark.plans.pipeline import Process
    from georef_ar_etl_spark.plans.steps import DependencyError, check_dependencies

    full = spark.range(3)
    empty = spark.range(0)

    ok = Process("p", [
        check_dependencies([("full", full)]),
        _s("emit", lambda v: "ran"),
    ])
    assert ok.run() == "ran"

    bad = Process("p", [
        check_dependencies([("full", full), ("empty", empty)]),
        _s("emit", lambda v: "ran"),
    ])
    with pytest.raises(DependencyError, match='"empty" is empty'):
        bad.run()

    # late-resolved providers: callable(ctx) and .state() objects
    class FakeEngine:
        def state(self):
            return full

    lazy = Process("p", [
        check_dependencies([("lazy", lambda ctx: full), ("eng", FakeEngine())]),
        _s("emit", lambda v: "ran"),
    ])
    assert lazy.run() == "ran"


def test_validate_table_size_step(spark):
    """ValidateTableSizeStep analogue (reference utils.py:94-118): eq/ge
    count assertions gate the pipeline; strict=False mirrors interactive
    mode (warn-only); results recorded in ctx like the reference report."""
    from georef_ar_etl_spark.plans.pipeline import Process
    from georef_ar_etl_spark.plans.steps import TableSizeError, validate_table_size

    df = spark.range(10)
    p = Process("p", [
        _s("src", lambda v: df, reads_input=False),
        validate_table_size(10, op="eq"),
        validate_table_size(5, op="ge"),
        _s("emit", lambda v: v.count()),
    ])
    assert p.run() == 10
    assert [c["ok"] for c in p.ctx["size_checks"]] == [True, True]

    failing = Process("p", [
        _s("src", lambda v: df, reads_input=False),
        validate_table_size(11, op="eq"),
    ])
    with pytest.raises(ProcessException):
        failing.run()

    lenient = Process("p", [
        _s("src", lambda v: df, reads_input=False),
        validate_table_size(11, op="eq", strict=False),
        _s("emit", lambda v: "survived"),
    ])
    assert lenient.run() == "survived"
    assert lenient.ctx["size_checks"][0]["ok"] is False

    with pytest.raises(ValueError):
        validate_table_size(1, op="contains")  # not an operator name


def test_engine_assert_size_uses_manifest(spark, tmp_path):
    """Manifest-count gate: zero Spark jobs, same semantics (the counts are
    summed per bucket at commit time and already tested against the
    oracle)."""
    from georef_ar_etl_spark import datagen
    from georef_ar_etl_spark.engine import CdcEngine
    from georef_ar_etl_spark.plans.steps import TableSizeError

    initial = datagen.gen_initial_state(40, seed=21, max_len=8)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.bootstrap(datagen.state_to_df(spark, initial))
    assert eng.assert_size(40, "eq") == 40
    assert eng.assert_size(10, "ge") == 40
    with pytest.raises(TableSizeError):
        eng.assert_size(41, "eq")
    with pytest.raises(ValueError):
        eng.assert_size(1, "floor")


def test_training_corpus_pipeline_end_to_end(spark):
    """The document operators composed as the reference-style Process:
    gate -> exact dedup -> near dedup -> decontaminate -> tokenize+pack,
    with every stage's invariant checked on the output."""
    from pyspark.sql import functions as F

    from georef_ar_etl_spark.operators import corpus, doc_dedup, text
    from georef_ar_etl_spark.plans.corpus_pipeline import training_corpus_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    proc = training_corpus_pipeline()
    assert proc.step_names() == [
        "quality_gate", "dedup_exact", "dedup_near", "decontaminate",
        "tokenize_pack",
    ]
    out = proc.run(initial=docs).cache()
    n = out.count()
    assert 0 < n < docs.count()

    # gate: survivors would all pass the gate again (idempotent filter)
    survivors = docs.join(out.select("doc_id"), "doc_id", "left_semi")
    regate = text.quality_gate(survivors)
    assert regate.filter(~F.col("keep")).count() == 0
    # the drop report materialized per reason
    rep = {r["reason"]: r["count"] for r in proc.ctx["report"]["gate_dropped"].collect()}
    assert rep and all(v > 0 for v in rep.values())

    # exact dedup: no two survivors share a normalized fingerprint
    assert (
        survivors.select(text.fingerprint(F.col("text")).alias("f")).distinct().count()
        == n
    )

    # decontamination: no surviving TRAIN doc shares substrings with the
    # held-out docs — audited against the pipeline's FROZEN stop list
    # (recomputing doc frequencies after removal changes the question:
    # see cross_corpus_overlap's stop_fps contract)
    train = survivors.join(out.filter("split = 'train'").select("doc_id"), "doc_id", "left_semi")
    held = survivors.join(out.filter("split != 'train'").select("doc_id"), "doc_id", "left_semi")
    leftover = doc_dedup.cross_corpus_overlap(
        train, held, min_shared=2,
        stop_fps=proc.ctx["report"]["contamination_stop_fps"],
    ).count()
    assert leftover == 0

    # packing: every pack respects the overflow-allowed bound
    stats = out.groupBy("source", "split", "pack_seq").agg(
        F.sum("n_tok").alias("tot")
    )
    mx = out.agg(F.max("n_tok")).first()[0]
    assert stats.filter(F.col("tot") >= 2048 + mx).count() == 0
    # and tokens are real hash-tokenizer output
    row = out.filter(F.col("n_tok") > 0).first()
    assert all(0 <= t < 32768 for t in row["tokens"])
