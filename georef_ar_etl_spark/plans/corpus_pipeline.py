"""The end-to-end training-corpus curation pipeline: the document-side
operators composed on the Step/Process graph (plans/pipeline.py — the
reference's Step framework), the way a data-curation team would actually
run them. Order matters and is the standard one:

1. quality_gate     — drop boilerplate/gibberish first (cheapest filter
                      first: pure Catalyst, no joins)
2. dedup_exact      — byte-identical collapse before the expensive
                      near-dup machinery sees the corpus
3. dedup_near       — MinHash pairs → connected components → keep one
                      representative per cluster
4. decontaminate    — split train/val/test by hash, then DROP training
                      docs sharing substrings with the held-out split
                      (cross_corpus_overlap); eval stays pristine
5. tokenize + pack  — hash-tokenize the surviving text, count tokens,
                      pack documents into fixed-capacity training
                      sequences per source

The value flowing between steps is a lazy DataFrame (plus a small report
dict in ctx) — heavy data moves only inside Spark jobs. Every step is a
pure transformation, so the whole pipeline is one declarative plan per
materialization point; ``run(start, end)`` re-enters like the reference's
--start/--end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from georef_ar_etl_spark.operators import corpus, doc_dedup, text
from georef_ar_etl_spark.plans.pipeline import Process, Step


def _gate(df: DataFrame, ctx: dict) -> DataFrame:
    gated = text.quality_gate(df)
    ctx.setdefault("report", {})["gate_dropped"] = (
        gated.filter(~F.col("keep")).groupBy("reason").count()
    )
    return gated.filter(F.col("keep")).drop("keep", "reason")


def _dedup_exact(df: DataFrame, ctx: dict) -> DataFrame:
    return doc_dedup.dedup_exact(df)


def _dedup_near(df: DataFrame, ctx: dict) -> DataFrame:
    pairs = doc_dedup.minhash_lsh_pairs(
        df,
        n_hashes=ctx.get("n_hashes", 8),
        n_bands=ctx.get("n_bands", 4),
        min_jaccard=ctx.get("min_jaccard", 0.5),
        shingle_k=ctx.get("shingle_k", 8),
    )
    return doc_dedup.dedup_near(df, pairs)


def _decontaminate(df: DataFrame, ctx: dict) -> DataFrame:
    labeled = corpus.hash_split(
        df,
        fractions=ctx.get("fractions", [("train", 0.8), ("val", 0.1), ("test", 0.1)]),
        hash_fn="md5",
    )
    train = labeled.filter(F.col("split") == "train")
    held = labeled.filter(F.col("split") != "train")
    # FREEZE the stop list on the original train side: removing dirty
    # docs shifts fingerprint doc-frequencies, so the removal is only a
    # fixpoint (auditable as "zero overlap remains") w.r.t. this list —
    # it is kept in ctx for exactly that audit
    stop = doc_dedup.corpus_stop_fingerprints(
        train, max_doc_freq=ctx.get("contamination_max_doc_freq", 4)
    ).localCheckpoint(eager=True)
    ctx.setdefault("report", {})["contamination_stop_fps"] = stop
    dirty = doc_dedup.cross_corpus_overlap(
        train, held,
        min_shared=ctx.get("contamination_min_shared", 2),
        stop_fps=stop,
        # the held side here is a 20% SPLIT of the corpus, not a small
        # benchmark set — a forced broadcast of its fingerprints would
        # blow the 8 GB limit at scale; let the optimizer pick the join
        broadcast_held=False,
    ).select(F.col("train_id").alias("doc_id")).distinct()
    clean_train = train.join(dirty, "doc_id", "left_anti")
    return clean_train.unionByName(held)


def _tokenize_and_pack(df: DataFrame, ctx: dict) -> DataFrame:
    ids = text.hash_tokenize(F.col("text"), vocab_size=ctx.get("vocab_size", 32768))
    toks = df.select(
        "doc_id", "source", "split",
        ids.alias("tokens"),
        F.size(ids).alias("n_tok"),
    )
    # pack within (source, split): a pack is a TRAINING sequence — held-out
    # documents must never share one with train docs (they would consume
    # the pack budget and collide sequence ids with eval packs)
    return corpus.pack_sequences(
        toks,
        capacity=ctx.get("pack_capacity", 2048),
        len_col="n_tok",
        group_col=["source", "split"],
    )


def training_corpus_pipeline(ctx: dict | None = None) -> Process:
    """The curation Process: run with the raw documents DataFrame as the
    initial value; returns curated, tokenized, packed rows
    (doc_id, source, split, tokens, n_tok, pack_seq)."""
    return Process(
        name="training_corpus",
        steps=[
            Step("quality_gate", _gate),
            Step("dedup_exact", _dedup_exact),
            Step("dedup_near", _dedup_near),
            Step("decontaminate", _decontaminate),
            Step("tokenize_pack", _tokenize_and_pack),
        ],
        # `ctx or {}` would swap a caller's EMPTY dict for a fresh one and
        # silently disconnect them from the report entries
        ctx=ctx if ctx is not None else {},
    )
