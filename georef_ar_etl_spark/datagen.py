"""Deterministic synthetic data plane (FIXTURES.md F1-F4). Seeded; no clock.

Skew is built in on purpose: doc_id group prefixes are drawn Zipf-ish so a
few groups dominate (the Buenos Aires ≫ Tierra del Fuego imbalance the
reference handles by manual per-province partitioning,
georef_ar_etl/intersections.py:29-40); one hot ``source`` dominates event
volume; and batches contain hot-key bursts, in-batch duplicate keys, invalid
events, and unnormalized payloads (trailing zero padding, negative tokens,
stale n_tok).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from georef_ar_etl_spark.schemas import DOC_ID_LEN, EVENT_SCHEMA, STATE_SCHEMA

GROUPS = [f"{i:02d}" for i in range(1, 25)]  # 24 groups, like 24 provinces
SOURCES = ["wal", "backfill", "manual", "migration"]


def _rng(seed: int) -> np.random.RandomState:
    return np.random.RandomState(seed)


def _group_weights(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** 1.2  # Zipf-ish: top group ≈ 25% of mass
    return w / w.sum()


def make_doc_id(rng: np.random.RandomState, group: str | None = None) -> str:
    if group is None:
        group = str(rng.choice(GROUPS, p=_group_weights(len(GROUPS))))
    suffix = "".join(str(d) for d in rng.randint(0, 10, DOC_ID_LEN - len(group)))
    return group + suffix


def make_tokens(rng: np.random.RandomState, max_len: int = 128) -> list[int]:
    n = int(np.clip(rng.lognormal(2.5, 1.0), 1, max_len))
    return [int(x) for x in rng.randint(1, 50000, n)]


def dirty_tokens(rng: np.random.RandomState, tokens: list[int]) -> list[int]:
    """Inject the noise normalization must remove: trailing zero padding and
    negative token ids."""
    t = list(tokens)
    if rng.rand() < 0.3:
        t = t + [0] * int(rng.randint(1, 8))
    if rng.rand() < 0.2:
        pos = int(rng.randint(0, len(t)))
        t.insert(pos, -int(rng.randint(1, 100)))
    return t


def gen_initial_state(n_rows: int, seed: int = 42, max_len: int = 128) -> list[dict]:
    rng = _rng(seed)
    state: dict[str, dict] = {}
    while len(state) < n_rows:
        doc_id = make_doc_id(rng)
        tokens = make_tokens(rng, max_len)
        state[doc_id] = {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": len(tokens),
            "source": str(rng.choice(SOURCES)),
        }
    return [state[k] for k in sorted(state)]


def gen_events(
    initial_doc_ids: list[str],
    n_events: int,
    n_batches: int,
    seed: int = 43,
    max_len: int = 128,
    invalid_frac: float = 0.05,
    dup_frac: float = 0.05,
    hot_key_frac: float = 0.03,
    evolve_from_batch: int | None = None,
    patch_frac: float = 0.0,
) -> list[dict]:
    """Change-event log per FIXTURES.md F2 (+F3 when ``evolve_from_batch``).

    Mix ≈ 60% update / 30% insert / 10% delete. ``source`` is skewed: 70% of
    events come from the 'wal' source. Updates/deletes target known ids when
    possible; inserts mint new ids (some in group '25'+, unknown to the dim
    table → quarantine path).

    ``patch_frac`` > 0 converts that share of events into partial-column
    ``op='patch'`` updates (schemas.OPS): a random subset of patchable
    columns set, the rest null ("keep"), ~15% aimed at absent keys
    (patch_noop path). Default 0.0 draws NO extra rng values, so every
    existing seeded log is byte-identical.
    """
    rng = _rng(seed)
    known = list(initial_doc_ids)
    events: list[dict] = []
    seq = 0
    hot_id = known[0] if known else make_doc_id(rng)

    for batch in range(n_batches):
        evolved = evolve_from_batch is not None and batch >= evolve_from_batch
        per_batch = n_events // n_batches
        for _ in range(per_batch):
            seq += 1
            r = rng.rand()
            op = "update" if r < 0.6 else ("insert" if r < 0.9 else "delete")
            if patch_frac and rng.rand() < patch_frac:
                op = "patch"
            source = "wal" if rng.rand() < 0.7 else str(rng.choice(SOURCES))

            if rng.rand() < hot_key_frac and known:
                doc_id = hot_id  # hot-key burst
            elif op == "patch" and known and rng.rand() >= 0.15:
                doc_id = str(known[rng.randint(0, len(known))])
            elif op == "patch":
                doc_id = make_doc_id(rng)  # likely-absent key → patch_noop
            elif op == "insert" or not known:
                unknown_group = rng.rand() < 0.05
                group = str(rng.choice(["25", "26", "99"])) if unknown_group else None
                doc_id = make_doc_id(rng, group)
                if not unknown_group:
                    known.append(doc_id)
            else:
                doc_id = str(known[rng.randint(0, len(known))])

            ev: dict = {"batch_id": batch, "seq": seq, "op": op, "doc_id": doc_id}
            if op == "delete":
                ev.update({"tokens": None, "n_tok": None, "source": source})
            elif op == "patch":
                # partial image: null = keep current value; n_tok is
                # derived-only so a patch never carries it
                set_tokens = rng.rand() < 0.6
                ev.update({
                    "tokens": dirty_tokens(rng, make_tokens(rng, max_len))
                    if set_tokens
                    else None,
                    "n_tok": None,
                    "source": source if rng.rand() < 0.5 else None,
                })
            else:
                tokens = dirty_tokens(rng, make_tokens(rng, max_len))
                # stale n_tok arrives wrong ~half the time; engine recomputes
                n_tok = len(tokens) if rng.rand() < 0.5 else int(rng.randint(0, max_len))
                ev.update({"tokens": tokens, "n_tok": n_tok, "source": source})

            if evolved:
                meta = f"m{int(rng.randint(0, 1000)):03d}"
                # a patch keeps src_meta null half the time ("keep" path)
                ev["src_meta"] = (
                    None if op == "patch" and rng.rand() < 0.5 else meta
                )

            # invalid events to quarantine
            bad = rng.rand()
            if bad < invalid_frac:
                kind = rng.randint(0, 3)
                if kind == 0:
                    ev["doc_id"] = doc_id[: rng.randint(1, DOC_ID_LEN)]  # bad length
                elif kind == 1:
                    ev["op"] = "upsert"  # unknown op
                elif op != "delete":
                    ev["tokens"] = [] if rng.rand() < 0.5 else [0, 0, 0]  # empty/all-pad

            events.append(ev)

            # in-batch duplicate key (same doc_id, later seq wins)
            if rng.rand() < dup_frac and op != "delete":
                seq += 1
                tokens2 = dirty_tokens(rng, make_tokens(rng, max_len))
                dup = {
                    "batch_id": batch,
                    "seq": seq,
                    "op": "update",
                    "doc_id": ev["doc_id"],
                    "tokens": tokens2,
                    "n_tok": len(tokens2),
                    "source": source,
                }
                if evolved:
                    dup["src_meta"] = f"m{int(rng.randint(0, 1000)):03d}"
                events.append(dup)
    return events


def gen_dim() -> list[dict]:
    """F4 dimension: known group prefixes with an enrichment name."""
    return [{"group_id": g, "group_name": f"group-{g}"} for g in GROUPS]


# -------------------------------------------------------------- Spark bridge
def state_schema_evolved(extra: bool) -> T.StructType:
    s = STATE_SCHEMA
    if extra:
        s = T.StructType(list(s.fields) + [T.StructField("src_meta", T.StringType(), True)])
    return s


def events_to_df(spark: SparkSession, events: list[dict]) -> DataFrame:
    evolved = any("src_meta" in e for e in events)
    schema = EVENT_SCHEMA
    if evolved:
        schema = T.StructType(
            list(EVENT_SCHEMA.fields) + [T.StructField("src_meta", T.StringType(), True)]
        )
        events = [{**e, "src_meta": e.get("src_meta")} for e in events]
    return spark.createDataFrame(events, schema)


def state_to_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(rows, STATE_SCHEMA)
