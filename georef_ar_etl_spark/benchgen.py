"""Vectorized (numpy→pyarrow) CDC workload generator for benchmarks.

Same shape/semantics as datagen.py (F1/F2) but generated columnarly so a
multi-million-event workload materializes in seconds. Deterministic: fixed
seed, no wall-clock. Cached as parquet keyed by the size parameters.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from georef_ar_etl_spark.datagen import GROUPS, SOURCES, _group_weights
from georef_ar_etl_spark.schemas import DOC_ID_LEN

_STATE_PA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])
_EVENT_PA = pa.schema([
    ("batch_id", pa.int64()),
    ("seq", pa.int64()),
    ("op", pa.string()),
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])


def _doc_ids(rng: np.random.RandomState, n: int) -> np.ndarray:
    groups = rng.choice(GROUPS, size=n, p=_group_weights(len(GROUPS)))
    suffix_len = DOC_ID_LEN - 2
    suffixes = rng.randint(0, 10 ** suffix_len, size=n).astype(np.uint64)
    return np.char.add(
        groups.astype("U2"), np.char.zfill(suffixes.astype("U11"), suffix_len)
    )


def _token_lists(rng: np.random.RandomState, n: int, mean_len: float = 24.0):
    lens = np.clip(rng.lognormal(np.log(mean_len), 0.8, size=n), 1, 2048).astype(np.int64)
    total = int(lens.sum())
    values = rng.randint(1, 50000, size=total).astype(np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(values))
    return arr, lens.astype(np.int32)


def gen_bench_workload(
    out_dir: str,
    n_initial: int,
    n_events: int,
    n_batches: int,
    seed: int = 42,
    mean_tokens: float = 24.0,
    patch_frac: float = 0.0,
) -> tuple[str, str]:
    """Write initial.parquet + events.parquet under out_dir (cached).

    ``patch_frac`` converts that share of events into partial-column
    ``op='patch'`` updates (half withhold tokens, half withhold source —
    null = "keep"), carved out of the update share."""
    tag = f"i{n_initial}_e{n_events}_b{n_batches}_s{seed}_t{int(mean_tokens)}"
    if patch_frac:
        tag += f"_p{int(patch_frac * 100)}"
    root = os.path.join(out_dir, tag)
    ipath = os.path.join(root, "initial.parquet")
    edir = os.path.join(root, "events")
    done = os.path.join(root, "_DONE")
    if os.path.exists(ipath) and os.path.exists(done):
        return ipath, edir
    os.makedirs(edir, exist_ok=True)
    rng = np.random.RandomState(seed)

    ids = np.unique(_doc_ids(rng, int(n_initial * 1.1)))[:n_initial]
    rng.shuffle(ids)
    tokens, lens = _token_lists(rng, len(ids), mean_tokens)
    sources = rng.choice(SOURCES, size=len(ids))
    # bounded row groups: one-table-sized groups defeat Spark's split-by-
    # range scan parallelism and overflow its vectored-IO fetch window
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array(ids), tokens, pa.array(lens), pa.array(sources)], schema=_STATE_PA
        ),
        ipath,
        row_group_size=32768,
    )

    # events: 60% update / 30% insert / 10% delete; updates+deletes hit the
    # known-id pool (skewed by the pool's own Zipf group mass); one hot key
    # gets a burst. source skew: 70% 'wal'.
    if patch_frac:
        ops = rng.choice(
            ["update", "insert", "delete", "patch"],
            size=n_events,
            p=[max(0.6 - patch_frac, 0.0), 0.3, 0.1, patch_frac],
        )
    else:
        ops = rng.choice(
            ["update", "insert", "delete"], size=n_events, p=[0.6, 0.3, 0.1]
        )
    ev_ids = np.empty(n_events, dtype=ids.dtype)
    upd = ops != "insert"
    ev_ids[upd] = ids[rng.randint(0, len(ids), size=int(upd.sum()))]
    ins = ~upd
    ev_ids[ins] = _doc_ids(rng, int(ins.sum()))
    hot = rng.rand(n_events) < 0.02
    ev_ids[hot & upd] = ids[0]

    tokens_e, lens_e = _token_lists(rng, n_events, mean_tokens)
    is_del = ops == "delete"
    is_patch = ops == "patch"
    # partial images: half the patches withhold tokens, half withhold
    # source (null = keep); n_tok is derived-only so patches never carry it
    no_tokens = is_del | (is_patch & (rng.rand(n_events) < 0.5))
    mask = pa.array(~no_tokens)
    tokens_col = pa.compute.if_else(mask, tokens_e, pa.nulls(n_events, _EVENT_PA.field("tokens").type))
    lens_col = pa.compute.if_else(
        pa.array(~(is_del | is_patch)), pa.array(lens_e), pa.nulls(n_events, pa.int32())
    )
    src = np.where(rng.rand(n_events) < 0.7, "wal", rng.choice(SOURCES, size=n_events))
    src_col = pa.array(src)
    if patch_frac:
        no_src = is_patch & (rng.rand(n_events) < 0.5)
        src_col = pa.compute.if_else(
            pa.array(~no_src), src_col, pa.nulls(n_events, pa.string())
        )
    batch = np.sort(rng.randint(0, n_batches, size=n_events).astype(np.int64))
    seq = np.arange(1, n_events + 1, dtype=np.int64)
    table = pa.Table.from_arrays(
        [pa.array(batch), pa.array(seq), pa.array(ops), pa.array(ev_ids),
         tokens_col, lens_col, src_col],
        schema=_EVENT_PA,
    )
    # one WAL-segment file per batch_id (the natural CDC landing layout;
    # engine.replay_segments applies them without any batch-discovery scan)
    bounds = np.searchsorted(batch, np.arange(n_batches + 1))
    for k in range(n_batches):
        pq.write_table(
            table.slice(bounds[k], bounds[k + 1] - bounds[k]),
            os.path.join(edir, f"batch-{k:06d}.parquet"),
            row_group_size=32768,
        )
    with open(done, "w") as f:
        f.write("ok")
    return ipath, edir
