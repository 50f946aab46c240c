"""Pure-Python reference applier — the golden oracle for correctness tests.

Direct analogue of the reference's row-at-a-time extraction loop
(georef_ar_etl/transformers.py:67-151): a dict keyed by ``doc_id``, events
applied strictly in ``(batch_id, seq)`` order, with the same validation /
normalization / quarantine rules as the Spark engine. The pytest gate
compares the Spark table's final state to this per row, including exact
token-array equality (FIXTURES.md §F5).
"""

from __future__ import annotations

from georef_ar_etl_spark.functions.tokens import normalize_tokens_py
from georef_ar_etl_spark.operators import validate as V
from georef_ar_etl_spark.schemas import DOC_ID_LEN, GROUP_PREFIX_LEN, OPS


def apply_events(
    state: dict[str, dict],
    events: list[dict],
    dim_groups: set[str] | None = None,
) -> tuple[dict[str, dict], list[dict]]:
    """Apply ``events`` (each a dict with batch_id/seq/op/doc_id/tokens/n_tok/
    source and any extra payload columns) to ``state`` in replay order.

    Returns (new_state, quarantined) where quarantined carries the event plus
    its ``reason``. Sequential per-event apply is equivalent to the engine's
    per-batch dedup-by-seq + merge (last writer wins either way).
    """
    state = dict(state)
    quarantined: list[dict] = []
    payload_keys: set[str] = set()
    for row in state.values():
        payload_keys.update(row.keys())

    for ev in sorted(events, key=lambda e: (e["batch_id"], e["seq"])):
        op = ev.get("op")
        doc_id = ev.get("doc_id")
        tokens = ev.get("tokens")

        if op not in OPS:
            quarantined.append({**ev, "reason": V.BAD_OP})
            continue
        if doc_id is None or len(doc_id) != DOC_ID_LEN:
            quarantined.append({**ev, "reason": V.BAD_ID})
            continue
        # a PATCH's null tokens mean "keep" (schemas.OPS contract) — its
        # token rules apply only when the patch sets tokens; rule PRECEDENCE
        # mirrors tag_invalid's CASE chain exactly
        tok_checked = op in ("insert", "update") or (op == "patch" and tokens is not None)
        if (op in ("insert", "update") and (tokens is None or len(tokens) == 0)) or (
            op == "patch" and tokens is not None and len(tokens) == 0
        ):
            quarantined.append({**ev, "reason": V.EMPTY_TOKENS})
            continue
        if tok_checked and any(t is None for t in tokens):
            quarantined.append({**ev, "reason": V.NULL_TOKEN_ELEM})
            continue

        if op == "delete":
            state.pop(doc_id, None)
            continue

        if op == "patch":
            norm = None
            if tokens is not None:
                norm = normalize_tokens_py(tokens)
                if not norm:
                    quarantined.append({**ev, "reason": V.EMPTY_AFTER_NORM})
                    continue
            if dim_groups is not None and doc_id[:GROUP_PREFIX_LEN] not in dim_groups:
                quarantined.append({**ev, "reason": V.UNKNOWN_GROUP})
                continue
            row = state.get(doc_id)
            if row is None:
                continue  # patch of an absent key: counted no-op (patch_noop)
            row = dict(row)
            for k, v in ev.items():
                # n_tok is derived-only: always recomputed from tokens, a
                # patch never sets it directly
                if k in ("batch_id", "seq", "op", "n_tok", "tokens") or v is None:
                    continue
                row[k] = v
            if norm is not None:
                row["tokens"] = norm
                row["n_tok"] = len(norm)
            payload_keys.update(row.keys())
            state[doc_id] = row
            continue

        # rule PRECEDENCE matches tag_invalid exactly: empty-after-norm is
        # decided BEFORE the dim-group lookup (the engine sets it in the CASE
        # chain and the dim join only fills still-null reasons) — per-reason
        # manifest histograms must agree, not just the quarantined row set
        norm = normalize_tokens_py(tokens)
        if not norm:
            quarantined.append({**ev, "reason": V.EMPTY_AFTER_NORM})
            continue
        if dim_groups is not None and doc_id[:GROUP_PREFIX_LEN] not in dim_groups:
            quarantined.append({**ev, "reason": V.UNKNOWN_GROUP})
            continue

        row = {
            k: v
            for k, v in ev.items()
            if k not in ("batch_id", "seq", "op")
        }
        row["doc_id"] = doc_id
        row["tokens"] = norm
        row["n_tok"] = len(norm)
        payload_keys.update(row.keys())
        state[doc_id] = row

    # additive schema evolution: older rows read the new columns as null
    for row in state.values():
        for k in payload_keys:
            row.setdefault(k, None)
    return state, quarantined


def state_as_sorted_rows(state: dict[str, dict]) -> list[dict]:
    return [state[k] for k in sorted(state)]
