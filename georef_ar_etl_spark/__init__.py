"""georef_ar_etl_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of datosgobar/georef-ar-etl (reference at
/root/reference, studied for WHAT it computes, never ported) as an idiomatic
Spark DataFrame engine:

* change-event micro-batches (insert/update/delete keyed by ``doc_id``) applied
  as MERGE-style upserts into snapshot tables of pre-tokenized training
  sequences ``(doc_id string, tokens array<int>, n_tok int, source string)``
  — the Spark-first rewrite of the reference's snapshot-diff-and-upsert kernel
  (reference: georef_ar_etl/transformers.py:67-151);
* exactly-once, resumable commits via per-epoch atomic manifests
  (reference analogues: one-transaction-per-process commit,
  georef_ar_etl/process.py:250-257, and download-resume,
  georef_ar_etl/extractors.py:14-16);
* additive schema evolution (reference analogue: Alembic additive migrations);
* vectorized Arrow/pandas UDFs for payload normalization — never per-row
  Python (reference's per-row ``_process_entity`` hooks, transformers.py:160);
* large-scale training-data operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), similarity search, text analysis, multimodal plumbing.
"""

__version__ = "0.1.0"

from georef_ar_etl_spark.session import get_spark  # noqa: F401
