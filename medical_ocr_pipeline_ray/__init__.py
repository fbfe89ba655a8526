"""medical_ocr_pipeline_ray — a Ray-Data-native data-processing engine.

From-scratch re-expression of alphapebble/medical-ocr-pipeline's
data-processing capabilities (see SURVEY.md) as idiomatic Ray Data:
``read_parquet → map_batches (zero-copy Arrow) → actor pools for stateful
stages → salted groupby assembly → partitioned write_parquet + manifest``.

The flagship pipeline is deterministic main-content extraction over
multi-turn transcript tables (HTML boilerplate strip, embedded-document
layout parse, OCR post-correction), verified per-turn against a
single-process oracle.  Alongside it the package ships the corpus-scale
operators a training-data pipeline needs: exact/MinHash-LSH/SimHash
dedup, similarity search over embeddings, text analysis, and relational
ops (joins/aggregates/top-k/windows) over Parquet tables.
"""

__version__ = "0.1.0"
