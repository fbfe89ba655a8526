"""Text-analysis operators over the ``documents`` table.

Engine-grade generalizations of the reference's per-page text-quality and
term metrics (``analyze_text_quality``,
notebooks/01_qa_pipeline_evaluation.ipynb:~117; term harvest,
notebooks/qa_pipeline_evaluator.py:322-325): token counting, quality
counters, language-ID heuristic, content fingerprinting.  Every operator
here has an exact DuckDB oracle (see the *_SQL strings) — semantics were
designed for cross-engine bit-equality (ASCII regex classes, integer
counters, deterministic tie-breaks; functions/textstats.py).

All are stateless vectorizable batch maps: per-row Python string kernels
inside ``map_batches`` (regex work has no Arrow kernel), scaling linearly
with no shuffle.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd

from ..functions.textstats import (DE_STOPS, EN_STOPS, FR_STOPS, exact_hash,
                                   fingerprint_md5, lang_guess,
                                   quality_counts)


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=list(columns))


def doc_stats(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rows = [quality_counts(t) for t in df["text"]]
        out = pd.DataFrame(rows)
        out.insert(0, "doc_id", df["doc_id"].to_numpy())
        return out[["doc_id", "n_tokens", "n_punct", "n_upper", "n_stop",
                    "n_long_tokens", "n_single_char_tokens"]]
    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in sorted(set(words)))


DOC_STATS_SQL = f"""
SELECT doc_id,
  len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens,
  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
  len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
  len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      x -> x IN ({_sql_list(EN_STOPS)}))) AS n_stop,
  len(list_filter(regexp_extract_all(text, '[A-Za-z0-9_]+'),
      x -> length(x) > 20)) AS n_long_tokens,
  len(list_filter(regexp_extract_all(text, '[A-Za-z0-9_]+'),
      x -> length(x) = 1)) AS n_single_char_tokens
FROM documents
"""


def doc_lang_id(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "lang_guess": [lang_guess(t) for t in df["text"]]})
    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


DOC_LANG_SQL = f"""
WITH c AS (
  SELECT doc_id,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> x IN ({_sql_list(EN_STOPS)}))) AS en,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> x IN ({_sql_list(DE_STOPS)}))) AS de,
    len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        x -> x IN ({_sql_list(FR_STOPS)}))) AS fr
  FROM documents)
SELECT doc_id,
  CASE WHEN en = 0 AND de = 0 AND fr = 0 THEN 'und'
       WHEN de >= en AND de >= fr THEN 'de'
       WHEN en >= fr THEN 'en'
       ELSE 'fr' END AS lang_guess
FROM c
"""


def doc_fingerprint(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "exact_md5": [exact_hash(t) for t in df["text"]],
            "norm_md5": [fingerprint_md5(t) for t in df["text"]]})
    return _docs(sf_dir).map_batches(fn, batch_format="pandas")


DOC_FINGERPRINT_SQL = r"""
SELECT doc_id, md5(text) AS exact_md5,
       md5(trim(regexp_replace(lower(text), '[ \t\n\r\f\v]+', ' ', 'g')))
         AS norm_md5
FROM documents
"""
