"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray itself before importing this module; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``       — flagship per-turn extraction at the sf0.001-scale
  tier; returns a lazy ``ray.data.Dataset``.
- ``queries()``     — one callable per implemented operator
  (medical_ocr_pipeline_ray/pipelines/catalogue.py).
- ``oracle_sql()``  — DuckDB oracles for the SQL-expressible subset;
  non-SQL operators (extraction, sketch dedup, approximate kNN,
  multimodal) are verified in the pytest suite instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from medical_ocr_pipeline_ray.pipelines import catalogue


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale: transcripts → extracted turns."""
    return catalogue.extract_turns("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return catalogue.queries()


def oracle_sql() -> dict[str, str]:
    return catalogue.oracle_sql()
