"""Targeted log hygiene for known-cosmetic Ray Data warnings."""

from __future__ import annotations

import logging

_EXECUTOR_LOGGER = "ray.data._internal.execution.streaming_executor_state"


class _EmptyBlockSchemaFilter(logging.Filter):
    """Drop the schema-mismatch warning Ray emits for SCHEMA-LESS empty
    blocks.

    Ray's sort / repartition fabricate empty pandas blocks for empty key
    ranges (``PandasBlockSchema(names=[], types=[])``); the streaming
    executor then warns about a "RefBundle with a different schema" once
    per such block.  Every UDF empty path in this repo returns a TYPED
    empty frame (full schema), so the schema-less flavor can only come
    from those Ray-internal fabricated blocks — pure noise.  Real schema
    mismatches (two non-empty schemas disagreeing) are kept."""

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        return not ("different schema" in msg
                    and "names=[], types=[]" in msg)


def silence_empty_block_schema_warnings() -> None:
    lg = logging.getLogger(_EXECUTOR_LOGGER)
    if not any(isinstance(f, _EmptyBlockSchemaFilter) for f in lg.filters):
        lg.addFilter(_EmptyBlockSchemaFilter())
