"""Transcript table source: synthesized-once, cached, read as a Dataset.

The driver's testdata has no transcripts table (FIXTURES.md F6), so the
primary input is synthesized deterministically (synth.py, seed=42) into a
sharded Parquet cache under /tmp and read back with
``ray.data.read_parquet`` — the same read path a real corpus would use.
"""

from __future__ import annotations

import os

import ray.data as rd

from ..synth import materialize_tier, tier_for_sf_dir


def transcripts_dir(tier: str = "t2", seed: int = 42) -> str:
    root = materialize_tier(tier, seed=seed)
    return os.path.join(root, "transcripts")


def expected_dir(tier: str = "t2", seed: int = 42) -> str:
    root = materialize_tier(tier, seed=seed)
    return os.path.join(root, "expected")


def read_transcripts(tier: str = "t2", seed: int = 42,
                     columns: list[str] | None = None) -> "rd.Dataset":
    return rd.read_parquet(transcripts_dir(tier, seed), columns=columns)


def read_transcripts_for_sf(sf_dir: str) -> "rd.Dataset":
    return read_transcripts(tier_for_sf_dir(sf_dir))


def to_jsonl_shards(src_dir: str, out_dir: str) -> str:
    """Convert a parquet transcript directory to JSONL shards (one file
    per fragment) — the interchange format agent-log producers commonly
    emit.  Timestamps serialize as ISO-8601 strings; the extraction
    pipeline never reads ``ts``, so both source formats drive identical
    extraction output (asserted in tests)."""
    import json

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for f in sorted(os.listdir(src_dir)):
        if not f.endswith(".parquet"):
            continue
        rows = pq.read_table(src_dir + "/" + f).to_pylist()
        out = os.path.join(out_dir, f.replace(".parquet", ".jsonl"))
        with open(out + ".tmp", "w") as fh:
            for r in rows:
                r = dict(r)
                ts = r.get("ts")
                if ts is not None and not isinstance(ts, str):
                    r["ts"] = ts.isoformat()
                fh.write(json.dumps(r) + "\n")
        os.replace(out + ".tmp", out)
    return out_dir


def read_transcripts_jsonl(path: str) -> "rd.Dataset":
    """Transcript source over JSONL shards (``ray.data.read_json``) —
    the same Dataset shape as the parquet reader, so every downstream
    stage (extraction, assembly, QA) runs unchanged on either format."""
    return rd.read_json(path)
