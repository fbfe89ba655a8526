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
