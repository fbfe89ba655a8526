"""Checkpoint manifest: per-partition lineage + metrics, atomic, resumable.

The reference's resume story is implicit (per-page JSON files + a discovery
fallback chain, notebooks/03_llm_cleanup.ipynb:~88,
notebooks/04_json_extraction.ipynb:~89); here it is explicit and exact:

- one JSON record per completed partition, written atomically
  (tmp + ``os.replace``) under ``<out_dir>/_manifest/``;
- the record carries lineage (input fragment paths, row count, stage
  version) and extraction metrics (content chars, class histogram) — the
  analogue of the reference's per-run ``metadata.json`` / lineage / metrics
  sidecars (notebooks/05_merge_and_validate.ipynb:~52);
- resume = diff the manifest against the input fragment list and process
  only missing partitions; a partition whose record exists is never
  re-read.

A partition's output directory is remade from scratch before (re)writing,
so a kill mid-partition can never leave a half-written partition that the
manifest claims complete.
"""

from __future__ import annotations

import json
import os
import shutil


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _record_path(out_dir: str, partition: str) -> str:
    return os.path.join(manifest_dir(out_dir), f"{partition}.json")


def load_manifest(out_dir: str, stage_version: str | None = None
                  ) -> dict[str, dict]:
    """partition name → record; optionally filtered to one stage version
    (a version bump invalidates prior partitions)."""
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return {}
    out: dict[str, dict] = {}
    for fn in sorted(os.listdir(mdir)):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(mdir, fn)) as f:
            rec = json.load(f)
        if stage_version is not None and rec.get("stage_version") != stage_version:
            continue
        out[rec["partition"]] = rec
    return out


def commit_partition(out_dir: str, record: dict) -> None:
    """Atomically record a completed partition (tmp + rename)."""
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = _record_path(out_dir, record["partition"])
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, sort_keys=True)
    os.replace(tmp, path)


def reset_partition_output(part_dir: str) -> None:
    """Remove any partial output before (re)writing a partition."""
    if os.path.isdir(part_dir):
        shutil.rmtree(part_dir)
