"""Flagship pipeline: transcript Parquet → extracted turns → conversations.

Lifecycle (SURVEY.md §3.4): ``read_parquet(fragments, include_paths=True)
→ map_batches(extract_cheap) → map_batches(HeavyExtractor actor pool)
→ write_parquet(partition_cols=[part]) + manifest commit → groupby(conv_id,
salt) assembly → conversations parquet``.

Resume model
------------
Input fragments are grouped into named partitions; partitions are processed
in bounded WAVES, each wave one streaming Ray Data run over only the
not-yet-committed partitions.  After a wave's write completes, each of its
partitions gets an atomic manifest record (lineage + metrics,
state/manifest.py).  A kill mid-wave loses at most that wave: on resume the
uncommitted partitions' output dirs are reset and reprocessed, so the final
output is partition-exact regardless of where the previous run died.

Scale notes
-----------
- The raw ``text`` payload column is dropped immediately after extraction
  (``finalize_turns``) so multi-MB tool payloads never enter the assembly
  shuffle.
- Assembly is the only all-to-all exchange; it is salted
  (stages/assemble.py) so mega-conversations cannot skew a single task.
- Output is hive-partitioned by source fragment → a 256-node run writes
  each partition independently and a rerun skips finished partitions.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.dataset as pads

import ray.data as rd

from ..config import (DEFAULT_EXTRACT, DEFAULT_PIPELINE, ExtractConfig,
                      PipelineConfig)
from ..stages.assemble import assemble_conversations
from ..stages.extract_stage import (HeavyExtractor, TURN_SCHEMA,
                                    extract_cheap_batch, finalize_turns)
from ..state.manifest import (commit_partition, load_manifest,
                              reset_partition_output)

WAVE_SIZE = 8


def list_fragments(input_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(input_dir, "*.parquet")))


def _partition_plan(fragments: list[str], per_part: int) -> dict[str, list[str]]:
    plan: dict[str, list[str]] = {}
    for i in range(0, len(fragments), per_part):
        plan[f"part-{i // per_part:05d}"] = fragments[i:i + per_part]
    return plan


def _add_partition_col(batch: pa.Table, path_to_part: dict[str, str]
                       ) -> pa.Table:
    parts = [path_to_part[os.path.basename(p)]
             for p in batch["path"].to_pylist()]
    batch = batch.drop_columns(["path"])
    return batch.append_column("part", pa.array(parts, pa.string()))


def build_turns_pipeline(ds: "rd.Dataset",
                         cfg: ExtractConfig = DEFAULT_EXTRACT,
                         pcfg: PipelineConfig = DEFAULT_PIPELINE,
                         keep_cols: tuple[str, ...] = (),
                         ) -> "rd.Dataset":
    """Per-turn extraction over a transcripts Dataset (no shuffle)."""
    extracted = ds.map_batches(
        extract_cheap_batch, batch_format="pyarrow",
        batch_size=pcfg.batch_size, fn_kwargs={"cfg": cfg})
    # autoscaling actor pool (min 1): a fixed-size pool of
    # heavy_concurrency × num_cpus actors can reserve every CPU on a small
    # node and starve the read stage (pipeline deadlock); (1, N) lets the
    # pool grow only while CPUs are free.
    heavy = extracted.map_batches(
        HeavyExtractor, batch_format="pyarrow",
        batch_size=pcfg.batch_size,
        concurrency=(1, pcfg.heavy_concurrency),
        num_cpus=pcfg.heavy_num_cpus,
        fn_constructor_kwargs={"cfg": cfg})
    keep = list(TURN_SCHEMA.names) + list(keep_cols)
    return heavy.map_batches(
        lambda b, _keep=tuple(keep): b.select(
            [n for n in _keep if n in b.column_names]),
        batch_format="pyarrow", batch_size=pcfg.batch_size)


def _partition_metrics(turns_root: str, part: str) -> dict:
    pdir = os.path.join(turns_root, f"part={part}")
    dset = pads.dataset(pdir, format="parquet")
    tbl = dset.to_table(columns=["content_chars", "payload_class"])
    classes = tbl["payload_class"].to_pylist()
    hist: dict[str, int] = {}
    for c in classes:
        hist[c] = hist.get(c, 0) + 1
    return {
        "rows": tbl.num_rows,
        "content_chars": int(pa.compute.sum(tbl["content_chars"]).as_py() or 0),
        "class_histogram": hist,
    }


def run_extraction(input_dir: str, out_dir: str, resume: bool = True,
                   cfg: ExtractConfig = DEFAULT_EXTRACT,
                   pcfg: PipelineConfig = DEFAULT_PIPELINE,
                   wave_size: int = WAVE_SIZE,
                   assemble: bool = True,
                   max_waves: int | None = None) -> dict:
    """Run (or resume) the flagship extraction; returns a run summary.

    ``max_waves`` stops after N waves (tests use it to simulate a kill
    between checkpoint commits)."""
    fragments = list_fragments(input_dir)
    if not fragments:
        raise FileNotFoundError(f"no parquet fragments under {input_dir}")
    plan = _partition_plan(fragments, pcfg.fragments_per_partition)
    turns_root = os.path.join(out_dir, "turns")
    done = load_manifest(out_dir, pcfg.stage_version) if resume else {}
    todo = [p for p in sorted(plan) if p not in done]
    os.makedirs(turns_root, exist_ok=True)

    processed = 0
    for wave_no, w in enumerate(range(0, len(todo), wave_size)):
        if max_waves is not None and wave_no >= max_waves:
            break
        wave = todo[w:w + wave_size]
        wave_files: list[str] = []
        path_to_part: dict[str, str] = {}
        for part in wave:
            reset_partition_output(os.path.join(turns_root, f"part={part}"))
            for f in plan[part]:
                wave_files.append(f)
                path_to_part[os.path.basename(f)] = part
        ds = rd.read_parquet(wave_files, include_paths=True)
        ds = ds.map_batches(_add_partition_col, batch_format="pyarrow",
                            fn_kwargs={"path_to_part": path_to_part})
        turns = build_turns_pipeline(ds, cfg, pcfg, keep_cols=("part",))
        turns.write_parquet(turns_root, partition_cols=["part"])
        for part in wave:
            metrics = _partition_metrics(turns_root, part)
            commit_partition(out_dir, {
                "partition": part,
                "fragments": [os.path.basename(f) for f in plan[part]],
                "stage_version": pcfg.stage_version,
                **metrics,
            })
            processed += 1

    summary = {
        "partitions_total": len(plan),
        "partitions_processed": processed,
        "partitions_skipped": len(plan) - len(todo),
    }
    if assemble:
        summary["conversations"] = run_assembly(out_dir, pcfg)
    return summary


def read_turns(out_dir: str) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(out_dir, "turns"))


def run_assembly(out_dir: str,
                 pcfg: PipelineConfig = DEFAULT_PIPELINE) -> dict:
    """Conversation assembly over the committed turns output.

    Derived data: rebuilt whole after the (expensive, checkpointed)
    extraction stage; at cluster scale this is one salted shuffle whose
    inputs are already partitioned parquet.
    """
    conv_dir = os.path.join(out_dir, "conversations")
    reset_partition_output(conv_dir)
    convs = assemble_conversations(read_turns(out_dir), pcfg)
    convs.write_parquet(conv_dir)
    n = pads.dataset(conv_dir, format="parquet").count_rows()
    return {"conversations": n}
