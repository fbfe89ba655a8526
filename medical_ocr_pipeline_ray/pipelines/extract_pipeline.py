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
from ..stages.extract_stage import (HeavyExtractor, extract_cheap_batch,
                                    extract_full_batch)
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
    """Per-turn extraction over a transcripts Dataset (no shuffle).

    Default path: ONE elastic task-pool stage with per-worker-process
    cached state (measured ~40% faster than a bounded actor pool for this
    light state — see stages/extract_stage.py).  ``use_actor_pool=True``
    switches to the two-tier cheap-tasks → heavy-actor-pool routing, the
    right shape when the heavy state is expensive (models, indexes).
    """
    if not pcfg.use_actor_pool:
        return ds.map_batches(
            extract_full_batch, batch_format="pyarrow",
            batch_size=pcfg.batch_size,
            fn_kwargs={"cfg": cfg, "keep_cols": tuple(keep_cols)})
    extracted = ds.map_batches(
        extract_cheap_batch, batch_format="pyarrow",
        batch_size=pcfg.batch_size, fn_kwargs={"cfg": cfg})
    # autoscaling actor pool (min 1): a fixed-size pool of
    # heavy_concurrency × num_cpus actors can reserve every CPU on a small
    # node and starve the read stage (pipeline deadlock); (min, N) lets the
    # pool grow only while CPUs are free.
    if pcfg.heavy_concurrency is None:
        import ray
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if \
            ray.is_initialized() else 8
        heavy_n = max(2, ncpu - 2)
    else:
        heavy_n = pcfg.heavy_concurrency
    return extracted.map_batches(
        HeavyExtractor, batch_format="pyarrow",
        batch_size=pcfg.batch_size,
        concurrency=(max(1, heavy_n // 2), heavy_n),
        num_cpus=pcfg.heavy_num_cpus,
        fn_constructor_kwargs={"cfg": cfg, "keep_cols": tuple(keep_cols)})


def _partition_metrics(turns_root: str, part: str,
                       salt_budget: int = 0) -> dict:
    pdir = os.path.join(turns_root, f"part={part}")
    dset = pads.dataset(pdir, format="parquet")
    tbl = dset.to_table(columns=["content_chars", "payload_class",
                                 "conv_id"])
    classes = tbl["payload_class"].to_pylist()
    hist: dict[str, int] = {}
    for c in classes:
        hist[c] = hist.get(c, 0) + 1
    out = {
        "rows": tbl.num_rows,
        "content_chars": int(pa.compute.sum(tbl["content_chars"]).as_py() or 0),
        "class_histogram": hist,
    }
    if salt_budget:
        # mega-conversation CANDIDATES for byte-budget salting, computed
        # on the lineage read-back this function already does (the
        # partition's columns are in hand) so run_assembly's discovery
        # pre-pass becomes a manifest lookup.  At-risk rule as in
        # stages/assemble.find_salt_boundaries: partition-local total ≥
        # budget, or the partition's first/last conversation (may
        # continue in a neighboring partition).  Arrow-native hash
        # aggregate — a pylist/pandas pass over millions of conv_id
        # strings measurably taxes the extraction phase.
        import pyarrow.compute as pc_
        if tbl.num_rows:
            g = pa.TableGroupBy(tbl.select(["conv_id", "content_chars"]),
                                "conv_id").aggregate(
                                    [("content_chars", "sum")])
            edge = pa.array([tbl["conv_id"][0].as_py(),
                             tbl["conv_id"][tbl.num_rows - 1].as_py()])
            keep = pc_.or_(
                pc_.greater_equal(g["content_chars_sum"],
                                  pa.scalar(salt_budget, pa.int64())),
                pc_.is_in(g["conv_id"], value_set=edge))
            sel = g.filter(keep)
            out["mega_candidates"] = dict(zip(
                sel["conv_id"].to_pylist(),
                (int(x) for x in sel["content_chars_sum"].to_pylist())))
        else:
            out["mega_candidates"] = {}
        out["salt_budget"] = int(salt_budget)
    return out


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
        # block granularity scaled to the cluster: ~8 blocks per CPU keeps
        # every core busy through the tail without per-task overhead blowup
        import ray as _ray
        ncpu = int(_ray.cluster_resources().get("CPU", 8)) if \
            _ray.is_initialized() else 8
        par = max(len(wave_files), ncpu * 8)
        ds = rd.read_parquet(wave_files, include_paths=True,
                             parallelism=par)
        ds = ds.map_batches(_add_partition_col, batch_format="pyarrow",
                            fn_kwargs={"path_to_part": path_to_part})
        turns = build_turns_pipeline(ds, cfg, pcfg, keep_cols=("part",))
        # zstd: ~2× smaller files than snappy → less disk/network per block
        # (compression CPU rides the parallel write tasks, which scales;
        # raw IO bandwidth does not)
        turns.write_parquet(turns_root, partition_cols=["part"],
                            compression="zstd")
        # lineage metrics: cheap columnar read-back of each partition, run
        # as Ray tasks so it scales with the cluster (not the driver)
        import ray
        budget = pcfg.salt_byte_budget
        if ray.is_initialized() and len(wave) > 4:
            mtask = ray.remote(num_cpus=0.5)(_partition_metrics)
            metrics_list = ray.get(
                [mtask.remote(turns_root, p, budget) for p in wave])
        else:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=8) as pool:
                metrics_list = list(pool.map(
                    lambda p: _partition_metrics(turns_root, p, budget),
                    wave))
        for part, metrics in zip(wave, metrics_list):
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


def read_turns(out_dir: str, columns: list[str] | None = None) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(out_dir, "turns"), columns=columns)


def run_assembly(out_dir: str,
                 pcfg: PipelineConfig = DEFAULT_PIPELINE) -> dict:
    """Conversation assembly over the committed turns output.

    Staged single-shuffle design: ONE ``groupby(bucket, salt)`` exchange
    folds every conversation; complete (single-salt) conversations — the
    overwhelming majority — are finalized in that same pass and written
    straight to ``conversations/base``.  Only the rare multi-salt
    (mega-conversation) partials take a second, tiny shuffle and land in
    ``conversations/merged``.  The bulk of the corpus therefore rides
    exactly one exchange + one write.  Read the result back with
    ``read_conversations``.
    """
    import pyarrow.compute as pc_
    import pyarrow.dataset as _pads

    conv_dir = os.path.join(out_dir, "conversations")
    reset_partition_output(conv_dir)
    base_dir = os.path.join(conv_dir, "base")
    merged_dir = os.path.join(conv_dir, "merged")
    # column-pruned read: assembly needs 4 of the 10 turn columns (spans —
    # the widest column — never leaves the parquet files)
    turns = read_turns(out_dir, columns=[
        "conv_id", "turn_idx", "text_extracted", "content_chars"])
    from ..stages.assemble import (_add_keys, boundaries_for_megaset,
                                   fold_or_finalize, merge_partials,
                                   salt_boundaries_ref)
    # Byte-budget salting: mega-conversations get per-chunk salts so no
    # salt group exceeds ~salt_byte_budget bytes.  The manifest carries
    # per-partition mega CANDIDATES (computed on the lineage read-back at
    # extraction time), so the common no-mega case costs a dict lookup;
    # outputs without candidates (or a different budget) fall back to the
    # full slim discovery pre-pass.
    bref = None
    if pcfg.salt_byte_budget:
        recs = list(load_manifest(out_dir, pcfg.stage_version).values())
        slim_cols = ["conv_id", "turn_idx", "content_chars"]
        if recs and all(
                r.get("salt_budget") == pcfg.salt_byte_budget and
                "mega_candidates" in r for r in recs):
            agg: dict[str, int] = {}
            for r in recs:
                for c, t in r["mega_candidates"].items():
                    agg[c] = agg.get(c, 0) + int(t)
            mega = {c: t for c, t in agg.items()
                    if t > pcfg.salt_byte_budget}
            if mega:
                bmap = boundaries_for_megaset(
                    read_turns(out_dir, columns=slim_cols), mega,
                    pcfg.salt_byte_budget, cap=pcfg.mega_conv_cap)
                import ray as _ray2
                bref = _ray2.put(bmap) if bmap else None
        else:
            bref = salt_boundaries_ref(
                read_turns(out_dir, columns=slim_cols), pcfg)
    keyed = turns.map_batches(
        _add_keys, batch_format="pyarrow", batch_size=pcfg.batch_size,
        fn_kwargs={"buckets": pcfg.assembly_buckets,
                   "salt_span": pcfg.salt_span,
                   "boundaries": bref})
    folded = keyed.groupby(["bucket", "salt"]).map_groups(
        fold_or_finalize, batch_format="pandas",
        fn_kwargs={"salt_span": pcfg.salt_span, "boundaries": bref})
    folded.write_parquet(base_dir, compression="zstd")

    # tiny second pass: only multi-salt partials (predicate pushdown)
    partials = rd.read_parquet(base_dir,
                               filter=(pc_.field("is_final") == False))  # noqa: E712
    n_partial_rows = partials.count()
    n_merged = 0
    if n_partial_rows:
        merged = partials.groupby("conv_id").map_groups(
            merge_partials, batch_format="pandas")
        merged.write_parquet(merged_dir, compression="zstd")
        n_merged = _pads.dataset(merged_dir, format="parquet").count_rows()
    n_final = _pads.dataset(base_dir, format="parquet").scanner(
        columns=["is_final"],
        filter=_pads.field("is_final") == True).count_rows()  # noqa: E712
    return {"conversations": n_final + n_merged}


def read_conversations(out_dir: str) -> "rd.Dataset":
    """The assembled conversation table (CONV_SCHEMA): finalized rows from
    the base fold plus merged multi-salt conversations."""
    import pyarrow.compute as pc_
    conv_dir = os.path.join(out_dir, "conversations")
    base = rd.read_parquet(
        os.path.join(conv_dir, "base"),
        columns=["conv_id", "n_turns", "content_chars", "full_text",
                 "sha256", "is_final"],
        filter=(pc_.field("is_final") == True))  # noqa: E712
    base = base.drop_columns(["is_final"])
    merged_dir = os.path.join(conv_dir, "merged")
    if os.path.isdir(merged_dir):
        base = base.union(rd.read_parquet(merged_dir))
    return base
