"""Ray Data pipeline vs single-process oracle (FIXTURES F3/F4/F5)."""

from __future__ import annotations

import os
import shutil

import pytest

from medical_ocr_pipeline_ray.oracle import oracle_assemble, oracle_extract_turns
from medical_ocr_pipeline_ray.synth import TIERS, gen_transcripts

from .conftest import spans_tuples


def _golden(tier: str):
    n_convs, lo, hi, skew, _sh = TIERS[tier]
    rows = gen_transcripts(n_convs, seed=42, min_turns=lo, max_turns=hi,
                           skew_conv_rows=skew)
    turns = oracle_extract_turns(rows)
    return turns, oracle_assemble(turns)


@pytest.fixture(scope="module")
def t1_run(ray_session, tmp_path_factory):
    from medical_ocr_pipeline_ray.pipelines.extract_pipeline import (
        read_conversations, read_turns, run_extraction)
    from medical_ocr_pipeline_ray.sources.transcripts import transcripts_dir

    out = str(tmp_path_factory.mktemp("mopr") / "t1_out")
    summary = run_extraction(transcripts_dir("t1"), out, wave_size=2)
    turns = (read_turns(out).to_pandas()
             .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    convs = (read_conversations(out).to_pandas()
             .sort_values("conv_id").reset_index(drop=True))
    return summary, turns, convs, out


def test_turns_match_oracle(t1_run):
    _summary, turns, _convs, _out = t1_run
    golden, _gc = _golden("t1")
    assert len(turns) == len(golden)
    for col in ("conv_id", "turn_idx", "payload_class", "text_extracted",
                "blocks_kept", "blocks_dropped_dup", "content_chars"):
        assert (turns[col].values == golden[col].values).all(), col
    for a, b in zip(turns["spans"], golden["spans"]):
        assert spans_tuples(a) == spans_tuples(b)


def test_conversations_match_oracle(t1_run):
    _summary, _turns, convs, _out = t1_run
    _gt, golden = _golden("t1")
    assert len(convs) == len(golden)
    for col in ("conv_id", "n_turns", "content_chars", "full_text", "sha256"):
        assert (convs[col].values == golden[col].values).all(), col


def test_manifest_lineage(t1_run):
    from medical_ocr_pipeline_ray.state.manifest import load_manifest
    summary, turns, _convs, out = t1_run
    man = load_manifest(out)
    assert summary["partitions_total"] == len(man)
    assert sum(r["rows"] for r in man.values()) == len(turns)
    assert sum(r["content_chars"] for r in man.values()) == \
        int(turns["content_chars"].sum())
    for rec in man.values():
        assert rec["fragments"] and rec["stage_version"]
        assert set(rec["class_histogram"]) <= {
            "plain", "html", "markdown", "ocr_noisy", "tool_pdf_payload",
            "empty"}


def test_determinism_across_batch_sizes(ray_session):
    """FIXTURES F5: same output across batch_size ∈ {1, 7, 256}."""
    import ray.data as rd
    from medical_ocr_pipeline_ray.config import PipelineConfig
    from medical_ocr_pipeline_ray.pipelines.extract_pipeline import (
        build_turns_pipeline)
    from medical_ocr_pipeline_ray.sources.transcripts import transcripts_dir

    results = []
    for bs in (1, 7, 256):
        ds = rd.read_parquet(transcripts_dir("t1"))
        pcfg = PipelineConfig(batch_size=bs, heavy_concurrency=2)
        df = (build_turns_pipeline(ds, pcfg=pcfg).to_pandas()
              .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
        results.append(df)
    base = results[0]
    for other in results[1:]:
        assert (base["text_extracted"].values ==
                other["text_extracted"].values).all()
        assert (base["blocks_dropped_dup"].values ==
                other["blocks_dropped_dup"].values).all()


def test_skewed_assembly_matches_oracle(ray_session, tmp_path):
    """FIXTURES F2: salted two-phase assembly == unsalted oracle result,
    with one mega-conversation holding ~30% of rows."""
    import ray.data as rd
    from medical_ocr_pipeline_ray.config import PipelineConfig
    from medical_ocr_pipeline_ray.stages.assemble import assemble_conversations
    from medical_ocr_pipeline_ray.pipelines.extract_pipeline import (
        build_turns_pipeline)
    from medical_ocr_pipeline_ray.sources.transcripts import transcripts_dir

    ds = rd.read_parquet(transcripts_dir("t2skew"))
    pcfg = PipelineConfig(salt_span=64)   # force many salt buckets
    turns = build_turns_pipeline(ds, pcfg=pcfg)
    convs = (assemble_conversations(turns, pcfg).to_pandas()
             .sort_values("conv_id").reset_index(drop=True))
    _gt, golden = _golden("t2skew")
    assert len(convs) == len(golden)
    assert (convs["sha256"].values == golden["sha256"].values).all()
    assert (convs["n_turns"].values == golden["n_turns"].values).all()
    mega = golden["n_turns"].max()
    assert mega >= 2000   # the skew fixture really is skewed


def test_staged_assembly_with_mega_conversation(ray_session, tmp_path):
    """run_assembly's staged path: single-salt convs finalized in the fold
    pass, the mega conversation merged via the tiny partial shuffle —
    result equals the oracle exactly (FIXTURES F2)."""
    from medical_ocr_pipeline_ray.pipelines.extract_pipeline import (
        read_conversations, run_extraction)
    from medical_ocr_pipeline_ray.sources.transcripts import transcripts_dir

    out = str(tmp_path / "skew_out")
    run_extraction(transcripts_dir("t2skew"), out)
    convs = (read_conversations(out).to_pandas()
             .sort_values("conv_id").reset_index(drop=True))
    _gt, golden = _golden("t2skew")
    assert len(convs) == len(golden)
    for col in ("conv_id", "n_turns", "content_chars", "sha256"):
        assert (convs[col].values == golden[col].values).all(), col
    # the mega conversation really took the merged path
    import os
    assert os.path.isdir(os.path.join(out, "conversations", "merged"))


def test_poison_row_quarantine(ray_session, monkeypatch):
    """A row whose extraction raises survives as payload_class='error'
    instead of failing the partition (SURVEY §4.2 dead-letter)."""
    import pyarrow as pa
    from medical_ocr_pipeline_ray.stages import extract_stage

    def bomb(text, tool="", cfg=None, cls=None):
        raise RuntimeError("boom")

    monkeypatch.setattr(extract_stage, "extract_turn", bomb)
    batch = pa.table({
        "conv_id": pa.array(["c1", "c2"]),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": pa.array(["user", "tool"]),
        "text": pa.array(["<p>some html that routes to python path</p>",
                          "%PDFBLOCKS 1\nP 1 800 1000\n"
                          "B 50 300 750 316 0.9 native|line"]),
        "tool": pa.array(["", "pdf_reader"]),
    })
    out = extract_stage.extract_full_batch(batch)
    df = out.to_pandas().sort_values("conv_id")
    assert list(df["payload_class"]) == ["error", "error"]
    assert list(df["text_extracted"]) == ["", ""]


def test_resume_partition_exact(ray_session, tmp_path):
    """FIXTURES F5 resume: kill after K waves → resume → identical output
    and identical manifest vs an uninterrupted run."""
    import pandas as pd
    import ray.data as rd
    from medical_ocr_pipeline_ray.pipelines.extract_pipeline import (
        read_turns, run_extraction)
    from medical_ocr_pipeline_ray.sources.transcripts import transcripts_dir
    from medical_ocr_pipeline_ray.state.manifest import load_manifest

    tdir = transcripts_dir("t1")
    out_a = str(tmp_path / "uninterrupted")
    out_b = str(tmp_path / "resumed")

    run_extraction(tdir, out_a, wave_size=1, assemble=False)
    # simulated kill: only 2 of 4 waves complete, then a junk partial dir
    summary_b1 = run_extraction(tdir, out_b, wave_size=1, assemble=False,
                                max_waves=2)
    assert summary_b1["partitions_processed"] == 2
    junk = os.path.join(out_b, "turns", "part=part-00002")
    os.makedirs(junk, exist_ok=True)
    with open(os.path.join(junk, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    summary_b2 = run_extraction(tdir, out_b, wave_size=1, assemble=False)
    assert summary_b2["partitions_skipped"] == 2

    def content(out):
        df = (read_turns(out).to_pandas()
              .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
        return df[["conv_id", "turn_idx", "text_extracted", "content_chars"]]

    pd.testing.assert_frame_equal(content(out_a), content(out_b))
    man_a, man_b = load_manifest(out_a), load_manifest(out_b)
    assert man_a == man_b


def test_jsonl_source_extraction_parity(ray_session, tmp_path):
    """The JSONL transcript source drives byte-identical extraction
    output to the parquet source — same corpus, two interchange
    formats, one pipeline."""
    from medical_ocr_pipeline_ray.pipelines.extract_pipeline import \
        build_turns_pipeline
    from medical_ocr_pipeline_ray.sources.transcripts import (
        read_transcripts, to_jsonl_shards, transcripts_dir)

    jdir = to_jsonl_shards(transcripts_dir("t1"), str(tmp_path / "jsonl"))
    cols = ["conv_id", "turn_idx", "payload_class", "text_extracted",
            "blocks_kept", "blocks_dropped_dup", "content_chars"]
    from medical_ocr_pipeline_ray.sources.transcripts import \
        read_transcripts_jsonl
    a = build_turns_pipeline(read_transcripts("t1")) \
        .select_columns(cols).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = build_turns_pipeline(read_transcripts_jsonl(jdir)) \
        .select_columns(cols).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in cols:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_empty_input_dir_raises_cleanly(ray_session, tmp_path):
    """An input directory with no fragments fails loudly up front
    (FileNotFoundError), never as a mid-pipeline mystery."""
    import pytest as _pt

    from medical_ocr_pipeline_ray.pipelines.extract_pipeline import \
        run_extraction

    empty = tmp_path / "no_fragments"
    empty.mkdir()
    with _pt.raises(FileNotFoundError):
        run_extraction(str(empty), str(tmp_path / "out"))
