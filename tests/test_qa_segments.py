"""QA layer + segment assembly tests (reference §2.5/§5 analogues)."""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _pdf(res):
    import ray.data as rd
    return res.to_pandas() if isinstance(res, rd.Dataset) else res


class TestQaFunctions:
    def test_cer_wer(self):
        from medical_ocr_pipeline_ray.functions.qa import cer, similarity, wer
        assert cer("abc", "abc") == 0.0
        assert cer("abcd", "abxd") == 0.25
        assert cer("", "") == 0.0
        assert cer("", "x") == 1.0
        assert wer("a b c d", "a b x d") == 0.25
        assert wer("a b", "a b") == 0.0
        assert similarity("abc", "abc") == 1.0


def test_qa_against_expected_is_zero(ray_session):
    """The reference GT path with required CER = 0: Ray output equals the
    generator sidecar for every turn."""
    from medical_ocr_pipeline_ray.pipelines.qa import qa_against_expected
    df = _pdf(qa_against_expected(SF_DIR))
    assert int(df["n_rows"].iloc[0]) > 100
    assert int(df["n_mismatch"].iloc[0]) == 0
    assert float(df["sum_cer"].iloc[0]) == 0.0
    assert float(df["max_cer"].iloc[0]) == 0.0


def test_qa_turn_metrics(ray_session):
    from medical_ocr_pipeline_ray.pipelines.qa import qa_turn_metrics
    df = _pdf(qa_turn_metrics(SF_DIR)).set_index("payload_class")
    assert {"plain", "html", "markdown", "ocr_noisy",
            "tool_pdf_payload"} <= set(df.index)
    # empty-output rate over non-empty inputs = 0 (FIXTURES F5): only the
    # 'empty' class may have zero-char outputs
    nonempty = df.drop(index="empty", errors="ignore")
    assert int(nonempty["n_empty_out"].sum()) == 0
    # per-turn dedup actually fired on pdf payloads
    assert int(df.loc["tool_pdf_payload", "blocks_dropped_dup"]) > 0


def test_qa_content_accounting(ray_session):
    from medical_ocr_pipeline_ray.pipelines.qa import qa_content_accounting
    df = _pdf(qa_content_accounting(SF_DIR)).set_index("payload_class")
    # plain is identity: extracted == span-accounted chars
    assert int(df.loc["plain", "extracted_chars"]) == \
        int(df.loc["plain", "span_chars"])
    # markdown spans cover lines but not the newline separators
    md_ex = int(df.loc["markdown", "extracted_chars"])
    md_sp = int(df.loc["markdown", "span_chars"])
    assert 0 < md_ex - md_sp < 0.05 * md_ex
    # html strips boilerplate: span accounting covers MORE than extraction
    assert int(df.loc["html", "span_chars"]) > \
        int(df.loc["html", "extracted_chars"])
    assert int(df["corpus_raw_chars"].iloc[0]) > 0


def test_segment_turns(ray_session):
    from medical_ocr_pipeline_ray.pipelines.segments import segment_turns
    df = _pdf(segment_turns(SF_DIR))
    assert len(df) > 100
    md = df[df["title"] != ""]
    assert len(md) > 0              # markdown headings became titled segments
    assert (df["n_lines"] >= 0).all()
    # deterministic
    again = _pdf(segment_turns(SF_DIR))
    a = df.sort_values(["conv_id", "turn_idx", "seg_idx"]).reset_index(drop=True)
    b = again.sort_values(["conv_id", "turn_idx", "seg_idx"]).reset_index(drop=True)
    assert a.equals(b)


def test_topk_boilerplate_turns(ray_session):
    from medical_ocr_pipeline_ray.pipelines.qa import topk_boilerplate_turns
    df = _pdf(topk_boilerplate_turns(SF_DIR))
    assert len(df) == 20
    assert (df["chars_removed"].to_numpy() >= 0).all()
    assert (np.diff(df["chars_removed"].to_numpy()) <= 0).all()  # desc order
    # the biggest strippers are html or pdf-payload turns
    assert set(df.head(5)["payload_class"]) <= {"html", "tool_pdf_payload"}


def test_export_metrics_csv(ray_session, tmp_path):
    import csv
    from medical_ocr_pipeline_ray.pipelines.extract_pipeline import (
        run_extraction)
    from medical_ocr_pipeline_ray.pipelines.qa import export_metrics_csv
    from medical_ocr_pipeline_ray.sources.transcripts import transcripts_dir
    out = str(tmp_path / "csvout")
    run_extraction(transcripts_dir("t1"), out, assemble=False)
    path = export_metrics_csv(out)
    with open(path) as f:
        rows = list(csv.reader(f))
    assert rows[0][:3] == ["partition", "rows", "content_chars"]
    assert len(rows) == 5   # header + 4 partitions
    from medical_ocr_pipeline_ray.synth import TIERS, gen_transcripts
    n_convs, lo, hi, skew, _sh = TIERS["t1"]
    expected = len(gen_transcripts(n_convs, 42, lo, hi, skew))
    assert sum(int(r[1]) for r in rows[1:]) == expected


def test_sample_events_seeded(ray_session):
    from medical_ocr_pipeline_ray.pipelines.catalogue import sample_events
    n1 = sample_events(SF_DIR).count()
    assert 0 < n1 < 1000    # ~10% of 1000 events


def test_engine_block_stats_match_pure_python(ray_session):
    """G5 parity: the Ray per-engine aggregate equals a sequential
    recomputation over the raw generated payloads."""
    from medical_ocr_pipeline_ray.functions.pdfblocks import (is_pdf_payload,
                                                              parse_payload)
    from medical_ocr_pipeline_ray.pipelines.qa import engine_block_stats
    from medical_ocr_pipeline_ray.synth import TIERS, gen_transcripts

    n_convs, lo, hi, skew, _ = TIERS["t1"]
    rows = gen_transcripts(n_convs, seed=42, min_turns=lo, max_turns=hi,
                           skew_conv_rows=skew)
    agg: dict[str, list] = {}
    for r in rows:
        if not r["tool"] or not is_pdf_payload(r["text"]):
            continue
        kept, low, _ = parse_payload(r["text"], min_conf=0.0)
        for b in kept + low:
            a = agg.setdefault(b.source, [0, 0, 0.0])
            a[0] += 1
            a[1] += len(b.text)
            a[2] += b.conf
    got = engine_block_stats("/root/testdata/sf0.001").to_pandas() \
        .sort_values("source").reset_index(drop=True)
    assert set(got["source"]) == set(agg)
    for _, row in got.iterrows():
        n, chars, conf = agg[row["source"]]
        assert int(row["n_blocks"]) == n
        assert abs(row["mean_chars"] - chars / n) < 1e-9
        assert abs(row["mean_conf"] - conf / n) < 1e-6
    assert {"native", "easyocr"} <= set(got["source"])


def test_quality_gate_no_silent_drops(ray_session):
    """G10 invariant as a query: unsanctioned content drop is ~zero for
    every payload class (everything removed is span-tagged), so no class
    has problem turns and composite scores are high."""
    from medical_ocr_pipeline_ray.pipelines.qa import qa_quality_gate
    df = qa_quality_gate("/root/testdata/sf0.001").to_pandas()
    assert len(df) >= 5
    assert int(df["n_problem"].sum()) == 0
    assert (df["preservation"] > 0.95).all()
    assert (df["composite_score"] > 0.8).all()
    assert ((df["composite_score"] <= 1.0) &
            (df["composite_score"] >= 0.0)).all()


def test_best_variant_argmax(ray_session):
    """O5: the chosen variant per tool turn really is the deterministic
    argmax over (blocks_kept, content_chars, name)."""
    from medical_ocr_pipeline_ray.config import DEFAULT_EXTRACT, ExtractConfig
    from medical_ocr_pipeline_ray.functions.pdfblocks import (
        extract_pdf_payload, is_pdf_payload)
    from medical_ocr_pipeline_ray.pipelines.qa import best_variant_extraction
    from medical_ocr_pipeline_ray.synth import TIERS, gen_transcripts

    got = best_variant_extraction("/root/testdata/sf0.001").to_pandas()
    assert len(got) > 0
    assert set(got["variant"]) <= {"strict", "lenient"}
    n_convs, lo, hi, skew, _ = TIERS["t1"]
    rows = {(r["conv_id"], r["turn_idx"]): r
            for r in gen_transcripts(n_convs, seed=42, min_turns=lo,
                                     max_turns=hi, skew_conv_rows=skew)}
    lenient = ExtractConfig(min_conf=0.30, adaptive_layout=False)
    sample = got.sort_values(["conv_id", "turn_idx"]).head(40)
    for _, row in sample.iterrows():
        r = rows[(row["conv_id"], row["turn_idx"])]
        assert r["tool"] and is_pdf_payload(r["text"])
        best = max(
            (extract_pdf_payload(r["text"], cfg)[2],
             len(extract_pdf_payload(r["text"], cfg)[0]), name)
            for name, cfg in (("strict", DEFAULT_EXTRACT),
                              ("lenient", lenient)))
        assert row["variant"] == best[2]
        assert int(row["blocks_kept"]) == best[0]


def test_payload_coverage_grid(ray_session):
    """G9 coverage mask: hand-verified grid for a crafted page + shape
    checks over the corpus."""
    import pandas as pd
    import ray.data as rd
    from medical_ocr_pipeline_ray.pipelines.qa import payload_coverage_grid

    df = payload_coverage_grid("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    g0 = np.asarray(df["coverage"].iloc[0])
    assert g0.shape == (64,)
    assert g0.sum() > 0
    # hand check: full-width block in the top band touches the whole
    # first row of an 8x8 grid
    from medical_ocr_pipeline_ray.functions.pdfblocks import parse_payload
    raw = "\n".join(["%PDFBLOCKS 1", "P 1 800 1000",
                     "B 0 0 800 125 0.9 native|full top band"])
    kept, _low, pdims = parse_payload(raw)
    b = kept[0]
    # the operator path: run the same math through a tiny synthetic check
    import numpy as _np
    grid = _np.zeros((8, 8), dtype=_np.int64)
    x0 = int(_np.clip(b.x0 / 800 * 8, 0, 7))
    x1 = int(_np.clip((b.x1 - 1e-9) / 800 * 8, 0, 7))
    y0 = int(_np.clip(b.y0 / 1000 * 8, 0, 7))
    y1 = int(_np.clip((b.y1 - 1e-9) / 1000 * 8, 0, 7))
    grid[y0:y1 + 1, x0:x1 + 1] += 1
    assert grid[0].sum() == 8 and grid[1:].sum() == 0


def test_export_qa_report_html(ray_session, tmp_path):
    import shutil
    from medical_ocr_pipeline_ray.pipelines.extract_pipeline import \
        run_extraction
    from medical_ocr_pipeline_ray.pipelines.qa import export_qa_report_html
    from medical_ocr_pipeline_ray.sources.transcripts import transcripts_dir
    out = str(tmp_path / "report_out")
    run_extraction(transcripts_dir("t1"), out)
    path = export_qa_report_html(out)
    html = open(path).read()
    assert "<table>" in html and "partitions" in html
    assert "tool_pdf_payload" in html


def test_annotate_turn_entities(ray_session):
    """M10 analogue: entity spans index into the extracted text, planted
    drugs/doses/tests from the form turns are recovered, text untouched."""
    from medical_ocr_pipeline_ray.functions.entities import annotate_entities
    from medical_ocr_pipeline_ray.pipelines.segments import \
        annotate_turn_entities
    from medical_ocr_pipeline_ray.synth import TIERS, gen_transcripts
    from medical_ocr_pipeline_ray.functions.extract import extract_turn

    got = annotate_turn_entities("/root/testdata/sf0.001").to_pandas()
    assert {"drug", "dose", "test"} <= set(got["ent_kind"])
    # spans really index the extracted text
    n_convs, lo, hi, skew, _ = TIERS["t1"]
    rows = {(r["conv_id"], r["turn_idx"]): r
            for r in gen_transcripts(n_convs, seed=42, min_turns=lo,
                                     max_turns=hi, skew_conv_rows=skew)}
    sample = got.sort_values(["conv_id", "turn_idx"]).head(200)
    for _, e in sample.iterrows():
        r = rows[(e["conv_id"], e["turn_idx"])]
        body = extract_turn(r["text"], r["tool"]).text_extracted
        assert body[e["ent_start"]:e["ent_end"]] == e["ent_text"]
    # parity with the pure function on one known form turn
    ents = annotate_entities("Medication: metformin 500 mg twice daily\n"
                             "Test: lipid panel")
    kinds = [(e["kind"], e["text"]) for e in ents]
    assert ("drug", "metformin") in kinds
    assert ("dose", "500 mg") in kinds
    assert ("test", "lipid panel") in kinds
