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
