"""Generator-expected vs oracle parity (pure Python, no Ray).

The synthesizer records the intended main content per turn
(``_expected_main``); the oracle must recover it exactly for every payload
class — the semantic correctness of extraction itself, independent of
distribution (FIXTURES.md F3 with required CER = 0).
"""

from __future__ import annotations

from collections import Counter

from medical_ocr_pipeline_ray.functions.extract import extract_turn
from medical_ocr_pipeline_ray.functions.ocr_correct import digits_pattern
from medical_ocr_pipeline_ray.synth import gen_transcripts


def test_oracle_matches_generator_expected_t2_sample():
    rows = gen_transcripts(60, seed=42, min_turns=5, max_turns=30)
    assert len(rows) > 500
    classes = Counter()
    for r in rows:
        ex = extract_turn(r["text"], r["tool"])
        assert ex.text_extracted == r["_expected_main"], (
            r["_gen_class"], r["conv_id"], r["turn_idx"])
        classes[r["_gen_class"]] += 1
    # all payload classes exercised
    assert set(classes) == {"plain", "html", "markdown", "ocr_noisy",
                            "tool_pdf_payload", "tool_pdf_twocol",
                            "tool_pdf_bigfont", "tool_pdf_handwriting",
                            "tool_pdf_sparse", "form", "form_json",
                            "degenerate"}


def test_digit_preservation_invariant():
    """FIXTURES F5: numeric-token multiset of extracted text equals the
    golden main content's (per turn) for noisy turns."""
    rows = [r for r in gen_transcripts(60, seed=7, min_turns=5, max_turns=30)
            if r["_gen_class"] == "ocr_noisy"]
    assert rows
    for r in rows:
        ex = extract_turn(r["text"], r["tool"])
        assert digits_pattern(ex.text_extracted) == \
            digits_pattern(r["_expected_main"])


def test_spans_are_raw_offsets_and_accounted():
    """Spans index into the raw text; boilerplate is tagged, never lost
    from accounting (content retention via spans, FIXTURES F5)."""
    rows = gen_transcripts(30, seed=42, min_turns=3, max_turns=15)
    for r in rows:
        ex = extract_turn(r["text"], r["tool"])
        for s in ex.spans:
            assert 0 <= s["start"] <= s["end"] <= len(r["text"])
        if r["_gen_class"] == "html":
            assert any(s["kind"] == "boilerplate" for s in ex.spans)
        if r["_gen_class"] == "tool_pdf_payload":
            assert any(s["kind"] in ("header", "footer") for s in ex.spans)


def test_generator_deterministic():
    a = gen_transcripts(10, seed=42, min_turns=3, max_turns=8)
    b = gen_transcripts(10, seed=42, min_turns=3, max_turns=8)
    assert a == b
