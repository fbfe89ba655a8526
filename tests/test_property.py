"""Property-based tests (hypothesis): extraction invariants hold for
ARBITRARY inputs, not just the synthetic corpus."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from medical_ocr_pipeline_ray.functions.extract import extract_turn
from medical_ocr_pipeline_ray.functions.ocr_correct import (correct_text,
                                                            digits_pattern)
from medical_ocr_pipeline_ray.functions.pdfblocks import Block, dedup_blocks
from medical_ocr_pipeline_ray.functions.fingerprint import (minhash_signature,
                                                            simhash64)

TEXTS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400)


@settings(max_examples=150, deadline=None)
@given(TEXTS, st.sampled_from(["", "pdf_reader", "browser"]))
def test_extract_total_and_deterministic(text, tool):
    """extract_turn never raises, spans index the raw text, and the result
    is deterministic."""
    a = extract_turn(text, tool)
    b = extract_turn(text, tool)
    assert a == b
    for s in a.spans:
        assert 0 <= s["start"] <= s["end"] <= len(text)
    assert a.payload_class in {"plain", "html", "markdown", "ocr_noisy",
                               "tool_pdf_payload", "empty"}
    if a.payload_class == "empty":
        assert a.text_extracted == ""


@settings(max_examples=150, deadline=None)
@given(TEXTS)
def test_correction_digit_invariance(text):
    """Fuzzy correction can never alter the numeric-token multiset relative
    to the rules+dictionary base (reference choose_text M13)."""
    from medical_ocr_pipeline_ray.functions.ocr_correct import (
        apply_dictionary, apply_rules)
    base = apply_dictionary(apply_rules(text))
    out = correct_text(text)
    assert digits_pattern(out) == digits_pattern(base)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.floats(0.5, 1.0),
                          st.integers(0, 900),
                          st.text(alphabet="abcdef ", min_size=5,
                                  max_size=40)),
                min_size=0, max_size=12),
       st.randoms(use_true_random=False))
def test_dedup_order_invariant(specs, rnd):
    """Greedy per-page dedup is deterministic under input permutation
    (SURVEY §4.3: order-dependent greedy needs a total tie-break)."""
    blocks = [Block(1, 10.0, float(y), 500.0, float(y) + 16, conf, "native",
                    txt, 0, len(txt))
              for conf, y, txt in specs]
    kept1, _ = dedup_blocks(list(blocks))
    shuffled = list(blocks)
    rnd.shuffle(shuffled)
    kept2, _ = dedup_blocks(shuffled)
    key = lambda b: (b.conf, b.y0, b.x0, b.text)
    assert sorted(map(key, kept1)) == sorted(map(key, kept2))


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abcdefgh ", max_size=300))
def test_sketches_deterministic(text):
    assert (minhash_signature(text) == minhash_signature(text)).all()
    assert simhash64(text) == simhash64(text)


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_merge_docs_fold_associative_property(data):
    """merge_dict fold property (reference 05_merge_and_validate merge_dict):
    folding any sequence of partial docs equals merging the folds of ANY
    contiguous split — the exact property that legalizes the salted
    two-phase document assembly."""
    from medical_ocr_pipeline_ray.functions.docschema import (
        doc_to_json, empty_doc, fold_docs, merge_docs)

    names = ["", "Ana", "Ben", "Zoe"]
    meds = [{"drug": d, "strength": s, "frequency": f}
            for d in ("x", "y") for s in ("", "10 mg") for f in ("", "daily")]

    def rand_doc():
        return {
            "patient": {"name": data.draw(st.sampled_from(names)),
                        "age": data.draw(st.sampled_from(["", "9", "44"]))},
            "doctor": {"name": data.draw(st.sampled_from(names))},
            "medications": data.draw(st.lists(st.sampled_from(meds),
                                              max_size=3)),
            "tests": data.draw(st.lists(
                st.sampled_from(["a", "b", "c"]), max_size=3)),
        }

    parts = [rand_doc() for _ in range(data.draw(st.integers(1, 6)))]
    cut = data.draw(st.integers(0, len(parts)))
    whole = fold_docs(parts)
    split = merge_docs(fold_docs(parts[:cut]) if cut else empty_doc(),
                       fold_docs(parts[cut:]) if cut < len(parts)
                       else empty_doc())
    assert doc_to_json(whole) == doc_to_json(split)


# ---------------------------------------------------------------------------
# Regex dialect parity: the BPE-ish pretokenizer (and the \S+ whitespace
# tokenizer) must count identically under Python re and DuckDB's RE2 —
# the contract doc_token_count's oracle rests on (leftmost-first
# alternation subset, no lookahead, ASCII classes).
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200))
def test_bpe_pretokenizer_dialect_parity(text):
    import re

    import duckdb

    from medical_ocr_pipeline_ray.pipelines.textops import (_BPE_PAT,
                                                            _BPE_SQL_PAT,
                                                            _WS_TOKEN_PAT)

    py_bpe = re.findall(_BPE_PAT, text)
    py_ws = len(re.findall(_WS_TOKEN_PAT, text))
    con = duckdb.connect()
    sq_bpe, sq_ws = con.execute(
        f"SELECT regexp_extract_all(?, '{_BPE_SQL_PAT}'),"
        f" len(regexp_extract_all(?, '{_WS_TOKEN_PAT}'))",
        [text, text]).fetchone()
    assert py_bpe == sq_bpe
    assert py_ws == sq_ws


@given(st.text(max_size=30), st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_levenshtein_dialect_parity(a, b):
    """The fuzzy-join DP must agree with DuckDB's levenshtein on
    arbitrary unicode strings (unit-cost standard edit distance)."""
    import duckdb

    from medical_ocr_pipeline_ray.pipelines.relational import _levenshtein

    con = duckdb.connect()
    want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
    assert _levenshtein(a, b) == want


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2 ** 31))
def test_ppm_roundtrip_property(w, h, seed):
    """encode→decode is the identity for any uint8 RGB field, and the
    grayscale matches the integer ITU-R 601-2 formula elementwise."""
    import numpy as np

    from medical_ocr_pipeline_ray.pipelines.multimodal import (
        _encode_ppm, decode_ppm, ppm_grayscale)

    rng = np.random.RandomState(seed % (2 ** 31))
    rgb = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    out = decode_ppm(_encode_ppm(rgb))
    np.testing.assert_array_equal(out, rgb)
    g = ppm_grayscale(out)
    expect = ((299 * rgb[..., 0].astype(int)
               + 587 * rgb[..., 1].astype(int)
               + 114 * rgb[..., 2].astype(int)) // 1000)
    np.testing.assert_array_equal(g.astype(int), expect)


@settings(max_examples=150, deadline=None)
@given(st.text(
    alphabet=st.sampled_from(list(
        "abcdefgh XYZ0123.!?\"'#-\t\n")), max_size=120))
def test_c4_line_filter_dialect_parity(text):
    """The C4 line-gating predicates (word count + terminal punctuation
    after strip) agree between the Python kernel and the DuckDB oracle
    expressions for adversarial whitespace/quote/newline mixes."""
    import re

    import duckdb

    word_rx = re.compile(r"[A-Za-z0-9]+")
    term_rx = re.compile(r'[.!?"]$')
    ws = " \t\r\f\v"
    py = [1 if (len(word_rx.findall(ln)) >= 2
                and term_rx.search(ln.strip(ws))) else 0
          for ln in text.split("\n")]
    con = duckdb.connect()
    sq = con.execute(
        "SELECT list_transform(string_split(?, chr(10)), line -> "
        "  CASE WHEN len(regexp_extract_all(line, '[A-Za-z0-9]+')) >= 2 "
        "            AND regexp_matches(trim(line, e' \\t\\r\\f\\v'), "
        "                               '[.!?\"]$') "
        "       THEN 1 ELSE 0 END)", [text]).fetchone()[0]
    assert py == sq
