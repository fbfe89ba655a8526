"""Unit tests for the pure per-turn extraction functions (no Ray)."""

from __future__ import annotations

from medical_ocr_pipeline_ray.functions.classify import classify_turn
from medical_ocr_pipeline_ray.functions.fingerprint import (
    hamming64, jaccard, lsh_band_keys, minhash_signature, shingles, simhash64)
from medical_ocr_pipeline_ray.functions.html_extract import extract_html
from medical_ocr_pipeline_ray.functions.markdown_seg import segment_markdown
from medical_ocr_pipeline_ray.functions.ocr_correct import (
    apply_dictionary, apply_fuzzy, apply_rules, correct_text, digits_pattern,
    should_correct)
from medical_ocr_pipeline_ray.functions.pdfblocks import (
    extract_pdf_payload, parse_payload)
from medical_ocr_pipeline_ray.functions.textstats import (
    fingerprint_md5, lang_guess, quality_counts, token_count)
from medical_ocr_pipeline_ray.synth import FUZZY_PAIRS


class TestOcrCorrect:
    def test_rules(self):
        assert apply_rules("a • b — c × d   e") == "a - b - c x d e"

    def test_dictionary_case_aware(self):
        assert apply_dictionary("necrosls and Necrosls and NECROSLS") == \
            "necrosis and Necrosis and NECROSIS"

    def test_fuzzy_pairs_all_recover(self):
        for wrong, right in FUZZY_PAIRS:
            assert apply_fuzzy(wrong) == right, wrong
            assert apply_fuzzy(wrong.capitalize()) == right.capitalize()

    def test_fuzzy_leaves_vocab_and_acronyms(self):
        assert apply_fuzzy("patient normal ABC") == "patient normal ABC"

    def test_digit_invariance_reverts_fuzzy(self):
        # a fuzzy change that would alter digits must be rejected wholesale
        base = "dose 100 mg examinaton"
        out = correct_text(base)
        assert digits_pattern(out) == digits_pattern(base)
        assert "examination" in out

    def test_should_correct(self):
        assert should_correct("hello @@ world")
        assert should_correct("a1b pattern")
        assert should_correct("run lll end")
        assert not should_correct("a clean sentence with 100 mg dose")


class TestHtml:
    RAW = ("<html><head><title>T</title><script>x()</script></head><body>"
           "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
           "<h2>Heading Here</h2>"
           "<p>This is the main paragraph with enough text to count fine.</p>"
           "<div><a href='#'>Share</a> <a href='#'>Tweet</a></div>"
           "<footer><a href='/t'>Terms</a></footer></body></html>")

    def test_main_only(self):
        text, spans = extract_html(self.RAW)
        assert text == ("Heading Here\n"
                        "This is the main paragraph with enough text to count"
                        " fine.")
        kinds = {s["kind"] for s in spans}
        assert "boilerplate" in kinds and "main" in kinds and "heading" in kinds

    def test_spans_index_raw(self):
        text, spans = extract_html(self.RAW)
        for s in spans:
            assert 0 <= s["start"] < s["end"] <= len(self.RAW)
        main = [s for s in spans if s["kind"] == "main"]
        assert self.RAW[main[0]["start"]:main[0]["end"]].startswith("This is")

    def test_entities_decoded(self):
        text, _ = extract_html("<p>Salt &amp; pepper makes a fine dinner"
                               " indeed</p>")
        assert text == "Salt & pepper makes a fine dinner indeed"

    def test_script_content_dropped(self):
        text, _ = extract_html("<p>Keep this sentence full of words here"
                               "</p><script>drop this</script>")
        assert "drop" not in text

    def test_link_density(self):
        raw = ("<div><a href='1'>aaaa bbbb cccc dddd</a> x</div>"
               "<p>A real paragraph with plenty of plain text words"
               " in it.</p>")
        text, _ = extract_html(raw)
        assert "aaaa" not in text and "real paragraph" in text


class TestPdfBlocks:
    RAW = "\n".join([
        "%PDFBLOCKS 1",
        "P 1 800 1000",
        "B 50 955 750 975 0.9 native|Footer banner",
        "B 50 300 750 316 0.9 native|second paragraph line",
        "B 50 20 750 40 0.95 native|Header banner",
        "B 410 130 750 146 0.9 native|right half",
        "B 50 130 390 146 0.9 native|left half",
        "B 50 150 750 166 0.9 native|left half continuation line okay good",
        "B 51 151 751 167 0.7 easyocr|xeft half continuation line okay good",
        "B 50 600 750 616 0.3 easyocr|low conf junk",
    ])

    def test_reading_order_and_bands(self):
        text, spans, kept, dropped = extract_pdf_payload(self.RAW)
        assert text == ("left half right half left half continuation line"
                        " okay good\nsecond paragraph line")
        kinds = [s["kind"] for s in spans]
        assert "header" in kinds and "footer" in kinds and "lowconf" in kinds

    def test_dedup_drops_low_conf_twin(self):
        blocks, low, _ = parse_payload(self.RAW)
        assert len(low) == 1
        text, spans, kept, dropped = extract_pdf_payload(self.RAW)
        assert dropped == 1 and kept == len(blocks) - 1

    def test_dedup_exact_case(self):
        raw = "\n".join([
            "%PDFBLOCKS 1", "P 1 800 1000",
            "B 50 300 750 316 0.9 native|this line is long enough to compare",
            "B 51 301 751 317 0.7 easyocr|xhis line is long enough to compare",
        ])
        text, spans, kept, dropped = extract_pdf_payload(raw)
        assert kept == 1 and dropped == 1
        assert text == "this line is long enough to compare"

    def test_conf_percent_normalized(self):
        raw = "\n".join([
            "%PDFBLOCKS 1", "P 1 800 1000",
            "B 50 300 750 316 90 native|percent confidence block",
        ])
        blocks, low, _ = parse_payload(raw)
        assert len(blocks) == 1 and abs(blocks[0].conf - 0.9) < 1e-9


class TestMarkdownAndClassify:
    def test_markdown_identity_and_spans(self):
        raw = "# Title\nplain prose line\n- bullet one\n1. numbered"
        text, spans = segment_markdown(raw)
        assert text == raw
        assert [s["kind"] for s in spans] == ["heading", "main", "bullet",
                                              "bullet"]

    def test_classify(self):
        assert classify_turn("", "") == "empty"
        assert classify_turn("<p>x</p>", "") == "html"
        assert classify_turn("# head\nbody", "") == "markdown"
        assert classify_turn("%PDFBLOCKS 1\nP 1 800 1000", "pdf_reader") == \
            "tool_pdf_payload"
        assert classify_turn("noise @@ here", "") == "ocr_noisy"
        assert classify_turn("just text", "") == "plain"
        # payload without a tool stays text-classified
        assert classify_turn("%PDFBLOCKS 1", "") == "plain"


class TestTextStats:
    def test_token_count(self):
        assert token_count("a b_c 12 -") == 3

    def test_lang_guess(self):
        assert lang_guess("the cat sat on the mat and that is that") == "en"
        assert lang_guess("der hund und die katze ist nicht da") == "de"
        assert lang_guess("le chat et la souris dans une maison") == "fr"
        assert lang_guess("xyz qrs") == "und"

    def test_fingerprint_ws_case_insensitive(self):
        assert fingerprint_md5("Hello   World") == fingerprint_md5("hello world ")

    def test_quality_counts_ints(self):
        q = quality_counts("Aa bb. CC!")
        assert q["n_tokens"] == 3 and q["n_punct"] == 2 and q["n_upper"] == 3


class TestFingerprint:
    def test_minhash_estimates_jaccard(self):
        a = "the quick brown fox jumps over the lazy dog " * 5
        b = "the quick brown fox leaps over the lazy dog " * 5
        sa, sb = minhash_signature(a), minhash_signature(b)
        est = (sa == sb).mean()
        true = jaccard(a, b)
        assert abs(est - true) < 0.25
        assert (minhash_signature(a) == sa).all()  # deterministic

    def test_lsh_bands_collide_for_near_dups(self):
        a = " ".join(f"tok{i}" for i in range(100))
        b = " ".join(f"tok{i}" for i in range(99)) + " tokX"
        ka, kb = set(lsh_band_keys(minhash_signature(a))), \
            set(lsh_band_keys(minhash_signature(b)))
        assert ka & kb

    def test_simhash_close_for_similar(self):
        a = " ".join(f"w{i}" for i in range(200))
        b = a + " extra"
        assert hamming64(simhash64(a), simhash64(b)) <= 8
        assert hamming64(simhash64(a), simhash64("completely different "
                                                 "content here")) > 16


class TestAdaptiveLayout:
    """L2/L3/L7 layout upgrades (reference 01b_normalize_layout.ipynb:~23
    merge_rows / maybe_two_columns / detect_handwriting and
    01_extract_blocks.ipynb:~88 GRID_RESCUE)."""

    TWOCOL = "\n".join([
        "%PDFBLOCKS 1", "P 1 800 1000",
        "B 420 137 750 153 0.9 native|right one",
        "B 50 130 380 146 0.9 native|left one",
        "B 50 150 380 166 0.9 native|left two",
        "B 420 157 750 173 0.9 native|right two",
    ])

    def test_two_column_reading_order(self):
        text, spans, kept, dropped = extract_pdf_payload(self.TWOCOL)
        assert text == "left one left two\nright one right two"

    def test_split_rows_not_mistaken_for_columns(self):
        # y-ALIGNED left/right fragments = split rows, read across
        raw = "\n".join([
            "%PDFBLOCKS 1", "P 1 800 1000",
            "B 50 130 380 146 0.9 native|alpha",
            "B 420 130 750 146 0.9 native|beta",
            "B 50 150 380 166 0.9 native|gamma",
            "B 420 150 750 166 0.9 native|delta",
        ])
        text, *_ = extract_pdf_payload(raw)
        assert text == "alpha beta gamma delta"

    def test_adaptive_tolerance_groups_large_font(self):
        from medical_ocr_pipeline_ray.config import ExtractConfig
        raw = "\n".join([
            "%PDFBLOCKS 1", "P 1 800 1000",
            "B 50 150 750 182 0.9 native|big line one",
            "B 50 190 750 222 0.9 native|big line two",   # 40 px later
            "B 50 270 750 302 0.9 native|second para",    # 80 px gap
        ])
        text, *_ = extract_pdf_payload(raw)
        assert text == "big line one big line two\nsecond para"
        # fixed 14/26 px tolerances would split the 40 px-spaced lines
        fixed = ExtractConfig(adaptive_layout=False)
        text_fixed, *_ = extract_pdf_payload(raw, fixed)
        assert text_fixed == "big line one\nbig line two\nsecond para"

    def test_handwriting_shrinks_bands(self):
        raw = "\n".join([
            "%PDFBLOCKS 1", "P 1 800 1000",
            "B 50 70 750 86 0.9 native|near top content",
            "B 50 150 750 162 0.9 native|short line",
            "B 50 174 750 202 0.9 native|tall line",
            "B 50 226 750 238 0.9 native|short again",
            "B 50 250 750 278 0.9 native|tall again",
        ])
        text, spans, *_ = extract_pdf_payload(raw)
        assert text.startswith("near top content")
        # regular heights => default bands => y=70 is header-tagged
        raw_reg = raw.replace("750 202", "750 190").replace(
            "750 278", "750 266").replace("750 162", "750 166").replace(
            "750 238", "750 242")
        text_reg, spans_reg, *_ = extract_pdf_payload(raw_reg)
        assert not text_reg.startswith("near top content")
        assert any(s["kind"] == "header" for s in spans_reg)

    def test_rescue_promotes_lowconf_on_sparse_page(self):
        raw = "\n".join([
            "%PDFBLOCKS 1", "P 1 800 1000",
            "B 50 130 750 146 0.9 native|tiny yield",
            "B 50 190 750 206 0.40 easyocr|rescued content line",
            "B 50 900 750 916 0.20 easyocr|junk stays out",
        ])
        text, spans, kept, dropped = extract_pdf_payload(raw)
        assert text == "tiny yield\nrescued content line"
        assert any(s["kind"] == "rescued" for s in spans)
        assert any(s["kind"] == "lowconf" for s in spans)   # the 0.20 junk
        # a page with plenty of yield does NOT rescue
        raw_rich = raw.replace(
            "tiny yield",
            "plenty of confident yield on this page so no rescue fires")
        text_rich, spans_rich, *_ = extract_pdf_payload(raw_rich)
        assert "rescued content line" not in text_rich
        assert not any(s["kind"] == "rescued" for s in spans_rich)


class TestSketchOps:
    def test_hll_accuracy_vs_exact(self, ray_session):
        """HyperLogLog distinct-shingle estimate within 3x the standard
        error of the exact count (p=12 -> ~1.6% stderr)."""
        import pyarrow.parquet as pq
        from medical_ocr_pipeline_ray.functions.fingerprint import shingles
        from medical_ocr_pipeline_ray.pipelines.textops import \
            approx_distinct_shingles
        sf = "/root/testdata/sf0.001"
        row = approx_distinct_shingles(sf).iloc[0]
        texts = pq.read_table(f"{sf}/documents.parquet",
                              columns=["text"])["text"].to_pylist()
        exact = len(set().union(*[shingles(t, 3) for t in texts]))
        assert exact > 10_000            # meaningful cardinality
        # the distributed exact count matches the sequential one, and
        # the operator itself asserts the estimator's 3-sigma band
        assert int(row["exact_distinct"]) == exact
        assert bool(row["within_3sigma"])

    def test_hll_merge_order_invariant(self):
        import numpy as np
        from medical_ocr_pipeline_ray.pipelines.textops import (
            _hll_estimate, _hll_registers)
        a = _hll_registers({f"tok{i}" for i in range(3000)})
        b = _hll_registers({f"tok{i}" for i in range(2000, 6000)})
        ab = np.maximum(a, b)
        ba = np.maximum(b, a)
        assert (ab == ba).all()
        est = _hll_estimate(ab)
        assert abs(est - 6000) / 6000 < 0.06


def test_tfidf_matches_sequential(ray_session):
    """Distributed TF-IDF equals a pure sequential recomputation (same
    smoothing, same tie-breaks) on every doc."""
    import numpy as np
    import pyarrow.parquet as pq
    from collections import Counter
    from medical_ocr_pipeline_ray.functions.fingerprint import words
    from medical_ocr_pipeline_ray.pipelines.textops import doc_tfidf_top_terms

    sf = "/root/testdata/sf0.001"
    got = doc_tfidf_top_terms(sf).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    tbl = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    dfm: Counter = Counter()
    for t in tbl["text"]:
        dfm.update(set(words(t)))
    n = len(tbl)
    rows = []
    for did, t in zip(tbl["doc_id"], tbl["text"]):
        ws = words(t)
        if not ws:
            continue
        tf = Counter(ws)
        scored = sorted(
            ((-(c / len(ws)) * (np.log((n + 1) / (dfm[w] + 1)) + 1.0), w)
             for w, c in tf.items()))
        for r, (neg, w) in enumerate(scored[:5], 1):
            rows.append((int(did), r, w, round(-neg, 8)))
    want = sorted(rows)
    have = list(got.itertuples(index=False, name=None))
    assert sorted(have) == want


def test_bloom_filter_prunes_and_never_drops_members():
    """The semi-join bloom prefilter: every member key passes (no false
    negatives — exactness depends on it) and non-member keys are mostly
    pruned (the shuffle-byte win it exists for)."""
    import numpy as np
    from medical_ocr_pipeline_ray.pipelines.relational import (
        _BLOOM_BITS, _bloom_positions)

    members = np.arange(0, 50_000, dtype=np.int64)
    bits = np.zeros(_BLOOM_BITS, dtype=bool)
    bits[_bloom_positions(members).reshape(-1)] = True
    # no false negatives
    assert bits[_bloom_positions(members)].all(axis=1).all()
    # strong pruning of non-members (~(1-e^-kn/m)^k ≈ 0.2% at these sizes)
    probes = np.arange(10_000_000, 10_100_000, dtype=np.int64)
    fp = bits[_bloom_positions(probes)].all(axis=1).mean()
    assert fp < 0.02


def test_png_codec_property_roundtrip():
    """Property: decode(encode(img, f)) == img for random images across
    all channel counts and every scanline filter type."""
    from hypothesis import given, settings, strategies as st
    import numpy as np

    from medical_ocr_pipeline_ray.functions.png import (decode_png,
                                                        encode_png)

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 12), st.integers(1, 12),
           st.sampled_from([1, 3, 4]), st.integers(0, 4),
           st.integers(0, 2**31 - 1))
    def check(h, w, ch, f, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        got = decode_png(encode_png(img if ch > 1 else img[:, :, 0],
                                    filter_type=f))
        assert np.array_equal(got, img)

    check()


def test_png_decoder_rejects_malformed():
    import numpy as np
    import pytest

    from medical_ocr_pipeline_ray.functions.png import (decode_png,
                                                        encode_png)

    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    # truncated scanline payload (IDAT replaced with a shorter stream)
    import struct
    import zlib
    sig = good[:8]
    bad_idat = zlib.compress(b"\x00" + b"\x00" * 5)   # wrong stride
    ihdr = good[8:8 + 25]
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    with pytest.raises(ValueError):
        decode_png(sig + ihdr + chunk(b"IDAT", bad_idat)
                   + chunk(b"IEND", b""))
    # unsupported profile: 16-bit depth flagged, not misdecoded
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    with pytest.raises(ValueError):
        decode_png(sig + chunk(b"IHDR", ihdr16)
                   + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
                   + chunk(b"IEND", b""))
