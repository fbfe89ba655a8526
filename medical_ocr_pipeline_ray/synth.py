"""Deterministic synthetic transcript generator (FIXTURES.md F1/F2).

Builds the primary input table — Parquet of multi-turn transcripts with
schema ``conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us]`` (BASELINE.json input_hint) — plus the
per-turn ``expected_main`` sidecar used by the semantic tests.

Payload classes mirror the reference's page-type diversity (native text
layer vs scanned vs banner-heavy pages, notebooks/01_extract_blocks.ipynb):
plain, html_boilerplate, markdown_bullets, ocr_noisy, tool_pdf_payload
(with duplicate blocks for the dedup path), and degenerate turns.

Everything is seeded (seed=42 default) and wall-clock free: timestamps are
a fixed epoch base + deterministic offsets.  Output is sharded into
multiple Parquet fragments (hash(conv) % shards) so partitioning, resume
and scaling tests exercise real multi-fragment inputs.
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.ocr_correct import BUILTIN_MAP

EPOCH_BASE_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

GENERAL_WORDS = (
    "the patient report shows stable findings with no acute process and "
    "regular follow up is recommended for routine review of the current "
    "treatment plan including daily medication and interval imaging to "
    "confirm that the observed lesion remains unchanged over time"
).split()

# corpus restricted to vocab/stopwords so fuzzy correction never touches
# unintended tokens in noisy turns (see functions/ocr_correct.VOCAB_WORDS)
NOISY_SAFE_WORDS = (
    "the patient report showing stable findings with normal results and "
    "routine follow treatment daily morning evening tablet capsule "
    "diagnosis specimen tissue biopsy radiology clinical summary"
).split()

# curated fuzzy corruptions: wrong -> right, each verified (unit tests) to
# snap back via difflib cutoff 0.86 against VOCAB_WORDS
FUZZY_PAIRS = (
    ("examinaton", "examination"),
    ("recomended", "recommended"),
    ("signficant", "significant"),
    ("proceedure", "procedure"),
    ("treatement", "treatment"),
    ("inflamation", "inflammation"),
    ("medicaton", "medication"),
    ("unremarkble", "unremarkable"),
)

DICT_PAIRS = tuple(sorted(BUILTIN_MAP.items()))

NAV_LINKS = ("Home", "About", "Services", "Contact", "Login", "Archive",
             "Settings", "Search")

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def _sentence(rng: random.Random, words: list[str] | tuple[str, ...],
              n_lo: int = 6, n_hi: int = 14) -> str:
    n = rng.randint(n_lo, n_hi)
    toks = [rng.choice(words) for _ in range(n)]
    toks[0] = toks[0].capitalize()
    return " ".join(toks) + "."


def _paragraph(rng: random.Random, n_sent_lo: int = 1, n_sent_hi: int = 3) -> str:
    return " ".join(_sentence(rng, GENERAL_WORDS)
                    for _ in range(rng.randint(n_sent_lo, n_sent_hi)))


def _make_plain(rng: random.Random) -> tuple[str, str]:
    text = _paragraph(rng, 1, 4)
    return text, text


def _make_html(rng: random.Random) -> tuple[str, str]:
    paras = [_paragraph(rng) for _ in range(rng.randint(2, 5))]
    heading = _sentence(rng, GENERAL_WORDS, 3, 5).rstrip(".")
    expected_parts: list[str] = []
    out = ["<html><head><title>Portal</title>",
           "<script>var t = 1 + 2; track();</script>",
           "<style>.x{color:red}</style></head><body>"]
    out.append("<nav>" + " ".join(
        f'<a href="/{w.lower()}">{w}</a>' for w in
        rng.sample(NAV_LINKS, 4)) + "</nav>")
    out.append("<header><div>Site Banner</div></header>")
    use_heading = rng.random() < 0.7
    if use_heading:
        out.append(f"<h2>{heading}</h2>")
        expected_parts.append(heading)
    for i, p in enumerate(paras):
        body = p
        if rng.random() < 0.3:
            body = p.replace(" and ", " &amp; ", 1)
        out.append(f"<p>{body}</p>")
        expected_parts.append(body.replace("&amp;", "&"))
        if i == 0:
            out.append('<div class="share"><a href="#">Share</a> '
                       '<a href="#">Tweet</a> <a href="#">Pin</a></div>')
    out.append("<aside>" + " ".join(
        f'<a href="/r/{i}">Related story {i}</a>' for i in range(3))
        + "</aside>")
    out.append("<footer><div>Copyright 2025 · "
               '<a href="/tos">Terms</a> · <a href="/priv">Privacy</a>'
               "</div></footer></body></html>")
    return "".join(out), "\n".join(expected_parts)


def _make_markdown(rng: random.Random) -> tuple[str, str]:
    lines = [f"# {_sentence(rng, GENERAL_WORDS, 3, 5).rstrip('.')}"]
    for _ in range(rng.randint(1, 3)):
        lines.append(_paragraph(rng))
    lines.append(f"## {_sentence(rng, GENERAL_WORDS, 2, 4).rstrip('.')}")
    for _ in range(rng.randint(2, 5)):
        lines.append(f"- {_sentence(rng, GENERAL_WORDS, 4, 8)}")
    text = "\n".join(lines)
    return text, text


def _make_noisy(rng: random.Random) -> tuple[str, str]:
    corrupted: list[str] = []
    expected: list[str] = []
    for _ in range(rng.randint(5, 10)):
        w = rng.choice(NOISY_SAFE_WORDS)
        corrupted.append(w)
        expected.append(w)
    # mid-text bullet/dash rule corruptions (NOT line-leading, which would
    # classify the turn as markdown)
    corrupted.append("•")
    expected.append("-")
    corrupted.append("—")
    expected.append("-")
    wrong, right = rng.choice(DICT_PAIRS)
    corrupted.append(wrong)
    expected.append(right)
    if rng.random() < 0.7:
        fw, fr = rng.choice(FUZZY_PAIRS)
        corrupted.append(fw)
        expected.append(fr)
    # digit token must survive exactly (choose_text digit invariance)
    dose = f"{rng.randint(1, 500)}"
    corrupted.extend([dose, "mg"])
    expected.extend([dose, "mg"])
    # noise trigger token (should_cleanup predicate M12)
    corrupted.append("@@")
    expected.append("@@")
    return " ".join(corrupted), " ".join(expected)


def _make_pdf_payload(rng: random.Random) -> tuple[str, str]:
    width, height = 800.0, 1000.0
    out_lines: list[str] = ["%PDFBLOCKS 1"]
    expected_paras: list[str] = []
    n_pages = 1 if rng.random() < 0.8 else 2
    for page in range(1, n_pages + 1):
        records: list[str] = []
        records.append(
            f"B 50 20 750 40 0.95 native|CONFIDENTIAL - Page {page}")
        records.append("B 50 955 750 975 0.9 native|Generated by scanner")
        y = 130.0
        for _ in range(rng.randint(2, 4)):
            para_lines: list[str] = []
            n_lines = rng.randint(1, 3)
            for _li in range(n_lines):
                line_text = _sentence(rng, GENERAL_WORDS, 5, 9)
                if rng.random() < 0.25:
                    # split the line into two x-ordered blocks
                    toks = line_text.split()
                    cut = max(1, len(toks) // 2)
                    left, rgt = " ".join(toks[:cut]), " ".join(toks[cut:])
                    records.append(
                        f"B 50 {y:g} 390 {y + 16:g} 0.9 native|{left}")
                    records.append(
                        f"B 410 {y:g} 750 {y + 16:g} 0.9 native|{rgt}")
                else:
                    records.append(
                        f"B 50 {y:g} 750 {y + 16:g} 0.9 native|{line_text}")
                    if rng.random() < 0.3 and len(line_text) >= 30:
                        # near-duplicate block: lower conf, one-char edit,
                        # overlapping bbox -> dropped by greedy dedup (D1)
                        dup = "x" + line_text[1:]
                        records.append(
                            f"B 51 {y + 1:g} 751 {y + 17:g} 0.7 easyocr|{dup}")
                para_lines.append(line_text)
                y += 20.0
            expected_paras.append(" ".join(para_lines))
            y += 20.0   # extra gap => 40 between paragraphs (> para_gap 26)
        if rng.random() < 0.3:
            records.append(f"B 50 {min(y, 900):g} 750 {min(y, 900) + 16:g} "
                           "0.30 easyocr|zz qq xx noise")
        # shuffle record order WITHIN the page (exercises the reading-order
        # sort); the P record must precede its page's blocks
        rng.shuffle(records)
        out_lines.append(f"P {page} {width:g} {height:g}")
        out_lines.extend(records)
    raw = "\n".join(out_lines)
    return raw, "\n".join(expected_paras)


def _make_pdf_twocol(rng: random.Random) -> tuple[str, str]:
    """Genuine two-column page: left column fully, then right column, with
    STAGGERED row grids (real columns wrap independently — the y-alignment
    guard in pdfblocks.maybe_two_columns keys on this).  Expected reading
    order = all left-column paragraphs, then all right-column paragraphs;
    without the L3 column split the columns would interleave in y order."""
    width, height = 800.0, 1000.0
    out_lines = ["%PDFBLOCKS 1", f"P 1 {width:g} {height:g}"]
    records = [
        "B 50 20 750 40 0.95 native|CONFIDENTIAL - Page 1",
        "B 50 955 750 975 0.9 native|Generated by scanner"]
    expected: list[str] = []
    col_paras: dict[str, list[str]] = {"L": [], "R": []}
    for col, x0, x1, y0 in (("L", 50, 380, 130.0), ("R", 420, 750, 137.0)):
        y = y0
        for _ in range(rng.randint(2, 3)):
            para_lines = []
            for _li in range(rng.randint(1, 2)):
                line_text = _sentence(rng, GENERAL_WORDS, 3, 5)
                records.append(
                    f"B {x0} {y:g} {x1} {y + 16:g} 0.9 native|{line_text}")
                para_lines.append(line_text)
                y += 20.0
            col_paras[col].append(" ".join(para_lines))
            y += 20.0
    expected = col_paras["L"] + col_paras["R"]
    rng.shuffle(records)
    out_lines.extend(records)
    return "\n".join(out_lines), "\n".join(expected)


def _make_pdf_bigfont(rng: random.Random) -> tuple[str, str]:
    """Uniform large text (32 px): line spacing 40 px within a paragraph,
    80 px between paragraphs.  Correct grouping NEEDS the median-height
    adaptive tolerances (tol_y 19.2 / para gap 51.2) — the fixed 14/26 px
    values would split every line into its own paragraph (L2 fixture)."""
    width, height = 800.0, 1000.0
    out_lines = ["%PDFBLOCKS 1", f"P 1 {width:g} {height:g}"]
    records = [
        "B 50 20 750 52 0.95 native|CONFIDENTIAL - Page 1",
        "B 50 940 750 972 0.9 native|Generated by scanner"]
    expected: list[str] = []
    y = 150.0
    for _ in range(rng.randint(2, 3)):
        para_lines = []
        for _li in range(rng.randint(1, 3)):
            line_text = _sentence(rng, GENERAL_WORDS, 4, 8)
            records.append(
                f"B 50 {y:g} 750 {y + 32:g} 0.9 native|{line_text}")
            para_lines.append(line_text)
            y += 40.0
        expected.append(" ".join(para_lines))
        y += 40.0   # => 80 px between paragraphs
    rng.shuffle(records)
    out_lines.extend(records)
    return "\n".join(out_lines), "\n".join(expected)


def _make_pdf_handwriting(rng: random.Random) -> tuple[str, str]:
    """Irregular text heights (12/28 px alternating → height IQR ≫
    0.35·median) trigger handwriting detection, which SHRINKS the banner
    bands ×0.5: the block at y=70 (inside the default 10% header band,
    outside the shrunken 5% band) must appear in the body text."""
    width, height = 800.0, 1000.0
    out_lines = ["%PDFBLOCKS 1", f"P 1 {width:g} {height:g}"]
    near_top = _sentence(rng, GENERAL_WORDS, 4, 7)
    records = [
        "B 50 20 750 40 0.95 native|CONFIDENTIAL - Page 1",
        "B 50 955 750 975 0.9 native|Generated by scanner",
        f"B 50 70 750 86 0.9 native|{near_top}"]
    expected: list[str] = [near_top]
    y = 150.0
    for _ in range(rng.randint(2, 3)):
        para_lines = []
        for li in range(2):   # one short + one tall line per paragraph
            h = 12 if li % 2 == 0 else 28
            line_text = _sentence(rng, GENERAL_WORDS, 4, 7)
            records.append(
                f"B 50 {y:g} 750 {y + h:g} 0.85 native|{line_text}")
            para_lines.append(line_text)
            y += 24.0
        expected.append(" ".join(para_lines))
        y += 40.0   # => 64 px paragraph gap (> adaptive para gap 32)
    rng.shuffle(records)
    out_lines.extend(records)
    return "\n".join(out_lines), "\n".join(expected)


def _make_pdf_sparse(rng: random.Random) -> tuple[str, str]:
    """Sparse page: one short confident line (< rescue_min_chars total
    yield) plus several 0.40-confidence lines.  The first layout pass
    yields almost nothing → the rescue tier (reference GRID_RESCUE)
    promotes the 0.40 blocks; the 0.20 junk line stays below rescue_conf
    and must NOT surface."""
    width, height = 800.0, 1000.0
    out_lines = ["%PDFBLOCKS 1", f"P 1 {width:g} {height:g}"]
    lead = _sentence(rng, GENERAL_WORDS, 2, 3)   # ≤ ~37 chars
    records = [
        "B 50 20 750 40 0.95 native|CONFIDENTIAL - Page 1",
        "B 50 955 750 975 0.9 native|Generated by scanner",
        f"B 50 130 750 146 0.9 native|{lead}",
        "B 50 900 750 916 0.20 easyocr|zz qq xx junk"]
    expected: list[str] = [lead]
    y = 190.0
    for _ in range(rng.randint(2, 4)):
        line_text = _sentence(rng, GENERAL_WORDS, 4, 8)
        records.append(
            f"B 50 {y:g} 750 {y + 16:g} 0.40 easyocr|{line_text}")
        expected.append(line_text)
        y += 40.0   # each rescued line its own paragraph
    rng.shuffle(records)
    out_lines.extend(records)
    return "\n".join(out_lines), "\n".join(expected)


_FORM_FIRST = ("Ana", "Ben", "Carla", "David", "Elena", "Farid", "Grace")
_FORM_LAST = ("Moreno", "Okafor", "Petrov", "Quinn", "Rossi", "Sato")
_FORM_DRUGS = ("amoxicillin", "ibuprofen", "metformin", "lisinopril",
               "omeprazole", "atorvastatin")
_FORM_FREQ = ("once daily", "twice daily", "every morning", "at bedtime")
_FORM_TESTS = ("blood count", "lipid panel", "chest imaging",
               "glucose test", "thyroid panel")


def _make_form(rng: random.Random) -> tuple[str, str]:
    """Structured ``Key: value`` form turn (classifies as plain; identity
    extraction).  Feeds the schema-document assembly: several form turns
    per conversation exercise the merge_dict fold (fill-empty-first-wins,
    list union) across turns."""
    lines: list[str] = []
    if rng.random() < 0.7:
        lines.append(f"Patient: {rng.choice(_FORM_FIRST)} "
                     f"{rng.choice(_FORM_LAST)}")
    if rng.random() < 0.5:
        lines.append(f"Age: {rng.randint(20, 90)}")
    if rng.random() < 0.6:
        lines.append(f"Doctor: Dr {rng.choice(_FORM_LAST)}")
    for _ in range(rng.randint(0, 2)):
        lines.append(f"Medication: {rng.choice(_FORM_DRUGS)} "
                     f"{rng.randint(1, 50) * 10} mg {rng.choice(_FORM_FREQ)}")
    for _ in range(rng.randint(0, 2)):
        lines.append(f"Test: {rng.choice(_FORM_TESTS)}")
    if not lines:
        lines.append(f"Patient: {rng.choice(_FORM_FIRST)} "
                     f"{rng.choice(_FORM_LAST)}")
    text = "\n".join(lines)
    return text, text


def _make_form_json(rng: random.Random) -> tuple[str, str]:
    """Model-style fenced JSON form turn — sometimes with leading prose
    and a trailing comma, so the fence-strip + light-repair path
    (functions/jsonrepair.py, reference M14) is exercised.  Classifies as
    plain (identity extraction); contributes to the schema-document
    assembly via the repaired JSON."""
    parts: list[str] = []
    if rng.random() < 0.8:
        parts.append(f'"patient": {{"name": "{rng.choice(_FORM_FIRST)} '
                     f'{rng.choice(_FORM_LAST)}", '
                     f'"age": "{rng.randint(20, 90)}"}}')
    if rng.random() < 0.5:
        parts.append(f'"doctor": {{"name": "Dr {rng.choice(_FORM_LAST)}"}}')
    meds = []
    for _ in range(rng.randint(0, 2)):
        meds.append(f'{{"drug": "{rng.choice(_FORM_DRUGS)}", '
                    f'"strength": "{rng.randint(1, 50) * 10} mg", '
                    f'"frequency": "{rng.choice(_FORM_FREQ)}"}}')
    if meds:
        parts.append(f'"medications": [{", ".join(meds)}]')
    if rng.random() < 0.5:
        parts.append(f'"tests": ["{rng.choice(_FORM_TESTS)}"]')
    if not parts:
        parts.append(f'"tests": ["{rng.choice(_FORM_TESTS)}"]')
    trailing = "," if rng.random() < 0.4 else ""
    body = "{" + ", ".join(parts) + trailing + "}"
    prefix = "Model output follows\n" if rng.random() < 0.3 else ""
    text = f"{prefix}```json\n{body}\n```"
    return text, text


def _make_degenerate(rng: random.Random) -> tuple[str, str]:
    choice = rng.randint(0, 3)
    if choice == 0:
        return "", ""
    if choice == 1:
        return "   ", ""
    if choice == 2:
        return "ok", "ok"
    return "नमस्ते दुनिया", "नमस्ते दुनिया"


_CLASS_BUILDERS = (
    ("plain", _make_plain, 0.28),
    ("html", _make_html, 0.20),
    ("markdown", _make_markdown, 0.15),
    ("ocr_noisy", _make_noisy, 0.13),
    ("tool_pdf_payload", _make_pdf_payload, 0.10),
    ("tool_pdf_twocol", _make_pdf_twocol, 0.03),
    ("tool_pdf_bigfont", _make_pdf_bigfont, 0.025),
    ("tool_pdf_handwriting", _make_pdf_handwriting, 0.025),
    ("tool_pdf_sparse", _make_pdf_sparse, 0.02),
    ("form", _make_form, 0.05),
    ("form_json", _make_form_json, 0.03),
    ("degenerate", _make_degenerate, 0.06),
)
_CLASS_CUM = np.cumsum([w for _, _, w in _CLASS_BUILDERS])


def gen_conversation(conv_index: int, seed: int, n_turns: int
                     ) -> list[dict]:
    rng = random.Random((seed << 20) ^ conv_index)
    conv_id = f"conv{conv_index:07d}"
    rows = []
    for t in range(n_turns):
        r = rng.random()
        cls_i = int(np.searchsorted(_CLASS_CUM, r * _CLASS_CUM[-1],
                                    side="right"))
        cls_i = min(cls_i, len(_CLASS_BUILDERS) - 1)
        name, builder, _w = _CLASS_BUILDERS[cls_i]
        text, expected = builder(rng)
        if name.startswith("tool_pdf"):
            role, tool = "tool", "pdf_reader"
        else:
            role = ("user", "assistant")[t % 2]
            tool = ""
        rows.append({
            "conv_id": conv_id,
            "turn_idx": t,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": EPOCH_BASE_US + conv_index * 3_600_000_000 + t * 10_000_000,
            "_expected_main": expected,
            "_gen_class": name,
        })
    return rows


def conv_n_turns(conv_index: int, seed: int, lo: int, hi: int) -> int:
    """Per-conversation turn count, derived independently of generation
    order (so shards can be generated in parallel, bit-identically)."""
    r = random.Random((seed << 21) ^ (conv_index * 2_654_435_761 & 0xFFFFFFFF))
    return r.randint(lo, hi)


def gen_transcripts(n_convs: int, seed: int = 42, min_turns: int = 5,
                    max_turns: int = 50, skew_conv_rows: int = 0
                    ) -> list[dict]:
    """All rows for ``n_convs`` conversations; optionally one extra
    mega-conversation of ``skew_conv_rows`` turns (FIXTURES F2 skew)."""
    rows: list[dict] = []
    for c in range(n_convs):
        rows.extend(gen_conversation(c, seed,
                                     conv_n_turns(c, seed, min_turns,
                                                  max_turns)))
    if skew_conv_rows > 0:
        rows.extend(gen_conversation(n_convs, seed, skew_conv_rows))
    return rows


def gen_shard_rows(shard: int, shards: int, n_convs: int, seed: int,
                   min_turns: int, max_turns: int, skew_conv_rows: int
                   ) -> list[dict]:
    """Rows of one shard (convs with index ≡ shard mod shards, ascending) —
    byte-identical to the serial path's shard split."""
    rows: list[dict] = []
    for c in range(shard, n_convs, shards):
        rows.extend(gen_conversation(c, seed,
                                     conv_n_turns(c, seed, min_turns,
                                                  max_turns)))
    if skew_conv_rows > 0 and n_convs % shards == shard:
        rows.extend(gen_conversation(n_convs, seed, skew_conv_rows))
    return rows


def rows_to_tables(rows: list[dict]) -> tuple[pa.Table, pa.Table]:
    """(transcripts_table, expected_sidecar_table)."""
    main = pa.Table.from_pylist(
        [{k: v for k, v in r.items() if not k.startswith("_")} for r in rows],
        schema=TRANSCRIPT_SCHEMA)
    side = pa.Table.from_pylist(
        [{"conv_id": r["conv_id"], "turn_idx": r["turn_idx"],
          "expected_main": r["_expected_main"], "gen_class": r["_gen_class"]}
         for r in rows],
        schema=pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                          ("expected_main", pa.string()),
                          ("gen_class", pa.string())]))
    return main, side


TIERS = {
    # name: (n_convs, min_turns, max_turns, skew_rows, shards)
    "t1": (20, 3, 10, 0, 4),
    "t2": (200, 5, 50, 0, 8),
    "t2skew": (120, 5, 50, 2500, 8),
    "bench": (2000, 5, 50, 0, 32),
    "bench_xl": (120_000, 5, 50, 0, 128),
    "bench_xxl": (240_000, 5, 50, 0, 256),
}

GEN_VERSION = "v5"   # bump to invalidate /tmp caches on generator changes


def _write_shard(tier_spec: tuple, shard: int, seed: int, tdir: str,
                 sdir: str) -> int:
    n_convs, lo, hi, skew, shards = tier_spec
    shard_rows = gen_shard_rows(shard, shards, n_convs, seed, lo, hi, skew)
    if not shard_rows:
        return 0
    main, side = rows_to_tables(shard_rows)
    pq.write_table(main, os.path.join(tdir, f"part-{shard:05d}.parquet"))
    pq.write_table(side, os.path.join(sdir, f"part-{shard:05d}.parquet"))
    return len(shard_rows)


def materialize_tier(tier: str, root: str = "/tmp/mopr_synth",
                     seed: int = 42) -> str:
    """Generate (once, cached) a tier's sharded transcripts + sidecar
    parquet under ``root``; returns the tier directory.  Shards are
    generated in parallel Ray tasks when a Ray session exists (per-shard
    output is order-independent by construction), serially otherwise."""
    spec = TIERS[tier]
    out_dir = os.path.join(root, f"{tier}-seed{seed}-{GEN_VERSION}")
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    tdir = os.path.join(out_dir, "transcripts")
    sdir = os.path.join(out_dir, "expected")
    os.makedirs(tdir, exist_ok=True)
    os.makedirs(sdir, exist_ok=True)
    shards = spec[4]
    total = 0
    use_ray = False
    try:
        import ray
        use_ray = ray.is_initialized() and shards >= 16
    except Exception:
        pass
    if use_ray:
        import ray
        gen_task = ray.remote(num_cpus=1)(_write_shard)
        total = sum(ray.get([
            gen_task.remote(spec, sh, seed, tdir, sdir)
            for sh in range(shards)]))
    else:
        for sh in range(shards):
            total += _write_shard(spec, sh, seed, tdir, sdir)
    with open(done + ".tmp", "w") as f:
        f.write(f"rows={total}\n")
    os.replace(done + ".tmp", done)
    return out_dir


def tier_for_sf_dir(sf_dir: str) -> str:
    """Map a driver sf directory to a synth tier (driver calls queries()
    with /root/testdata/sf{0.001,0.01,0.1})."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": "t1", "sf0.01": "t2",
            "sf0.1": "bench_xxl"}.get(base, "t2")
