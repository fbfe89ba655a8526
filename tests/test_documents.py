"""Schema-document assembly (reference stages 04/05 merge_dict fold):
merge semantics unit tests, Ray-vs-oracle parity, and associativity of the
salted two-phase fold."""

from __future__ import annotations

import json

import pandas as pd

from medical_ocr_pipeline_ray.functions.docschema import (
    doc_to_json, empty_doc, extract_doc_fields, fold_docs, merge_docs)

SF_DIR = "/root/testdata/sf0.001"


class TestMergeSemantics:
    def test_fill_empty_first_wins(self):
        a = {"patient": {"name": "Ana Moreno", "age": ""},
             "doctor": {"name": ""}, "medications": [], "tests": []}
        b = {"patient": {"name": "Ben Quinn", "age": "44"},
             "doctor": {"name": "Dr Sato"}, "medications": [], "tests": []}
        m = merge_docs(a, b)
        assert m["patient"]["name"] == "Ana Moreno"   # first non-empty wins
        assert m["patient"]["age"] == "44"            # empty gets filled
        assert m["doctor"]["name"] == "Dr Sato"

    def test_list_union_first_occurrence_order(self):
        med1 = {"drug": "ibuprofen", "strength": "200 mg", "frequency": ""}
        med2 = {"drug": "metformin", "strength": "500 mg", "frequency": ""}
        a = dict(empty_doc(), medications=[med1])
        b = dict(empty_doc(), medications=[med2, dict(med1)])
        m = merge_docs(a, b)
        assert m["medications"] == [med1, med2]       # dup dropped, order kept

    def test_fold_associative(self):
        parts = [
            dict(empty_doc(), tests=["blood count"]),
            {"patient": {"name": "Ana", "age": ""}, "doctor": {"name": ""},
             "medications": [], "tests": ["lipid panel"]},
            {"patient": {"name": "Zoe", "age": "31"}, "doctor": {"name": ""},
             "medications": [], "tests": ["blood count"]},
        ]
        seq = fold_docs(parts)
        left = merge_docs(merge_docs(merge_docs(empty_doc(), parts[0]),
                                     parts[1]), parts[2])
        right = merge_docs(merge_docs(empty_doc(), parts[0]),
                           merge_docs(parts[1], parts[2]))
        assert doc_to_json(seq) == doc_to_json(left) == doc_to_json(right)

    def test_extract_doc_fields(self):
        d = extract_doc_fields(
            "Patient: Ana Moreno\nAge: 44\nDoctor: Dr Sato\n"
            "Medication: metformin 500 mg twice daily\nTest: lipid panel")
        assert d["patient"] == {"name": "Ana Moreno", "age": "44"}
        assert d["medications"] == [{"drug": "metformin",
                                     "strength": "500 mg",
                                     "frequency": "twice daily"}]
        assert d["tests"] == ["lipid panel"]
        assert extract_doc_fields("no structured fields here") == {}


def _ray_docs_df(res) -> pd.DataFrame:
    df = res.to_pandas().sort_values("conv_id").reset_index(drop=True)
    df["doc_json"] = [
        doc_to_json({"patient": dict(p), "doctor": dict(dr),
                     "medications": [dict(m) for m in meds],
                     "tests": list(ts)})
        for p, dr, meds, ts in zip(df["patient"], df["doctor"],
                                   df["medications"], df["tests"])]
    return df[["conv_id", "n_sources", "doc_json"]]


def test_ray_matches_oracle_fold(ray_session):
    from medical_ocr_pipeline_ray.pipelines.documents import (
        assemble_documents, oracle_assemble_documents)
    from medical_ocr_pipeline_ray.synth import TIERS, gen_transcripts

    n_convs, lo, hi, skew, _ = TIERS["t2"]
    rows = gen_transcripts(n_convs, seed=42, min_turns=lo, max_turns=hi,
                           skew_conv_rows=skew)
    want = oracle_assemble_documents(rows).reset_index(drop=True)
    assert len(want) > 20           # the form class actually contributes
    got = _ray_docs_df(assemble_documents(SF_DIR.replace("0.001", "0.01")))
    assert len(got) == len(want)
    assert list(got["conv_id"]) == list(want["conv_id"])
    assert list(got["n_sources"].astype(int)) == \
        list(want["n_sources"].astype(int))
    assert list(got["doc_json"]) == list(want["doc_json"])


def test_salted_fold_matches_unsalted(ray_session):
    """Associativity under salting: tiny salt span (forces multi-salt
    partials for every conversation) produces the identical documents."""
    import medical_ocr_pipeline_ray.pipelines.documents as documents
    from medical_ocr_pipeline_ray.pipelines.documents import (
        assemble_documents, oracle_assemble_documents)
    from medical_ocr_pipeline_ray.synth import TIERS, gen_transcripts

    n_convs, lo, hi, skew, _ = TIERS["t1"]
    rows = gen_transcripts(n_convs, seed=42, min_turns=lo, max_turns=hi,
                           skew_conv_rows=skew)
    want = oracle_assemble_documents(rows).reset_index(drop=True)
    base = _ray_docs_df(assemble_documents(SF_DIR))
    old = documents._SALT_SPAN
    try:
        documents._SALT_SPAN = 2     # every conversation spans many salts
        salted = _ray_docs_df(assemble_documents(SF_DIR))
    finally:
        documents._SALT_SPAN = old
    for got in (base, salted):
        assert list(got["conv_id"]) == list(want["conv_id"])
        assert list(got["doc_json"]) == list(want["doc_json"])


class TestJsonRepair:
    def test_strip_and_repair(self):
        from medical_ocr_pipeline_ray.functions.jsonrepair import (
            light_repair, parse_json_maybe, strip_fences)
        raw = ('Model output follows\n```json\n'
               '{"tests": ["blood count",], "doctor": {"name": "Dr Quinn"},}'
               '\n```')
        assert strip_fences(raw).strip().startswith("{")
        assert parse_json_maybe(raw) == {
            "tests": ["blood count"], "doctor": {"name": "Dr Quinn"}}
        assert light_repair('junk before {"a": [1,2,],}') == '{"a": [1,2]}'
        assert parse_json_maybe("no json at all") is None

    def test_fenced_json_feeds_doc_fields(self):
        from medical_ocr_pipeline_ray.functions.docschema import \
            extract_doc_fields
        raw = ('```json\n{"patient": {"name": "Ana Moreno", "age": "41"}, '
               '"medications": [{"drug": "metformin", "strength": "500 mg", '
               '"frequency": "twice daily"}],}\n```')
        d = extract_doc_fields(raw)
        assert d["patient"] == {"name": "Ana Moreno", "age": "41"}
        assert d["medications"][0]["drug"] == "metformin"
        # string-coerced sloppy shapes
        d2 = extract_doc_fields(
            '```json\n{"patient": "Ben Quinn", "medications": '
            '["ibuprofen"]}\n```')
        assert d2["patient"]["name"] == "Ben Quinn"
        assert d2["medications"] == [{"drug": "ibuprofen", "strength": "",
                                      "frequency": ""}]
