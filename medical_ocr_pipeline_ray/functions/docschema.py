"""Schema-driven document extraction + the merge_dict fold.

Re-expresses the reference's stages 04/05 — schema-prompted JSON
extraction (notebooks/04_json_extraction.ipynb:~89 ``try_model``) and the
recursive merge of per-chunk documents
(notebooks/05_merge_and_validate.ipynb:~52 ``merge_dict``) — as
deterministic in-process operators (the engine's X1-analogue policy:
nondeterministic LLM stages are replaced by rule extractors, SURVEY.md
§7.5 non-goals):

- ``extract_doc_fields``: per-turn ``Key: value`` line scan into a nested
  domain document (struct fields ``patient``/``doctor``, list-of-struct
  ``medications``, plain list ``tests`` — the shape of
  config/schema_prescription.json:1-43).
- ``merge_docs``: the reference's ``merge_dict`` semantics, ported
  faithfully: empty values ("" / None / [] / {}) are overwritten,
  NON-empty first value wins, nested dicts recurse, lists union with
  first-occurrence order keyed by canonical JSON
  (``json.dumps(item, sort_keys=True)``).

``merge_docs`` is ASSOCIATIVE over an ordered sequence of partials
(first-wins + ordered list union), which is what makes the salted
two-phase conversation fold in pipelines/documents.py legal — the same
argument as the text-concat assembly (SURVEY.md D3).
"""

from __future__ import annotations

import json
import re

DOC_KEYS = ("patient", "doctor", "medications", "tests")

_LINE_RX = re.compile(r"^(Patient|Age|Doctor|Medication|Test)\s*:\s*(.+?)\s*$",
                      re.MULTILINE)
_MED_RX = re.compile(
    r"^(?P<drug>[A-Za-z][A-Za-z\-]*)\s+(?P<strength>\d+\s*mg)"
    r"(?:\s+(?P<frequency>.+))?$")


def empty_doc() -> dict:
    return {"patient": {"name": "", "age": ""},
            "doctor": {"name": ""},
            "medications": [],
            "tests": []}


def _doc_from_json(obj) -> dict:
    """Map a parsed (possibly sloppy) JSON object onto the domain doc —
    tolerant of string-vs-struct fields, like the reference's
    ``coerce_to_list_of_dicts`` hardening
    (notebooks/04a_extraction_hardening.ipynb:~91)."""
    if not isinstance(obj, dict):
        return {}
    doc = empty_doc()
    found = False
    pat = obj.get("patient")
    if isinstance(pat, dict):
        doc["patient"]["name"] = str(pat.get("name", "") or "")
        doc["patient"]["age"] = str(pat.get("age", "") or "")
        found = True
    elif isinstance(pat, str) and pat:
        doc["patient"]["name"] = pat
        found = True
    doc_f = obj.get("doctor")
    if isinstance(doc_f, dict):
        doc["doctor"]["name"] = str(doc_f.get("name", "") or "")
        found = True
    elif isinstance(doc_f, str) and doc_f:
        doc["doctor"]["name"] = doc_f
        found = True
    for it in (obj.get("medications") or []):
        if isinstance(it, dict):
            item = {"drug": str(it.get("drug", "") or ""),
                    "strength": str(it.get("strength", "") or ""),
                    "frequency": str(it.get("frequency", "") or "")}
        else:
            item = {"drug": str(it), "strength": "", "frequency": ""}
        if item not in doc["medications"]:
            doc["medications"].append(item)
        found = True
    for t in (obj.get("tests") or []):
        if str(t) and str(t) not in doc["tests"]:
            doc["tests"].append(str(t))
        found = True
    return doc if found else {}


def extract_doc_fields(text: str) -> dict:
    """Deterministic per-turn partial document from ``Key: value`` lines
    or a fenced JSON payload (fence-strip + light repair, reference M14).
    Returns {} when the turn contributes nothing (most turns)."""
    if "```" in (text or ""):
        from .jsonrepair import parse_json_maybe, strip_fences
        obj = parse_json_maybe(strip_fences(text))
        d = _doc_from_json(obj)
        if d:
            return d
    doc = empty_doc()
    found = False
    for key, val in _LINE_RX.findall(text or ""):
        found = True
        if key == "Patient":
            doc["patient"]["name"] = doc["patient"]["name"] or val
        elif key == "Age":
            doc["patient"]["age"] = doc["patient"]["age"] or val
        elif key == "Doctor":
            doc["doctor"]["name"] = doc["doctor"]["name"] or val
        elif key == "Medication":
            m = _MED_RX.match(val)
            item = ({"drug": m.group("drug"),
                     "strength": re.sub(r"\s+", " ", m.group("strength")),
                     "frequency": m.group("frequency") or ""}
                    if m else {"drug": val, "strength": "", "frequency": ""})
            if item not in doc["medications"]:
                doc["medications"].append(item)
        elif key == "Test":
            if val not in doc["tests"]:
                doc["tests"].append(val)
    return doc if found else {}


def _is_empty(v) -> bool:
    return v in ("", None) or v == [] or v == {}


def merge_docs(base: dict, new: dict) -> dict:
    """Reference ``merge_dict`` semantics
    (notebooks/05_merge_and_validate.ipynb:~52): fill-empty, first
    non-empty wins, dict recurse, list union (canonical-JSON key,
    first-occurrence order).  Pure — returns a new dict."""
    out = {k: v for k, v in base.items()}
    for k, nv in new.items():
        bv = out.get(k)
        if _is_empty(bv):
            out[k] = nv
        elif isinstance(bv, dict) and isinstance(nv, dict):
            out[k] = merge_docs(bv, nv)
        elif isinstance(bv, list) and isinstance(nv, list):
            seen = {json.dumps(it, sort_keys=True) for it in bv}
            merged = list(bv)
            for it in nv:
                key = json.dumps(it, sort_keys=True)
                if key not in seen:
                    seen.add(key)
                    merged.append(it)
            out[k] = merged
        # else: first non-empty scalar wins — keep bv
    return out


def fold_docs(partials: list[dict]) -> dict:
    """Ordered left fold of per-turn partials into one document."""
    doc = empty_doc()
    for p in partials:
        if p:
            doc = merge_docs(doc, p)
    return doc


def doc_to_json(doc: dict) -> str:
    """Canonical JSON (sorted keys) — the serialization partials ride
    through the shuffle as, and the basis of content hashes."""
    return json.dumps(doc, sort_keys=True, separators=(",", ":"))
