"""Single-process, pure-Python oracle pipeline (FIXTURES.md F3/F4).

Runs the SAME per-turn extraction semantics (functions/extract.py) in a
plain sequential loop, plus the conversation-assembly fold, with zero Ray
involvement.  The pytest suite compares the Ray Data pipeline's output
against this oracle row-for-row under stable ``(conv_id, turn_idx)``
ordering — the reference's ground-truth CER/WER path
(notebooks/qa_pipeline_evaluator.py:444-509) with required CER = 0.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from .config import DEFAULT_EXTRACT, ExtractConfig
from .functions.extract import extract_turn


def oracle_extract_turns(rows: list[dict],
                         cfg: ExtractConfig = DEFAULT_EXTRACT) -> pd.DataFrame:
    """Per-turn golden table, sorted by (conv_id, turn_idx)."""
    out = []
    for r in rows:
        ex = extract_turn(r["text"], r.get("tool", ""), cfg)
        out.append({
            "conv_id": r["conv_id"],
            "turn_idx": r["turn_idx"],
            "payload_class": ex.payload_class,
            "text_extracted": ex.text_extracted,
            "spans": ex.spans,
            "blocks_kept": ex.blocks_kept,
            "blocks_dropped_dup": ex.blocks_dropped_dup,
            "content_chars": len(ex.text_extracted),
        })
    df = pd.DataFrame(out)
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def assemble_conversation(turn_texts: list[str]) -> tuple[str, str]:
    """(full_text, sha256) — ordered concat with newline separators.
    Associative w.r.t. contiguous turn ranges, which is what makes the
    salted two-phase merge in the Ray pipeline legal (the reference's
    ``merge_dict`` fold has the same property,
    notebooks/05_merge_and_validate.ipynb:~52)."""
    full = "\n".join(turn_texts)
    return full, hashlib.sha256(full.encode("utf-8")).hexdigest()


def oracle_assemble(turns_df: pd.DataFrame) -> pd.DataFrame:
    """Per-conversation golden table (FIXTURES F4)."""
    recs = []
    for conv_id, g in turns_df.sort_values(["conv_id", "turn_idx"]).groupby(
            "conv_id", sort=True):
        full, digest = assemble_conversation(list(g["text_extracted"]))
        recs.append({
            "conv_id": conv_id,
            "n_turns": int(len(g)),
            "content_chars": int(g["content_chars"].sum()),
            "full_text": full,
            "sha256": digest,
        })
    return pd.DataFrame(recs).sort_values("conv_id").reset_index(drop=True)
