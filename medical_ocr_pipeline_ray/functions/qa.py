"""QA metrics: CER / WER / similarity — the reference's ground-truth
comparison path (notebooks/qa_pipeline_evaluator.py:444-509 ``_calculate_cer``
/ ``_calculate_wer``; similarity via SequenceMatcher) as pure functions.

Used by the QA pipeline (pipelines/qa.py) to score extraction output
against the expected sidecar; the oracle-equality tests require CER = 0
(the reference's GT path with required CER 0, SURVEY.md §5).
"""

from __future__ import annotations

import difflib
import re

_WORD_RX = re.compile(r"\S+")


def levenshtein(a: str, b: str) -> int:
    """Edit distance, O(len(a)·len(b)) time / O(min) memory."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def cer(reference: str, hypothesis: str) -> float:
    """Character error rate vs reference (0.0 = exact)."""
    if not reference:
        return 0.0 if not hypothesis else 1.0
    return levenshtein(reference, hypothesis) / len(reference)


def wer(reference: str, hypothesis: str) -> float:
    """Word error rate (token-level levenshtein)."""
    ref = _WORD_RX.findall(reference)
    hyp = _WORD_RX.findall(hypothesis)
    if not ref:
        return 0.0 if not hyp else 1.0
    # token-level DP via joining tokens to single chars is unsafe; run DP
    # over the token lists directly
    if ref == hyp:
        return 0.0
    prev = list(range(len(hyp) + 1))
    for i, ta in enumerate(ref, 1):
        cur = [i]
        for j, tb in enumerate(hyp, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ta != tb)))
        prev = cur
    return prev[-1] / len(ref)


def similarity(a: str, b: str) -> float:
    """SequenceMatcher ratio (reference ``fuzz_ratio`` fallback)."""
    return difflib.SequenceMatcher(None, a, b).ratio()
