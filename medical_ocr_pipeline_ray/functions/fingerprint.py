"""Document fingerprint sketches: shingles, MinHash, SimHash, Jaccard.

Near-duplicate detection primitives for the corpus-scale dedup operators
(pipelines/dedup.py).  The reference's dedup is page-local bbox+text greedy
matching (D1, notebooks/01_extract_blocks.ipynb:~207 ``deduplicate``); the
corpus-level operators here are the standard public constructions
(Broder MinHash + banded LSH; Charikar SimHash) a training-data pipeline
needs at 100 TB scale.

Determinism: every hash is derived from blake2b/md5 digests of the token
bytes — NEVER Python's salted ``hash()`` — so signatures are identical
across processes, workers and runs.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WORD_RX = re.compile(r"[a-z0-9]+")

_MERSENNE_P = (1 << 61) - 1
_NUM_PERM = 64
_BANDS = 16
_ROWS_PER_BAND = _NUM_PERM // _BANDS


def _perm_params(num_perm: int = _NUM_PERM, seed: int = 42
                 ) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    return a, b


_A, _B = _perm_params()


def words(text: str) -> list[str]:
    return _WORD_RX.findall(text.lower())


def shingles(text: str, k: int = 3) -> set[str]:
    """Word k-shingles; a doc shorter than k words contributes its full
    token sequence as one shingle (so short docs still compare)."""
    ws = words(text)
    if not ws:
        return set()
    if len(ws) < k:
        return {" ".join(ws)}
    return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"),
                                          digest_size=8).digest(), "big")


def minhash_signature(text: str, k: int = 3,
                      num_perm: int = _NUM_PERM) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) over word k-shingles."""
    sh = shingles(text, k)
    if not sh:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter((_stable_u64(s) for s in sh), dtype=np.uint64,
                    count=len(sh))
    # (a*x + b) mod p, vectorized over perms × shingles
    vals = (( _A[:num_perm, None] * (x[None, :] % _MERSENNE_P)
             + _B[:num_perm, None]) % _MERSENNE_P)
    return vals.min(axis=1).astype(np.uint64)


def lsh_band_keys(sig: np.ndarray, bands: int = _BANDS) -> list[str]:
    """Banded LSH keys: md5 of each band's rows.  Docs sharing any band key
    are near-dup candidates (groupby key in the LSH pipeline)."""
    rows = len(sig) // bands
    keys = []
    for b in range(bands):
        chunk = sig[b * rows:(b + 1) * rows].tobytes()
        keys.append(f"{b}:{hashlib.md5(chunk).hexdigest()[:16]}")
    return keys


def simhash64(text: str) -> int:
    """Charikar SimHash over word unigrams (64-bit, weight 1 per distinct
    token occurrence count)."""
    ws = words(text)
    if not ws:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    from collections import Counter
    for w, cnt in Counter(ws).items():
        h = _stable_u64(w)
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
        acc += (bits.astype(np.int64) * 2 - 1) * cnt
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = shingles(text_a, k), shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
