"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio decode libraries are not available in this environment,
so the DECODE KERNEL IS STUBBED (clearly marked below) — but the Ray-side
plumbing is real and tested: Arrow ``binary`` payload column + metadata
struct, an actor-pool ``map_batches`` stage with per-actor init, small
batches sized for wide binary rows, and a deterministic feature extractor
(byte histogram) standing in for a model forward pass.

This mirrors how the reference ships page images to OCR engines as opaque
PNG bytes over a service boundary (multipart upload in ``mcp_ocr``,
notebooks/01_blocks_all_mcp_compare.ipynb:~80) — here the payload is an
Arrow binary column flowing through the object store instead.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def synth_media(sf_dir: str):
    """Deterministic pseudo-media corpus: each document's text rendered to
    an opaque byte payload with typed metadata (no external data)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        payloads, widths, heights, kinds = [], [], [], []
        for did, t in zip(ids, texts):
            seed = hashlib.md5(f"{did}".encode()).digest()
            body = (seed + t.encode("utf-8")) * 4   # opaque bytes
            payloads.append(body)
            widths.append(64 + (did % 8) * 32)
            heights.append(64 + (did % 5) * 32)
            kinds.append("image/x-synth" if did % 3 else "audio/x-synth")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(kinds, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        })

    return ds.map_batches(to_media, batch_format="pyarrow", batch_size=256)


class MediaDecoder:
    """Actor-pool decode/feature stage.

    ``__init__`` is where a real build would load the decoder / model once
    per actor (PIL/torchvision/librosa).  Those libraries are absent here:
    ``decode=True`` raises ``NotImplementedError`` (STUB — the real kernel
    goes there), while the default path computes a deterministic
    16-bin byte histogram + length as the stand-in feature vector, so the
    batch plumbing, schema and actor lifecycle are fully exercised.
    """

    def __init__(self, decode: bool = False):
        self.decode = decode
        self.bins = np.arange(0, 257, 16)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode:
            raise NotImplementedError(
                "real media decode requires PIL/librosa — not available in "
                "this environment; plug the decoder here")
        ids = batch["doc_id"].to_pylist()
        feats, sizes = [], []
        for buf in batch["payload"]:
            b = np.frombuffer(buf.as_py(), dtype=np.uint8)
            hist, _ = np.histogram(b, bins=self.bins)
            feats.append(hist.astype(np.int64))
            sizes.append(len(b))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bytes": pa.array(sizes, pa.int64()),
            "byte_hist": pa.array([f.tolist() for f in feats],
                                  pa.list_(pa.int64(), 16)),
        })


def multimodal_features(sf_dir: str):
    """Binary payloads → actor-pool feature extraction.  Small batches +
    bounded pool: wide binary rows must not blow a worker's heap."""
    media = synth_media(sf_dir)
    return media.map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4), fn_constructor_kwargs={"decode": False})
