"""Planted-truth tests for the non-SQL operators: near-dup dedup (MinHash
LSH / SimHash / n-gram Jaccard), approximate kNN, embedding near-dup,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _pdf(res):
    import ray.data as rd
    return res.to_pandas() if isinstance(res, rd.Dataset) else res


@pytest.fixture(scope="module")
def planted_truth(ray_session):
    """Brute-force ground truth over the augmented corpus: every
    (orig, orig+1M) pair's exact Jaccard (k=3 and k=2) and the exact-twin
    pairs (orig, orig+2M)."""
    from medical_ocr_pipeline_ray.functions.fingerprint import jaccard
    from medical_ocr_pipeline_ray.pipelines.dedup import augmented_docs
    df = _pdf(augmented_docs(SF_DIR))
    texts = dict(zip(df["doc_id"].astype(int), df["text"]))
    near, exact = {}, []
    for did in texts:
        if did < 1_000_000 and did + 1_000_000 in texts:
            near[(did, did + 1_000_000)] = {
                3: jaccard(texts[did], texts[did + 1_000_000], 3),
                2: jaccard(texts[did], texts[did + 1_000_000], 2)}
        if did < 1_000_000 and did + 2_000_000 in texts:
            exact.append((did, did + 2_000_000))
    return texts, near, exact


def test_minhash_lsh_finds_planted_pairs(ray_session, planted_truth):
    from medical_ocr_pipeline_ray.pipelines.dedup import dedup_minhash_lsh
    texts, near, exact = planted_truth
    found = _pdf(dedup_minhash_lsh(SF_DIR))
    pairs = set(zip(found["doc_a"].astype(int), found["doc_b"].astype(int)))
    # every reported pair really is >= 0.8 Jaccard
    for s in found["similarity"]:
        assert s >= 0.8
    # exact twins must always be found (Jaccard 1.0, identical signatures)
    for p in exact:
        assert p in pairs, p
    # strongly-similar planted pairs are found (LSH P(miss|J>=0.9) ~ 1e-5)
    strong = [p for p, j in near.items() if j[3] >= 0.9]
    assert strong
    hit = sum(1 for p in strong if p in pairs)
    assert hit / len(strong) >= 0.95


def test_simhash_finds_planted_pairs(ray_session, planted_truth):
    from medical_ocr_pipeline_ray.functions.fingerprint import (hamming64,
                                                                simhash64)
    from medical_ocr_pipeline_ray.pipelines.dedup import dedup_simhash
    texts, near, exact = planted_truth
    found = _pdf(dedup_simhash(SF_DIR))
    pairs = set(zip(found["doc_a"].astype(int), found["doc_b"].astype(int)))
    for s in found["similarity"]:
        assert s <= 6
    for p in exact:
        assert p in pairs, p
    # planted near-twins within the hamming budget AND sharing a 16-bit
    # chunk must be reported
    for (a, b) in near:
        ha, hb = simhash64(texts[a]), simhash64(texts[b])
        d = hamming64(ha, hb)
        shares_chunk = any(((ha >> (16 * c)) & 0xFFFF) ==
                           ((hb >> (16 * c)) & 0xFFFF) for c in range(4))
        if d <= 6 and shares_chunk:
            assert (a, b) in pairs, (a, b, d)


def test_ngram_jaccard_finds_planted_pairs(ray_session, planted_truth):
    from medical_ocr_pipeline_ray.pipelines.dedup import dedup_ngram_jaccard
    texts, near, exact = planted_truth
    found = _pdf(dedup_ngram_jaccard(SF_DIR))
    pairs = set(zip(found["doc_a"].astype(int), found["doc_b"].astype(int)))
    for s in found["similarity"]:
        assert s >= 0.8
    for p in exact:
        assert p in pairs, p
    # deterministic blocking: every planted pair with bigram J >= 0.8 found
    for p, j in near.items():
        if j[2] >= 0.8:
            assert p in pairs, (p, j)


def test_knn_lsh_recall_vs_brute(ray_session):
    from medical_ocr_pipeline_ray.pipelines.similarity import (knn_brute_force,
                                                               knn_lsh)
    brute = knn_brute_force(SF_DIR)
    approx = knn_lsh(SF_DIR)
    recall = len(set(brute["vec_id"]) & set(approx["vec_id"])) / len(brute)
    # random gaussian corpora are the adversarial case for hyperplane LSH
    # (true neighbors barely correlated); deterministic given fixed seeds
    assert recall >= 0.5
    # the query vector itself is always rank 1 in both
    assert brute["vec_id"].iloc[0] == approx["vec_id"].iloc[0]


def test_embedding_near_dup_finds_planted_twins(ray_session):
    from medical_ocr_pipeline_ray.pipelines.similarity import (
        augmented_embeddings, embedding_near_dup)
    aug = _pdf(augmented_embeddings(SF_DIR))
    planted = {(int(v) - 1_000_000, int(v))
               for v in aug["vec_id"] if v >= 1_000_000}
    found = _pdf(embedding_near_dup(SF_DIR))
    pairs = set(zip(found["vec_a"].astype(int), found["vec_b"].astype(int)))
    assert planted
    hit = sum(1 for p in planted if p in pairs)
    assert hit / len(planted) >= 0.6   # LSH bucket-collision recall
    for c in found["cosine"]:
        assert c >= 0.99


def test_multimodal_plumbing(ray_session):
    from medical_ocr_pipeline_ray.pipelines.multimodal import (
        MediaDecoder, multimodal_features, synth_media)
    feats = _pdf(multimodal_features(SF_DIR))
    assert len(feats) == 500
    assert {"doc_id", "n_bytes", "byte_hist"} <= set(feats.columns)
    h0 = np.asarray(feats.sort_values("doc_id")["byte_hist"].iloc[0])
    assert h0.shape == (16,) and h0.sum() == \
        feats.sort_values("doc_id")["n_bytes"].iloc[0]
    # determinism
    again = _pdf(multimodal_features(SF_DIR)).sort_values("doc_id")
    assert (again["n_bytes"].to_numpy() ==
            feats.sort_values("doc_id")["n_bytes"].to_numpy()).all()
    # the stubbed real-decode path is clearly gated
    import pyarrow as pa
    dec = MediaDecoder(decode=True)
    with pytest.raises(NotImplementedError):
        dec(pa.table({"doc_id": pa.array([1], pa.int64()),
                      "payload": pa.array([b"x"], pa.binary())}))


def test_hot_bucket_star_pairing_no_silent_loss(ray_session):
    """A duplicate cluster LARGER than MAX_BUCKET (identical signatures →
    one hot LSH bucket) must not be silently dropped: every member is
    linked to the cluster representative (star pairing), so the cluster
    is recoverable by union-find."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from medical_ocr_pipeline_ray.pipelines import dedup as dd

    n = dd.MAX_BUCKET + 36   # hot: 100 identical docs
    text = "identical duplicate document body with enough words to shingle"
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": [text] * n})

    from medical_ocr_pipeline_ray.functions.fingerprint import (
        lsh_band_keys_batch, minhash_signatures_batch)

    def bands(df):
        sigs = minhash_signatures_batch(list(df["text"]), 3)
        keys = lsh_band_keys_batch(sigs)
        nb = keys.shape[1]
        return pd.DataFrame({
            "band_key": keys.reshape(-1),
            "doc_id": np.repeat(df["doc_id"].to_numpy(), nb)})

    keyed = rd.from_pandas(docs).map_batches(bands, batch_format="pandas")
    pairs = dd._pairs_from_buckets(keyed, "band_key").to_pandas()
    got = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    # star pairs: every non-representative doc linked to doc 0
    assert {(0, b) for b in range(1, n)} <= got


def test_multimodal_resize_geometry(ray_session):
    import numpy as np
    from medical_ocr_pipeline_ray.pipelines.multimodal import (
        MediaResizer, multimodal_resize)
    df = multimodal_resize(SF_DIR).to_pandas()
    assert len(df) == 500
    long_in = np.maximum(df["width"], df["height"])
    long_out = np.maximum(df["out_w"], df["out_h"])
    assert (long_out <= 96).all()                       # clamped
    small = long_in <= 96
    assert (df.loc[small, "out_w"] == df.loc[small, "width"]).all()  # no-op
    # aspect preserved within rounding
    ar_in = df["width"] / df["height"]
    ar_out = df["out_w"] / df["out_h"]
    assert (abs(ar_in - ar_out) / ar_in < 0.05).all()
    # compressed-format resample without PIL is clearly gated (binary
    # PPM payloads resample in-sandbox — covered by the hand-computed
    # nearest-neighbor test below)
    try:
        from PIL import Image      # noqa: F401
    except ImportError:
        import pyarrow as pa
        import pytest as _pt
        with _pt.raises(NotImplementedError):
            MediaResizer(resample=True)(pa.table(
                {"doc_id": pa.array([1], pa.int64()),
                 "payload": pa.array([b"\x89PNGxxxx"], pa.binary()),
                 "width": pa.array([10], pa.int32()),
                 "height": pa.array([10], pa.int32())}))


def test_multimodal_frame_sample(ray_session):
    from medical_ocr_pipeline_ray.pipelines.multimodal import (
        multimodal_frame_sample, synth_media)
    frames = multimodal_frame_sample(SF_DIR).to_pandas()
    media = synth_media(SF_DIR).to_pandas()
    sizes = dict(zip(media["doc_id"], media["payload"].str.len()))
    got = frames.groupby("doc_id")
    for did, g in got:
        n_frames = max(1, (sizes[did] + 511) // 512)
        expect_idx = sorted(set(range(0, n_frames, 2)) | {n_frames - 1})
        assert sorted(g["frame_idx"]) == expect_idx, did
        assert (g["byte_offset"] == g["frame_idx"] * 512).all()
    # determinism
    again = multimodal_frame_sample(SF_DIR).to_pandas()
    a = frames.sort_values(["doc_id", "frame_idx"])["frame_hash"].tolist()
    b = again.sort_values(["doc_id", "frame_idx"])["frame_hash"].tolist()
    assert a == b


def test_dedup_clusters_match_union_find(ray_session):
    """Connected components by distributed label propagation equal a
    sequential union-find over the SAME verified pair set, and planted
    twin chains (X, X+1M, X+2M) collapse to representative X."""
    from medical_ocr_pipeline_ray.pipelines.dedup import (dedup_clusters,
                                                          dedup_minhash_lsh)
    pairs = _pdf(dedup_minhash_lsh(SF_DIR))
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    got = _pdf(dedup_clusters(SF_DIR))
    got_map = dict(zip(got["doc_id"].astype(int),
                       got["cluster_rep"].astype(int)))
    assert got_map == want
    # every edge's endpoints share a representative, reps are component
    # minima, and transitive (multi-hop) components exist in the corpus
    for a, b in zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)):
        assert got_map[a] == got_map[b]
    from collections import Counter
    comp_sizes = Counter(got_map.values())
    assert max(comp_sizes.values()) >= 3      # at least one multi-hop chain
    for node, rep in got_map.items():
        assert rep <= node
        assert got_map[rep] == rep


def test_knn_ivf_recall_vs_brute(ray_session):
    from medical_ocr_pipeline_ray.pipelines.similarity import (knn_brute_force,
                                                               knn_ivf)
    brute = knn_brute_force(SF_DIR)
    approx = knn_ivf(SF_DIR)
    recall = len(set(brute["vec_id"]) & set(approx["vec_id"])) / len(brute)
    # nprobe/n_centroids = 1/4 of the corpus scanned; gaussian corpora are
    # the adversarial case for coarse quantization
    assert recall >= 0.3
    assert brute["vec_id"].iloc[0] == approx["vec_id"].iloc[0]  # query itself

def test_embedding_near_dup_hot_bucket_star_pairing(ray_session):
    """A degenerate low-entropy embedding region (all vectors identical →
    ONE hot LSH bucket larger than MAX_BUCKET) must complete with a
    LINEAR number of pairs (star pairing vs the min-id representative),
    not an O(n²) per-bucket quadratic, and nothing silently dropped."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from medical_ocr_pipeline_ray.pipelines.dedup import MAX_BUCKET
    from medical_ocr_pipeline_ray.pipelines.similarity import near_dup_pairs

    n = MAX_BUCKET + 36
    dim = 16
    v = np.ones(dim) / np.sqrt(dim)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [v.copy() for _ in range(n)]})
    out = near_dup_pairs(rd.from_pandas(df), threshold=0.99,
                         n_planes=10, dim=dim, n_buckets=8).to_pandas()
    got = set(zip(out["vec_a"].astype(int), out["vec_b"].astype(int)))
    # every member linked to the representative (doc 0) ...
    assert {(0, b) for b in range(1, n)} <= got
    # ... and ONLY star pairs: candidate count is linear in bucket size
    assert len(out) == n - 1
    assert (out["cosine"] >= 0.99).all()

def test_media_decoder_optional_pil_seam(ray_session):
    """decode=True uses PIL when the environment has it (real kernel:
    decoded-PIXEL histogram) and raises the declared stub error when it
    does not — same actor, same output schema either way."""
    import pyarrow as pa
    from medical_ocr_pipeline_ray.pipelines.multimodal import MediaDecoder

    try:
        from PIL import Image
        has_pil = True
    except ImportError:
        has_pil = False

    dec = MediaDecoder(decode=True)
    if has_pil:
        import io
        img = Image.new("L", (4, 4), color=255)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        out = dec(pa.table({
            "doc_id": pa.array([7], pa.int64()),
            "payload": pa.array([buf.getvalue()], pa.binary())}))
        assert out.column_names == ["doc_id", "n_bytes", "byte_hist"]
        hist = out["byte_hist"][0].as_py()
        assert sum(hist) == 16           # 4x4 decoded pixels
        assert hist[-1] == 16            # all white -> top bin
    else:
        with pytest.raises(NotImplementedError):
            dec(pa.table({"doc_id": pa.array([1], pa.int64()),
                          "payload": pa.array([b"x"], pa.binary())}))

def test_knn_ivf_pruned_reads_only_probe_cells(ray_session):
    """Read-pruned IVF: identical ranking to the compute-pruned knn_ivf
    (same centroids / probe cells), and the scan touches strictly fewer
    parquet fragments than the full layout holds."""
    import glob
    import os
    from medical_ocr_pipeline_ray.pipelines.similarity import (
        _ivf_layout_cached, knn_brute_force, knn_ivf, knn_ivf_pruned)

    pruned = knn_ivf_pruned(SF_DIR)
    full = knn_ivf(SF_DIR)
    assert list(pruned["vec_id"]) == list(full["vec_id"])
    # pruning evidence: probe cells < total cells in the layout
    layout = _ivf_layout_cached(SF_DIR, 16)
    all_cells = glob.glob(os.path.join(layout, "cell=*"))
    assert len(all_cells) > 4           # corpus spans more cells ...
    # ... while the query read only nprobe=4 of them (by construction of
    # the explicit path list); recall sanity vs brute force
    brute = set(knn_brute_force(SF_DIR)["vec_id"])
    assert len(set(pruned["vec_id"]) & brute) / len(brute) >= 0.3
    # query vector itself always survives (it sits in a probe cell)
    assert list(pruned["vec_id"])[0] == list(knn_brute_force(SF_DIR)["vec_id"])[0]


def test_dedup_pipeline_end_to_end(ray_session, planted_truth):
    """Composite dedup: every planted EXACT twin collapses to its
    original; near twins above the verify threshold collapse too; docs
    with no partner all survive; survivors + removed partition the
    corpus exactly (nothing lost, nothing duplicated)."""
    from medical_ocr_pipeline_ray.pipelines.dedup import (augmented_docs,
                                                          dedup_pipeline)
    texts, near, exact = planted_truth
    all_ids = set(_pdf(augmented_docs(SF_DIR))["doc_id"])
    kept = set(_pdf(dedup_pipeline(SF_DIR))["doc_id"])
    removed = all_ids - kept
    assert kept <= all_ids and len(kept) == len(all_ids) - len(removed)
    # every exact twin (did + 2_000_000) must be gone, original kept
    exact_twins = {b for _, b in exact}
    assert exact_twins <= removed
    assert {a for a, _ in exact} <= kept
    # only docs with a VERIFIED near-dup partner may be removed (the
    # corpus has organic template near-dups beyond the planted twins,
    # so the bound is the verified pair graph, not the planted set)
    from medical_ocr_pipeline_ray.pipelines.dedup import dedup_minhash_lsh
    pairs_df = _pdf(dedup_minhash_lsh(SF_DIR))
    in_graph = set(pairs_df["doc_a"].astype(int)) | \
        set(pairs_df["doc_b"].astype(int))
    assert removed <= in_graph
    # each connected component keeps EXACTLY its min-id representative
    # (sequential union-find over the same verified pair list)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["doc_a"].astype(int),
                    pairs_df["doc_b"].astype(int)):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for d in in_graph:
        comps.setdefault(find(d), set()).add(d)
    for rep, members in comps.items():
        assert kept & members == {min(members)}
        assert members - {min(members)} <= removed
    # strongly-similar planted near twins collapse (LSH recall ~1-1e-5;
    # verify is exact-threshold)
    strong_twins = {b for (_, b), j in near.items() if j[3] >= 0.9}
    assert strong_twins
    assert len(strong_twins & removed) / len(strong_twins) >= 0.95


def test_mixed_hot_bucket_rescue_recovers_both_clusters(ray_session):
    """Adversarial fixture for the star-pairing assumption: TWO distinct
    duplicate clusters collide behind ONE band key with > MAX_BUCKET
    members total.  Star pairing alone links only the cluster holding the
    min-id representative; the residual-star rescue must recover the
    second cluster, so ``dedup_pipeline`` keeps exactly the two cluster
    representatives."""
    import collections

    import ray.data as rd

    from medical_ocr_pipeline_ray.pipelines.dedup import (
        MAX_BUCKET, _verify_with_rescue, dedup_pipeline)

    n_a = MAX_BUCKET // 2 + 5          # cluster sizes chosen so the one
    n_b = MAX_BUCKET // 2 + 5          # shared bucket is hot (> MAX_BUCKET)
    text_a = "alpha cluster body repeated words " * 8
    text_b = "completely different beta payload tokens " * 8
    ids = np.arange(n_a + n_b, dtype=np.int64)
    corpus = rd.from_pandas(pd.DataFrame({
        "doc_id": ids, "text": [text_a] * n_a + [text_b] * n_b}))
    keyed = rd.from_pandas(pd.DataFrame({
        "band_key": np.full(len(ids), 7, dtype=np.int64), "doc_id": ids}))

    pairs = _verify_with_rescue(keyed, "band_key", sf_dir="",
                                mode="jaccard", k=3, threshold=0.8,
                                corpus=corpus).to_pandas()
    assert not pairs.duplicated(["doc_a", "doc_b"]).any()

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = collections.defaultdict(set)
    for d in ids:
        comp[find(int(d))].add(int(d))
    assert sorted(sorted(m) for m in comp.values()) == [
        list(range(n_a)), list(range(n_a, n_a + n_b))]

    kept = dedup_pipeline(
        "", pairs=rd.from_pandas(pairs[["doc_a", "doc_b"]]),
        corpus=corpus).to_pandas()
    assert sorted(kept["doc_id"].astype(int)) == [0, n_a]


def test_ppm_pixel_path_hand_computed(ray_session):
    """The dependency-free P6 decoder + grayscale + histogram against a
    hand-computed 2x2 image — the REAL pixel path running in-sandbox."""
    import pyarrow as pa

    from medical_ocr_pipeline_ray.pipelines.multimodal import (
        MediaDecoder, decode_ppm, ppm_grayscale)

    # 2x2: red, green / blue, white — with a header comment
    raw = b"P6\n# test image\n2 2\n255\n" + bytes(
        [255, 0, 0,  0, 255, 0,
         0, 0, 255,  255, 255, 255])
    rgb = decode_ppm(raw)
    assert rgb.shape == (2, 2, 3)
    assert rgb[0, 0].tolist() == [255, 0, 0]
    assert rgb[1, 1].tolist() == [255, 255, 255]
    # ITU-R 601-2 luma, truncating: R=76, G=149, B=29, W=255
    gray = ppm_grayscale(rgb)
    assert gray.ravel().tolist() == [76, 149, 29, 255]

    dec = MediaDecoder(decode=True)
    out = dec(pa.table({"doc_id": pa.array([1], pa.int64()),
                        "payload": pa.array([raw], pa.binary())}))
    hist = out["byte_hist"][0].as_py()
    expected = [0] * 16
    expected[76 // 16] = 1      # 76  -> bin 4
    expected[149 // 16] = 1     # 149 -> bin 9
    expected[29 // 16] = 1      # 29  -> bin 1
    expected[15] = 1            # 255 -> top bin
    assert hist == expected
    assert out["n_bytes"][0].as_py() == len(raw)

    # strict decode on a non-PPM payload without PIL: the declared stub
    try:
        from PIL import Image      # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            dec(pa.table({"doc_id": pa.array([1], pa.int64()),
                          "payload": pa.array([b"RIFFxxxx"], pa.binary())}))
    # "auto" policy: same opaque payload falls back to the byte histogram
    auto = MediaDecoder(decode="auto")
    out2 = auto(pa.table({"doc_id": pa.array([1], pa.int64()),
                          "payload": pa.array([b"RIFFxxxx"], pa.binary())}))
    assert sum(out2["byte_hist"][0].as_py()) == 8


def test_ppm_resample_nearest_hand_computed(ray_session):
    """Nearest-neighbor pixel resample of a 4x4 PPM down to 2x2 —
    src index = floor(dst * in/out) picks rows/cols {0, 2}."""
    import pyarrow as pa

    from medical_ocr_pipeline_ray.pipelines.multimodal import (
        MediaResizer, _encode_ppm, decode_ppm)

    rgb = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    raw = _encode_ppm(rgb)
    rs = MediaResizer(max_side=2, resample=True)
    out = rs(pa.table({
        "doc_id": pa.array([5], pa.int64()),
        "payload": pa.array([raw], pa.binary()),
        "width": pa.array([4], pa.int32()),
        "height": pa.array([4], pa.int32())}))
    assert out["out_w"][0].as_py() == 2 and out["out_h"][0].as_py() == 2
    small = decode_ppm(out["resampled"][0].as_py())
    assert small.shape == (2, 2, 3)
    np.testing.assert_array_equal(small, rgb[[0, 2]][:, [0, 2]])


def test_synth_media_images_are_real_ppm(ray_session):
    """Image payloads in the synth corpus decode to their declared
    metadata geometry — the decode pipeline runs genuine pixels, for
    BOTH the raw-PPM docs and the zlib-compressed PNG docs."""
    from medical_ocr_pipeline_ray.functions.png import decode_png
    from medical_ocr_pipeline_ray.pipelines.multimodal import (
        decode_ppm, synth_media)
    m = synth_media(SF_DIR).to_pandas()
    ppms = m[m["media_type"] == "image/x-portable-pixmap"].head(5)
    pngs = m[m["media_type"] == "image/png"].head(5)
    assert len(ppms) == 5 and len(pngs) == 5
    for _, row in ppms.iterrows():
        rgb = decode_ppm(row["payload"])
        assert rgb.shape == (row["height"], row["width"], 3)
    for _, row in pngs.iterrows():
        rgb = decode_png(row["payload"])
        assert rgb.shape == (row["height"], row["width"], 3)


def test_png_decoder_pixel_parity_with_ppm_kernel(ray_session):
    """The dependency-free PNG decoder reproduces the PPM kernel's
    pixels bit-for-bit on the same synth field, for every scanline
    filter type the spec defines (the synth writer emits filter 0; the
    other four exercise the unfilter paths without PIL)."""
    from medical_ocr_pipeline_ray.functions.png import (decode_png,
                                                        encode_png)
    from medical_ocr_pipeline_ray.pipelines.multimodal import (
        _encode_ppm, _synth_rgb, decode_ppm, ppm_grayscale)

    for did in (2, 5, 11):
        rgb = _synth_rgb(did, 64 + (did % 8) * 32, 64 + (did % 5) * 32)
        via_ppm = decode_ppm(_encode_ppm(rgb))
        for f in range(5):
            via_png = decode_png(encode_png(rgb, filter_type=f))
            np.testing.assert_array_equal(via_png, via_ppm)
            np.testing.assert_array_equal(ppm_grayscale(via_png),
                                          ppm_grayscale(via_ppm))


def test_containment_probes_avoid_hot_shingles(ray_session):
    """df-aware probe selection (round-4 verdict #2): every corpus doc
    shares a hot trigram with the small doc, yet the candidate set stays
    O(1) because the probes pick the small doc's LOW-df shingles — a
    hot-shingle probe would have produced one candidate per corpus doc.
    The true container is still found exactly (pigeonhole recall)."""
    import ray.data as rd

    from medical_ocr_pipeline_ray.pipelines.dedup import (
        _containment_candidates)

    hot = "the of and"                 # trigram present in EVERY doc
    n = 60
    docs = []
    for i in range(n):
        filler = " ".join(f"unique{i}w{j}" for j in range(20))
        docs.append({"doc_id": i, "text": f"{hot} {filler}"})
    # small doc = the 12-word prefix of doc 0 (contains the hot trigram)
    small_text = " ".join(docs[0]["text"].split()[:12])
    docs.append({"doc_id": 999, "text": small_text})
    aug = rd.from_items(docs)

    cands, _corpus = _containment_candidates(aug, p=8)
    cands = cands.to_pandas()
    # candidate copies across buckets are deduped downstream by
    # _attach_text; the cost property is about DISTINCT candidates
    probe_cands = cands[cands["doc_a"] == 999] \
        .drop_duplicates(["doc_a", "doc_b"])
    # a hot probe would emit ~n distinct candidates; df-aware probes: 1
    assert len(probe_cands) == 1
    assert probe_cands["doc_b"].iloc[0] == 0


def test_ngram_jaccard_survives_hot_length_bucket(ray_session, tmp_path):
    """Round-4 verdict #3: with length-only blocking, 8.6k same-length
    docs land in ONE bucket and the exact-quadratic pair cap became a
    hard ValueError.  The prefix-filter sub-blocking keeps the blocking
    exact (the planted exact twins are all found) while the same corpus
    now passes — distinct-content docs no longer share blocking keys
    just because they share a length."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from medical_ocr_pipeline_ray.pipelines.dedup import dedup_ngram_jaccard

    n = 8400                         # > cap-trip size for length blocking
    ids = list(range(n))
    # per-doc disjoint vocab: J = 0 between distinct docs, so the only
    # qualifying pairs are the did%37 exact twins the operator plants
    texts = [" ".join(f"d{i}w{j}" for j in range(12)) for i in ids]
    d = tmp_path / "sfhot"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}),
        str(d / "documents.parquet"))

    out = dedup_ngram_jaccard(str(d)).to_pandas()
    expect = {(i, i + 2_000_000) for i in ids if i % 37 == 0}
    got = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))
    assert got == expect
    assert (out["similarity"] == 1.0).all()


def test_media_resizer_png_roundtrip(ray_session):
    """PNG payloads resample through the builtin decoder and come back
    as a resized PNG (format round-trip, same nearest-neighbor kernel
    as the PPM path)."""
    import pyarrow as pa

    from medical_ocr_pipeline_ray.functions.png import (decode_png,
                                                        encode_png)
    from medical_ocr_pipeline_ray.pipelines.multimodal import MediaResizer

    rgb = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    rs = MediaResizer(max_side=2, resample=True)
    out = rs(pa.table({
        "doc_id": pa.array([5], pa.int64()),
        "payload": pa.array([encode_png(rgb)], pa.binary()),
        "width": pa.array([4], pa.int32()),
        "height": pa.array([4], pa.int32())}))
    small = decode_png(out["resampled"][0].as_py())
    np.testing.assert_array_equal(small, rgb[[0, 2]][:, [0, 2]])
