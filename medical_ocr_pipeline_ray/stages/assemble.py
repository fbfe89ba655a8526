"""Conversation assembly: bucketed two-phase fold (the one shuffle family).

Ray's ``groupby(key).map_groups(fn)`` pays ~1.5 ms of framework overhead
PER GROUP — catastrophic at 10^5-10^9 conversations (measured 100× slower
than a vectorized fold).  Assembly therefore never creates one group per
conversation; it groups by a COARSE key and folds all conversations of a
bucket vectorized inside one task:

1. key phase (``map_batches``): ``bucket = crc32(conv_id) % P`` and
   ``salt = turn_idx // S``.
2. partial fold: ``groupby([bucket, salt])`` → per GROUP (not per conv):
   sort by (conv_id, turn_idx), detect conversation runs with numpy
   boundary diffs, join texts per run → one partial row per (conv, salt).
   Group size ≈ corpus/P, bounded by choosing P ~ corpus_bytes/256 MB; a
   mega-conversation (FIXTURES F2) is split across salts, so no group
   explodes (the reference-analogue associative-merge argument:
   notebooks/05_merge_and_validate.ipynb:~52 ``merge_dict`` fold /
   SURVEY.md D3).
3. final fold: ``groupby(bucket)`` over the (tiny) partials → sort by
   (conv_id, salt), run-fold again, sha256 per conversation.

Both shuffles move only slim columns (raw payloads were dropped at the
extraction stage); group counts are O(P), so map_groups overhead is
negligible; all per-row work is a single python scan per bucket.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_PIPELINE, PipelineConfig

CONV_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("n_turns", pa.int64()),
    ("content_chars", pa.int64()),
    ("full_text", pa.string()),
    ("sha256", pa.string()),
])


def _resolve_boundaries(boundaries) -> dict:
    """fn_kwargs carry either a plain dict (tests) or a ``ray.put`` ref
    (pipelines — plasma-cached per worker instead of re-pickled per task)."""
    if boundaries is None:
        return {}
    if isinstance(boundaries, dict):
        return boundaries
    import ray
    return ray.get(boundaries)


def _add_keys(batch: pa.Table, buckets: int, salt_span: int,
              boundaries=None) -> pa.Table:
    """bucket = crc32(conv_id) % P; salt = BYTE-budget chunk index for
    mega-conversations (from the ``find_salt_boundaries`` pre-pass map),
    ``turn_idx // salt_span`` otherwise.  Byte salts are monotone in
    turn_idx with contiguous preimages, so partials merge by min_turn
    exactly like span salts."""
    conv = batch["conv_id"].to_pylist()
    bucket = np.fromiter((zlib.crc32(c.encode()) % buckets for c in conv),
                         dtype=np.int32, count=len(conv))
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
    salt = (turn // salt_span).astype(np.int32)
    bmap = _resolve_boundaries(boundaries)
    if bmap:
        for i, c in enumerate(conv):
            b = bmap.get(c)
            if b is not None:
                salt[i] = np.searchsorted(b, turn[i], side="right") - 1
    out = batch
    # NEGATIVE RESULT (round 4, kept for the record): dictionary-encoding
    # conv_id here — each block shipping every distinct id once as int32
    # indices — measured assembly 16.9 s vs 10.7 s WITHOUT on a same-
    # window A/B (bench_xl, 32 CPUs): the per-block encode hash of every
    # conv_id plus the categorical→object conversion inside the pandas
    # folds costs more than the ~12 B/row of string savings, because
    # text_extracted dominates the exchange bytes anyway (conv_id is
    # ~4% of the row).  Reverted; see BASELINE.md round-4 notes.
    for name, arr in (("bucket", bucket), ("salt", salt)):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, pa.array(arr))
    return out


def find_salt_boundaries(turns_slim, budget: int, cap: int = 100_000,
                         n_buckets: int | None = None) -> dict:
    """BYTE-budget chunk boundaries for mega-conversations — the
    reference's ``chunks_by_size`` guard (~90k chars,
    notebooks/04_json_extraction.ipynb:~89) as a slim pre-pass.

    Turn-count salting alone cannot bound salt-group BYTES (a
    mega-conversation of mega-turns puts ``salt_span × turn_bytes`` in one
    group); a byte salt must be in the shuffle key, and the prefix sums it
    needs cannot be computed row-locally.  So:

    1. per-conversation totals via map-side combiner + one slim groupby
       (conv_id, int64 — text never read);
    2. conversations with total > budget (the skew tail, bounded by
       definition) keep their per-turn rows for a bucketed prefix-sum
       fold emitting one boundary-list row per conversation;
    3. the resulting {conv_id: chunk-start turn indices} dict is small
       (|mega| rows) and is broadcast via ``ray.put``.

    ``cap`` bounds the driver-side dict; overflow conversations fall back
    to turn-span salting and the count is LOGGED (no silent caps).  Chunk
    rule: turn t belongs to chunk ``prefix_chars_before_t // budget`` —
    monotone in t, so chunks are contiguous turn ranges.

    Totals cost is kept off the common path by an AT-RISK filter in the
    combiner: a conversation fully interior to one batch with a partial
    sum under the budget provably cannot be mega, so only batch-BOUNDARY
    conversations (which may continue in neighboring batches) and
    partials already ≥ budget enter the exchange — ~2 rows per batch
    instead of one per (conv, batch).  Exact when conversation rows are
    physically contiguous (the standard layout for transcript logs and
    this engine's extraction output); a conversation whose rows are
    scattered could be missed, which only degrades it to turn-span
    salting — output bytes are unaffected."""
    import logging

    from ray.data.aggregate import Sum

    def partial_tot(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("conv_id", as_index=False)["content_chars"].sum()
        if len(df):
            edge = (df["conv_id"].iloc[0], df["conv_id"].iloc[-1])
            g = g[(g["content_chars"] >= budget)
                  | g["conv_id"].isin(edge)]
        return g

    totals = turns_slim.map_batches(partial_tot, batch_format="pandas",
                                    batch_size=None) \
        .groupby("conv_id").aggregate(
            Sum("content_chars", alias_name="total"))

    def only_mega(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["total"] > budget][["conv_id", "total"]]

    mega = totals.map_batches(only_mega, batch_format="pandas").to_pandas()
    if mega.empty:
        return {}
    return boundaries_for_megaset(
        turns_slim, dict(zip(mega["conv_id"], mega["total"].astype(int))),
        budget, cap=cap, n_buckets=n_buckets)


def boundaries_for_megaset(turns_slim, mega_totals: dict, budget: int,
                           cap: int = 100_000,
                           n_buckets: int | None = None) -> dict:
    """Chunk boundaries for a KNOWN set of mega-conversations (conv_id →
    total chars): filtered slim read + bucketed prefix-sum fold.  Split
    out of ``find_salt_boundaries`` so callers that already know the
    mega set (run_assembly reads per-partition candidates from the
    checkpoint manifest) skip the discovery exchange entirely."""
    import logging

    if not mega_totals:
        return {}
    if len(mega_totals) > cap:
        logging.getLogger(__name__).warning(
            "boundaries_for_megaset: %d mega-conversations exceed the cap "
            "of %d; the %d largest get byte salts, the rest fall back to "
            "turn-span salting", len(mega_totals), cap, cap)
        keep = sorted(mega_totals, key=lambda c: (-mega_totals[c], c))[:cap]
        mega_totals = {c: mega_totals[c] for c in keep}
    from ..partitioning import checked_put
    mega_ref = checked_put(frozenset(mega_totals), "mega-conversation ids")

    def pick(df: pd.DataFrame, _ref=mega_ref) -> pd.DataFrame:
        import ray as _r
        keep = df["conv_id"].isin(_r.get(_ref))
        return df.loc[keep, ["conv_id", "turn_idx", "content_chars"]]

    picked = turns_slim.map_batches(pick, batch_format="pandas")
    p = n_buckets or 64

    def key(df: pd.DataFrame) -> pd.DataFrame:
        cb = np.fromiter(
            (zlib.crc32(c.encode()) % p for c in df["conv_id"]),
            dtype=np.int64, count=len(df))
        return df.assign(bucket=cb.astype(np.int32))

    def bounds(g: pd.DataFrame, _budget=budget) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        turn = g["turn_idx"].to_numpy()
        chars = g["content_chars"].to_numpy(dtype=np.int64)
        oc, ob = [], []
        for s, e in _runs(conv):
            prefix = np.concatenate(
                ([0], np.cumsum(chars[s:e - 1] if e - s > 1 else
                                chars[s:s])))
            salt = prefix // _budget
            change = np.flatnonzero(np.diff(salt)) + 1
            starts = turn[s:e][np.concatenate(([0], change)).astype(int)]
            oc.append(conv[s])
            # serialize as text — variable-length int lists in pandas
            # object columns are fragile through Ray's block layer
            ob.append(",".join(str(int(t)) for t in starts))
        return pd.DataFrame({"conv_id": oc, "bounds": ob})

    rows = picked.map_batches(key, batch_format="pandas") \
        .groupby("bucket").map_groups(bounds, batch_format="pandas") \
        .to_pandas()
    return {c: np.array([int(x) for x in b.split(",")], dtype=np.int64)
            for c, b in zip(rows["conv_id"], rows["bounds"])}


def _runs(conv_sorted: np.ndarray) -> list[tuple[int, int]]:
    """Contiguous [start, end) runs of equal conv_id in a sorted array."""
    n = len(conv_sorted)
    if n == 0:
        return []
    change = np.flatnonzero(conv_sorted[1:] != conv_sorted[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    return list(zip(starts, ends))


def _conv_order(conv: np.ndarray, second: np.ndarray) -> np.ndarray:
    """Sort permutation grouping equal conv_ids contiguously with
    ``second`` ascending inside each group.  Inter-conversation order is
    irrelevant to every fold (rows per conversation are independent), so
    conv_ids are FACTORIZED to first-occurrence int codes and the sort is
    an int lexsort — O(n) hashing instead of O(n log n) string compares
    (the folds are the assembly CPU hot path)."""
    codes = pd.factorize(conv)[0]
    return np.lexsort((second, codes))


def partial_fold_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """One partial row per (conv, salt) — vectorized over the whole bucket."""
    order = _conv_order(group["conv_id"].to_numpy(),
                        group["turn_idx"].to_numpy())
    conv = group["conv_id"].to_numpy()[order]
    texts = group["text_extracted"].to_numpy()[order]
    chars = group["content_chars"].to_numpy()[order]
    salts = group["salt"].to_numpy()[order]
    # runs keyed by (conv, salt): conv runs then split on salt changes
    # (salts ascend with turn_idx inside a conversation, so the lexsort by
    # turn_idx already orders them)
    n = len(conv)
    if n:
        change = np.flatnonzero((conv[1:] != conv[:-1])
                                | (salts[1:] != salts[:-1])) + 1
        runs = list(zip(np.concatenate(([0], change)),
                        np.concatenate((change, [n]))))
    else:
        runs = []
    oc, osalt, on, ochars, otext = [], [], [], [], []
    for s, e in runs:
        oc.append(conv[s])
        osalt.append(int(salts[s]))
        on.append(int(e - s))
        ochars.append(int(chars[s:e].sum()))
        otext.append("\n".join(t if t is not None else ""
                               for t in texts[s:e]))
    return pd.DataFrame({
        "bucket": np.full(len(oc), int(group["bucket"].iloc[0]),
                          dtype=np.int32),
        "conv_id": oc,
        "salt": np.array(osalt, dtype=np.int32),
        "n_turns": np.array(on, dtype=np.int64),
        "content_chars": np.array(ochars, dtype=np.int64),
        "text_part": otext,
    })


def final_fold_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """Merge each conversation's salt partials (ordered) — vectorized over
    the whole bucket; one output row per conversation."""
    order = _conv_order(group["conv_id"].to_numpy(),
                        group["salt"].to_numpy())
    conv = group["conv_id"].to_numpy()[order]
    parts = group["text_part"].to_numpy()[order]
    n_turns = group["n_turns"].to_numpy()[order]
    chars = group["content_chars"].to_numpy()[order]
    oc, on, ochars, otext, osha = [], [], [], [], []
    for s, e in _runs(conv):
        full = "\n".join(parts[s:e])
        oc.append(conv[s])
        on.append(int(n_turns[s:e].sum()))
        ochars.append(int(chars[s:e].sum()))
        otext.append(full)
        osha.append(hashlib.sha256(full.encode("utf-8")).hexdigest())
    return pd.DataFrame({
        "conv_id": oc,
        "n_turns": np.array(on, dtype=np.int64),
        "content_chars": np.array(ochars, dtype=np.int64),
        "full_text": otext,
        "sha256": osha,
    })


def salt_boundaries_ref(turns_slim, pcfg: PipelineConfig):
    """Run the byte-budget pre-pass (if enabled) and broadcast the
    boundary map; None when disabled or when no conversation exceeds the
    budget (the fast path — keying then behaves exactly as span salting)."""
    if not pcfg.salt_byte_budget:
        return None
    bmap = find_salt_boundaries(turns_slim, pcfg.salt_byte_budget,
                                pcfg.mega_conv_cap)
    if not bmap:
        return None
    from ..partitioning import checked_put
    return checked_put(bmap, "byte-salt boundary map")


def assemble_conversations(turns_ds, pcfg: PipelineConfig = DEFAULT_PIPELINE):
    """turns Dataset (conv_id/turn_idx/text_extracted/content_chars …) →
    conversation Dataset (CONV_SCHEMA).  Pure two-shuffle dataset pipeline
    (no writes); the checkpointing runner uses the cheaper staged
    single-shuffle variant (``fold_or_finalize`` + a side merge of the rare
    multi-salt partials, see pipelines/extract_pipeline.run_assembly)."""
    slim = turns_ds.select_columns(
        ["conv_id", "turn_idx", "text_extracted", "content_chars"])
    bref = salt_boundaries_ref(
        slim.select_columns(["conv_id", "turn_idx", "content_chars"]), pcfg)
    keyed = slim.map_batches(
        _add_keys, batch_format="pyarrow", batch_size=pcfg.batch_size,
        fn_kwargs={"buckets": pcfg.assembly_buckets,
                   "salt_span": pcfg.salt_span,
                   "boundaries": bref})
    partials = keyed.groupby(["bucket", "salt"]).map_groups(
        partial_fold_bucket, batch_format="pandas")
    return partials.groupby("bucket").map_groups(
        final_fold_bucket, batch_format="pandas")


def fold_or_finalize(group: pd.DataFrame, salt_span: int,
                     boundaries=None) -> pd.DataFrame:
    """Phase-A fold that FINALIZES complete conversations in place.

    A conversation is provably complete inside its (bucket, salt=0) group
    when its max turn_idx < salt_span - 1 (turn indices are contiguous
    0..n-1 per conversation — FIXTURES.md F1; convs with >= salt_span
    turns conservatively take the partial path).  Byte-salted
    mega-conversations (present in the ``boundaries`` map) are complete
    iff their boundary list has a single chunk.  Finalized rows carry
    sha256 + is_final=True; multi-salt conversations emit partial rows
    (is_final=False) that a tiny follow-up shuffle merges — so the bulk of
    the corpus never rides a second exchange."""
    bmap = _resolve_boundaries(boundaries)
    order = _conv_order(group["conv_id"].to_numpy(),
                        group["turn_idx"].to_numpy())
    conv = group["conv_id"].to_numpy()[order]
    turn = group["turn_idx"].to_numpy()[order]
    texts = group["text_extracted"].to_numpy()[order]
    chars = group["content_chars"].to_numpy()[order]
    salt0 = int(group["salt"].iloc[0]) == 0
    oc, on, ochars, otext, osha, ofinal, omin = [], [], [], [], [], [], []
    for s, e in _runs(conv):
        full = "\n".join(t if t is not None else "" for t in texts[s:e])
        b = bmap.get(conv[s])
        if b is not None:
            complete = salt0 and len(b) == 1
        else:
            complete = salt0 and int(turn[e - 1]) < salt_span - 1
        oc.append(conv[s])
        on.append(int(e - s))
        ochars.append(int(chars[s:e].sum()))
        otext.append(full)
        osha.append(hashlib.sha256(full.encode("utf-8")).hexdigest()
                    if complete else "")
        ofinal.append(complete)
        omin.append(int(turn[s]))
    return pd.DataFrame({
        "conv_id": oc,
        "n_turns": np.array(on, dtype=np.int64),
        "content_chars": np.array(ochars, dtype=np.int64),
        "full_text": otext,
        "sha256": osha,
        "is_final": np.array(ofinal, dtype=bool),
        "min_turn": np.array(omin, dtype=np.int32),
    })


def merge_partials(group: pd.DataFrame) -> pd.DataFrame:
    """Merge one conversation's multi-salt partials (few rows per conv)."""
    g = group.sort_values("min_turn")
    full = "\n".join(g["full_text"])
    return pd.DataFrame([{
        "conv_id": g["conv_id"].iloc[0],
        "n_turns": int(g["n_turns"].sum()),
        "content_chars": int(g["content_chars"].sum()),
        "full_text": full,
        "sha256": hashlib.sha256(full.encode("utf-8")).hexdigest(),
    }])
