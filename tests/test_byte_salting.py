"""Byte-budget assembly salting (the reference chunks_by_size guard):
mega-conversations split by PAYLOAD SIZE, not turn count, and the result
is byte-equal to a naive single-process assembly for any budget."""

import dataclasses
import hashlib

import numpy as np
import pandas as pd
import pytest

from medical_ocr_pipeline_ray.config import DEFAULT_PIPELINE


def _turns_df() -> pd.DataFrame:
    """3 normal convs + one mega-conv of mega-turns (40 x 5000 chars) +
    one conv whose LAST turn alone exceeds the budget."""
    rows = []
    for c in range(3):
        for t in range(5):
            txt = f"conv{c} turn{t} " + "x" * (50 + 13 * t)
            rows.append((f"conv-{c}", t, txt))
    for t in range(40):
        rows.append(("mega-conv", t, f"m{t} " + "y" * 5000))
    rows.append(("tail-heavy", 0, "small start"))
    rows.append(("tail-heavy", 1, "z" * 20000))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                     "text_extracted"])
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["content_chars"] = df["text_extracted"].str.len().astype(np.int64)
    return df


def _oracle(df: pd.DataFrame) -> pd.DataFrame:
    g = df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")
    out = g["text_extracted"].apply("\n".join).reset_index(name="full_text")
    out["sha256"] = [hashlib.sha256(t.encode()).hexdigest()
                     for t in out["full_text"]]
    return out.sort_values("conv_id").reset_index(drop=True)


def _cfg(budget: int, salt_span: int = 512):
    return dataclasses.replace(DEFAULT_PIPELINE, salt_byte_budget=budget,
                               salt_span=salt_span, assembly_buckets=8)


def test_boundaries_match_naive_chunker(ray_session):
    import ray.data as rd
    from medical_ocr_pipeline_ray.stages.assemble import find_salt_boundaries

    df = _turns_df()
    budget = 8000
    bmap = find_salt_boundaries(
        rd.from_pandas(df[["conv_id", "turn_idx", "content_chars"]]),
        budget)
    # naive: chunk index of turn t = chars-before-t // budget
    for conv, g in df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        chars = g["content_chars"].to_numpy()
        prefix = np.concatenate(([0], np.cumsum(chars)[:-1]))
        salts = prefix // budget
        starts = g["turn_idx"].to_numpy()[
            np.concatenate(([True], np.diff(salts) != 0))]
        if chars.sum() > budget:
            assert conv in bmap, conv
            assert list(bmap[conv]) == [int(s) for s in starts], conv
        else:
            assert conv not in bmap, conv
    # the mega conv really splits into multiple byte chunks
    assert len(bmap["mega-conv"]) > 3


@pytest.mark.parametrize("budget,salt_span", [
    (8000, 512),      # byte salting drives the split
    (8000, 4),        # byte + span salting mixed across convs
    (10**9, 512),     # budget never binds -> pure span path
    (0, 512),         # disabled -> pre-pass skipped entirely
])
def test_assembly_byte_equal_any_budget(ray_session, budget, salt_span):
    import ray.data as rd
    from medical_ocr_pipeline_ray.stages.assemble import (
        assemble_conversations)

    df = _turns_df()
    got = assemble_conversations(
        rd.from_pandas(df), _cfg(budget, salt_span)).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    want = _oracle(df)
    assert list(got["conv_id"]) == list(want["conv_id"])
    assert list(got["full_text"]) == list(want["full_text"])
    assert list(got["sha256"]) == list(want["sha256"])
    assert got["n_turns"].sum() == len(df)


def test_staged_runner_byte_salting(ray_session, tmp_path):
    """run_assembly (fold_or_finalize + merge path) over a parquet turns
    dir with a binding byte budget: output byte-equal to the oracle and
    the mega conversations actually take the partial path."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from medical_ocr_pipeline_ray.pipelines.extract_pipeline import (
        read_conversations, run_assembly)

    df = _turns_df()
    out = str(tmp_path / "run")
    turns_dir = tmp_path / "run" / "turns" / "part=p0"
    turns_dir.mkdir(parents=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(turns_dir / "t.parquet"))
    summary = run_assembly(out, _cfg(8000))
    assert summary["conversations"] == df["conv_id"].nunique()
    got = read_conversations(out).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    want = _oracle(df)
    assert list(got["full_text"]) == list(want["full_text"])
    assert list(got["sha256"]) == list(want["sha256"])
    # the mega conversations came through the merged (partial) path
    import os
    assert os.path.isdir(os.path.join(out, "conversations", "merged"))
