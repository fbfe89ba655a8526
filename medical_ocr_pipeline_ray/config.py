"""Pipeline configuration — single typed config object.

Replaces the reference's per-notebook papermill config cells and
``config/config.yml`` (reference: config/config.yml:1-87) with one frozen
dataclass threaded through the pipeline builder.  All thresholds trace to the
reference implementation (file:line cited per field).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractConfig:
    """Knobs for the per-turn extraction core.

    Threshold provenance (reference = /root/reference):
    - min_conf: block confidence floor, notebooks/01_extract_blocks.ipynb:~25
      (``min_conf = 0.50``; filter applied in each ``extract_*``).
    - dedup_iou_thr / dedup_sim_thr: greedy near-dedup thresholds,
      notebooks/01_extract_blocks.ipynb:~25 (``dedup_iou_thr=0.50``,
      ``dedup_sim_thr=0.92``) applied in ``deduplicate`` (:~207).
    - line_tol_y / para_gap_y: line assembly / paragraph join gaps,
      notebooks/01_extract_blocks.ipynb:~207 ``regroup_lines`` (14 px / 26 px).
    - header_band_frac / footer_band_frac: banner band tagging,
      notebooks/01b_normalize_layout.ipynb:~23 ``adaptive_bands`` (band px
      caps 140/120 on ~1400 px pages ≈ 10% / 10%); the reference *tags*
      header/footer blocks rather than deleting them — we keep that:
      band blocks get spans with kind header/footer and are excluded from
      the main extracted text only.
    - fuzzy_cutoff / fuzzy_max_corr / fuzzy_token_min_len: fuzzy vocab
      correction, notebooks/02_cleanup_blocks.ipynb:~147 ``apply_fuzzy``
      (difflib cutoff 0.86, ``max_corr=200``, token regex
      ``[A-Za-z][A-Za-z\\-]{2,}``).
    - link_density_thr / min_block_chars: boilerplate scoring for HTML block
      trees — Readability/Trafilatura-style text-density + link-density
      heuristics (public algorithmic knowledge); the reference's analogue is
      banner masking + header/footer tagging (``mask_bands``,
      notebooks/01_extract_blocks.ipynb:~207) and the HTML strip regex
      (notebooks/01_qa_pipeline_evaluation.ipynb:~117 ``_HTML_TAG_RE``).
    """

    min_conf: float = 0.50
    dedup_iou_thr: float = 0.50
    dedup_sim_thr: float = 0.92
    line_tol_y: float = 14.0
    para_gap_y: float = 26.0
    header_band_frac: float = 0.10
    footer_band_frac: float = 0.10
    # adaptive layout (reference 01b_normalize_layout.ipynb:~23):
    # - merge_rows scales tolerances by the page's median text height
    #   (0.60·med_h line tolerance; paragraph gap 1.60·med_h ≈ the fixed
    #   14/26 px defaults at the reference's ~16 px text height),
    # - detect_handwriting (height IQR) shrinks the banner bands,
    # - maybe_two_columns splits on 2-means x-centers at ≥ 0.12·page width.
    adaptive_layout: bool = True
    line_tol_med_factor: float = 0.60
    para_gap_med_factor: float = 1.60
    two_column_min_sep_frac: float = 0.12
    hw_iqr_factor: float = 0.35
    hw_band_shrink: float = 0.5
    # rescue escalation (reference GRID_RESCUE, 01_extract_blocks.ipynb:~88):
    # first-pass body yield below rescue_min_chars promotes low-confidence
    # blocks >= rescue_conf and re-runs the layout pass
    rescue_min_chars: int = 40
    rescue_conf: float = 0.35
    fuzzy_cutoff: float = 0.86
    fuzzy_max_corr: int = 200
    fuzzy_token_min_len: int = 3
    link_density_thr: float = 0.50
    short_block_chars: int = 25
    short_block_link_thr: float = 0.20


@dataclass(frozen=True)
class PipelineConfig:
    """Physical execution knobs for the Ray Data pipeline.

    Sized for a multi-node cluster streaming ~100 TB; tested single-node.

    - batch_size: rows per batch handed to extraction UDFs.  Turn rows are
      ~1 KB text on average but tool turns carry multi-KB payloads, so keep
      batches modest (the reference's analogue is the char-budget chunking in
      notebooks/04_json_extraction.ipynb:~89 ``chunks_by_size``).
    - heavy_concurrency: actor-pool size for the stateful correction/layout
      stage (reference A8-A10 singletons become an actor pool,
      SURVEY.md §2.3).
    - salt_span: turns per salt bucket for the conversation-assembly shuffle;
      mega-conversations (skew fixture F2) are split into
      ``turn_idx // salt_span`` partials merged associatively — the two-phase
      merge is legal because assembly is an ordered concat (the reference's
      ``merge_dict`` fold is likewise associative,
      notebooks/05_merge_and_validate.ipynb:~52).
    - fragments_per_partition: input parquet fragments grouped per resume
      partition (checkpoint manifest granularity).
    """

    batch_size: int = 1024
    use_actor_pool: bool = False   # True → two-tier cheap-task/heavy-actor
    heavy_concurrency: int | None = None   # None → size to the cluster CPUs
    heavy_num_cpus: float = 1.0
    salt_span: int = 512
    # BYTE-budget salting (the reference's actual guard — ``chunks_by_size``
    # splits assembled docs at ~90k chars, notebooks/04_json_extraction
    # .ipynb:~89; turn-count salting alone lets a mega-conversation of
    # mega-turns land one giant salt group).  Conversations whose total
    # content_chars exceed the budget get per-chunk salts from a slim
    # boundary pre-pass (stages/assemble.find_salt_boundaries); everyone
    # else keeps the salt-0 fast path.  0 disables the pre-pass.
    salt_byte_budget: int = 262_144
    # driver-side cap on how many mega-conversations get byte boundaries
    # per run (the skew tail is bounded by definition; beyond the cap a
    # conversation falls back to turn-span salting and the overflow is
    # LOGGED — no silent caps)
    mega_conv_cap: int = 100_000
    # assembly fan-in: conversations are folded per hash bucket (vectorized),
    # never one Ray group per conversation; choose so bucket ≈ 256 MB of
    # slim turn rows at your corpus size (stages/assemble.py)
    assembly_buckets: int = 64
    fragments_per_partition: int = 1
    stage_version: str = "v1"


DEFAULT_EXTRACT = ExtractConfig()
DEFAULT_PIPELINE = PipelineConfig()
