"""Job entry point — the ``ray job submit`` target for the flagship
pipeline (BASELINE north_rule lifecycle: submit → run/resume → manifest).

    ray job submit -- python -m medical_ocr_pipeline_ray.job \
        --input-dir /data/transcripts --out-dir /data/extracted

Locally (no cluster):

    python -m medical_ocr_pipeline_ray.job --tier t2 --out-dir /tmp/out

Resume is the default: a re-submitted job diffs the checkpoint manifest
against the input fragments and processes only missing partitions
(state/manifest.py).  Owns its Ray session only when none exists (the
driver contract forbids init inside library code paths).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="medical_ocr_pipeline_ray.job")
    p.add_argument("--input-dir", default="",
                   help="directory of transcript parquet fragments")
    p.add_argument("--tier", default="",
                   help="synthesize+use a synth tier instead of --input-dir "
                        "(t1|t2|t2skew|bench|bench_xl|bench_xxl)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--no-assemble", action="store_true")
    p.add_argument("--wave-size", type=int, default=8)
    p.add_argument("--num-cpus", type=int, default=0,
                   help="only used when this process owns ray.init")
    args = p.parse_args(argv)

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from .pipelines.extract_pipeline import run_extraction
    from .sources.transcripts import transcripts_dir

    input_dir = args.input_dir or transcripts_dir(args.tier or "t2")
    summary = run_extraction(input_dir, args.out_dir,
                             resume=not args.no_resume,
                             wave_size=args.wave_size,
                             assemble=not args.no_assemble)
    print(json.dumps({"input_dir": input_dir, "out_dir": args.out_dir,
                      **summary}))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
