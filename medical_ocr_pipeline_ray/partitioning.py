"""Cluster-aware sizing for the bucketed exchanges.

Every bucketed operator in this engine (partitioned hash joins, coarse-key
folds, candidate-pair emission, label propagation) shuffles through an
explicit ``key % P`` bucket column.  Round 1/2 hard-coded P (32/64/8);
this module centralizes the documented sizing rule so one helper owns it:

    P = max( ceil(est_bytes / TARGET_BUCKET_BYTES),   # one bucket's slice
                                                      # fits a task heap
             2 x cluster CPUs,                        # small inputs still
                                                      # use every core
             8 )                                      # test-scale floor

At 100 TB, ``est_bytes`` dominates (100 TB / 256 MB ~ 400k buckets); on
the single-node test tiers the CPU floor dominates, which keeps group
counts in the regime where Ray's ~1 ms/group framework overhead is
negligible.  Bucket counts never affect operator RESULTS - only how the
exchange is partitioned - so correctness is invariant to this sizing.
"""

from __future__ import annotations

import os

TARGET_BUCKET_BYTES = 256 * 1024 * 1024


def cluster_cpus(default: int = 8) -> int:
    """Total CPUs of the attached Ray cluster (``default`` when Ray is not
    initialized - e.g. module import time, or pure-local unit tests)."""
    try:
        import ray
        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:
        pass
    return default


def buckets_for(est_bytes: int | None = None, *, floor: int | None = None,
                target_bytes: int = TARGET_BUCKET_BYTES) -> int:
    """Partition count for a bucketed exchange over ~``est_bytes`` of
    data.  ``est_bytes=None`` (unknown) returns just the parallelism
    floor; pass ``floor`` to pin the minimum explicitly (tests)."""
    if floor is None:
        floor = max(8, 2 * cluster_cpus())
    if est_bytes is None or est_bytes <= 0:
        return floor
    return max(floor, -(-int(est_bytes) // int(target_bytes)))


# A broadcast small side (ray.put once, ray.get per task) must fit every
# worker heap alongside the batch being processed.  256 MB is the same
# order as one exchange bucket; anything bigger should be a partitioned
# join, not a broadcast.
BROADCAST_CAP_BYTES = 256 * 1024 * 1024


def est_object_bytes(obj) -> int:
    """Order-of-magnitude heap estimate for broadcast-cap checks (NOT an
    exact accounting): payload bytes plus ~64 B/element container
    overhead for the common shapes (str/bytes collections, dicts, numpy,
    pandas, arrow)."""
    import numpy as np
    if isinstance(obj, (bytes, bytearray, str)):
        return len(obj)
    if isinstance(obj, np.ndarray):
        return int(obj.nbytes)
    if hasattr(obj, "memory_usage"):                       # pandas
        usage = obj.memory_usage(deep=True)
        return int(usage.sum()) if hasattr(usage, "sum") else int(usage)
    if hasattr(obj, "nbytes"):                             # arrow
        return int(obj.nbytes)
    if isinstance(obj, (set, frozenset, list, tuple)):
        return sum(est_object_bytes(x) + 64 for x in obj)
    if isinstance(obj, dict):
        return sum(est_object_bytes(k) + est_object_bytes(v) + 64
                   for k, v in obj.items())
    return 64


def checked_put(obj, what: str, cap: int = BROADCAST_CAP_BYTES):
    """``ray.put`` with a build-time size assertion: raises instead of
    silently broadcasting an unbounded small side (an eval set, a dict
    table, a vocabulary) that stopped being small.  The error names the
    partitioned-join escape hatch because that IS the fix at scale."""
    est = est_object_bytes(obj)
    if est > cap:
        raise ValueError(
            f"broadcast side '{what}' is ~{est // (1024 * 1024)} MB "
            f"(cap {cap // (1024 * 1024)} MB): too big to ship to every "
            "worker — use a partitioned/bucketed join instead of a "
            "broadcast, or raise the cap deliberately")
    import ray
    return ray.put(obj)


def table_bytes(sf_dir: str, name: str) -> int | None:
    """On-disk bytes of one input parquet table (file or directory) - the
    cheap, metadata-free estimate ``buckets_for`` wants.  Compressed bytes
    undercount heap bytes by the codec ratio, which the 256 MB target
    absorbs (a 2-4x expansion still fits a task)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(root, f))
                for root, _dirs, files in os.walk(path) for f in files)
        return os.path.getsize(path)
    except OSError:
        return None
