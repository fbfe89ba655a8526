"""Unit tests for the bucketed-exchange sizing rule (partitioning.py)."""

import numpy as np

from medical_ocr_pipeline_ray.partitioning import (TARGET_BUCKET_BYTES,
                                                   buckets_for, cluster_cpus,
                                                   table_bytes)

SF_DIR = "/root/testdata/sf0.001"


def test_floor_when_bytes_unknown():
    assert buckets_for(None, floor=8) == 8
    assert buckets_for(0, floor=8) == 8


def test_bytes_rule_ceil():
    assert buckets_for(TARGET_BUCKET_BYTES * 10, floor=8) == 10
    assert buckets_for(TARGET_BUCKET_BYTES * 10 + 1, floor=8) == 11


def test_floor_dominates_small_inputs():
    assert buckets_for(1024, floor=64) == 64


def test_100tb_regime():
    # at the design target the bytes term dominates any CPU floor
    p = buckets_for(100 * 10**12, floor=512)
    assert p == -(-100 * 10**12 // TARGET_BUCKET_BYTES)
    assert p > 100_000


def test_default_floor_tracks_cluster():
    # with Ray up (session fixture) the floor is 2x cluster CPUs, min 8
    assert buckets_for() >= 8
    assert buckets_for() >= min(8, 2 * cluster_cpus())


def test_table_bytes_reads_real_table():
    n = table_bytes(SF_DIR, "documents")
    assert n is not None and n > 0


def test_table_bytes_missing_is_none():
    assert table_bytes(SF_DIR, "no_such_table") is None


def test_checked_put_rejects_oversized_broadcast(ray_session):
    """A broadcast small side past the cap must raise at build time, not
    silently ship to every worker."""
    import pytest

    from medical_ocr_pipeline_ray.partitioning import (BROADCAST_CAP_BYTES,
                                                       checked_put,
                                                       est_object_bytes)

    small = {"a": 1, "b": 2}
    ref = checked_put(small, "tiny map")          # under cap: fine
    import ray
    assert ray.get(ref) == small

    big = np.zeros(BROADCAST_CAP_BYTES // 8 + 1024, dtype=np.int64)
    assert est_object_bytes(big) > BROADCAST_CAP_BYTES
    with pytest.raises(ValueError, match="partitioned"):
        checked_put(big, "runaway eval set")
    # estimator covers string collections (the realistic eval-set shape)
    est = est_object_bytes(frozenset({"alpha", "beta"}))
    assert est >= len("alpha") + len("beta")
