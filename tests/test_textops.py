

def test_approx_value_quantiles_rank_tolerance(ray_session):
    """Sketch quantiles land within 3% rank error of the exact
    distribution, and are deterministic across runs (hash sample, no
    RNG)."""
    import numpy as np
    import pyarrow.parquet as pq
    from medical_ocr_pipeline_ray.pipelines.textops import \
        approx_value_quantiles
    sf = "/root/testdata/sf0.01"
    got = approx_value_quantiles(sf)
    vals = np.sort(pq.read_table(f"{sf}/events.parquet",
                                 columns=["value"])["value"].to_numpy())
    n = len(vals)
    for _, row in got.iterrows():
        rank = np.searchsorted(vals, row["value"], side="right") / n
        assert abs(rank - row["q"]) < 0.03, (row["q"], rank)
    again = approx_value_quantiles(sf)
    assert (again["value"].to_numpy() == got["value"].to_numpy()).all()
