"""discretise_habitat golden invariants (FIXTURES.md F6,
R/discretise_habitat.R:66-74,225-227,284-319)."""

import numpy as np
import pytest

from hexscape_spark import geo
from hexscape_spark.habitat import bandwidth_nrd, discretise_habitat


@pytest.fixture(scope="module")
def habitat_df(spark):
    # F6: rectangles totalling ~25 km², Density in {0.75, 0.25, 0.0}
    km = 1000.0
    rows = [
        ("High", 0.75, geo.rect_wkb(0, 0, 4 * km, 3 * km)),
        ("Low", 0.25, geo.rect_wkb(4 * km, 0, 8 * km, 2 * km)),
        ("High2", 0.75, geo.rect_wkb(1 * km, 4 * km, 3 * km, 6 * km)),
        ("Non", 0.0, geo.rect_wkb(8 * km, 0, 10 * km, 1 * km)),
    ]
    return spark.createDataFrame(
        [(h, d, bytearray(w)) for h, d, w in rows],
        "Habitat STRING, Density DOUBLE, geom_wkb BINARY")


def test_bandwidth_nrd_matches_r_formula():
    x = np.arange(100, dtype=float)
    q25, q75 = np.quantile(x, [0.25, 0.75])
    want = 4 * 1.06 * min(np.std(x, ddof=1), (q75 - q25) / 1.34) * 100 ** -0.2
    assert bandwidth_nrd(x) == pytest.approx(want)


def test_total_capacity_approximately_conserved(spark, habitat_df):
    """Σ output Capacity ≈ Σ area×Density (within rasterisation tolerance,
    R/discretise_habitat.R:316-318)."""
    out = discretise_habitat(spark, habitat_df, max_size_km2=5.0,
                             min_size_km2=0.5, raster_size_km2=0.05,
                             point_density_per_km2=50.0).toPandas()
    want_capacity = (4 * 3 * 0.75) + (4 * 2 * 0.25) + (2 * 2 * 0.75)
    got = out.Capacity.sum()
    assert got == pytest.approx(want_capacity, rel=0.15)


def test_subpatch_sizes_and_ids(spark, habitat_df):
    out = discretise_habitat(spark, habitat_df, max_size_km2=3.0,
                             min_size_km2=0.5, raster_size_km2=0.05,
                             point_density_per_km2=50.0).toPandas()
    # split patches should not (grossly) exceed max_size
    assert (out.area / 1e6 <= 3.0 * 1.5).all()
    # PatchID format "{main}_{sub}" and unique
    assert out.PatchID.is_unique
    assert all("_" in p for p in out.PatchID)
    # no output patch smaller than min_size/2 (raster tolerance)
    assert (out.area / 1e6 >= 0.5 / 2).all()


def test_deterministic(spark, habitat_df):
    a = discretise_habitat(spark, habitat_df, seed=7).toPandas() \
        .sort_values("PatchID").reset_index(drop=True)
    b = discretise_habitat(spark, habitat_df, seed=7).toPandas() \
        .sort_values("PatchID").reset_index(drop=True)
    assert (a.PatchID.values == b.PatchID.values).all()
    assert np.allclose(a.area.values, b.area.values)


def test_habitat_no_cell_level_driver_funnels():
    """Scale contract (VERDICT r01 #10, tightened r03 #5/#7): NOTHING
    cell- or point-scale funnels through the driver — no toPandas at all,
    no Arrow collect, no point broadcast; the only broadcast is the
    capped habitat-dimension WKB list, and executor memory is therefore
    independent of the synthetic point count (the partial-sum join's
    temporaries are (_KDE_CELL_BATCH x _KDE_PT_CHUNK))."""
    import inspect

    from hexscape_spark import habitat as hab_mod
    src = inspect.getsource(hab_mod.discretise_habitat)
    assert ".toPandas()" not in src
    assert ".toArrow()" not in src           # the r3 point torrent is gone
    # bandwidth moments must come from a distributed agg
    assert "percentile(" in src and "stddev_samp" in src
    # habitat polygons reach executors as a broadcast dimension (bounded
    # by _HABITAT_DIM_CAP), not a per-UDF closure pickle
    assert "broadcast(hab_wkbs)" in src and "_HABITAT_DIM_CAP" in src
    # the KDE reduce is an ordered fold, not an unordered float SUM
    assert "sort_array" in src
    comp_src = inspect.getsource(hab_mod.grid_components)
    assert ".toPandas()" not in comp_src and ".collect()" not in comp_src


def test_kde_executor_memory_independent_of_point_count(spark, habitat_df,
                                                        monkeypatch):
    """VERDICT r03 #5 'done' pin: with point chunks and cell batches
    forced tiny, the partial-sum join still reproduces the same patches —
    i.e. no stage ever needs all points (or all cells) in one task, so
    per-task memory is a constant independent of the point count."""
    from hexscape_spark import habitat as hab_mod
    a = discretise_habitat(spark, habitat_df, seed=5).toPandas() \
        .sort_values("PatchID").reset_index(drop=True)
    monkeypatch.setattr(hab_mod, "_KDE_PT_CHUNK", 23)
    monkeypatch.setattr(hab_mod, "_KDE_CELL_BATCH", 17)
    b = discretise_habitat(spark, habitat_df, seed=5).toPandas() \
        .sort_values("PatchID").reset_index(drop=True)
    assert (a.PatchID.values == b.PatchID.values).all()
    assert np.allclose(a.area.values, b.area.values, rtol=0, atol=1e-6)


def test_kde_chunking_exact(spark, habitat_df, monkeypatch):
    """Point-chunked KDE == unchunked: forcing a tiny _KDE_PT_CHUNK must
    not change any output value (pins the bounded per-batch allocation,
    VERDICT r02 #2)."""
    from hexscape_spark import habitat as hab_mod
    a = discretise_habitat(spark, habitat_df, seed=3).toPandas() \
        .sort_values("PatchID").reset_index(drop=True)
    monkeypatch.setattr(hab_mod, "_KDE_PT_CHUNK", 17)
    b = discretise_habitat(spark, habitat_df, seed=3).toPandas() \
        .sort_values("PatchID").reset_index(drop=True)
    assert (a.PatchID.values == b.PatchID.values).all()
    assert np.allclose(a.area.values, b.area.values, rtol=0, atol=1e-9)


def test_grid_components_labels_match_unionfind(spark):
    """Label propagation == classic union-find on a random raster mask."""
    import numpy as np
    from hexscape_spark.habitat import grid_components
    rng = np.random.RandomState(11)
    mask = rng.rand(20, 20) < 0.45
    keys = [(int(ix), int(iy)) for iy, ix in zip(*np.nonzero(mask))]
    df = spark.createDataFrame(keys, "ix INT, iy INT")
    got = {(r.ix, r.iy): r.comp for r in grid_components(df).collect()}
    # reference union-find
    idx = {k: i for i, k in enumerate(keys)}
    parent = list(range(len(keys)))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (ix, iy), i in idx.items():
        for nb in ((ix + 1, iy), (ix, iy + 1)):
            if nb in idx:
                ra, rb = find(i), find(idx[nb])
                if ra != rb:
                    parent[ra] = rb
    want_groups = {}
    for k, i in idx.items():
        want_groups.setdefault(find(i), set()).add(k)
    got_groups = {}
    for k, c in got.items():
        got_groups.setdefault(c, set()).add(k)
    assert sorted(map(sorted, want_groups.values())) == \
        sorted(map(sorted, got_groups.values()))


def test_grid_components_two_level_matches_serial_unionfind(spark):
    """The r5 two-level grid CC (block-local union-find + quotient-graph
    CC) produces the same min-node-key labels as a serial union-find
    over the full 4-adjacency — including negative indices, components
    that snake across many tiles (block=4 forces heavy cross-tile
    merging), and isolated cells."""
    from hexscape_spark.habitat import grid_components
    rng = np.random.RandomState(5)
    pts = {(int(x), int(y)) for x, y in
           zip(rng.randint(-20, 20, 500), rng.randint(-20, 20, 500))}
    pts |= {(x, 0) for x in range(-15, 16)}       # a long snake
    df = spark.createDataFrame(sorted(pts), "ix INT, iy INT")
    got = {(r.ix, r.iy): r.comp
           for r in grid_components(df, block=4).collect()}

    def key(ix, iy):
        return (iy << 32) | (ix & 0xFFFFFFFF)

    parent = {p: p for p in pts}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (x, y) in pts:
        for nb in ((x + 1, y), (x, y + 1)):
            if nb in pts:
                ra, rb = find((x, y)), find(nb)
                if ra != rb:
                    parent[rb] = ra
    groups = {}
    for p in pts:
        groups.setdefault(find(p), []).append(p)
    want = {}
    for members in groups.values():
        m = min(key(x, y) for x, y in members)
        for p in members:
            want[p] = m
    assert got == want
