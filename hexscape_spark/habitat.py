"""Density-driven habitat discretisation (R/discretise_habitat.R:21-330).

Pipeline (squares rasterisation):
  1. total capacity = Σ area×Density; target total patch area =
     capacity / patch_density                    (:64-74)
  2. synthetic points at Density-proportional grid spacing inside each
     habitat class                               (:76-94) — map-only UDF
  3. bivariate-normal KDE over the points, bandwidth = MASS::bandwidth.nrd
     × h_adj, evaluated on the raster grid       (:140-143) — the kernel
     evaluation is distributed: raster cells × broadcast points
  4. raster cells clipped to the habitat union, area per cell (:182-189)
  5. inclusion threshold on z chosen so the cumulative included area hits
     the target (ordered cumsum + argmin — W4)   (:207-249), two passes
     with a min_size eligibility filter between  (:218-234)
  6. included cells -> connected components = patches (st_cast POLYGON
     equivalent; exact on the square raster via 4-neighbour union-find)
  7. patches larger than max_size split by seeded k-means (Lloyd; the
     reference pins Hartigan-Wong — documented divergence, results differ
     only in rare tie geometries) + nearest-centre (Voronoi) assignment of
     raster cells                                 (:284-319)
  8. Capacity = area_km² × patch_density          (:316-317)

Scale notes: steps 2-5 are DataFrame stages (map-only UDFs + one window);
component labelling (6) runs driver-side over the bounded included-cell
set (|cells| ≤ landscape/raster_size; the label-propagation join variant is
the scale path, cf. graph.bfs_hops).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import geo


def bandwidth_nrd(x: np.ndarray) -> float:
    """MASS::bandwidth.nrd, reimplemented exactly: 4 * 1.06 * min(sd,
    IQR/1.34) * n^-0.2  (R quantile type 7 matches numpy default)."""
    q25, q75 = np.quantile(x, [0.25, 0.75])
    h = (q75 - q25) / 1.34
    return 4 * 1.06 * min(float(np.std(x, ddof=1)), h) * len(x) ** (-0.2)


def habitat_points(habitat: DataFrame, point_density_per_km2: float,
                   geom: str = "geom_wkb") -> DataFrame:
    """Synthetic suitability points: grid spacing 1/sqrt(Density * pd)
    inside each habitat polygon (R/discretise_habitat.R:85-92)."""
    pd_m2 = point_density_per_km2 / 1e6
    schema = "px DOUBLE, py DOUBLE, density DOUBLE"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                dens = float(row["Density"])
                if dens <= 0:
                    continue
                polys = geo.wkb_to_polygons(bytes(row[geom]))
                x0, y0, x1, y1 = geo.polygons_bounds(polys)
                by = 1.0 / np.sqrt(dens * pd_m2)
                xs = np.arange(x0, x1 + 1e-9, by)
                ys = np.arange(y0, y1 + 1e-9, by)
                gx, gy = np.meshgrid(xs, ys)
                gx, gy = gx.ravel(), gy.ravel()
                ok = geo.points_in_polygons(gx, gy, polys)
                outs.append(pd.DataFrame({"px": gx[ok], "py": gy[ok],
                                          "density": dens}))
            yield pd.concat(outs) if outs else pd.DataFrame(
                {"px": [], "py": [], "density": []})

    return habitat.mapInPandas(run, schema=schema)


def discretise_habitat(spark: SparkSession, habitat: DataFrame,
                       max_size_km2: float = 5.0, min_size_km2: float = 0.5,
                       patch_density_per_km2: float = 1.0,
                       raster_size_km2: float = 0.05, h_adj: float = 0.5,
                       point_density_per_km2: float = 100.0,
                       seed: int = 42,
                       geom: str = "geom_wkb") -> DataFrame:
    """habitat: DataFrame(Habitat STRING, Density DOUBLE, geom_wkb BINARY).
    Returns DataFrame(PatchID STRING, main_patch INT, sub_patch INT,
    area DOUBLE [m²], Capacity DOUBLE)."""
    assert max_size_km2 >= 2 * min_size_km2          # :46

    hab_pd = habitat.select("Density", geom).toPandas()
    hab_polys = [p for _, row in hab_pd.iterrows()
                 for p in geo.wkb_to_polygons(bytes(row[geom]))]

    # 1. capacity / target size (km²)
    total_capacity = sum(
        geo.polygons_area(geo.wkb_to_polygons(bytes(row[geom]))) / 1e6 * row["Density"]
        for _, row in hab_pd.iterrows())
    total_size_km2 = total_capacity / patch_density_per_km2

    # 2. synthetic points (distributed), then coords for bandwidth
    pts = habitat_points(habitat, point_density_per_km2, geom=geom)
    coords = pts.select("px", "py").toPandas()
    px = coords["px"].to_numpy()
    py = coords["py"].to_numpy()
    bwx = bandwidth_nrd(px) * h_adj
    bwy = bandwidth_nrd(py) * h_adj

    # raster grid (squares): edge from raster_size, bbox snapped (:112-118)
    d = int(np.floor(np.sqrt(raster_size_km2 * 1e6)))
    x0 = np.floor(px.min() / d) * d
    y0 = np.floor(py.min() / d) * d
    x1 = np.ceil(px.max() / d) * d
    y1 = np.ceil(py.max() / d) * d
    nx = int((x1 - x0) / d) + 1
    ny = int((y1 - y0) / d) + 1

    # 3+4. distributed KDE at cell centres + clip areas to the habitat union
    cells = spark.range(nx * ny).selectExpr(
        f"CAST(id % {nx} AS INT) AS ix", f"CAST(id DIV {nx} AS INT) AS iy")
    hx, hy = bwx / 4.0, bwy / 4.0        # MASS::kde2d divides h by 4
    pxb = px.copy()
    pyb = py.copy()
    hab_wkbs = [bytes(row[geom]) for _, row in hab_pd.iterrows()]
    x0_, y0_, d_ = float(x0), float(y0), float(d)

    cell_schema = "ix INT, iy INT, cx DOUBLE, cy DOUBLE, z DOUBLE, area DOUBLE"

    def kde_clip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        polys = [p for w in hab_wkbs for p in geo.wkb_to_polygons(w)]
        n = len(pxb)
        for pdf in batches:
            cx = x0_ + pdf["ix"].to_numpy() * d_
            cy = y0_ + pdf["iy"].to_numpy() * d_
            # bivariate product-normal KDE (MASS::kde2d:  mean over points
            # of dnorm(dx/hx)*dnorm(dy/hy)/(hx*hy))
            zx = np.exp(-0.5 * ((cx[:, None] - pxb[None, :]) / hx) ** 2)
            zy = np.exp(-0.5 * ((cy[:, None] - pyb[None, :]) / hy) ** 2)
            z = (zx * zy).sum(axis=1) / (n * 2 * np.pi * hx * hy)
            # clip cell to habitat union for its area
            areas = np.zeros(len(pdf))
            for i in range(len(pdf)):
                ring = geo.rect_ring(cx[i] - d_ / 2, cy[i] - d_ / 2,
                                     cx[i] + d_ / 2, cy[i] + d_ / 2)
                areas[i] = sum(geo.area_polygons_in_convex([poly], ring)
                               for poly in polys)
            out = pd.DataFrame({"ix": pdf["ix"], "iy": pdf["iy"],
                                "cx": cx, "cy": cy, "z": z, "area": areas})
            yield out[out["area"] > 0.0]

    dens = cells.mapInPandas(kde_clip, schema=cell_schema)
    dens = dens.persist()

    # 5. threshold passes: ordered cumsum to hit total_size (W4, :207-249)
    def pick_target_z(df: DataFrame) -> float:
        w = Window.orderBy(F.desc("z")).rowsBetween(Window.unboundedPreceding, 0)
        ranked = df.withColumn("cum_km2", F.sum(F.col("area") / 1e6).over(w)) \
            .withColumn("delta", F.abs(F.col("cum_km2") - F.lit(total_size_km2)))
        return ranked.orderBy("delta").limit(1).collect()[0]["z"]

    z1 = pick_target_z(dens)
    inc1 = dens.where(F.col("z") >= z1).toPandas()

    # 6. connected components on the square raster (exact st_cast POLYGON)
    def components(cdf: pd.DataFrame) -> pd.Series:
        idx = {(r.ix, r.iy): i for i, r in enumerate(cdf.itertuples())}
        parent = list(range(len(cdf)))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for (ix, iy), i in idx.items():
            for nb in ((ix + 1, iy), (ix, iy + 1)):
                j = idx.get(nb)
                if j is not None:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[ra] = rb
        roots = {}
        labels = np.empty(len(cdf), dtype=np.int64)
        for i in range(len(cdf)):
            r = find(i)
            labels[i] = roots.setdefault(r, len(roots) + 1)
        return pd.Series(labels, index=cdf.index)

    inc1["comp"] = components(inc1)
    # eligibility: components >= min_size (first pass, :218-229)
    comp_area = inc1.groupby("comp").area.sum() / 1e6
    ok_comps = set(comp_area[comp_area >= min_size_km2].index)
    eligible_keys = set(map(tuple, inc1[inc1.comp.isin(ok_comps)][["ix", "iy"]].values))
    # cells bordering eligible polygons are also eligible (st_intersects :231-234)
    border = set()
    for ix, iy in eligible_keys:
        border.update({(ix + 1, iy), (ix - 1, iy), (ix, iy + 1), (ix, iy - 1),
                       (ix + 1, iy + 1), (ix - 1, iy - 1),
                       (ix + 1, iy - 1), (ix - 1, iy + 1)})
    eligible_all = eligible_keys | border

    elig_pdf = dens.toPandas()
    elig_pdf = elig_pdf[[tuple(k) in eligible_all
                         for k in elig_pdf[["ix", "iy"]].values]]
    elig_df = spark.createDataFrame(elig_pdf)
    z2 = pick_target_z(elig_df)
    final = elig_pdf[elig_pdf.z >= z2].copy()
    final["comp"] = components(final)

    # 7. split big components with seeded k-means + nearest-centre assignment
    rng = np.random.RandomState(seed)
    rows = []
    for comp, grp in final.groupby("comp"):
        area_km2 = grp.area.sum() / 1e6
        split = int(np.ceil(area_km2 / max_size_km2))
        if split <= 1:
            rows.append((int(comp), 1, float(grp.area.sum())))
            continue
        xy = grp[["cx", "cy"]].to_numpy()
        wts = grp["area"].to_numpy()
        # k-means++ init, Lloyd iterations (reference: Hartigan-Wong; both
        # converge to near-identical centres on raster data)
        centers = [xy[rng.randint(len(xy))]]
        for _ in range(split - 1):
            d2 = np.min([((xy - c) ** 2).sum(axis=1) for c in centers], axis=0)
            centers.append(xy[rng.choice(len(xy), p=d2 / d2.sum())])
        centers = np.array(centers)
        for _ in range(50):
            assign = np.argmin(((xy[:, None, :] - centers[None, :, :]) ** 2)
                               .sum(axis=2), axis=1)
            new_c = np.array([
                np.average(xy[assign == k], axis=0, weights=wts[assign == k])
                if (assign == k).any() else centers[k]
                for k in range(split)])
            if np.allclose(new_c, centers):
                break
            centers = new_c
        for k in range(split):
            a = float(wts[assign == k].sum())
            if a > 0:
                rows.append((int(comp), k + 1, a))

    out = pd.DataFrame(rows, columns=["main_patch", "sub_patch", "area"])
    out["PatchID"] = out.main_patch.astype(str) + "_" + out.sub_patch.astype(str)
    out["Capacity"] = out.area / 1e6 * patch_density_per_km2
    dens.unpersist()
    return spark.createDataFrame(
        out[["PatchID", "main_patch", "sub_patch", "area", "Capacity"]])
