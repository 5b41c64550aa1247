"""extract_landcover lifecycle invariants (SURVEY §3.1,
R/extract_corine.R coverage-gap semantics)."""

import pytest
from pyspark.sql import functions as F

from hexscape_spark import geo
from hexscape_spark.pipeline import MISSING_CC, extract_landcover


@pytest.fixture(scope="module")
def landcover(spark):
    km = 1000.0
    rows = [
        (1, "211", geo.rect_wkb(0, 0, 10 * km, 8 * km)),
        (2, "211", geo.rect_wkb(12 * km, 0, 20 * km, 6 * km)),
        (3, "311", geo.rect_wkb(0, 10 * km, 15 * km, 20 * km)),
        (4, "512", geo.rect_wkb(16 * km, 10 * km, 20 * km, 14 * km)),
    ]
    return spark.createDataFrame([(i, c, bytearray(w)) for i, c, w in rows],
                                 "poly_id LONG, clc STRING, geom_wkb BINARY")


@pytest.fixture(scope="module")
def result(spark, landcover, tmp_path_factory):
    mask = geo.rect_wkb(0, 0, 20000.0, 20000.0)
    labels = spark.createDataFrame(
        [("211", "Arable land"), ("311", "Forest"), ("512", "Water")],
        "clc STRING, label STRING")
    return extract_landcover(
        spark, landcover, mask, clc_labels=labels,
        checkpoint_root=str(tmp_path_factory.mktemp("ckpt")))


def test_per_cell_areas_partition_mask(result):
    """Σ per-cell areas (incl. MISSING_CC) == mask area per cell exactly."""
    cells = result["cells"].toPandas()
    per_cell = cells.groupby("cell_id").agg(total=("area", "sum"),
                                            mask_a=("mask_area", "first"))
    assert (abs(per_cell.total - per_cell.mask_a) < 1e-6).all()


def test_missing_cc_total(result):
    """Coverage gap = mask − Σ layers = 400 − (80+48+150+16) = 106 km²."""
    cells = result["cells"].toPandas()
    gap = cells[cells.clc == MISSING_CC].area.sum() / 1e6
    assert gap == pytest.approx(400 - 294, abs=1e-6)


def test_dissolved_unions_and_labels(result):
    d = result["dissolved"].toPandas().set_index("clc")
    assert d.loc["211"].n_parts == 2
    assert d.loc["211"].area == pytest.approx((80 + 48) * 1e6)
    assert d.loc["311"].label == "Forest"


def test_planning_counts(result):
    plan = {r["clc"]: r["n_features"] for r in result["plan"].collect()}
    assert plan == {"211": 2, "311": 1, "512": 1}


def test_clc_filter_pushes_selection(spark, landcover):
    mask = geo.rect_wkb(0, 0, 20000.0, 20000.0)
    res = extract_landcover(spark, landcover, mask, clc_filter=["211"])
    cells = res["cells"].toPandas()
    assert set(cells.clc) == {"211", MISSING_CC}
