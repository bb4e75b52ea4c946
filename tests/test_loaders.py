"""Source loader tests (SURVEY §2.1): zip-CSV scan, PSV scan, GeoJSON parse,
7z gating, versioned prepared cache."""

import zipfile

import pytest

from geocode_spark.sources.loaders import (clear_prepared, geojson_to_records,
                                           load_cpo_zip, load_psv_centroids,
                                           prepared_path, read_csv_from_7z)


def test_load_cpo_zip(spark, tmp_path):
    # synthesize a codepo_gb.zip with two Data/CSV members + a decoy
    zp = tmp_path / "codepo_gb.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("Data/CSV/ab.csv",
                   '"AB1 0AA",10,385386,801193,"S92000003","","S08000020","","S12000033","S13002842"\n')
        z.writestr("Data/CSV/zz.csv",
                   '"ZZ9 9ZZ",10,530000,180000,"E92000001","","","","",""\n')
        z.writestr("Doc/readme.txt", "not a data file")
    df = load_cpo_zip(spark, zp, staging_dir=tmp_path / "staging")
    rows = {r.Postcode: r for r in df.collect()}
    assert set(rows) == {"AB1 0AA", "ZZ9 9ZZ"}
    assert rows["AB1 0AA"].Eastings == 385386
    assert df.columns == ["Postcode", "Positional_quality_indicator",
                          "Eastings", "Northings"]


def test_load_cpo_zip_empty_raises(spark, tmp_path):
    zp = tmp_path / "empty.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("other.txt", "x")
    with pytest.raises(FileNotFoundError):
        load_cpo_zip(spark, zp, staging_dir=tmp_path / "s2")


def test_load_psv(spark, tmp_path):
    p = tmp_path / "c.psv"
    p.write_text("E14000530|Aldershot|-0.7841|51.288952\n"
                 "E14000575|Blyth Valley|-1.56095|55.092758\n")
    df = load_psv_centroids(spark, p)
    rows = {r.name: r for r in df.collect()}
    assert rows["Aldershot"].latitude == pytest.approx(51.288952)
    assert rows["Blyth Valley"].longitude == pytest.approx(-1.56095)


def test_geojson_records():
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "properties": {"code": "R1", "grp": "_G"},
             "geometry": {"type": "Polygon",
                          "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]}},
            {"type": "Feature",
             "properties": {"code": "R2"},
             "geometry": {"type": "MultiPolygon",
                          "coordinates": [[[[2, 2], [3, 2], [3, 3], [2, 3]]],
                                          [[[5, 5], [6, 5], [6, 6], [5, 6]]]]}},
            {"type": "Feature", "properties": {"code": "R3"},
             "geometry": {"type": "Point", "coordinates": [9, 9]}},
        ],
    }
    recs = geojson_to_records(fc, "code", ("grp",))
    assert [r["region_id"] for r in recs] == ["R1", "R2"]  # Point skipped
    assert recs[0]["grp"] == "_G"
    assert len(recs[1]["rings"]) == 2  # multipolygon parts

    # end-to-end: records -> prepared -> PIP
    from geocode_spark.regions import prepare_regions
    import numpy as np
    from geocode_spark.geometry import points_in_polygon

    prep = prepare_regions(recs, "gj")
    xs, ys, offs, bbox = prep.geoms["R2"]
    assert points_in_polygon(np.array([2.5, 5.5, 4.0]),
                             np.array([2.5, 5.5, 4.0]), xs, ys, offs).tolist() \
        == [True, True, False]


def test_7z_gated(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="py7zr"):
        read_csv_from_7z(spark, tmp_path / "x.7z", "member.csv")


def test_clear_prepared(tmp_path):
    for name in ["llsoa_1", "llsoa_2", "gsp_2"]:
        (tmp_path / name).mkdir()
    assert prepared_path(tmp_path, "llsoa", "2") == tmp_path / "llsoa_2"
    removed = clear_prepared(tmp_path, keep_version="2")
    assert removed == ["llsoa_1"]
    removed = clear_prepared(tmp_path, label="gsp")
    assert removed == ["gsp_2"]
    assert (tmp_path / "llsoa_2").exists()
