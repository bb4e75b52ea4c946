"""Facade tests: the reference's own golden test cases run verbatim through
GeocoderSpark's list helpers (positional contract parity with
/root/reference/Tests/test_geocode.py)."""

import pytest

from geocode_spark.geocoder import GeocoderSpark


@pytest.fixture(scope="module")
def geo(spark, fixture_dir):
    return GeocoderSpark(spark, data_dir=str(fixture_dir))


def test_geocode_postcode_golden(geo):
    # Tests/test_geocode.py:251-264
    out = geo.geocode_postcode_list(["RG1 3PE", "S10 2FR", "FY2 0RD"])
    expected = [(51.45511, -0.94070, 1), (53.37708, -1.48700, 1),
                (53.83989, -3.04328, 1)]
    for (lat, lon, st), (ela, elo, est) in zip(out, expected):
        assert lat == pytest.approx(ela, abs=1e-4)
        assert lon == pytest.approx(elo, abs=1e-4)
        assert st == est


def test_reverse_geocode_llsoa_golden(geo):
    # Tests/test_geocode.py:185-202
    latlons = [
        (54.547776537068664, -1.195629080286167),
        (53.666095344794648, -1.703771184460476),
        (51.578729873335718, -0.068445270723745),
        (53.207256254835059, -3.13247635788833),
    ]
    assert geo.reverse_geocode_llsoa_list(latlons) == [
        "E01012082", "E01011214", "E01002050", "W01000323"]
    assert geo.reverse_geocode_llsoa_list(
        [(55.91836588770352, -4.21934323024909)], dz=True) == ["S01008087"]


def test_reverse_geocode_gsp_golden(geo):
    # Tests/test_geocode.py:219-231
    out = geo.reverse_geocode_gsp_list(
        [(53.33985, -2.051880), (55.950095, -3.178485)])
    assert out == [("BRED_1", "_G"), ("DEWP", "_N")]


def test_geocode_llsoa_centroids_golden(geo):
    # Tests/test_geocode.py:160-183 (13 dp)
    out = geo.geocode_llsoa_list(["E01012082", "S01020873"])
    assert out[0][0] == pytest.approx(54.5477949315505, abs=1e-10)
    assert out[1][1] == pytest.approx(-3.46004249282003, abs=1e-10)


def test_nuts_levels(geo, spark):
    # Tests/test_geocode.py:204-217
    df = spark.createDataFrame(
        [(0, 51.3259, -1.9613), (1, 47.9995, 0.2335), (2, 50.8356, 8.7343)],
        "row_id long, latitude double, longitude double")
    for level, exp in [(0, ["UK", "FR", "DE"]), (3, ["UKK15", "FRG04", "DE724"])]:
        rows = geo.reverse_geocode_nuts(df, level=level).orderBy("row_id").collect()
        assert [r.nuts for r in rows] == exp


def test_dispatchers_and_errors(geo, spark):
    df = spark.createDataFrame([(0, "Medway")], "row_id long, lad string")
    out = geo.geocode(df, "lad").collect()
    assert out[0].latitude == pytest.approx(51.44772)
    with pytest.raises(ValueError, match="not supported"):
        geo.geocode(df, "planet")
    with pytest.raises(ValueError, match="not supported"):
        geo.reverse_geocode(df, "galaxy")
    with pytest.raises(ValueError):
        geo.reverse_geocode_nuts(df, level=7)


def test_reverse_geocode_gsp_versions(geo):
    # Tests/test_geocode.py:226-231: identical results for both versions
    latlons = [(53.33985, -2.051880), (55.950095, -3.178485)]
    df_rows = lambda version: geo.reverse_geocode_gsp(
        geo.spark.createDataFrame(
            [(i, la, lo) for i, (la, lo) in enumerate(latlons)],
            "row_id long, latitude double, longitude double"),
        version=version).orderBy("row_id").collect()
    for v in ("20220314", "20250109", "20260209"):
        assert [(r.gsp, r.gsp_group) for r in df_rows(v)] == [
            ("BRED_1", "_G"), ("DEWP", "_N")]


def test_reverse_geocode_dno_overlap_keep_first(geo, spark):
    df = spark.createDataFrame(
        [(0, 51.6, 0.2),    # inside BOTH East and London -> keep-first "10"
         (1, 51.3, -0.4),   # London only -> "12"
         (2, 52.5, 1.0),    # East only -> "10"
         (3, 40.0, 10.0)],  # neither
        "row_id long, latitude double, longitude double")
    got = {r.row_id: (r.dno, r.dno_name)
           for r in geo.reverse_geocode_dno(df).collect()}
    assert got[0] == ("10", "UKPN East")
    assert got[1] == ("12", "UKPN London")
    assert got[2] == ("10", "UKPN East")
    assert got[3] == (None, None)


def test_crs_roundtrip_df(geo, spark):
    df = spark.createDataFrame([(0, 51.5074, -0.1278)],
                               "row_id long, latitude double, longitude double")
    en = geo.latlon2bng(df)
    back = geo.bng2latlon(en)
    r = back.collect()[0]
    assert r.latitude == pytest.approx(51.5074, abs=1e-6)
    assert r.longitude == pytest.approx(-0.1278, abs=1e-6)
