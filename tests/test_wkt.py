"""WKT1 / WKT2 / PROJ-string CRS parsing.

Parity target: the reference accepts any pyproj CRS input
(reference gridmapping/base.py:398-400 CRS.from_user_input), which
includes WKT text and PROJ strings.  Each test parses an
independently-sourced WKT/PROJ definition and checks the resulting
transform against the engine's registry twin at value level.
"""

import math

import numpy as np
import pytest

from xcube_resampling_spark.crs import CRS, Transformer, CRS_WGS84
from xcube_resampling_spark.wkt import (
    crs_from_proj,
    crs_from_wkt,
    crs_to_proj,
    crs_to_wkt,
)


def _max_err(crs_a, crs_b, lo_rng, la_rng, n=80, seed=7):
    rng = np.random.default_rng(seed)
    lo = rng.uniform(*lo_rng, n)
    la = rng.uniform(*la_rng, n)
    fa = Transformer.from_crs(CRS_WGS84, crs_a)
    fb = Transformer.from_crs(CRS_WGS84, crs_b)
    xa, ya = fa.transform(lo, la)
    xb, yb = fb.transform(lo, la)
    return max(np.abs(xa - xb).max(), np.abs(ya - yb).max())


WKT1_32633 = """PROJCS["WGS 84 / UTM zone 33N",
  GEOGCS["WGS 84",DATUM["WGS_1984",
    SPHEROID["WGS 84",6378137,298.257223563]],
    PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
  PROJECTION["Transverse_Mercator"],
  PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",15],
  PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],
  PARAMETER["false_northing",0],UNIT["metre",1],
  AUTHORITY["EPSG","32633"]]"""

WKT2_3035 = """PROJCRS["ETRS89-extended / LAEA Europe",
  BASEGEOGCRS["ETRS89",DATUM["European Terrestrial Reference System 1989",
    ELLIPSOID["GRS 1980",6378137,298.257222101,LENGTHUNIT["metre",1]]]],
  CONVERSION["Europe Equal Area 2001",
    METHOD["Lambert Azimuthal Equal Area",ID["EPSG",9820]],
    PARAMETER["Latitude of natural origin",52,
      ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Longitude of natural origin",10,
      ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["False easting",4321000,LENGTHUNIT["metre",1]],
    PARAMETER["False northing",3210000,LENGTHUNIT["metre",1]]],
  CS[Cartesian,2],AXIS["northing (Y)",north],AXIS["easting (X)",east],
  LENGTHUNIT["metre",1],ID["EPSG",3035]]"""

WKT1_5514_FERRO = """PROJCS["S-JTSK (Ferro) / Krovak East North",
 GEOGCS["S-JTSK (Ferro)",
  DATUM["S_JTSK_Ferro",
   SPHEROID["Bessel 1841",6377397.155,299.1528128]],
  PRIMEM["Ferro",-17.66666666666667],
  UNIT["degree",0.0174532925199433]],
 PROJECTION["Krovak"],
 PARAMETER["latitude_of_center",49.5],
 PARAMETER["longitude_of_center",42.5],
 PARAMETER["azimuth",30.28813972222222],
 PARAMETER["pseudo_standard_parallel_1",78.5],
 PARAMETER["scale_factor",0.9999],
 PARAMETER["false_easting",0],
 PARAMETER["false_northing",0],
 UNIT["metre",1]]"""

WKT1_29873 = """PROJCS["Timbalai 1948 / RSO Borneo (m)",
 GEOGCS["Timbalai 1948",
  DATUM["Timbalai_1948",
   SPHEROID["Everest 1830 (1967 Definition)",6377298.556,300.8017]],
  PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
 PROJECTION["Hotine_Oblique_Mercator_Azimuth_Center"],
 PARAMETER["latitude_of_center",4],
 PARAMETER["longitude_of_center",115],
 PARAMETER["azimuth",53.31582047222222],
 PARAMETER["rectified_grid_angle",53.13010236111111],
 PARAMETER["scale_factor",0.99984],
 PARAMETER["false_easting",590476.87],
 PARAMETER["false_northing",442857.65],
 UNIT["metre",1],AUTHORITY["EPSG","29873"]]"""

WKT1_TX_CENTRAL_FTUS = """PROJCS["NAD83 / Texas Central (ftUS)",
 GEOGCS["NAD83",DATUM["North_American_Datum_1983",
  SPHEROID["GRS 1980",6378137,298.257222101]],
  PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
 PROJECTION["Lambert_Conformal_Conic_2SP"],
 PARAMETER["standard_parallel_1",31.88333333333333],
 PARAMETER["standard_parallel_2",30.11666666666667],
 PARAMETER["latitude_of_origin",29.66666666666667],
 PARAMETER["central_meridian",-100.3333333333333],
 PARAMETER["false_easting",2296583.333],
 PARAMETER["false_northing",9842500.000000002],
 UNIT["US survey foot",0.3048006096012192]]"""

WKT2_GOES = """PROJCRS["GOES-R ABI fixed grid",
 BASEGEOGCRS["GRS80",DATUM["unknown",
  ELLIPSOID["GRS80",6378137,298.257222101]]],
 CONVERSION["geos",METHOD["Geostationary Satellite (Sweep X)"],
  PARAMETER["Longitude of natural origin",-75],
  PARAMETER["Satellite height",35786023,LENGTHUNIT["metre",1]],
  PARAMETER["False easting",0],PARAMETER["False northing",0]],
 CS[Cartesian,2],LENGTHUNIT["metre",1]]"""

WKT1_23031_TOWGS84 = """PROJCS["ED50 / UTM zone 31N",
 GEOGCS["ED50",DATUM["European_Datum_1950",
  SPHEROID["International 1924",6378388,297],
  TOWGS84[-87,-98,-121,0,0,0,0]],
 PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
 PROJECTION["Transverse_Mercator"],
 PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",3],
 PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],
 PARAMETER["false_northing",0],UNIT["metre",1],
 AUTHORITY["EPSG","23031"]]"""


class TestWkt1:
    def test_utm_33n_matches_registry(self):
        crs = crs_from_wkt(WKT1_32633)
        assert crs.kind == "tmerc"
        assert crs.auth_code == "EPSG:32633"
        assert _max_err(crs, CRS.from_epsg(32633), (9, 21), (35, 70)) < 1e-6

    def test_krovak_with_ferro_prime_meridian(self):
        # EPSG-style WKT references Ferro; lon params shift by -17d40'
        crs = crs_from_wkt(WKT1_5514_FERRO)
        assert crs.kind == "krovak"
        assert abs(crs.param("lon_0") - (24.0 + 50.0 / 60)) < 1e-9
        # 3 mm floor: the WKT azimuth decimal differs from the
        # registry's sexagesimal constant in the 7th decimal
        assert _max_err(crs, CRS.from_epsg(5514), (12, 19), (48, 51)) < 0.01

    def test_hotine_oblique_mercator(self):
        crs = crs_from_wkt(WKT1_29873)
        assert crs.kind == "omerc"
        assert _max_err(crs, CRS.from_epsg(29873), (110, 119), (0, 7)) < 0.01

    def test_us_survey_foot_unit_factor(self):
        crs = crs_from_wkt(WKT1_TX_CENTRAL_FTUS)
        assert crs.kind == "lcc"
        # false easting converted to metres (2296583.333 ftUS)
        assert abs(crs.param("x_0") - 700000.0) < 1e-3
        twin = crs_from_proj(
            "+proj=lcc +lat_1=31.88333333333333 +lat_2=30.11666666666667 "
            "+lat_0=29.66666666666667 +lon_0=-100.3333333333333 "
            "+x_0=700000 +y_0=3000000 +ellps=GRS80")
        assert _max_err(crs, twin, (-104, -97), (28, 33)) < 1e-3

    def test_towgs84_datum_shift_parsed(self):
        crs = crs_from_wkt(WKT1_23031_TOWGS84)
        assert crs.towgs84 == (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0)
        assert _max_err(crs, CRS.from_epsg(23031), (0, 6), (36, 52)) < 1e-6

    def test_geographic_wgs84(self):
        crs = crs_from_wkt(
            'GEOGCS["WGS 84",DATUM["WGS_1984",'
            'SPHEROID["WGS 84",6378137,298.257223563]],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
            'AUTHORITY["EPSG","4326"]]')
        assert crs.is_geographic

    def test_unknown_method_raises_with_name(self):
        bad = WKT1_32633.replace("Transverse_Mercator", "Bonne")
        with pytest.raises(ValueError, match="Bonne"):
            crs_from_wkt(bad)


class TestWkt2:
    def test_laea_europe_matches_registry(self):
        crs = crs_from_wkt(WKT2_3035)
        assert crs.kind == "laea"
        assert crs.auth_code == "EPSG:3035"
        assert _max_err(crs, CRS.from_epsg(3035), (-8, 28), (36, 66)) < 1e-6

    def test_geostationary_sweep_x(self):
        crs = crs_from_wkt(WKT2_GOES)
        assert crs.kind == "geos"
        assert crs.param("sweep_x") == 1.0
        assert crs.param("h") == 35786023.0
        twin = crs_from_proj(
            "+proj=geos +h=35786023 +lon_0=-75 +sweep=x +ellps=GRS80")
        assert _max_err(crs, twin, (-100, -60), (-40, 40)) < 1e-6

    def test_quoted_quote_escaping(self):
        crs = crs_from_wkt(WKT2_3035.replace(
            '"ETRS89-extended / LAEA Europe"',
            '"ETRS89 ""extended"" LAEA"'))
        assert crs.name == 'ETRS89 "extended" LAEA'


class TestProjString:
    def test_utm_zone_expansion(self):
        crs = crs_from_proj("+proj=utm +zone=33 +datum=WGS84")
        assert _max_err(crs, CRS.from_epsg(32633), (9, 21), (35, 70)) == 0.0

    def test_utm_south(self):
        crs = crs_from_proj("+proj=utm +zone=60 +south +ellps=WGS84")
        assert _max_err(crs, CRS.from_epsg(32760), (172, 180), (-50, -10)) \
            == 0.0

    def test_mercator_lat_ts_variant_b(self):
        # variant B lat_ts folds into the exact EPSG 9805 k_0
        crs = crs_from_proj("+proj=merc +lat_ts=41.7 +ellps=WGS84")
        k0_ref = math.cos(math.radians(41.7)) / math.sqrt(
            1 - crs.ellipsoid.e2 * math.sin(math.radians(41.7)) ** 2)
        assert abs(crs.param("k_0") - k0_ref) < 1e-15

    def test_spherical_mercator_is_webmerc(self):
        crs = crs_from_proj("+proj=merc +a=6378137 +b=6378137")
        assert crs.kind == "webmerc"

    def test_rotated_pole_matches_cf(self):
        crs = crs_from_proj(
            "+proj=ob_tran +o_proj=longlat +o_lat_p=39.25 +lon_0=18 "
            "+ellps=WGS84")
        cf = CRS.from_cf({
            "grid_mapping_name": "rotated_latitude_longitude",
            "grid_north_pole_latitude": 39.25,
            "grid_north_pole_longitude": -162.0,
        })
        assert _max_err(crs, cf, (-10, 30), (30, 60)) < 1e-9

    def test_towgs84_parsed(self):
        crs = crs_from_proj(
            "+proj=utm +zone=31 +ellps=intl +towgs84=-87,-98,-121")
        assert crs.towgs84 == (-87.0, -98.0, -121.0)
        assert _max_err(crs, CRS.from_epsg(23031), (0, 6), (36, 52)) < 1e-6

    def test_sphere_radius(self):
        crs = crs_from_proj("+proj=sinu +R=6371007.181 +lon_0=0")
        assert crs.ellipsoid.a == 6371007.181
        assert math.isinf(crs.ellipsoid.inv_f)

    def test_unsupported_proj_raises(self):
        with pytest.raises(ValueError, match="wink2"):
            crs_from_proj("+proj=wink2 +lat_1=50.467")


class TestFromUserInput:
    def test_from_string_routes_wkt_and_proj(self):
        assert CRS.from_user_input(WKT1_32633).kind == "tmerc"
        assert CRS.from_user_input(
            "+proj=utm +zone=33 +datum=WGS84").kind == "tmerc"
        assert CRS.from_user_input("EPSG:3035").kind == "laea"

    def test_spec_roundtrip_preserves_wkt_crs(self):
        crs = crs_from_wkt(WKT1_29873)
        again = CRS.from_spec(crs.to_spec())
        assert again.kind == crs.kind
        assert again.params == crs.params
        assert again.ellipsoid == crs.ellipsoid


class TestWktEmission:
    """crs_to_wkt / CRS.to_wkt: whole-registry parse-emit closure at
    transform level (the emitted WKT must mean exactly the same CRS)."""

    REGISTRY = [32633, 32760, 25832, 23031, 27700, 2193, 3577, 3112,
                5514, 2056, 29873, 3395, 6933, 4087, 3035, 3857, 3031,
                3413, 5070, 2154, 5041, 5042, 2048, 24200, 27572,
                8857, 8858, 8859, 28992]

    # sane probe box per projection family
    BOXES = {
        "tmerc": ((-4, 8), (40, 60)), "stere": ((-90, 90), (70, 85)),
        "krovak": ((13, 18), (48, 51)), "somerc": ((6, 10), (46, 48)),
        "omerc": ((110, 119), (1, 7)), "aea": ((-110, -80), (25, 48)),
        "sterea": ((3, 8), (50, 54)),
        "lcc": ((-4, 8), (42, 50)),
    }

    @pytest.mark.parametrize("code", REGISTRY)
    def test_registry_roundtrips_through_wkt(self, code):
        crs = CRS.from_epsg(code)
        again = crs_from_wkt(crs.to_wkt())
        assert again.kind == crs.kind
        lo_rng, la_rng = self.BOXES.get(crs.kind, ((-20, 40), (-35, 65)))
        if crs.kind == "stere" and crs.param("lat_0") < 0:
            la_rng = (-85, -70)
        if crs.kind in ("tmerc",):
            lon0 = crs.param("lon_0")
            lo_rng = (lon0 - 5, lon0 + 5)
        if crs.kind == "lcc" and crs.param("lat_1") < 0:
            la_rng = (-45, -12)
        if crs.kind == "aea" and crs.param("lat_1") < 0:
            la_rng = (-45, -12)
        err = _max_err(crs, again, lo_rng, la_rng)
        assert err < 1e-8, (code, err)
        # datum shift and authority survive
        tw = tuple(crs.towgs84) + (0.0,) * (7 - len(crs.towgs84)) \
            if crs.towgs84 else ()
        assert again.towgs84 == tw

    def test_geos_sweep_axis_survives(self):
        crs = CRS.from_cf({
            "grid_mapping_name": "geostationary",
            "perspective_point_height": 35786023.0,
            "longitude_of_projection_origin": -75.0,
            "sweep_angle_axis": "x",
            "semi_major_axis": 6378137.0,
            "inverse_flattening": 298.257222101,
        })
        again = crs_from_wkt(crs.to_wkt())
        assert again.param("sweep_x") == 1.0
        assert _max_err(crs, again, (-100, -60), (-40, 40)) < 1e-8

    def test_spherical_ellipsoid_survives(self):
        crs = CRS.from_string("MODIS")
        again = crs_from_wkt(crs.to_wkt())
        assert math.isinf(again.ellipsoid.inv_f)
        assert again.ellipsoid.a == crs.ellipsoid.a

    def test_rot_pole_raises_with_alternative(self):
        cf = CRS.from_cf({
            "grid_mapping_name": "rotated_latitude_longitude",
            "grid_north_pole_latitude": 39.25,
            "grid_north_pole_longitude": -162.0,
        })
        with pytest.raises(ValueError, match="ob_tran|to_cf"):
            cf.to_wkt()


class TestProjEmission:
    """crs_to_proj / CRS.to_proj: registry closure at parameter level."""

    @pytest.mark.parametrize("code", TestWktEmission.REGISTRY)
    def test_registry_roundtrips_through_proj_string(self, code):
        crs = CRS.from_epsg(code)
        again = crs_from_proj(crs.to_proj())
        assert again.kind == crs.kind
        assert dict(again.params) == dict(crs.params)
        assert again.ellipsoid == crs.ellipsoid
        assert tuple(again.towgs84) == tuple(crs.towgs84)

    def test_rot_pole_ob_tran_form(self):
        cf = CRS.from_cf({
            "grid_mapping_name": "rotated_latitude_longitude",
            "grid_north_pole_latitude": 39.25,
            "grid_north_pole_longitude": -162.0,
        })
        s = cf.to_proj()
        assert "+proj=ob_tran" in s
        again = crs_from_proj(s)
        assert _max_err(cf, again, (-10, 30), (30, 60)) < 1e-9

    def test_sphere_emits_radius(self):
        crs = CRS.from_string("MODIS")
        s = crs.to_proj()
        assert "+R=6371007.181" in s
        again = crs_from_proj(s)
        assert again.ellipsoid == crs.ellipsoid

    def test_geos_sweep_survives(self):
        crs = CRS.geostationary(lon_0=-75.0, sweep="x", h=35786023.0)
        again = crs_from_proj(crs.to_proj())
        assert again.param("sweep_x") == 1.0
        assert dict(again.params) == dict(crs.params)


class TestCfWktBridge:
    """CF grid mappings carry crs_wkt (pyproj to_cf/from_cf parity)."""

    def test_to_cf_includes_crs_wkt(self):
        cf = CRS.from_epsg(32633).to_cf()
        assert cf["grid_mapping_name"] == "transverse_mercator"
        again = crs_from_wkt(cf["crs_wkt"])
        assert dict(again.params) == dict(CRS.from_epsg(32633).params)

    def test_krovak_roundtrips_via_crs_wkt_only(self):
        # CF has no grid_mapping_name for Krovak; the wkt attribute is
        # the only faithful CF serialization
        k = CRS.from_epsg(5514)
        cf = k.to_cf()
        assert "grid_mapping_name" not in cf
        back = CRS.from_cf(cf)
        assert back.kind == "krovak"
        assert dict(back.params) == dict(k.params)

    def test_from_cf_crs_wkt_fallback_for_unsupported_name(self):
        cf = CRS.from_epsg(3035).to_cf()
        cf["grid_mapping_name"] = "some_future_mapping"
        back = CRS.from_cf(cf)
        assert back.kind == "laea"
        assert dict(back.params) == dict(CRS.from_epsg(3035).params)


class TestWkt2Ensemble:
    def test_datum_ensemble_ellipsoid_parsed(self):
        # WKT2:2019 output for ETRS89-based CRSs wraps the datum in an
        # ENSEMBLE node; the GRS80 ellipsoid must still be found (the
        # WGS84 fallback differs in inverse flattening)
        wkt = """PROJCRS["ETRS89-extended / LAEA Europe",
         BASEGEOGCRS["ETRS89",
          ENSEMBLE["European Terrestrial Reference System 1989 ensemble",
           MEMBER["ETRF89"],MEMBER["ETRF2000"],
           ELLIPSOID["GRS 1980",6378137,298.257222101,
            LENGTHUNIT["metre",1]],
           ENSEMBLEACCURACY[0.1]]],
         CONVERSION["Europe Equal Area 2001",
          METHOD["Lambert Azimuthal Equal Area",ID["EPSG",9820]],
          PARAMETER["Latitude of natural origin",52,
           ANGLEUNIT["degree",0.0174532925199433]],
          PARAMETER["Longitude of natural origin",10,
           ANGLEUNIT["degree",0.0174532925199433]],
          PARAMETER["False easting",4321000,LENGTHUNIT["metre",1]],
          PARAMETER["False northing",3210000,LENGTHUNIT["metre",1]]],
         CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north],
         LENGTHUNIT["metre",1],ID["EPSG",3035]]"""
        crs = crs_from_wkt(wkt)
        assert crs.ellipsoid.inv_f == 298.257222101
        assert _max_err(crs, CRS.from_epsg(3035), (-8, 28), (36, 66)) \
            < 1e-6


class TestProjUnits:
    def test_us_survey_foot_false_origin_normalized(self):
        # Texas Central in ftUS: engine normalizes projected axes to
        # metres, same as the WKT1 ftUS path
        c = crs_from_proj(
            "+proj=lcc +lat_1=31.88333333333333 "
            "+lat_2=30.11666666666667 +lat_0=29.66666666666667 "
            "+lon_0=-100.3333333333333 +x_0=2296583.333333333 "
            "+y_0=9842500 +ellps=GRS80 +units=us-ft")
        assert abs(c.param("x_0") - 700000.0) < 1e-6
        assert abs(c.param("y_0") - 3000000.0) < 1e-6

    def test_to_meter_override(self):
        c = crs_from_proj(
            "+proj=tmerc +lon_0=9 +x_0=2 +to_meter=0.5 +ellps=WGS84")
        assert c.param("x_0") == 1.0

    def test_unknown_units_raise(self):
        with pytest.raises(ValueError, match="units"):
            crs_from_proj("+proj=tmerc +lon_0=9 +ellps=WGS84 +units=km")


class TestUps:
    """Polar Stereographic variant A (EPSG 9810): the UPS grids."""

    def test_gn72_worked_example(self):
        # EPSG GN7-2 variant A example: WGS84, k0=0.994, FE=FN=2000000,
        # 73N 44E -> E 3320416.75, N 632668.43
        f = Transformer.from_crs(CRS_WGS84, CRS.from_epsg(5041))
        x, y = f.transform(np.array([44.0]), np.array([73.0]))
        assert abs(x[0] - 3320416.75) < 0.01
        assert abs(y[0] - 632668.43) < 0.01

    def test_south_roundtrip(self):
        crs = CRS.from_epsg(5042)
        f = Transformer.from_crs(CRS_WGS84, crs)
        inv = Transformer.from_crs(crs, CRS_WGS84)
        rng = np.random.default_rng(3)
        lo = rng.uniform(-179, 179, 200)
        la = rng.uniform(-88, -60, 200)
        x, y = f.transform(lo, la)
        lo2, la2 = inv.transform(x, y)
        np.testing.assert_allclose(lo2, lo, atol=1e-8)
        np.testing.assert_allclose(la2, la, atol=1e-8)

    def test_variant_a_wkt_parses(self):
        wkt = """PROJCS["WGS 84 / UPS North (E,N)",
         GEOGCS["WGS 84",DATUM["WGS_1984",
          SPHEROID["WGS 84",6378137,298.257223563]],
          PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
         PROJECTION["Polar_Stereographic"],
         PARAMETER["latitude_of_origin",90],
         PARAMETER["central_meridian",0],
         PARAMETER["scale_factor",0.994],
         PARAMETER["false_easting",2000000],
         PARAMETER["false_northing",2000000],
         UNIT["metre",1],AUTHORITY["EPSG","5041"]]"""
        crs = crs_from_wkt(wkt)
        assert _max_err(crs, CRS.from_epsg(5041), (-179, 179), (62, 88)) \
            < 1e-6

    def test_variant_a_proj_string(self):
        crs = crs_from_proj(
            "+proj=stere +lat_0=90 +k=0.994 +x_0=2000000 +y_0=2000000 "
            "+ellps=WGS84")
        assert _max_err(crs, CRS.from_epsg(5041), (-179, 179), (62, 88)) \
            == 0.0

    def test_variant_a_wkt_emission_keeps_k0(self):
        # regression: emitting UPS as variant B dropped k_0=0.994
        # (11.5 km error); the emitter must use the variant-A method
        for code in (5041, 5042):
            crs = CRS.from_epsg(code)
            again = crs_from_wkt(crs.to_wkt())
            assert again.param("k_0") == 0.994
            la = (62, 88) if code == 5041 else (-88, -62)
            assert _max_err(crs, again, (-179, 179), la) < 1e-8

    def test_variant_a_cf_roundtrip_keeps_k0(self):
        # CF polar_stereographic: variant A carries
        # scale_factor_at_projection_origin instead of standard_parallel
        crs = CRS.from_epsg(5041)
        cf = crs.to_cf()
        assert cf["scale_factor_at_projection_origin"] == 0.994
        assert "standard_parallel" not in cf
        again = CRS.from_cf(cf)
        assert again.param("k_0") == 0.994
        assert _max_err(crs, again, (-179, 179), (62, 88)) == 0.0
        # variant B still roundtrips through standard_parallel
        b = CRS.from_epsg(3031)
        cfb = b.to_cf()
        assert cfb["standard_parallel"] == -71.0
        assert _max_err(b, CRS.from_cf(cfb), (-179, 179), (-85, -65)) \
            == 0.0


class TestLcc1spScaleFactor:
    """EPSG 9801 (LCC 1SP): the engine must honor k_0 -- France's
    legacy NTF Lambert zones and many national 1SP grids carry
    0.9998-ish scale factors."""

    def test_k0_scales_coordinates_exactly(self):
        # rho = a F t^n k0 => (x - FE, y - FN) scale linearly in k0
        from xcube_resampling_spark.crs import _Ellipsoid

        def mk(k0):
            return CRS(
                "lcc", "lcc1sp", _Ellipsoid(6378137.0, 298.257223563),
                params=(("lat_0", 46.8), ("lat_1", 46.8),
                        ("lat_2", 46.8), ("lon_0", 2.337), ("k_0", k0),
                        ("x_0", 600000.0), ("y_0", 200000.0)),
            )

        c1, ck = mk(1.0), mk(0.99987742)
        rng = np.random.default_rng(11)
        lo = rng.uniform(-4, 8, 50)
        la = rng.uniform(42, 51, 50)
        x1, y1 = Transformer.from_crs(CRS_WGS84, c1).transform(lo, la)
        xk, yk = Transformer.from_crs(CRS_WGS84, ck).transform(lo, la)
        np.testing.assert_allclose(
            xk - 600000.0, 0.99987742 * (x1 - 600000.0), rtol=1e-12)
        np.testing.assert_allclose(
            yk - 200000.0, 0.99987742 * (y1 - 200000.0), rtol=1e-12)
        # and the inverse closes
        lo2, la2 = Transformer.from_crs(ck, CRS_WGS84).transform(xk, yk)
        np.testing.assert_allclose(lo2, lo, atol=1e-9)
        np.testing.assert_allclose(la2, la, atol=1e-9)

    def test_wkt1_1sp_parse_applies_k0(self):
        wkt = """PROJCS["NTF-ish Lambert zone II",
         GEOGCS["WGS 84",DATUM["WGS_1984",
          SPHEROID["WGS 84",6378137,298.257223563]],
          PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
         PROJECTION["Lambert_Conformal_Conic_1SP"],
         PARAMETER["latitude_of_origin",46.8],
         PARAMETER["central_meridian",2.337],
         PARAMETER["scale_factor",0.99987742],
         PARAMETER["false_easting",600000],
         PARAMETER["false_northing",2200000],
         UNIT["metre",1]]"""
        crs = crs_from_wkt(wkt)
        assert crs.param("k_0") == 0.99987742
        from xcube_resampling_spark.crs import _Ellipsoid
        ref = CRS(
            "lcc", "lcc1sp", _Ellipsoid(6378137.0, 298.257223563),
            params=(("lat_0", 46.8), ("lat_1", 46.8), ("lat_2", 46.8),
                    ("lon_0", 2.337), ("k_0", 0.99987742),
                    ("x_0", 600000.0), ("y_0", 2200000.0)),
        )
        assert _max_err(crs, ref, (-4, 8), (42, 51)) == 0.0

    def test_1sp_emission_closure(self):
        from xcube_resampling_spark.crs import _Ellipsoid
        crs = CRS(
            "lcc", "lcc1sp", _Ellipsoid(6378137.0, 298.257223563),
            params=(("lat_0", 46.8), ("lat_1", 46.8), ("lat_2", 46.8),
                    ("lon_0", 2.337), ("k_0", 0.99987742),
                    ("x_0", 600000.0), ("y_0", 2200000.0)),
        )
        for again in (crs_from_wkt(crs.to_wkt()),
                      crs_from_proj(crs.to_proj())):
            assert again.param("k_0") == 0.99987742
            assert _max_err(crs, again, (-4, 8), (42, 51)) < 1e-8


class TestTmercSouthOrientated:
    """EPSG 9808 (Transverse Mercator South Orientated): the South
    African Lo grids -- westing/southing axes, otherwise plain TM."""

    def test_reflection_relation_is_exact(self):
        from xcube_resampling_spark.crs import _Ellipsoid

        lo19 = CRS.from_epsg(2048)
        plain = CRS(
            "tmerc", "Lo19 north-orientated",
            _Ellipsoid(6378137.0, 298.257223563),
            params=(("k_0", 1.0), ("lat_0", 0.0), ("lon_0", 19.0),
                    ("x_0", 0.0), ("y_0", 0.0)),
        )
        rng = np.random.default_rng(5)
        lo = rng.uniform(16, 22, 60)
        la = rng.uniform(-35, -22, 60)
        xs, ys = Transformer.from_crs(CRS_WGS84, lo19).transform(lo, la)
        xn, yn = Transformer.from_crs(CRS_WGS84, plain).transform(lo, la)
        np.testing.assert_array_equal(xs, -xn)
        np.testing.assert_array_equal(ys, -yn)
        # south of the equator, southing is positive; west of the
        # central meridian, westing is positive
        assert (ys > 0).all()
        assert (xs[lo < 19.0] > 0).all()
        assert (xs[lo > 19.0] < 0).all()

    def test_cape_town_and_roundtrip(self):
        lo19 = CRS.from_epsg(2048)
        f = Transformer.from_crs(CRS_WGS84, lo19)
        x, y = f.transform(np.array([18.4241]), np.array([-33.9249]))
        assert x[0] == pytest.approx(53251.51, abs=1.0)
        assert y[0] == pytest.approx(3755480.59, abs=1.0)
        lo2, la2 = Transformer.from_crs(lo19, CRS_WGS84).transform(x, y)
        assert lo2[0] == pytest.approx(18.4241, abs=1e-9)
        assert la2[0] == pytest.approx(-33.9249, abs=1e-9)

    def test_gdal_wkt1_parses(self):
        wkt = """PROJCS["Hartebeesthoek94 / Lo19",
         GEOGCS["Hartebeesthoek94",DATUM["Hartebeesthoek94",
          SPHEROID["WGS 84",6378137,298.257223563]],
          PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
         PROJECTION["Transverse_Mercator_South_Orientated"],
         PARAMETER["latitude_of_origin",0],
         PARAMETER["central_meridian",19],
         PARAMETER["scale_factor",1],
         PARAMETER["false_easting",0],
         PARAMETER["false_northing",0],
         UNIT["metre",1],AUTHORITY["EPSG","2048"]]"""
        crs = crs_from_wkt(wkt)
        assert crs.param("south_orient") == 1.0
        assert _max_err(crs, CRS.from_epsg(2048), (16, 22), (-35, -22)) \
            == 0.0

    def test_proj_axis_wsu(self):
        crs = crs_from_proj(
            "+proj=tmerc +lat_0=0 +lon_0=19 +k=1 +x_0=0 +y_0=0 "
            "+axis=wsu +ellps=WGS84")
        assert _max_err(crs, CRS.from_epsg(2048), (16, 22), (-35, -22)) \
            == 0.0
        # emission closure carries the axis flag
        again = crs_from_proj(CRS.from_epsg(2048).to_proj())
        assert again.param("south_orient") == 1.0
        assert "+axis=wsu" in CRS.from_epsg(2048).to_proj()

    def test_axis_wsu_rejected_off_tmerc(self):
        with pytest.raises(ValueError, match="axis"):
            crs_from_proj("+proj=lcc +lat_1=40 +axis=wsu +ellps=WGS84")
        with pytest.raises(ValueError, match="axis"):
            crs_from_proj("+proj=tmerc +lon_0=19 +axis=neu +ellps=WGS84")

    def test_cf_falls_back_to_crs_wkt(self):
        # CF has no south-orientated TM name: the named keys would flip
        # the axes, so to_cf carries crs_wkt only -- and from_cf
        # restores the orientation from it
        cf = CRS.from_epsg(2048).to_cf()
        assert "grid_mapping_name" not in cf
        again = CRS.from_cf(cf)
        assert again.param("south_orient") == 1.0
        assert _max_err(CRS.from_epsg(2048), again,
                        (16, 22), (-35, -22)) < 1e-8


class TestNationalLambertGrids:
    """LCC-1SP national grids registered on the k_0-aware machinery."""

    def test_jamaica_gn72_worked_example(self):
        # EPSG GN7-2 LCC-1SP example (Jamaica 1969 National Grid):
        # 17d55'55.80"N 76d56'37.26"W -> E 255966.58, N 142493.51
        f = Transformer.from_crs(CRS_WGS84, CRS.from_epsg(24200))
        lat = 17 + 55 / 60 + 55.80 / 3600
        lon = -(76 + 56 / 60 + 37.26 / 3600)
        x, y = f.transform(np.array([lon]), np.array([lat]))
        assert x[0] == pytest.approx(255966.58, abs=0.01)
        assert y[0] == pytest.approx(142493.51, abs=0.01)

    def test_ntf_lambert_ii_origin_and_shift(self):
        from xcube_resampling_spark.crs import _lcc_forward

        ntf = CRS.from_epsg(27572)
        assert ntf.towgs84 == (-168.0, -60.0, 320.0)
        assert ntf.param("k_0") == 0.99987742
        # natural origin (52 gr N on the Paris meridian) sits at FE/FN
        x, y = _lcc_forward(ntf, np.array([2.337229166666667]),
                            np.array([46.8]))
        assert x[0] == pytest.approx(600000.0, abs=1e-6)
        assert y[0] == pytest.approx(2200000.0, abs=1e-6)


class TestOmercVariantA:
    """EPSG 9812 (Hotine variant A, natural-origin anchoring): GDAL's
    bare WKT1 'Hotine_Oblique_Mercator' and PROJ '+no_uoff'."""

    def _variant_a(self):
        b = CRS.from_epsg(29873)
        return CRS("omerc", "variant A twin", b.ellipsoid,
                   tuple(sorted(dict(b.params, no_uoff=1.0).items())))

    def test_differs_from_variant_b_by_constant_uc_shift(self):
        a, b = self._variant_a(), CRS.from_epsg(29873)
        fa = Transformer.from_crs(CRS_WGS84, a)
        fb = Transformer.from_crs(CRS_WGS84, b)
        rng = np.random.default_rng(5)
        lo = rng.uniform(110, 119, 50)
        la = rng.uniform(1, 7, 50)
        xa, ya = fa.transform(lo, la)
        xb, yb = fb.transform(lo, la)
        dx, dy = xa - xb, ya - yb
        # constant offset u_c * (sin gamma, cos gamma), nonzero
        assert np.ptp(dx) < 1e-6 and np.ptp(dy) < 1e-6
        assert abs(dx[0]) > 1000.0
        # and it equals the u_c shift along the rectified grid angle
        gamma = math.radians(b.param("gamma"))
        u_c = dy[0] / math.cos(gamma)
        assert abs(dx[0] - u_c * math.sin(gamma)) < 1e-6

    def test_roundtrip(self):
        a = self._variant_a()
        f = Transformer.from_crs(CRS_WGS84, a)
        inv = Transformer.from_crs(a, CRS_WGS84)
        rng = np.random.default_rng(6)
        lo = rng.uniform(110, 119, 100)
        la = rng.uniform(1, 7, 100)
        x, y = f.transform(lo, la)
        lo2, la2 = inv.transform(x, y)
        np.testing.assert_allclose(lo2, lo, atol=1e-9)
        np.testing.assert_allclose(la2, la, atol=1e-9)

    def test_wkt1_bare_hotine_is_variant_a(self):
        crs = crs_from_wkt(WKT1_29873.replace(
            "Hotine_Oblique_Mercator_Azimuth_Center",
            "Hotine_Oblique_Mercator"))
        assert crs.param("no_uoff") == 1.0
        assert _max_err(crs, self._variant_a(), (110, 119), (1, 7)) < 0.01

    def test_proj_no_uoff_flag(self):
        crs = crs_from_proj(
            "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582047222222 "
            "+gamma=53.13010236111111 +k=0.99984 +x_0=590476.87 "
            "+y_0=442857.65 +no_uoff +ellps=evrst69")
        assert crs.param("no_uoff") == 1.0
        assert _max_err(crs, self._variant_a(), (110, 119), (1, 7)) < 1e-6

    def test_emission_closure_both_variants(self):
        for crs in (self._variant_a(), CRS.from_epsg(29873)):
            again_w = crs_from_wkt(crs.to_wkt())
            again_p = crs_from_proj(crs.to_proj())
            for again in (again_w, again_p):
                assert again.param("no_uoff", 0.0) == \
                    crs.param("no_uoff", 0.0)
                assert _max_err(crs, again, (110, 119), (1, 7)) == 0.0


class TestForeignDialectRegressions:
    """Round-5 review pins: input classes the closure tests never
    generate (GDAL/ESRI WKT1 dialects, legacy PROJ strings)."""

    def test_gdal_wkt1_laea_longitude_of_center(self):
        """GDAL's WKT1 for EPSG:3035 uses latitude/longitude_of_center;
        lonc must land on the engine's lon_0 (it silently fell away,
        shifting the center ~700 km)."""
        wkt1 = """PROJCS["ETRS89-extended / LAEA Europe",
 GEOGCS["ETRS89",DATUM["European_Terrestrial_Reference_System_1989",
  SPHEROID["GRS 1980",6378137,298.257222101]],
  PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],
 PROJECTION["Lambert_Azimuthal_Equal_Area"],
 PARAMETER["latitude_of_center",52],
 PARAMETER["longitude_of_center",10],
 PARAMETER["false_easting",4321000],
 PARAMETER["false_northing",3210000],
 UNIT["metre",1]]"""
        got = crs_from_wkt(wkt1)
        ref = CRS.from_epsg(3035)
        assert got.param("lon_0") == 10.0
        import numpy as np

        from xcube_resampling_spark.crs import CRS_WGS84, Transformer
        lo = np.array([5.0, 15.0]); la = np.array([45.0, 55.0])
        xa, ya = Transformer.from_crs(CRS_WGS84, got).transform(lo, la)
        xb, yb = Transformer.from_crs(CRS_WGS84, ref).transform(lo, la)
        np.testing.assert_allclose(xa, xb, atol=1e-6)
        np.testing.assert_allclose(ya, yb, atol=1e-6)

    def test_proj_pm_paris(self):
        """+pm=paris longitudes are Paris-relative; the engine stores
        Greenwich lon_0, so it must shift by 2.33722917 deg (ignoring
        it landed NTF grids ~260 km west)."""
        c = crs_from_proj(
            "+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 "
            "+k_0=0.99987742 +x_0=600000 +y_0=2200000 "
            "+ellps=clrk80ign +pm=paris")
        assert c.param("lon_0") == pytest.approx(2.33722917)
        with pytest.raises(ValueError, match="pm"):
            crs_from_proj("+proj=longlat +ellps=WGS84 +pm=oslo")

    def test_proj_pm_defaulted_lon_0(self):
        """+pm= must shift even when the string has no explicit +lon_0:
        PROJ's lon_0 default is 0 RELATIVE TO THE MERIDIAN (the old
        `if lk in p` guard silently yielded Greenwich lon_0=0)."""
        c = crs_from_proj("+proj=moll +pm=paris +ellps=WGS84")
        assert c.param("lon_0") == pytest.approx(2.33722917)
        c2 = crs_from_proj("+proj=moll +lon_0=10 +pm=paris +ellps=WGS84")
        assert c2.param("lon_0") == pytest.approx(12.33722917)

    def test_proj_pm_geographic_modeled(self):
        """+proj=longlat +pm=paris (EPSG:4807-style) must model the
        meridian, not silently return a Greenwich CRS (~2.34 deg
        wrong).  The Transformer shifts to/from Greenwich and the
        parse-emit closure holds in both WKT and PROJ forms."""
        from xcube_resampling_spark.crs import Transformer

        g = crs_from_proj("+proj=longlat +pm=paris +ellps=WGS84")
        assert g.param("pm") == pytest.approx(2.33722917)
        fwd = Transformer.from_crs(g, "OGC:CRS84")
        lon, lat = fwd.transform([0.0], [48.0])
        assert lon[0] == pytest.approx(2.33722917)
        assert lat[0] == pytest.approx(48.0)
        inv = Transformer.from_crs("OGC:CRS84", g)
        lon, lat = inv.transform([2.33722917], [48.0])
        assert lon[0] == pytest.approx(0.0, abs=1e-12)
        # closure both ways
        assert crs_from_proj(crs_to_proj(g)).param("pm") == g.param("pm")
        assert crs_from_wkt(crs_to_wkt(g)).param("pm") == g.param("pm")

    def test_proj_pm_rot_pole(self):
        """+proj=ob_tran +pm= shifts the pole longitude to Greenwich
        (the rot_pole branch used to return before the pm block)."""
        c = crs_from_proj(
            "+proj=ob_tran +o_proj=longlat +o_lat_p=37 +lon_0=177 "
            "+pm=2.0 +ellps=WGS84")
        assert c.param("pole_lon") == pytest.approx(-1.0)

    def test_proj_unknown_ellps_raises_and_krass_parses(self):
        c = crs_from_proj("+proj=tmerc +lon_0=21 +ellps=krass")
        assert c.ellipsoid.a == 6378245.0
        with pytest.raises(ValueError, match="ellps"):
            crs_from_proj("+proj=tmerc +lon_0=21 +ellps=bogus77")
        nad27 = crs_from_proj("+proj=lcc +lat_1=33 +lat_2=45 "
                              "+datum=NAD27")
        assert nad27.ellipsoid.a == 6378206.4
        with pytest.raises(ValueError, match="datum"):
            crs_from_proj("+proj=tmerc +datum=potsdam77")

    def test_spherical_merc_with_scale_keeps_merc_kernel(self):
        """+proj=merc +R +lat_ts=30 must keep its cos(30) scale -- the
        webmerc kernel has no k_0 (silently dropped ~15.5%)."""
        import math as m

        c = crs_from_proj("+proj=merc +R=6371000 +lat_ts=30")
        assert c.kind == "merc"
        assert c.param("k_0") == pytest.approx(m.cos(m.radians(30.0)))
        # unit-scale sphere still lowers to the webmerc fast path
        c2 = crs_from_proj("+proj=merc +R=6371000")
        assert c2.kind == "webmerc"

    def test_k0less_crs_emits_unit_scale(self):
        """A CRS whose params lack k_0 transforms with the kernel
        default 1.0; its WKT emission must say 1.0, not param()'s
        generic 0.0 (which collapsed every reparsed coordinate)."""
        c = crs_from_proj("+proj=sterea +lat_0=52 +lon_0=5 "
                          "+ellps=bessel")
        merged = dict(c.params)
        merged.pop("k_0", None)
        from dataclasses import replace

        c2 = replace(c, params=tuple(sorted(merged.items())))
        again = crs_from_wkt(c2.to_wkt())
        assert again.param("k_0", 1.0) == 1.0

    def test_coordinate_frame_rotation_sign(self):
        """A BOUNDCRS whose transformation METHOD is Coordinate Frame
        carries rotations with the opposite sign of the engine's
        position-vector convention."""
        base = CRS.from_epsg(28992)
        wkt = base.to_wkt()
        assert "Position Vector" in wkt or "ABRIDGED" in wkt.upper()
        pv = crs_from_wkt(wkt)
        cf_wkt = wkt.replace("Position Vector transformation",
                             "Coordinate Frame rotation")
        cf = crs_from_wkt(cf_wkt)
        assert cf.towgs84[0] == pv.towgs84[0]
        for k in (3, 4, 5):
            assert cf.towgs84[k] == pytest.approx(-pv.towgs84[k])

    def test_quoted_name_survives_emission(self):
        from dataclasses import replace

        c = replace(CRS.from_epsg(3035),
                    name='ETRS89 "extended" LAEA')
        again = crs_from_wkt(c.to_wkt())
        assert again.name == 'ETRS89 "extended" LAEA'
        assert again.params == c.params


class TestPrimemUnits:
    """Strict OGC WKT1: a PRIMEM without its own unit is in the GEOGCS
    angular UNIT (EPSG:4807 quotes Paris as 2.5969213 GRADS)."""

    def test_geogcs_primem_in_grads(self):
        wkt = (
            'GEOGCS["NTF (Paris)",DATUM["Nouvelle_Triangulation_'
            'Francaise_Paris",SPHEROID["Clarke 1880 (IGN)",6378249.2,'
            '293.4660212936269]],PRIMEM["Paris",2.5969213],'
            'UNIT["grad",0.01570796326794897]]'
        )
        c = crs_from_wkt(wkt)
        assert c.param("pm") == pytest.approx(2.33722917, abs=1e-6)

    def test_projcs_primem_in_grads(self):
        wkt = (
            'PROJCS["NTF (Paris) / Lambert zone II",GEOGCS["NTF '
            '(Paris)",DATUM["NTF_Paris",SPHEROID["Clarke 1880 (IGN)",'
            '6378249.2,293.4660212936269]],PRIMEM["Paris",2.5969213],'
            'UNIT["grad",0.01570796326794897]],'
            'PROJECTION["Lambert_Conformal_Conic_1SP"],'
            'PARAMETER["latitude_of_origin",52],'
            'PARAMETER["central_meridian",0],'
            'PARAMETER["scale_factor",0.99987742],'
            'PARAMETER["false_easting",600000],'
            'PARAMETER["false_northing",2200000],UNIT["metre",1]]'
        )
        c = crs_from_wkt(wkt)
        # lat_0 = 52 grads = 46.8 deg; lon_0 = 0 + Paris = 2.337 deg
        assert c.param("lat_0") == pytest.approx(46.8)
        assert c.param("lon_0") == pytest.approx(2.33722917, abs=1e-6)

    def test_degree_primem_unchanged(self):
        wkt = (
            'GEOGCS["x",DATUM["d",SPHEROID["WGS 84",6378137,'
            '298.257223563]],PRIMEM["Paris",2.33722917],'
            'UNIT["degree",0.0174532925199433]]'
        )
        c = crs_from_wkt(wkt)
        assert c.param("pm") == pytest.approx(2.33722917)

    def test_gdal_dialect_grads_unit_degree_primem(self):
        """GDAL-dialect WKT1 writes PRIMEM in DEGREES even when the
        GEOGCS UNIT is grads (epsg.io's EPSG:27572 form); the
        known-meridian table disambiguates against strict OGC."""
        wkt = (
            'GEOGCS["NTF (Paris)",DATUM["NTF_Paris",SPHEROID['
            '"Clarke 1880 (IGN)",6378249.2,293.4660212936269]],'
            'PRIMEM["Paris",2.33722917],'
            'UNIT["grad",0.01570796326794897]]'
        )
        c = crs_from_wkt(wkt)
        assert c.param("pm") == pytest.approx(2.33722917, abs=1e-6)

    def test_unknown_meridian_uses_cs_unit(self):
        """A meridian name outside the PROJ table falls back to the
        strict-OGC rule (scale by the CS angular unit)."""
        wkt = (
            'GEOGCS["x",DATUM["d",SPHEROID["WGS 84",6378137,'
            '298.257223563]],PRIMEM["Custom",10.0],'
            'UNIT["grad",0.01570796326794897]]'
        )
        c = crs_from_wkt(wkt)
        assert c.param("pm") == pytest.approx(9.0)
