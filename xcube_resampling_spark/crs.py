"""Minimal coordinate-reference-system support (no external deps).

The reference engine delegates all CRS handling to pyproj
(/root/reference/xcube_resampling/gridmapping/base.py:49-52,
 reproject.py:124-126).  pyproj is not available in this environment, so this
module implements the small subset of CRS functionality the engine needs from
public, published formulas:

* geographic CRS (WGS84 / CRS84 lon-lat degrees),
* Universal Transverse Mercator (EPSG:326xx / 327xx) via the Krueger series
  (Karney 2011, "Transverse Mercator with an accuracy of a few nanometers" --
  public-domain formulas, coefficients to order n^6),
* Lambert Azimuthal Equal Area (EPSG:3035 and general CF parameters) per
  EPSG Guidance Note 7-2 (method code 9820, ellipsoidal oblique case).

All functions are vectorized over numpy arrays so they can run inside
Arrow-batched pandas UDFs on Spark executors.  CRS objects serialize to a
small spec string so they can be shipped to executors cheaply.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import numpy as np

__all__ = ["CRS", "Transformer", "CRS_WGS84", "CRS_CRS84",
           "CRS_SINU_MODIS"]

# Ellipsoids: name -> (a, 1/f)
_ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "Clarke1866": (6378206.4, 294.978698214),  # Snyder test points
    "Airy1830": (6377563.396, 299.3249646),    # OSGB36 / EPSG:27700
    "Intl1924": (6378388.0, 297.0),            # ED50 and Snyder examples
    "Everest1967": (6377298.556, 300.8017),    # Timbalai 1948 / EPSG:29873
    "Bessel1841": (6377397.155, 299.1528128),  # CH1903(+) / EPSG:2056
    "Clarke1880IGN": (6378249.2, 293.4660212936269),  # NTF (France)
}


@dataclass(frozen=True)
class _Ellipsoid:
    a: float
    inv_f: float

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e2(self) -> float:
        f = self.f
        return f * (2.0 - f)

    @property
    def e(self) -> float:
        return math.sqrt(self.e2)

    @property
    def n(self) -> float:
        f = self.f
        return f / (2.0 - f)


@dataclass(frozen=True)
class CRS:
    """A coordinate reference system.

    kind: the projection family -- one of 'geographic', 'tmerc', 'laea',
      'webmerc', 'merc', 'stere', 'stere_obl', 'sterea', 'lcc', 'aea',
      'sinu', 'cea', 'eqc', 'geos', 'omerc', 'somerc', 'krovak',
      'ortho', 'moll', 'eqearth', 'aeqd', 'nsper', 'rot_pole'.
    params: projection parameters (lon_0, lat_0, k_0, x_0, y_0, ...) in
      degrees / metres, stored as sorted (key, value) pairs.
    """

    kind: str
    name: str
    ellipsoid: _Ellipsoid
    params: tuple = field(default_factory=tuple)  # sorted (key, value) pairs
    auth_code: str | None = None
    # 3- or 7-parameter Helmert shift of this CRS's datum TO WGS84
    # (dx, dy, dz [m]) or (dx, dy, dz, rx, ry, rz [arc-sec], s [ppm]),
    # position-vector convention (EPSG method 9606).  Empty = treated as
    # WGS84-compatible (projection-only transforms, the pre-round-4
    # behavior and pyproj's behavior without a pipeline).
    towgs84: tuple = ()

    # ------------------------------------------------------------------ #
    # constructors

    @staticmethod
    def from_user_input(value) -> "CRS":
        if isinstance(value, CRS):
            return value
        if isinstance(value, int):
            return CRS.from_epsg(value)
        if isinstance(value, str):
            return CRS.from_string(value)
        raise ValueError(f"cannot create CRS from {value!r}")

    @staticmethod
    def from_string(s: str) -> "CRS":
        su = s.strip().upper()
        if "+PROJ=" in su:
            from .wkt import crs_from_proj
            return crs_from_proj(s.strip())
        if re.match(r"\s*(PROJCS|GEOGCS|PROJCRS|GEOGCRS|GEODCRS|BOUNDCRS)"
                    r"\s*[\[(]", su):
            from .wkt import crs_from_wkt
            return crs_from_wkt(s.strip())
        if su in ("OGC:CRS84", "CRS84", "WGS84", "WGS 84", "EPSG:CRS84"):
            return CRS_CRS84
        if su.startswith("EPSG:"):
            return CRS.from_epsg(int(su.split(":", 1)[1]))
        if su.isdigit():
            return CRS.from_epsg(int(su))
        if su == "ESRI:54008":
            # World Sinusoidal on the WGS84 ellipsoid (EPSG method 9835)
            return CRS(
                "sinu", "World Sinusoidal",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                params=(("lon_0", 0.0), ("x_0", 0.0), ("y_0", 0.0)),
                auth_code="ESRI:54008",
            )
        if su in ("MODIS", "SR-ORG:6974", "SINUSOIDAL"):
            return CRS_SINU_MODIS
        if su == "ESRI:54009":
            # World Mollweide on the WGS84 datum (spherical math on a)
            return CRS(
                "moll", "World Mollweide",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                params=(("lon_0", 0.0), ("x_0", 0.0), ("y_0", 0.0)),
                auth_code="ESRI:54009",
            )
        raise ValueError(f"unsupported CRS string: {s!r}")

    @staticmethod
    def from_epsg(code: int) -> "CRS":
        if code == 4326:
            return CRS(
                "geographic", "WGS 84", _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                auth_code="EPSG:4326",
            )
        if 32601 <= code <= 32660 or 32701 <= code <= 32760:
            south = code >= 32701
            zone = code - (32700 if south else 32600)
            lon0 = zone * 6 - 183
            hemi = "S" if south else "N"
            return CRS(
                "tmerc",
                f"WGS 84 / UTM zone {zone}{hemi}",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                params=(
                    ("k_0", 0.9996),
                    ("lat_0", 0.0),
                    ("lon_0", float(lon0)),
                    ("x_0", 500000.0),
                    ("y_0", 10000000.0 if south else 0.0),
                ),
                auth_code=f"EPSG:{code}",
            )
        if 25828 <= code <= 25838:
            # ETRS89 / UTM (GRS80; same Krueger machinery as WGS84 UTM)
            zone = code - 25800
            return CRS(
                "tmerc",
                f"ETRS89 / UTM zone {zone}N",
                _Ellipsoid(*_ELLIPSOIDS["GRS80"]),
                params=(
                    ("k_0", 0.9996),
                    ("lat_0", 0.0),
                    ("lon_0", float(zone * 6 - 183)),
                    ("x_0", 500000.0),
                    ("y_0", 0.0),
                ),
                auth_code=f"EPSG:{code}",
            )
        if 23028 <= code <= 23038:
            # ED50 / UTM (International 1924): first datum-shifted CRS in
            # the registry -- towgs84 is the EPSG:1133 mean European
            # 3-parameter shift (~0.9 m grade)
            zone = code - 23000
            return CRS(
                "tmerc",
                f"ED50 / UTM zone {zone}N",
                _Ellipsoid(*_ELLIPSOIDS["Intl1924"]),
                params=(
                    ("k_0", 0.9996),
                    ("lat_0", 0.0),
                    ("lon_0", float(zone * 6 - 183)),
                    ("x_0", 500000.0),
                    ("y_0", 0.0),
                ),
                auth_code=f"EPSG:{code}",
                towgs84=(-87.0, -98.0, -121.0),
            )
        if code == 27700:
            # OSGB36 / British National Grid (EPSG method 9807 on Airy
            # 1830; datum handled as projection-only, like pyproj without
            # a transformation pipeline)
            return CRS(
                "tmerc",
                "OSGB36 / British National Grid",
                _Ellipsoid(*_ELLIPSOIDS["Airy1830"]),
                params=(
                    ("k_0", 0.9996012717),
                    ("lat_0", 49.0),
                    ("lon_0", -2.0),
                    ("x_0", 400000.0),
                    ("y_0", -100000.0),
                ),
                auth_code="EPSG:27700",
            )
        if 2046 <= code <= 2055:
            # Hartebeesthoek94 / Lo15..Lo33 (EPSG method 9808,
            # Transverse Mercator South Orientated): the South African
            # survey grids -- westing/southing axes, no false origin,
            # WGS84 ellipsoid
            lon0 = 15.0 + 2.0 * (code - 2046)
            return CRS(
                "tmerc",
                f"Hartebeesthoek94 / Lo{lon0:.0f}",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                params=(
                    ("k_0", 1.0),
                    ("lat_0", 0.0),
                    ("lon_0", lon0),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                    ("south_orient", 1.0),
                ),
                auth_code=f"EPSG:{code}",
            )
        if code == 24200:
            # Jamaica 1969 / Jamaica National Grid (EPSG method 9801,
            # LCC 1SP with k_0 = 1): the EPSG GN7-2 worked example for
            # the 1SP method (255966.58 E, 142493.51 N at
            # 17d55'55.8"N 76d56'37.26"W)
            return CRS(
                "lcc",
                "Jamaica 1969 / Jamaica National Grid",
                _Ellipsoid(*_ELLIPSOIDS["Clarke1866"]),
                params=(
                    ("lat_0", 18.0),
                    ("lat_1", 18.0),
                    ("lat_2", 18.0),
                    ("lon_0", -77.0),
                    ("k_0", 1.0),
                    ("x_0", 250000.0),
                    ("y_0", 150000.0),
                ),
                auth_code="EPSG:24200",
            )
        if code == 27572:
            # NTF (Paris) / Lambert zone II ("Lambert II etendu" --
            # France's pre-RGF93 national grid, EPSG method 9801 LCC
            # 1SP on Clarke 1880 IGN): lat/lon of natural origin
            # 52 grads from Greenwich-referenced Paris meridian
            # (2d20'14.025"), k_0 = 0.99987742; EPSG:1276 3-parameter
            # NTF -> WGS84 shift
            return CRS(
                "lcc",
                "NTF (Paris) / Lambert zone II",
                _Ellipsoid(*_ELLIPSOIDS["Clarke1880IGN"]),
                params=(
                    ("lat_0", 46.8),
                    ("lat_1", 46.8),
                    ("lat_2", 46.8),
                    ("lon_0", 2.337229166666667),
                    ("k_0", 0.99987742),
                    ("x_0", 600000.0),
                    ("y_0", 2200000.0),
                ),
                auth_code="EPSG:27572",
                towgs84=(-168.0, -60.0, 320.0),
            )
        if code == 2193:
            # NZGD2000 / New Zealand Transverse Mercator 2000: the
            # generic Krueger tmerc machinery on GRS80
            return CRS(
                "tmerc",
                "NZGD2000 / New Zealand Transverse Mercator 2000",
                _Ellipsoid(*_ELLIPSOIDS["GRS80"]),
                params=(
                    ("k_0", 0.9996),
                    ("lat_0", 0.0),
                    ("lon_0", 173.0),
                    ("x_0", 1600000.0),
                    ("y_0", 10000000.0),
                ),
                auth_code="EPSG:2193",
            )
        if code == 3577:
            # GDA94 / Australian Albers (EPSG method 9822 on GRS80)
            return CRS(
                "aea",
                "GDA94 / Australian Albers",
                _Ellipsoid(*_ELLIPSOIDS["GRS80"]),
                params=(
                    ("lat_1", -18.0),
                    ("lat_2", -36.0),
                    ("lat_0", 0.0),
                    ("lon_0", 132.0),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                ),
                auth_code="EPSG:3577",
            )
        if code == 3112:
            # GDA94 / Geoscience Australia Lambert (LCC 2SP on GRS80)
            return CRS(
                "lcc",
                "GDA94 / Geoscience Australia Lambert",
                _Ellipsoid(*_ELLIPSOIDS["GRS80"]),
                params=(
                    ("lat_1", -18.0),
                    ("lat_2", -36.0),
                    ("lat_0", 0.0),
                    ("lon_0", 134.0),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                ),
                auth_code="EPSG:3112",
            )
        if code == 5514:
            # S-JTSK / Krovak East North: oblique conformal conic
            # (EPSG method 9819) on Bessel 1841.  lon_0 stored in
            # Greenwich terms (42d30' E of Ferro = 24d50' E Greenwich;
            # the Ferro shift cancels in longitude differences).
            return CRS(
                "krovak",
                "S-JTSK / Krovak East North",
                _Ellipsoid(*_ELLIPSOIDS["Bessel1841"]),
                params=(
                    ("k_0", 0.9999),
                    ("lat_0", 49.5),
                    ("lon_0", 24.0 + 50.0 / 60),
                    ("alpha", 30.0 + 17.0 / 60 + 17.3031 / 3600),
                    ("lat_p", 78.5),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                ),
                auth_code="EPSG:5514",
            )
        if code in (2056, 21781):
            # CH1903+ / LV95 and CH1903 / LV03: Swiss Oblique Mercator
            # (EPSG method 9814, Rosenmund double projection) on Bessel
            # 1841, centered on the old Bern observatory.
            lv95 = code == 2056
            return CRS(
                "somerc",
                "CH1903+ / LV95" if lv95 else "CH1903 / LV03",
                _Ellipsoid(*_ELLIPSOIDS["Bessel1841"]),
                params=(
                    ("k_0", 1.0),
                    ("lat_0", 46.0 + 57.0 / 60 + 8.66 / 3600),
                    ("lon_0", 7.0 + 26.0 / 60 + 22.5 / 3600),
                    ("x_0", 2600000.0 if lv95 else 600000.0),
                    ("y_0", 1200000.0 if lv95 else 200000.0),
                ),
                auth_code=f"EPSG:{code}",
            )
        if code == 29873:
            # Timbalai 1948 / RSO Borneo (m): Hotine Oblique Mercator
            # variant B (EPSG method 9815) -- the worked example of EPSG
            # Guidance Note 7-2.  Angles converted from the GN's
            # sexagesimal values.
            return CRS(
                "omerc",
                "Timbalai 1948 / RSO Borneo (m)",
                _Ellipsoid(*_ELLIPSOIDS["Everest1967"]),
                params=(
                    ("k_0", 0.99984),
                    ("lat_0", 4.0),
                    ("lonc", 115.0),
                    ("alpha", 53.0 + 18.0 / 60 + 56.9537 / 3600),
                    ("gamma", 53.0 + 7.0 / 60 + 48.3685 / 3600),
                    ("x_0", 590476.87),
                    ("y_0", 442857.65),
                ),
                auth_code="EPSG:29873",
            )
        if code in (5041, 5042):
            # WGS 84 / UPS North (E,N) and South (E,N): Polar
            # Stereographic variant A (EPSG method 9810) -- k_0 at the
            # pole; validated against the EPSG GN7-2 worked example
            # (73N 44E -> E 3320416.75, N 632668.43)
            north = code == 5041
            return CRS(
                "stere",
                f"WGS 84 / UPS {'North' if north else 'South'} (E,N)",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                params=(
                    ("k_0", 0.994),
                    ("lat_0", 90.0 if north else -90.0),
                    ("lat_ts", 90.0 if north else -90.0),
                    ("lon_0", 0.0),
                    ("x_0", 2000000.0),
                    ("y_0", 2000000.0),
                ),
                auth_code=f"EPSG:{code}",
            )
        if code == 3395:
            # WGS 84 / World Mercator (EPSG method 9804, ellipsoidal 1SP)
            return CRS(
                "merc",
                "WGS 84 / World Mercator",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                params=(
                    ("k_0", 1.0),
                    ("lon_0", 0.0),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                ),
                auth_code="EPSG:3395",
            )
        if code == 6933:
            # WGS 84 / NSIDC EASE-Grid 2.0 Global (EPSG method 9835,
            # Lambert cylindrical equal area, lat_ts = 30)
            return CRS(
                "cea",
                "WGS 84 / NSIDC EASE-Grid 2.0 Global",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                params=(
                    ("lat_ts", 30.0),
                    ("lon_0", 0.0),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                ),
                auth_code="EPSG:6933",
            )
        if code == 4087:
            # WGS 84 / World Equidistant Cylindrical (EPSG method 1028)
            return CRS(
                "eqc",
                "WGS 84 / World Equidistant Cylindrical",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                params=(
                    ("lat_ts", 0.0),
                    ("lon_0", 0.0),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                ),
                auth_code="EPSG:4087",
            )
        if code == 28992:
            # Amersfoort / RD New (EPSG method 9809, oblique "double"
            # stereographic on Bessel 1841); towgs84 is the classic
            # 7-parameter Amersfoort->WGS84 position-vector shift
            return CRS(
                "sterea",
                "Amersfoort / RD New",
                _Ellipsoid(*_ELLIPSOIDS["Bessel1841"]),
                params=(
                    ("k_0", 0.9999079),
                    ("lat_0", 52.0 + 9.0 / 60 + 22.178 / 3600),
                    ("lon_0", 5.0 + 23.0 / 60 + 15.5 / 3600),
                    ("x_0", 155000.0),
                    ("y_0", 463000.0),
                ),
                auth_code="EPSG:28992",
                towgs84=(565.417, 50.3319, 465.552, -0.398957,
                         0.343988, -1.8774, 4.0725),
            )
        if code in (8857, 8858, 8859):
            # WGS 84 / Equal Earth {Greenwich, Americas, Asia-Pacific}
            # (EPSG method 1078)
            region, lon0 = {
                8857: ("Greenwich", 0.0),
                8858: ("Americas", -90.0),
                8859: ("Asia-Pacific", 150.0),
            }[code]
            return CRS(
                "eqearth",
                f"WGS 84 / Equal Earth {region}",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                params=(
                    ("lon_0", lon0),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                ),
                auth_code=f"EPSG:{code}",
            )
        if code == 3035:
            return CRS(
                "laea",
                "ETRS89-extended / LAEA Europe",
                _Ellipsoid(*_ELLIPSOIDS["GRS80"]),
                params=(
                    ("lat_0", 52.0),
                    ("lon_0", 10.0),
                    ("x_0", 4321000.0),
                    ("y_0", 3210000.0),
                ),
                auth_code="EPSG:3035",
            )
        if code == 3857:
            # EPSG method 1024 "Popular Visualisation Pseudo Mercator":
            # spherical formulas on the WGS84 semi-major axis
            return CRS(
                "webmerc",
                "WGS 84 / Pseudo-Mercator",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                params=(
                    ("lon_0", 0.0),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                ),
                auth_code="EPSG:3857",
            )
        if code == 3413:
            # NSIDC Sea Ice Polar Stereographic North (EPSG method 9829)
            return CRS(
                "stere",
                "WGS 84 / NSIDC Sea Ice Polar Stereographic North",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                params=(
                    ("lat_0", 90.0),
                    ("lat_ts", 70.0),
                    ("lon_0", -45.0),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                ),
                auth_code="EPSG:3413",
            )
        if code == 3031:
            # Antarctic Polar Stereographic (EPSG method 9829)
            return CRS(
                "stere",
                "WGS 84 / Antarctic Polar Stereographic",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                params=(
                    ("lat_0", -90.0),
                    ("lat_ts", -71.0),
                    ("lon_0", 0.0),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                ),
                auth_code="EPSG:3031",
            )
        if code == 2154:
            # RGF93 v1 / Lambert-93 (EPSG method 9802, LCC 2SP)
            return CRS(
                "lcc",
                "RGF93 v1 / Lambert-93",
                _Ellipsoid(*_ELLIPSOIDS["GRS80"]),
                params=(
                    ("lat_1", 49.0),
                    ("lat_2", 44.0),
                    ("lat_0", 46.5),
                    ("lon_0", 3.0),
                    ("x_0", 700000.0),
                    ("y_0", 6600000.0),
                ),
                auth_code="EPSG:2154",
            )
        if code == 5070:
            # NAD83 / Conus Albers (EPSG method 9822, Albers 2SP)
            return CRS(
                "aea",
                "NAD83 / Conus Albers",
                _Ellipsoid(*_ELLIPSOIDS["GRS80"]),
                params=(
                    ("lat_1", 29.5),
                    ("lat_2", 45.5),
                    ("lat_0", 23.0),
                    ("lon_0", -96.0),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                ),
                auth_code="EPSG:5070",
            )
        if code == 3978:
            # NAD83 / Canada Atlas Lambert (EPSG method 9802, LCC 2SP)
            return CRS(
                "lcc",
                "NAD83 / Canada Atlas Lambert",
                _Ellipsoid(*_ELLIPSOIDS["GRS80"]),
                params=(
                    ("lat_1", 49.0),
                    ("lat_2", 77.0),
                    ("lat_0", 49.0),
                    ("lon_0", -95.0),
                    ("x_0", 0.0),
                    ("y_0", 0.0),
                ),
                auth_code="EPSG:3978",
            )
        raise ValueError(f"unsupported EPSG code: {code}")

    @staticmethod
    def geostationary(
        lon_0: float = 0.0,
        sweep: str = "y",
        h: float = 35785831.0,
        ellipsoid: str = "WGS84",
    ) -> "CRS":
        """The geostationary fixed grid (PROJ 'geos'): GOES-R ABI uses
        sweep='x' at lon_0 -75/-137 (verified against the GOES-R PUG
        worked example), MSG SEVIRI sweep='y' at lon_0 0/9.5/45.5.
        ``h`` is the perspective height above the ellipsoid."""
        if sweep not in ("x", "y"):
            raise ValueError("sweep must be 'x' or 'y'")
        return CRS(
            "geos", f"Geostationary (lon_0={lon_0}, sweep={sweep})",
            _Ellipsoid(*_ELLIPSOIDS[ellipsoid]),
            params=(
                ("h", float(h)),
                ("lon_0", float(lon_0)),
                ("sweep_x", 1.0 if sweep == "x" else 0.0),
                ("x_0", 0.0),
                ("y_0", 0.0),
            ),
        )

    @staticmethod
    def orthographic(
        lat_0: float = 0.0,
        lon_0: float = 0.0,
        false_easting: float = 0.0,
        false_northing: float = 0.0,
        ellipsoid: str = "WGS84",
    ) -> "CRS":
        """Ellipsoidal orthographic (EPSG method 9840, PROJ 'ortho'):
        the view from infinity over (lat_0, lon_0).  Satellite full-disk
        composites and local engineering grids; only the facing
        hemisphere maps (back-hemisphere points -> NaN)."""
        return CRS(
            "ortho", "Orthographic",
            _Ellipsoid(*_ELLIPSOIDS[ellipsoid]),
            params=(
                ("lat_0", float(lat_0)),
                ("lon_0", float(lon_0)),
                ("x_0", float(false_easting)),
                ("y_0", float(false_northing)),
            ),
        )

    @staticmethod
    def azimuthal_equidistant(
        lat_0: float = 0.0,
        lon_0: float = 0.0,
        false_easting: float = 0.0,
        false_northing: float = 0.0,
        ellipsoid: str = "WGS84",
    ) -> "CRS":
        """Azimuthal Equidistant (PROJ 'aeqd', CF
        'azimuthal_equidistant'): distances and azimuths from the origin
        are true.  Polar aspect on an ellipsoid uses the exact meridian
        arc; oblique ellipsoidal aspects project along true geodesics
        (Vincenty series, PROJ-compatible); spherical is Snyder sec. 25.
        Radar/range displays and local AoI grids."""
        return CRS(
            "aeqd", "Azimuthal Equidistant",
            _Ellipsoid(*_ELLIPSOIDS[ellipsoid]),
            params=(
                ("lat_0", float(lat_0)),
                ("lon_0", float(lon_0)),
                ("x_0", float(false_easting)),
                ("y_0", float(false_northing)),
            ),
        )

    @staticmethod
    def mollweide(
        lon_0: float = 0.0,
        false_easting: float = 0.0,
        false_northing: float = 0.0,
        ellipsoid: str = "WGS84",
    ) -> "CRS":
        """Mollweide pseudocylindrical equal-area (PROJ 'moll',
        ESRI:54009 World_Mollweide).  Global thematic/equal-area
        mosaics; spherical math on R = a like PROJ."""
        return CRS(
            "moll", "Mollweide",
            _Ellipsoid(*_ELLIPSOIDS[ellipsoid]),
            params=(
                ("lon_0", float(lon_0)),
                ("x_0", float(false_easting)),
                ("y_0", float(false_northing)),
            ),
        )

    @staticmethod
    def equal_earth(
        lon_0: float = 0.0,
        false_easting: float = 0.0,
        false_northing: float = 0.0,
        ellipsoid: str = "WGS84",
    ) -> "CRS":
        """Equal Earth (EPSG method 1078): the modern equal-area world
        projection (EPSG:8857/8858/8859); polynomial on the authalic
        sphere, exactly area-preserving on the ellipsoid."""
        return CRS(
            "eqearth", "Equal Earth",
            _Ellipsoid(*_ELLIPSOIDS[ellipsoid]),
            params=(
                ("lon_0", float(lon_0)),
                ("x_0", float(false_easting)),
                ("y_0", float(false_northing)),
            ),
        )

    @staticmethod
    def from_cf(attrs: dict) -> "CRS":
        """Build a CRS from CF grid-mapping attributes
        (parity: pyproj CRS.from_cf used at reference cfconv.py:91-116)."""
        gmn = attrs.get("grid_mapping_name")
        if gmn is None and "crs_wkt" in attrs:
            # CF allows a grid mapping to carry only crs_wkt (pyproj
            # parses it); also the escape hatch for methods that have a
            # WKT form but no CF grid_mapping_name (e.g. Krovak)
            from .wkt import crs_from_wkt
            return crs_from_wkt(attrs["crs_wkt"])
        if gmn in (None, "latitude_longitude"):
            return CRS_WGS84
        if "earth_radius" in attrs and "semi_major_axis" not in attrs:
            # CF: earth_radius declares a spherical figure (any mapping)
            ell = _Ellipsoid(float(attrs["earth_radius"]), float("inf"))
        else:
            ell = _Ellipsoid(
                float(attrs.get("semi_major_axis", 6378137.0)),
                float(attrs.get("inverse_flattening", 298.257223563)),
            )
        if gmn == "transverse_mercator":
            return CRS(
                "tmerc", "Transverse Mercator", ell,
                params=(
                    ("k_0", float(attrs.get(
                        "scale_factor_at_central_meridian", 1.0))),
                    ("lat_0", float(attrs.get(
                        "latitude_of_projection_origin", 0.0))),
                    ("lon_0", float(attrs.get("longitude_of_central_meridian", 0.0))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "lambert_azimuthal_equal_area":
            return CRS(
                "laea", "Lambert Azimuthal Equal Area", ell,
                params=(
                    ("lat_0", float(attrs.get(
                        "latitude_of_projection_origin", 0.0))),
                    ("lon_0", float(attrs.get(
                        "longitude_of_projection_origin", 0.0))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "swiss_oblique_cylindrical":
            return CRS(
                "somerc", "Swiss Oblique Mercator", ell,
                params=(
                    ("k_0", float(attrs.get(
                        "scale_factor_at_projection_origin", 1.0))),
                    ("lat_0", float(attrs.get(
                        "latitude_of_projection_origin", 0.0))),
                    ("lon_0", float(attrs.get(
                        "longitude_of_projection_origin", 0.0))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "oblique_mercator":
            alpha = float(attrs.get("azimuth_of_central_line", 0.0))
            return CRS(
                "omerc", "Hotine Oblique Mercator", ell,
                params=(
                    ("k_0", float(attrs.get(
                        "scale_factor_at_projection_origin", 1.0))),
                    ("lat_0", float(attrs.get(
                        "latitude_of_projection_origin", 0.0))),
                    ("lonc", float(attrs.get(
                        "longitude_of_projection_origin", 0.0))),
                    ("alpha", alpha),
                    ("gamma", float(attrs.get(
                        "rectified_grid_angle", alpha))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "polar_stereographic":
            lat_0 = float(attrs.get("latitude_of_projection_origin", 90.0))
            lat_ts = attrs.get("standard_parallel")
            sf = attrs.get("scale_factor_at_projection_origin")
            if lat_ts is None:
                # CF variant A: scale factor at the pole, no standard
                # parallel (UPS et al.)
                lat_ts = lat_0
            params = [
                ("lat_0", lat_0),
                ("lat_ts", float(lat_ts)),
                ("lon_0", float(attrs.get(
                    "straight_vertical_longitude_from_pole", 0.0))),
                ("x_0", float(attrs.get("false_easting", 0.0))),
                ("y_0", float(attrs.get("false_northing", 0.0))),
            ]
            if sf is not None:
                params.insert(2, ("k_0", float(sf)))
            return CRS(
                "stere", "Polar Stereographic", ell,
                params=tuple(params),
            )
        if gmn == "albers_conical_equal_area":
            sp = attrs.get("standard_parallel")
            if isinstance(sp, (list, tuple)):
                lat_1 = float(sp[0])
                lat_2 = float(sp[1]) if len(sp) > 1 else lat_1
            else:
                lat_1 = lat_2 = float(sp)
            return CRS(
                "aea", "Albers Equal Area", ell,
                params=(
                    ("lat_1", lat_1),
                    ("lat_2", lat_2),
                    ("lat_0", float(attrs.get(
                        "latitude_of_projection_origin", 0.0))),
                    ("lon_0", float(attrs.get(
                        "longitude_of_central_meridian", 0.0))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "lambert_conformal_conic":
            sp = attrs.get("standard_parallel")
            if isinstance(sp, (list, tuple)):
                lat_1 = float(sp[0])
                lat_2 = float(sp[1]) if len(sp) > 1 else lat_1
            else:
                lat_1 = lat_2 = float(sp)
            return CRS(
                "lcc", "Lambert Conformal Conic", ell,
                params=(
                    ("lat_1", lat_1),
                    ("lat_2", lat_2),
                    ("lat_0", float(attrs.get(
                        "latitude_of_projection_origin", 0.0))),
                    ("lon_0", float(attrs.get(
                        "longitude_of_central_meridian", 0.0))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "rotated_latitude_longitude":
            return CRS(
                "rot_pole", "Rotated Latitude/Longitude", ell,
                params=(
                    ("pole_lat", float(attrs["grid_north_pole_latitude"])),
                    ("pole_lon", float(attrs["grid_north_pole_longitude"])),
                ),
            )
        if gmn == "geostationary":
            sweep = attrs.get("sweep_angle_axis")
            if sweep is None:
                # legacy CF: fixed_angle_axis is the OTHER axis
                fixed = attrs.get("fixed_angle_axis", "x")
                sweep = "y" if fixed == "x" else "x"
            return CRS(
                "geos", "Geostationary", ell,
                params=(
                    ("h", float(attrs["perspective_point_height"])),
                    ("lon_0", float(attrs.get(
                        "longitude_of_projection_origin", 0.0))),
                    ("sweep_x", 1.0 if sweep == "x" else 0.0),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "orthographic":
            return CRS(
                "ortho", "Orthographic", ell,
                params=(
                    ("lat_0", float(attrs.get(
                        "latitude_of_projection_origin", 0.0))),
                    ("lon_0", float(attrs.get(
                        "longitude_of_projection_origin", 0.0))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "stereographic":
            # CF's general (oblique) stereographic -- pyproj lowers it
            # onto +proj=stere; a polar origin IS the polar kind
            lat_0 = float(attrs.get("latitude_of_projection_origin", 0.0))
            k_0 = float(attrs.get(
                "scale_factor_at_projection_origin", 1.0))
            lon_0 = float(attrs.get(
                "longitude_of_projection_origin", 0.0))
            fe = float(attrs.get("false_easting", 0.0))
            fn = float(attrs.get("false_northing", 0.0))
            if abs(abs(lat_0) - 90.0) < 1e-12:
                return CRS(
                    "stere", "Polar Stereographic", ell,
                    params=(("k_0", k_0), ("lat_0", lat_0),
                            ("lat_ts", lat_0), ("lon_0", lon_0),
                            ("x_0", fe), ("y_0", fn)),
                )
            return CRS(
                "stere_obl", "Stereographic", ell,
                params=(("k_0", k_0), ("lat_0", lat_0),
                        ("lon_0", lon_0), ("x_0", fe), ("y_0", fn)),
            )
        if gmn == "vertical_perspective":
            return CRS(
                "nsper", "Vertical Perspective", ell,
                params=(
                    ("h", float(attrs["perspective_point_height"])),
                    ("lat_0", float(attrs.get(
                        "latitude_of_projection_origin", 0.0))),
                    ("lon_0", float(attrs.get(
                        "longitude_of_projection_origin", 0.0))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "azimuthal_equidistant":
            return CRS(
                "aeqd", "Azimuthal Equidistant", ell,
                params=(
                    ("lat_0", float(attrs.get(
                        "latitude_of_projection_origin", 0.0))),
                    ("lon_0", float(attrs.get(
                        "longitude_of_projection_origin", 0.0))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "sinusoidal":
            radius = attrs.get("earth_radius")
            if radius is not None:  # spherical (MODIS-style) grid
                ell = _Ellipsoid(float(radius), float("inf"))
            return CRS(
                "sinu", "Sinusoidal", ell,
                params=(
                    ("lon_0", float(attrs.get(
                        "longitude_of_projection_origin",
                        attrs.get("longitude_of_central_meridian", 0.0)))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "mercator":
            if "scale_factor_at_projection_origin" in attrs:
                # ellipsoidal Mercator 1SP (EPSG method 9804)
                return CRS(
                    "merc", "Mercator", ell,
                    params=(
                        ("k_0", float(
                            attrs["scale_factor_at_projection_origin"])),
                        ("lon_0", float(attrs.get(
                            "longitude_of_projection_origin", 0.0))),
                        ("x_0", float(attrs.get("false_easting", 0.0))),
                        ("y_0", float(attrs.get("false_northing", 0.0))),
                    ),
                )
            return CRS(
                "webmerc", "Mercator (spherical)", ell,
                params=(
                    ("lon_0", float(attrs.get(
                        "longitude_of_projection_origin", 0.0))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "lambert_cylindrical_equal_area":
            sp = attrs.get("standard_parallel", 0.0)
            if isinstance(sp, (list, tuple)):
                sp = sp[0]
            return CRS(
                "cea", "Lambert Cylindrical Equal Area", ell,
                params=(
                    ("lat_ts", float(sp)),
                    ("lon_0", float(attrs.get(
                        "longitude_of_central_meridian", 0.0))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if gmn == "equidistant_cylindrical":
            sp = attrs.get("standard_parallel", 0.0)
            if isinstance(sp, (list, tuple)):
                sp = sp[0]
            return CRS(
                "eqc", "Equidistant Cylindrical", ell,
                params=(
                    ("lat_ts", float(sp)),
                    ("lon_0", float(attrs.get(
                        "longitude_of_central_meridian", 0.0))),
                    ("x_0", float(attrs.get("false_easting", 0.0))),
                    ("y_0", float(attrs.get("false_northing", 0.0))),
                ),
            )
        if "crs_wkt" in attrs:
            # unsupported-by-CF-name method with a parsable WKT twin
            from .wkt import crs_from_wkt
            return crs_from_wkt(attrs["crs_wkt"])
        raise ValueError(f"unsupported CF grid mapping: {gmn!r}")

    # ------------------------------------------------------------------ #
    # properties / serialization

    @property
    def is_geographic(self) -> bool:
        # rotated-pole grids are degree-based like pyproj's is_geographic;
        # the Transformer still rotates them to/from true lon-lat
        return self.kind in ("geographic", "rot_pole")

    def param(self, key: str, default: float = 0.0) -> float:
        for k, v in self.params:
            if k == key:
                return v
        return default

    def equals(self, other: "CRS") -> bool:
        if self is other:
            return True
        return (
            self.kind == other.kind
            and self.name == other.name
            and self.ellipsoid == other.ellipsoid
            and self.params == other.params
            and self.towgs84 == other.towgs84
        )

    def __eq__(self, other) -> bool:  # match pyproj CRS == semantics loosely
        return isinstance(other, CRS) and self.equals(other)

    def __hash__(self):
        return hash((self.kind, self.name, self.ellipsoid, self.params,
                     self.towgs84))

    def to_spec(self) -> str:
        """Compact string spec, safe to ship to executors."""
        p = ";".join(f"{k}={v!r}" for k, v in self.params)
        tw = ",".join(repr(v) for v in self.towgs84)
        return (
            f"{self.kind}|{self.name}|{self.ellipsoid.a}|{self.ellipsoid.inv_f}|{p}"
            f"|{self.auth_code or ''}|{tw}"
        )

    @staticmethod
    def from_spec(spec: str) -> "CRS":
        parts = spec.split("|")
        kind, name, a, inv_f, p, auth = parts[:6]
        tw = parts[6] if len(parts) > 6 else ""
        params = tuple(
            (kv.split("=")[0], float(kv.split("=")[1]))
            for kv in p.split(";")
            if kv
        )
        return CRS(kind, name, _Ellipsoid(float(a), float(inv_f)), params,
                   auth or None,
                   tuple(float(v) for v in tw.split(",") if v))

    def to_wkt(self) -> str:
        """ISO 19162 WKT2 text (parity: pyproj CRS.to_wkt); see
        wkt.crs_to_wkt for the closure guarantee."""
        from .wkt import crs_to_wkt
        return crs_to_wkt(self)

    def to_proj(self) -> str:
        """PROJ string (parity: pyproj CRS.to_proj4)."""
        from .wkt import crs_to_proj
        return crs_to_proj(self)

    def to_cf(self) -> dict:
        """CF grid-mapping attributes (sink-side metadata; parity:
        reference utils.py:147 `gm.crs.to_cf()`).

        Like pyproj, the result carries a ``crs_wkt`` attribute
        alongside the named CF keys whenever the projection has a WKT
        form; methods CF has no grid_mapping_name for (e.g. Krovak)
        emit ``crs_wkt`` alone, which ``from_cf`` parses back."""
        try:
            attrs = self._to_cf_named()
        except ValueError:
            attrs = dict(
                semi_major_axis=self.ellipsoid.a,
                inverse_flattening=self.ellipsoid.inv_f,
            )
        try:
            attrs["crs_wkt"] = self.to_wkt()
        except ValueError:
            pass  # rotated pole: CF-named only
        return attrs

    def _to_cf_named(self) -> dict:
        if self.ellipsoid.e2 == 0.0:
            # CF prescribes earth_radius for spherical figures; an
            # inverse_flattening of inf would also serialize as the
            # non-strict-JSON token Infinity in .zattrs
            ell = dict(earth_radius=self.ellipsoid.a)
        else:
            ell = dict(
                semi_major_axis=self.ellipsoid.a,
                inverse_flattening=self.ellipsoid.inv_f,
            )
        if self.kind == "geographic":
            return dict(grid_mapping_name="latitude_longitude", **ell)
        if self.kind == "tmerc":
            if self.param("south_orient", 0.0):
                # CF has no south-orientated TM mapping; emitting the
                # plain transverse_mercator keys would silently flip the
                # Lo grids' axes -> fall back to crs_wkt-only attrs
                raise ValueError(
                    "transverse_mercator (south orientated) has no CF "
                    "grid_mapping_name; carried via crs_wkt")
            return dict(
                grid_mapping_name="transverse_mercator",
                scale_factor_at_central_meridian=self.param("k_0", 1.0),
                latitude_of_projection_origin=self.param("lat_0"),
                longitude_of_central_meridian=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "laea":
            return dict(
                grid_mapping_name="lambert_azimuthal_equal_area",
                latitude_of_projection_origin=self.param("lat_0"),
                longitude_of_projection_origin=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "stere":
            d = dict(
                grid_mapping_name="polar_stereographic",
                latitude_of_projection_origin=self.param("lat_0"),
                straight_vertical_longitude_from_pole=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
            # CF: EITHER standard_parallel OR
            # scale_factor_at_projection_origin.  Variant A (EPSG 9810,
            # UPS: k_0 at the pole) must carry the scale factor -- a
            # standard_parallel=90 roundtrip would silently drop k_0
            if (abs(self.param("lat_ts", 90.0)) >= 90.0 - 1e-12
                    and self.param("k_0", 1.0) != 1.0):
                d["scale_factor_at_projection_origin"] = \
                    self.param("k_0")
            else:
                d["standard_parallel"] = self.param("lat_ts")
            return d
        if self.kind == "webmerc":
            return dict(
                grid_mapping_name="mercator",
                longitude_of_projection_origin=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "merc":
            return dict(
                grid_mapping_name="mercator",
                scale_factor_at_projection_origin=self.param("k_0", 1.0),
                longitude_of_projection_origin=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "cea":
            return dict(
                grid_mapping_name="lambert_cylindrical_equal_area",
                standard_parallel=self.param("lat_ts"),
                longitude_of_central_meridian=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "eqc":
            # name used by PROJ/CF discussions; CF 1.x has no canonical
            # equidistant-cylindrical mapping
            return dict(
                grid_mapping_name="equidistant_cylindrical",
                standard_parallel=self.param("lat_ts"),
                longitude_of_central_meridian=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "rot_pole":
            return dict(
                grid_mapping_name="rotated_latitude_longitude",
                grid_north_pole_latitude=self.param("pole_lat"),
                grid_north_pole_longitude=self.param("pole_lon"),
                **ell,
            )
        if self.kind == "aea":
            return dict(
                grid_mapping_name="albers_conical_equal_area",
                standard_parallel=[self.param("lat_1"),
                                   self.param("lat_2")],
                latitude_of_projection_origin=self.param("lat_0"),
                longitude_of_central_meridian=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "geos":
            return dict(
                grid_mapping_name="geostationary",
                perspective_point_height=self.param("h"),
                longitude_of_projection_origin=self.param("lon_0"),
                sweep_angle_axis="x" if self.param("sweep_x") else "y",
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "stere_obl":
            return dict(
                grid_mapping_name="stereographic",
                scale_factor_at_projection_origin=self.param("k_0", 1.0),
                latitude_of_projection_origin=self.param("lat_0"),
                longitude_of_projection_origin=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "nsper":
            return dict(
                grid_mapping_name="vertical_perspective",
                perspective_point_height=self.param("h"),
                latitude_of_projection_origin=self.param("lat_0"),
                longitude_of_projection_origin=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "aeqd":
            return dict(
                grid_mapping_name="azimuthal_equidistant",
                latitude_of_projection_origin=self.param("lat_0"),
                longitude_of_projection_origin=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "ortho":
            return dict(
                grid_mapping_name="orthographic",
                latitude_of_projection_origin=self.param("lat_0"),
                longitude_of_projection_origin=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "sinu":
            return dict(
                grid_mapping_name="sinusoidal",
                longitude_of_projection_origin=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "omerc":
            return dict(
                grid_mapping_name="oblique_mercator",
                azimuth_of_central_line=self.param("alpha"),
                # CF has no rectified-grid-angle attribute; GDAL/PROJ
                # write it alongside, and from_cf reads it back
                rectified_grid_angle=self.param(
                    "gamma", self.param("alpha")
                ),
                latitude_of_projection_origin=self.param("lat_0"),
                longitude_of_projection_origin=self.param("lonc"),
                scale_factor_at_projection_origin=self.param("k_0", 1.0),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "somerc":
            # CF has no Swiss grid-mapping name; GDAL's netCDF driver
            # round-trips method 9814 under this de-facto extension name
            return dict(
                grid_mapping_name="swiss_oblique_cylindrical",
                latitude_of_projection_origin=self.param("lat_0"),
                longitude_of_projection_origin=self.param("lon_0"),
                scale_factor_at_projection_origin=self.param("k_0", 1.0),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        if self.kind == "lcc":
            return dict(
                grid_mapping_name="lambert_conformal_conic",
                standard_parallel=[self.param("lat_1"),
                                   self.param("lat_2")],
                latitude_of_projection_origin=self.param("lat_0"),
                longitude_of_central_meridian=self.param("lon_0"),
                false_easting=self.param("x_0"),
                false_northing=self.param("y_0"),
                **ell,
            )
        raise ValueError(self.kind)


CRS_WGS84 = CRS("geographic", "WGS 84", _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
                auth_code="EPSG:4326")
CRS_CRS84 = CRS("geographic", "WGS 84 (CRS84)",
                _Ellipsoid(*_ELLIPSOIDS["WGS84"]), auth_code="OGC:CRS84")
# The MODIS land-product grid: sinusoidal on the authalic sphere
# R = 6371007.181 m (inv_f = inf -> e2 == 0, spherical formulas)
CRS_SINU_MODIS = CRS(
    "sinu", "MODIS Sinusoidal (sphere)",
    _Ellipsoid(6371007.181, float("inf")),
    params=(("lon_0", 0.0), ("x_0", 0.0), ("y_0", 0.0)),
    auth_code="SR-ORG:6974",
)


# ---------------------------------------------------------------------- #
# Transverse Mercator (Krueger series, order n^6)

def _tm_coeffs(n: float):
    n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
    alpha = (
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
        + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
        - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
        + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 319334400,
    )
    beta = (
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
        + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
        - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800,
    )
    rect_a = 1 + n2 / 4 + n4 / 64 + n6 / 256
    return alpha, beta, rect_a


def _tmerc_forward(crs: CRS, lon, lat):
    ell = crs.ellipsoid
    e = ell.e
    n = ell.n
    alpha, _, rect_a = _tm_coeffs(n)
    big_a = ell.a / (1 + n) * rect_a
    k0 = crs.param("k_0", 1.0)
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")

    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    # wrap into (-pi, pi]
    lam = np.arctan2(np.sin(lam), np.cos(lam))

    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - e * np.arctanh(e * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a_j in enumerate(alpha, start=1):
        xi += a_j * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a_j * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    x = fe + k0 * big_a * eta
    y = fn + k0 * big_a * xi
    # meridian-origin offset: subtract northing of lat_0 if non-zero
    lat0 = crs.param("lat_0")
    if lat0 != 0.0:
        y0 = _tmerc_forward_scalar_northing(crs, lat0)
        y = y - y0 + fn  # forward already added fn; keep single fn
    if crs.param("south_orient", 0.0):
        # EPSG 9808 (Transverse Mercator South Orientated, the South
        # African Lo grids): axes run westing/southing -- reflect about
        # the false origin (Lo grids have FE = FN = 0, so this is plain
        # negation of the natural-origin easting/northing)
        x = 2.0 * fe - x
        y = 2.0 * fn - y
    return x, y


def _tmerc_forward_scalar_northing(crs: CRS, lat0: float) -> float:
    # northing of (lat0, lon0) with false northing included; computed
    # north-orientated (south_orient reflects AFTER this offset)
    crs0 = CRS(crs.kind, crs.name, crs.ellipsoid,
               tuple((k, (0.0 if k in ("lat_0", "south_orient") else v))
                     for k, v in crs.params))
    _, y = _tmerc_forward(crs0, np.array([crs.param("lon_0")]),
                          np.array([lat0]))
    return float(y[0])


def _wrap_lon(lon):
    """Wrap longitudes into [-180, 180].

    Values already in range (including the exact +/-180 boundary) pass
    through bit-identically; only |lon| > 180 is shifted by the nearest
    multiple of 360. Every projection inverse must end with this so the
    fwd->inv closure holds for lon_0 != 0 CRSs near the antimeridian
    (e.g. EPSG:3035 at lon -171 would otherwise invert to +189).
    """
    lon = np.asarray(lon, dtype=np.float64)
    out = np.abs(lon) > 180.0
    if np.any(out):
        lon = np.where(out, lon - 360.0 * np.round(lon / 360.0), lon)
    return lon


def _tmerc_inverse(crs: CRS, x, y):
    ell = crs.ellipsoid
    e = ell.e
    n = ell.n
    _, beta, rect_a = _tm_coeffs(n)
    big_a = ell.a / (1 + n) * rect_a
    k0 = crs.param("k_0", 1.0)
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    lat0 = crs.param("lat_0")
    x = np.asarray(x, dtype=np.float64)
    y_adj = np.asarray(y, dtype=np.float64)
    if crs.param("south_orient", 0.0):
        # undo the EPSG 9808 westing/southing reflection first
        x = 2.0 * fe - x
        y_adj = 2.0 * fn - y_adj
    if lat0 != 0.0:
        y_adj = y_adj + (_tmerc_forward_scalar_northing(crs, lat0) - fn)

    xi = (y_adj - fn) / (k0 * big_a)
    eta = (x - fe) / (k0 * big_a)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b_j in enumerate(beta, start=1):
        xi_p -= b_j * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b_j * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # invert conformal latitude chi -> geographic latitude phi by fixed point:
    # sin(phi) = tanh( atanh(sin chi) + e * atanh(e * sin(phi)) )
    psi = np.arctanh(np.sin(chi))
    s = np.sin(chi)
    for _ in range(12):
        s = np.tanh(psi + e * np.arctanh(e * s))
    phi = np.arcsin(np.clip(s, -1.0, 1.0))
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Lambert Azimuthal Equal Area (EPSG method 9820, ellipsoidal oblique)

def _laea_setup(crs: CRS):
    ell = crs.ellipsoid
    e, e2 = ell.e, ell.e2
    lat0 = math.radians(crs.param("lat_0"))

    def q_of(sphi):
        return (1 - e2) * (
            sphi / (1 - e2 * sphi * sphi)
            - (1 / (2 * e)) * np.log((1 - e * sphi) / (1 + e * sphi))
        )

    qp = q_of(1.0)
    s0 = math.sin(lat0)
    q0 = q_of(s0)
    beta0 = math.asin(q0 / qp)
    rq = ell.a * math.sqrt(qp / 2)
    d = ell.a * (math.cos(lat0) / math.sqrt(1 - e2 * s0 * s0)) / (
        rq * math.cos(beta0))
    return q_of, qp, beta0, rq, d


def _laea_forward(crs: CRS, lon, lat):
    q_of, qp, beta0, rq, d = _laea_setup(crs)
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    lam = np.arctan2(np.sin(lam), np.cos(lam))
    q = q_of(np.sin(phi))
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    b = rq * np.sqrt(
        2.0 / (1 + math.sin(beta0) * np.sin(beta)
               + math.cos(beta0) * np.cos(beta) * np.cos(lam))
    )
    x = fe + (b * d) * (np.cos(beta) * np.sin(lam))
    y = fn + (b / d) * (
        math.cos(beta0) * np.sin(beta)
        - math.sin(beta0) * np.cos(beta) * np.cos(lam)
    )
    return x, y


def _laea_inverse(crs: CRS, x, y):
    q_of, qp, beta0, rq, d = _laea_setup(crs)
    ell = crs.ellipsoid
    e2 = ell.e2
    e4, e6 = e2 * e2, e2 * e2 * e2
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    xr = (np.asarray(x, dtype=np.float64) - fe) / d
    yr = (np.asarray(y, dtype=np.float64) - fn) * d
    rho = np.sqrt(xr * xr + yr * yr)
    with np.errstate(invalid="ignore", divide="ignore"):
        c = 2 * np.arcsin(np.clip(rho / (2 * rq), -1.0, 1.0))
        beta_p = np.arcsin(np.clip(
            np.cos(c) * math.sin(beta0)
            + (yr * np.sin(c) * math.cos(beta0)) / rho, -1.0, 1.0))
        lam = np.arctan2(
            xr * np.sin(c),
            rho * math.cos(beta0) * np.cos(c)
            - yr * math.sin(beta0) * np.sin(c),
        )
    # at the projection center rho == 0
    center = rho == 0
    if np.any(center):
        beta_p = np.where(center, beta0, beta_p)
        lam = np.where(center, 0.0, lam)
    phi = (
        beta_p
        + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * np.sin(2 * beta_p)
        + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta_p)
        + (761 * e6 / 45360) * np.sin(6 * beta_p)
    )
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Spherical web / pseudo Mercator (EPSG method 1024)

def _webmerc_forward(crs: CRS, lon, lat):
    a = crs.ellipsoid.a
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    x = fe + a * lam
    y = fn + a * np.log(np.tan(np.pi / 4 + phi / 2))
    return x, y


def _webmerc_inverse(crs: CRS, x, y):
    a = crs.ellipsoid.a
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    lam = (np.asarray(x, dtype=np.float64) - fe) / a
    phi = np.pi / 2 - 2 * np.arctan(
        np.exp(-(np.asarray(y, dtype=np.float64) - fn) / a)
    )
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Polar Stereographic, variant B (EPSG method 9829; Snyder 1987 sec. 21)

def _stere_setup(crs: CRS):
    ell = crs.ellipsoid
    e = ell.e
    south = crs.param("lat_0") < 0
    lat_ts = abs(crs.param("lat_ts", 90.0))
    phi_c = math.radians(lat_ts)

    def t_of(phi):
        s = np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) * (
            (1 + e * s) / (1 - e * s)
        ) ** (e / 2)

    if lat_ts >= 90.0 - 1e-12:
        # variant A: k0 at the pole; rho = 2 a k0 t / sqrt((1+e)^(1+e)(1-e)^(1-e))
        k0 = crs.param("k_0", 1.0)
        denom = math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
        rho_factor = 2 * ell.a * k0 / denom
    else:
        m_c = math.cos(phi_c) / math.sqrt(
            1 - ell.e2 * math.sin(phi_c) ** 2
        )
        rho_factor = ell.a * m_c / float(t_of(np.float64(phi_c)))
    return t_of, rho_factor, south


def _stere_forward(crs: CRS, lon, lat):
    t_of, rho_factor, south = _stere_setup(crs)
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if south:
        # Snyder: south aspect = north formulas with reversed signs of
        # x, y, phi, lambda, lambda0
        lam = np.radians(-(lon - lon0))
        phi = np.radians(-lat)
    else:
        lam = np.radians(lon - lon0)
        phi = np.radians(lat)
    lam = np.arctan2(np.sin(lam), np.cos(lam))
    rho = rho_factor * t_of(phi)
    x = rho * np.sin(lam)
    y = -rho * np.cos(lam)
    if south:
        x, y = -x, -y
    return fe + x, fn + y


def _stere_inverse(crs: CRS, x, y):
    t_of, rho_factor, south = _stere_setup(crs)
    ell = crs.ellipsoid
    e2 = ell.e2
    e4, e6, e8 = e2 * e2, e2 ** 3, e2 ** 4
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    xr = np.asarray(x, dtype=np.float64) - fe
    yr = np.asarray(y, dtype=np.float64) - fn
    if south:
        xr, yr = -xr, -yr
    rho = np.hypot(xr, yr)
    t = rho / rho_factor
    chi = np.pi / 2 - 2 * np.arctan(t)
    # conformal -> geographic latitude series (Snyder 3-5)
    phi = (
        chi
        + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * np.sin(2 * chi)
        + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * np.sin(4 * chi)
        + (7 * e6 / 120 + 81 * e8 / 1120) * np.sin(6 * chi)
        + (4279 * e8 / 161280) * np.sin(8 * chi)
    )
    lam = np.arctan2(xr, -yr)
    lam = np.where(rho == 0, 0.0, lam)
    if south:
        lon, lat = lon0 - np.degrees(lam), -np.degrees(phi)
    else:
        lon, lat = lon0 + np.degrees(lam), np.degrees(phi)
    # wrap to (-180, 180]
    lon = np.where(lon > 180.0, lon - 360.0,
                   np.where(lon <= -180.0, lon + 360.0, lon))
    return lon, lat


# ---------------------------------------------------------------------- #
# Oblique (double) Stereographic (EPSG method 9809; PROJ 'sterea'):
# geographic -> conformal sphere -> spherical stereographic.  The Dutch
# RD grid (Amersfoort / EPSG:28992) and several other national grids.
# Formulas per EPSG Guidance Note 7-2 sec. "Oblique and Equatorial
# Stereographic".


def _sterea_setup(crs: CRS):
    ell = crs.ellipsoid
    e, e2 = ell.e, ell.e2
    lat0 = math.radians(crs.param("lat_0"))
    s0, c0 = math.sin(lat0), math.cos(lat0)
    # Gaussian radius and conformal-sphere constants at the origin
    rho0 = ell.a * (1 - e2) / (1 - e2 * s0 * s0) ** 1.5
    nu0 = ell.a / math.sqrt(1 - e2 * s0 * s0)
    r = math.sqrt(rho0 * nu0)
    n = math.sqrt(1 + e2 * c0 ** 4 / (1 - e2))
    s1 = (1 + s0) / (1 - s0)
    s2 = (1 - e * s0) / (1 + e * s0)
    w1 = (s1 * s2 ** e) ** n
    sin_chi00 = (w1 - 1) / (w1 + 1)
    c = (n + s0) * (1 - sin_chi00) / ((n - s0) * (1 + sin_chi00))
    w2 = c * w1
    chi0 = math.asin((w2 - 1) / (w2 + 1))
    return ell, r, n, c, chi0, lat0


def _sterea_forward(crs: CRS, lon, lat):
    ell, r, n, c, chi0, _ = _sterea_setup(crs)
    e = ell.e
    k0 = crs.param("k_0", 1.0)
    lam0 = math.radians(crs.param("lon_0"))
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    # conformal longitude: LAMBDA = n(lam - lam0) + lam0, differenced
    # against LAMBDA0 = lam0 -> n * wrapped(lam - lam0)
    dl = np.arctan2(np.sin(lam - lam0), np.cos(lam - lam0)) * n
    s = np.sin(phi)
    pole = np.abs(s) >= 1.0
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        sa = (1 + s) / (1 - s)
        sb = (1 - e * s) / (1 + e * s)
        w = c * (sa * sb ** e) ** n
        chi = np.arcsin(np.clip((w - 1) / (w + 1), -1.0, 1.0))
    if np.any(pole):
        chi = np.where(pole, np.sign(s) * (np.pi / 2), chi)
    b = 1 + np.sin(chi) * math.sin(chi0) \
        + np.cos(chi) * math.cos(chi0) * np.cos(dl)
    x = fe + 2 * r * k0 * np.cos(chi) * np.sin(dl) / b
    y = fn + 2 * r * k0 * (
        np.sin(chi) * math.cos(chi0)
        - np.cos(chi) * math.sin(chi0) * np.cos(dl)
    ) / b
    return x, y


def _sterea_inverse(crs: CRS, x, y):
    ell, r, n, c, chi0, _ = _sterea_setup(crs)
    e, e2 = ell.e, ell.e2
    k0 = crs.param("k_0", 1.0)
    lam0 = math.radians(crs.param("lon_0"))
    fe, fn = crs.param("x_0"), crs.param("y_0")
    xr = np.asarray(x, dtype=np.float64) - fe
    yr = np.asarray(y, dtype=np.float64) - fn
    g = 2 * r * k0 * math.tan(np.pi / 4 - chi0 / 2)
    h = 4 * r * k0 * math.tan(chi0) + g
    i = np.arctan2(xr, h + yr)
    j = np.arctan2(xr, g - yr) - i
    chi = chi0 + 2 * np.arctan((yr - xr * np.tan(j / 2)) / (2 * r * k0))
    dl = (j + 2 * i) / n
    # conformal -> geographic latitude: invert the isometric latitude
    # psi(phi) = psi_chi by EPSG's fixed-point iteration
    sin_chi = np.sin(chi)
    psi = 0.5 * np.log((1 + sin_chi) / (c * (1 - sin_chi))) / n
    phi = 2 * np.arctan(np.exp(psi)) - np.pi / 2
    for _ in range(8):
        es = e * np.sin(phi)
        psi_i = np.log(
            np.tan(phi / 2 + np.pi / 4) * ((1 - es) / (1 + es)) ** (e / 2)
        )
        phi = phi - (psi_i - psi) * np.cos(phi) * (
            1 - es * es) / (1 - e2)
    return (
        _wrap_lon(np.degrees(dl + lam0)),
        np.degrees(phi),
    )


# ---------------------------------------------------------------------- #
# Oblique/equatorial Stereographic, PROJ 'stere' semantics (CF
# 'stereographic'): conformal latitude chi + spherical stereographic,
# akm1 = 2 a k0 cos(phi0)/sqrt(1 - e2 sin^2 phi0) -- exactly PROJ's
# e_forward/e_inverse oblique branch, which is what pyproj produces for
# a CF 'stereographic' grid mapping.  (Polar aspects are the separate
# EPSG 9810/9829 'stere' kind; the Gaussian-sphere double stereographic
# EPSG 9809 is 'sterea'.)


def _conformal_lat(ell: _Ellipsoid, phi):
    """chi(phi): conformal latitude (Snyder 3-1)."""
    e = ell.e
    s = np.sin(phi)
    t = np.tan(np.pi / 4 + phi / 2) * (
        (1 - e * s) / (1 + e * s)) ** (e / 2)
    return 2 * np.arctan(t) - np.pi / 2


def _stere_obl_setup(crs: CRS):
    ell = crs.ellipsoid
    lat0 = math.radians(crs.param("lat_0"))
    k0 = crs.param("k_0", 1.0)
    s0 = math.sin(lat0)
    chi0 = float(_conformal_lat(ell, np.float64(lat0)))
    akm1 = 2 * ell.a * k0 * math.cos(lat0) / math.sqrt(
        1 - ell.e2 * s0 * s0)
    return ell, chi0, akm1


def _stere_obl_forward(crs: CRS, lon, lat):
    ell, chi0, akm1 = _stere_obl_setup(crs)
    lon0 = math.radians(crs.param("lon_0"))
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    dl = np.arctan2(np.sin(lam - lon0), np.cos(lam - lon0))
    chi = _conformal_lat(ell, phi)
    sc0, cc0 = math.sin(chi0), math.cos(chi0)
    a_fac = akm1 / (cc0 * (
        1 + sc0 * np.sin(chi) + cc0 * np.cos(chi) * np.cos(dl)))
    x = fe + a_fac * np.cos(chi) * np.sin(dl)
    y = fn + a_fac * (cc0 * np.sin(chi) - sc0 * np.cos(chi) * np.cos(dl))
    return x, y


def _stere_obl_inverse(crs: CRS, x, y):
    ell, chi0, akm1 = _stere_obl_setup(crs)
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    xr = np.asarray(x, dtype=np.float64) - fe
    yr = np.asarray(y, dtype=np.float64) - fn
    rho = np.hypot(xr, yr)
    sc0, cc0 = math.sin(chi0), math.cos(chi0)
    # rho = (akm1/cos chi0) tan(c/2)  ->  c
    c = 2 * np.arctan2(rho * cc0, akm1)
    sin_c, cos_c = np.sin(c), np.cos(c)
    with np.errstate(invalid="ignore", divide="ignore"):
        chi = np.arcsin(np.clip(
            cos_c * sc0 + yr * sin_c * cc0 / np.where(rho > 0, rho, 1.0),
            -1.0, 1.0))
        lam = np.arctan2(
            xr * sin_c, rho * cc0 * cos_c - yr * sc0 * sin_c)
    center = rho == 0
    if np.any(center):
        chi = np.where(center, chi0, chi)
        lam = np.where(center, 0.0, lam)
    phi = _conformal_to_geographic(ell, chi)
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Vertical (near-side) Perspective, spherical (PROJ 'nsper'; CF
# 'vertical_perspective').  Snyder 1987 sec. 23: the view from a finite
# height h above the origin; only the cap cos(c) >= 1/P is visible,
# P = 1 + h/R.  Like PROJ, spherical math on R = a.


def _nsper_setup(crs: CRS):
    r = crs.ellipsoid.a
    p = 1.0 + crs.param("h") / r
    lat0 = math.radians(crs.param("lat_0"))
    return r, p, lat0


def _nsper_forward(crs: CRS, lon, lat):
    r, p, lat0 = _nsper_setup(crs)
    lon0 = math.radians(crs.param("lon_0"))
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    dl = np.arctan2(np.sin(lam - lon0), np.cos(lam - lon0))
    s0, c0 = math.sin(lat0), math.cos(lat0)
    cos_c = s0 * np.sin(phi) + c0 * np.cos(phi) * np.cos(dl)
    with np.errstate(invalid="ignore", divide="ignore"):
        k = (p - 1) / (p - cos_c)                       # Snyder 23-3
    k = np.where(cos_c >= 1.0 / p, k, np.nan)           # far side -> NaN
    x = fe + r * k * np.cos(phi) * np.sin(dl)
    y = fn + r * k * (c0 * np.sin(phi) - s0 * np.cos(phi) * np.cos(dl))
    return x, y


def _nsper_inverse(crs: CRS, x, y):
    r, p, lat0 = _nsper_setup(crs)
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    xr = np.asarray(x, dtype=np.float64) - fe
    yr = np.asarray(y, dtype=np.float64) - fn
    rho = np.hypot(xr, yr) / r
    # solve (P-1) sin c + rho cos c = rho P for the near-side root
    aa = p - 1.0
    with np.errstate(invalid="ignore", divide="ignore"):
        disc = aa * aa * p * p - (aa * aa + rho * rho) * (p * p - 1.0)
        sin_c = rho * (aa * p - np.sqrt(disc)) / (aa * aa + rho * rho)
    sin_c = np.clip(sin_c, -1.0, 1.0)
    cos_c = np.sqrt(np.clip(1.0 - sin_c * sin_c, 0.0, 1.0))
    s0, c0 = math.sin(lat0), math.cos(lat0)
    with np.errstate(invalid="ignore", divide="ignore"):
        phi = np.arcsin(np.clip(
            cos_c * s0 + yr / r * sin_c * c0 / np.where(rho > 0, rho, 1.0),
            -1.0, 1.0))
        lam = np.arctan2(
            xr / r * sin_c,
            rho * c0 * cos_c - yr / r * s0 * sin_c)
    center = rho == 0
    if np.any(center):
        phi = np.where(center, lat0, phi)
        lam = np.where(center, 0.0, lam)
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Azimuthal Equidistant (PROJ 'aeqd'; CF 'azimuthal_equidistant').
# Three regimes, matching PROJ's dispatch:
#   * spherical ellipsoid -> Snyder sec. 25 closed forms (exact),
#   * polar aspect on an ellipsoid -> rho = |M(pole) - M(phi)| via the
#     meridian arc (exact, Snyder 25-16),
#   * oblique/equatorial aspect on an ellipsoid -> geodesic azimuth +
#     distance from the origin (Vincenty 1975 inverse/direct series;
#     PROJ >= 4.9 likewise projects along true geodesics).  Vincenty's
#     known non-convergence wedge at near-antipodal points (~0.5 deg
#     around the antipode) returns the last iterate -- the antipode is
#     outside every practical aeqd domain.


def _vincenty_inverse(ell: _Ellipsoid, phi1, lam1, phi2, lam2):
    """Geodesic distance s and forward azimuth alpha1 from (phi1, lam1)
    to vectorized (phi2, lam2), radians.  Vincenty 1975 eqs 1-11."""
    f = ell.f
    b = ell.a * (1 - f)
    u1 = np.arctan((1 - f) * np.tan(phi1))
    u2 = np.arctan((1 - f) * np.tan(phi2))
    su1, cu1 = np.sin(u1), np.cos(u1)
    su2, cu2 = np.sin(u2), np.cos(u2)
    ldiff = np.arctan2(np.sin(lam2 - lam1), np.cos(lam2 - lam1))
    lam = ldiff.copy()
    sin_sig = np.zeros_like(lam)
    cos_sig = np.ones_like(lam)
    sig = np.zeros_like(lam)
    sin_alpha = np.zeros_like(lam)
    cos2_alpha = np.ones_like(lam)
    cos_2sigm = np.ones_like(lam)
    with np.errstate(divide="ignore", invalid="ignore"):
        for _ in range(40):
            sl, cl = np.sin(lam), np.cos(lam)
            sin_sig = np.sqrt(
                (cu2 * sl) ** 2 + (cu1 * su2 - su1 * cu2 * cl) ** 2)
            cos_sig = su1 * su2 + cu1 * cu2 * cl
            sig = np.arctan2(sin_sig, cos_sig)
            sin_alpha = np.where(
                sin_sig > 0, cu1 * cu2 * sl / np.where(
                    sin_sig > 0, sin_sig, 1.0), 0.0)
            cos2_alpha = 1.0 - sin_alpha * sin_alpha
            # equatorial geodesics: cos^2 alpha == 0 -> cos(2 sigma_m)
            # unused (C == f/16*0*(...) keeps the term finite with 0)
            cos_2sigm = np.where(
                cos2_alpha > 0,
                cos_sig - 2 * su1 * su2 / np.where(
                    cos2_alpha > 0, cos2_alpha, 1.0),
                0.0)
            cc = f / 16 * cos2_alpha * (4 + f * (4 - 3 * cos2_alpha))
            prev = lam
            lam = ldiff + (1 - cc) * f * sin_alpha * (
                sig + cc * sin_sig * (
                    cos_2sigm + cc * cos_sig * (
                        -1 + 2 * cos_2sigm * cos_2sigm)))
            # non-antipodal points converge in < 6 iterations; the cap
            # only matters inside the documented antipodal wedge
            if np.all(np.abs(lam - prev) < 1e-14):
                break
    uu2 = cos2_alpha * (ell.a ** 2 - b ** 2) / (b ** 2)
    aa = 1 + uu2 / 16384 * (4096 + uu2 * (-768 + uu2 * (320 - 175 * uu2)))
    bb = uu2 / 1024 * (256 + uu2 * (-128 + uu2 * (74 - 47 * uu2)))
    dsig = bb * sin_sig * (
        cos_2sigm + bb / 4 * (
            cos_sig * (-1 + 2 * cos_2sigm ** 2)
            - bb / 6 * cos_2sigm * (-3 + 4 * sin_sig ** 2)
            * (-3 + 4 * cos_2sigm ** 2)))
    s = b * aa * (sig - dsig)
    alpha1 = np.arctan2(cu2 * np.sin(lam), cu1 * su2 - su1 * cu2 * np.cos(lam))
    return s, alpha1


def _vincenty_direct(ell: _Ellipsoid, phi1, lam1, alpha1, s):
    """Destination (phi2, lam2) from start + azimuth + geodesic distance
    (Vincenty 1975 direct, eqs 12-16); radians."""
    f = ell.f
    b = ell.a * (1 - f)
    u1 = np.arctan((1 - f) * np.tan(phi1))
    su1, cu1 = np.sin(u1), np.cos(u1)
    sa1, ca1 = np.sin(alpha1), np.cos(alpha1)
    sig1 = np.arctan2(np.tan(u1), ca1)
    sin_alpha = cu1 * sa1
    cos2_alpha = 1.0 - sin_alpha * sin_alpha
    uu2 = cos2_alpha * (ell.a ** 2 - b ** 2) / (b ** 2)
    aa = 1 + uu2 / 16384 * (4096 + uu2 * (-768 + uu2 * (320 - 175 * uu2)))
    bb = uu2 / 1024 * (256 + uu2 * (-128 + uu2 * (74 - 47 * uu2)))
    sig = s / (b * aa)
    for _ in range(20):
        cos_2sigm = np.cos(2 * sig1 + sig)
        sin_sig, cos_sig = np.sin(sig), np.cos(sig)
        dsig = bb * sin_sig * (
            cos_2sigm + bb / 4 * (
                cos_sig * (-1 + 2 * cos_2sigm ** 2)
                - bb / 6 * cos_2sigm * (-3 + 4 * sin_sig ** 2)
                * (-3 + 4 * cos_2sigm ** 2)))
        prev = sig
        sig = s / (b * aa) + dsig
        if np.all(np.abs(sig - prev) < 1e-14):
            break
    sin_sig, cos_sig = np.sin(sig), np.cos(sig)
    cos_2sigm = np.cos(2 * sig1 + sig)
    phi2 = np.arctan2(
        su1 * cos_sig + cu1 * sin_sig * ca1,
        (1 - f) * np.sqrt(
            sin_alpha ** 2 + (su1 * sin_sig - cu1 * cos_sig * ca1) ** 2))
    lam = np.arctan2(
        sin_sig * sa1, cu1 * cos_sig - su1 * sin_sig * ca1)
    cc = f / 16 * cos2_alpha * (4 + f * (4 - 3 * cos2_alpha))
    ldiff = lam - (1 - cc) * f * sin_alpha * (
        sig + cc * sin_sig * (
            cos_2sigm + cc * cos_sig * (-1 + 2 * cos_2sigm ** 2)))
    return phi2, lam1 + ldiff


def _aeqd_forward(crs: CRS, lon, lat):
    ell = crs.ellipsoid
    lat0 = math.radians(crs.param("lat_0"))
    lon0 = math.radians(crs.param("lon_0"))
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    dl = np.arctan2(np.sin(lam - lon0), np.cos(lam - lon0))
    if ell.e2 == 0.0:
        # Snyder 25-1..25-4: k' = c / sin c
        cos_c = (math.sin(lat0) * np.sin(phi)
                 + math.cos(lat0) * np.cos(phi) * np.cos(dl))
        c = np.arccos(np.clip(cos_c, -1.0, 1.0))
        with np.errstate(invalid="ignore", divide="ignore"):
            k = np.where(c > 0, c / np.sin(c), 1.0)
        x = fe + ell.a * k * np.cos(phi) * np.sin(dl)
        y = fn + ell.a * k * (
            math.cos(lat0) * np.sin(phi)
            - math.sin(lat0) * np.cos(phi) * np.cos(dl))
        return x, y
    if abs(abs(crs.param("lat_0")) - 90.0) < 1e-12:
        sgn = 1.0 if crs.param("lat_0") > 0 else -1.0
        mp = _meridian_arc(ell, np.asarray(sgn * np.pi / 2))
        rho = np.abs(mp - _meridian_arc(ell, phi))
        x = fe + rho * np.sin(dl)
        y = fn - sgn * rho * np.cos(dl)
        return x, y
    s, alpha1 = _vincenty_inverse(ell, lat0, 0.0, phi, dl)
    return fe + s * np.sin(alpha1), fn + s * np.cos(alpha1)


def _aeqd_inverse(crs: CRS, x, y):
    ell = crs.ellipsoid
    lat0 = math.radians(crs.param("lat_0"))
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    xr = np.asarray(x, dtype=np.float64) - fe
    yr = np.asarray(y, dtype=np.float64) - fn
    rho = np.hypot(xr, yr)
    if ell.e2 == 0.0:
        c = rho / ell.a
        with np.errstate(invalid="ignore", divide="ignore"):
            phi = np.arcsin(np.clip(
                np.cos(c) * math.sin(lat0)
                + yr * np.sin(c) * math.cos(lat0) / np.where(
                    rho > 0, rho, 1.0), -1.0, 1.0))
            lam = np.arctan2(
                xr * np.sin(c),
                rho * math.cos(lat0) * np.cos(c)
                - yr * math.sin(lat0) * np.sin(c))
        center = rho == 0
        if np.any(center):
            phi = np.where(center, lat0, phi)
            lam = np.where(center, 0.0, lam)
        return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)
    if abs(abs(crs.param("lat_0")) - 90.0) < 1e-12:
        sgn = 1.0 if crs.param("lat_0") > 0 else -1.0
        mp = float(_meridian_arc(ell, np.asarray(sgn * np.pi / 2)))
        # north: M(phi) = M(pole) - rho; south: M(phi) = M(pole) + rho
        phi = _meridian_arc_inverse(ell, mp - sgn * rho)
        lam = np.arctan2(xr, -sgn * yr)
        center = rho == 0
        if np.any(center):
            lam = np.where(center, 0.0, lam)
        return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)
    alpha1 = np.arctan2(xr, yr)
    phi, lam = _vincenty_direct(ell, lat0, 0.0, alpha1, rho)
    center = rho == 0
    if np.any(center):
        phi = np.where(center, lat0, phi)
        lam = np.where(center, 0.0, lam)
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Albers Equal Area conic, 2SP (EPSG method 9822; Snyder sec. 14,
# ellipsoidal).  Shares the authalic-latitude machinery with LAEA.


def _aea_setup(crs: CRS):
    ell = crs.ellipsoid
    e, e2 = ell.e, ell.e2

    def q_of(sphi):
        return (1 - e2) * (
            sphi / (1 - e2 * sphi * sphi)
            - (1 / (2 * e)) * np.log((1 - e * sphi) / (1 + e * sphi))
        )

    def m_of(phi):
        return math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)

    phi1 = math.radians(crs.param("lat_1"))
    phi2 = math.radians(crs.param("lat_2", crs.param("lat_1")))
    phi0 = math.radians(crs.param("lat_0"))
    q0 = float(q_of(np.float64(math.sin(phi0))))
    q1 = float(q_of(np.float64(math.sin(phi1))))
    m1 = m_of(phi1)
    if abs(phi1 - phi2) < 1e-12:
        n = math.sin(phi1)
    else:
        q2 = float(q_of(np.float64(math.sin(phi2))))
        m2 = m_of(phi2)
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    c = m1 * m1 + n * q1
    rho0 = ell.a * math.sqrt(c - n * q0) / n
    qp = float(q_of(np.float64(1.0)))
    return q_of, n, c, rho0, qp


def _aea_forward(crs: CRS, lon, lat):
    q_of, n, c, rho0, _ = _aea_setup(crs)
    ell = crs.ellipsoid
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam = np.radians(lon - lon0)
    lam = np.arctan2(np.sin(lam), np.cos(lam))
    q = q_of(np.sin(np.radians(lat)))
    with np.errstate(invalid="ignore"):
        rho = ell.a * np.sqrt(c - n * q) / n
    theta = n * lam
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def _aea_inverse(crs: CRS, x, y):
    q_of, n, c, rho0, qp = _aea_setup(crs)
    ell = crs.ellipsoid
    e2 = ell.e2
    e4, e6 = e2 * e2, e2 ** 3
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    xr = np.asarray(x, dtype=np.float64) - fe
    yr = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sign(n) * np.hypot(xr, yr)
    q = (c - (rho * n / ell.a) ** 2) / n
    with np.errstate(invalid="ignore"):
        beta = np.arcsin(q / qp)
        theta = np.arctan2(np.sign(n) * xr, np.sign(n) * yr)
    # authalic -> geographic latitude series (Snyder 3-18)
    phi = (
        beta
        + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * np.sin(2 * beta)
        + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta)
        + (761 * e6 / 45360) * np.sin(6 * beta)
    )
    lon = lon0 + np.degrees(theta / n)
    lat = np.degrees(phi)
    lon = np.where(lon > 180.0, lon - 360.0,
                   np.where(lon <= -180.0, lon + 360.0, lon))
    return lon, lat


# ---------------------------------------------------------------------- #
# Lambert Conformal Conic, 2SP (EPSG method 9802; Snyder sec. 15,
# ellipsoidal).  lat_1 == lat_2 degenerates to the 1SP cone (n = sin lat_1).


def _lcc_t_of(e: float, phi):
    s = np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) * (
        (1 + e * s) / (1 - e * s)
    ) ** (e / 2)


def _lcc_setup(crs: CRS):
    ell = crs.ellipsoid
    e = ell.e
    phi1 = math.radians(crs.param("lat_1"))
    phi2 = math.radians(crs.param("lat_2", crs.param("lat_1")))
    phi0 = math.radians(crs.param("lat_0"))

    def m_of(phi):
        return math.cos(phi) / math.sqrt(
            1 - ell.e2 * math.sin(phi) ** 2
        )

    t0 = float(_lcc_t_of(e, np.float64(phi0)))
    t1 = float(_lcc_t_of(e, np.float64(phi1)))
    m1 = m_of(phi1)
    if abs(phi1 - phi2) < 1e-12:
        n = math.sin(phi1)
    else:
        t2 = float(_lcc_t_of(e, np.float64(phi2)))
        m2 = m_of(phi2)
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    # EPSG 9801 (1SP): rho = a F t^n k_0 -- the 2SP form (9802) has no
    # scale factor, so k_0 defaults to 1 and both methods share this
    # setup.  Folding k_0 into a*F scales rho and rho_0 together, which
    # keeps the inverse (which divides by af) consistent for free.
    af = crs.param("k_0", 1.0) * ell.a * m1 / (n * t1 ** n)  # a * F * k0
    rho0 = af * t0 ** n
    return n, af, rho0


def _lcc_forward(crs: CRS, lon, lat):
    n, af, rho0 = _lcc_setup(crs)
    e = crs.ellipsoid.e
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)
    lam = np.arctan2(np.sin(lam), np.cos(lam))
    with np.errstate(divide="ignore", invalid="ignore"):
        rho = af * _lcc_t_of(e, phi) ** n
    theta = n * lam
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def _lcc_inverse(crs: CRS, x, y):
    n, af, rho0 = _lcc_setup(crs)
    ell = crs.ellipsoid
    e2 = ell.e2
    e4, e6, e8 = e2 * e2, e2 ** 3, e2 ** 4
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    xr = np.asarray(x, dtype=np.float64) - fe
    yr = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sign(n) * np.hypot(xr, yr)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (rho / af) ** (1.0 / n)
        theta = np.arctan2(np.sign(n) * xr, np.sign(n) * yr)
    chi = np.pi / 2 - 2 * np.arctan(t)
    # conformal -> geographic latitude series (Snyder 3-5)
    phi = (
        chi
        + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * np.sin(2 * chi)
        + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * np.sin(4 * chi)
        + (7 * e6 / 120 + 81 * e8 / 1120) * np.sin(6 * chi)
        + (4279 * e8 / 161280) * np.sin(8 * chi)
    )
    lon = lon0 + np.degrees(theta / n)
    lat = np.degrees(phi)
    lon = np.where(lon > 180.0, lon - 360.0,
                   np.where(lon <= -180.0, lon + 360.0, lon))
    return lon, lat


# ---------------------------------------------------------------------- #
# Sinusoidal (EPSG method 9835; Snyder 1987 sec. 30, eqs 30-1..30-8).
# The equal-area pseudo-cylindrical projection of the MODIS land grids
# (sphere R = 6371007.181 m) and ESRI:54008 World Sinusoidal (WGS84).
# Spherical case: x = R lam cos(phi), y = R phi.  Ellipsoidal case:
# x = a lam cos(phi) / sqrt(1 - e2 sin^2 phi), y = M(phi) the meridian
# arc (Snyder 3-21); inverse latitude via the rectifying-latitude series
# (Snyder 3-26).

def _meridian_arc(ell: _Ellipsoid, phi):
    """Meridian distance from the equator, Snyder eq. 3-21."""
    e2 = ell.e2
    e4, e6 = e2 * e2, e2 * e2 * e2
    return ell.a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )


def _meridian_arc_inverse(ell: _Ellipsoid, m):
    """Footpoint latitude from meridian distance, Snyder eqs 7-19/3-26."""
    e2 = ell.e2
    sq = math.sqrt(1 - e2)
    e1 = (1 - sq) / (1 + sq)
    e1_2, e1_3, e1_4 = e1 * e1, e1**3, e1**4
    mu = m / (ell.a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2**3 / 256))
    return (
        mu
        + (3 * e1 / 2 - 27 * e1_3 / 32) * np.sin(2 * mu)
        + (21 * e1_2 / 16 - 55 * e1_4 / 32) * np.sin(4 * mu)
        + (151 * e1_3 / 96) * np.sin(6 * mu)
        + (1097 * e1_4 / 512) * np.sin(8 * mu)
    )


def _sinu_forward(crs: CRS, lon, lat):
    ell = crs.ellipsoid
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    lam = np.arctan2(np.sin(lam), np.cos(lam))
    if ell.e2 == 0.0:  # sphere (MODIS grid): Snyder 30-1, 30-2
        x = fe + ell.a * lam * np.cos(phi)
        y = fn + ell.a * phi
    else:  # ellipsoid: Snyder 30-8 easting, 3-21 northing
        s = np.sin(phi)
        x = fe + ell.a * lam * np.cos(phi) / np.sqrt(1 - ell.e2 * s * s)
        y = fn + _meridian_arc(ell, phi)
    return x, y


def _sinu_inverse(crs: CRS, x, y):
    ell = crs.ellipsoid
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    xr = np.asarray(x, dtype=np.float64) - fe
    yr = np.asarray(y, dtype=np.float64) - fn
    if ell.e2 == 0.0:
        phi = yr / ell.a
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = xr / (ell.a * np.cos(phi))
    else:
        phi = _meridian_arc_inverse(ell, yr)
        s = np.sin(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = xr * np.sqrt(1 - ell.e2 * s * s) / (ell.a * np.cos(phi))
    # at the poles cos(phi) == 0 and every longitude maps to x == 0
    pole = np.abs(np.cos(phi)) < 1e-14
    if np.any(pole):
        lam = np.where(pole, 0.0, lam)
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Mollweide (pseudocylindrical equal-area; PROJ 'moll', ESRI:54009
# "World_Mollweide").  Snyder 1987 sec. 31, eqs 31-1..31-8.  Like PROJ,
# the math is spherical on R = a regardless of the declared ellipsoid
# (PROJ's moll never reads the eccentricity) -- so ESRI:54009 "on WGS84"
# means WGS84 geographic coordinates fed through sphere formulas.

def _moll_theta(phi):
    """Solve 2t + sin(2t) = pi * sin(phi) for t (Newton, Snyder 31-3).

    The root is double at the poles (the derivative vanishes), so
    Newton's rate degrades from quadratic to linear (factor 1/2) as
    |phi| -> 90 deg; a fixed small iteration count leaves km-scale
    errors near the poles.  Iterate to convergence instead: the linear
    regime still halves the error every step, so <= 80 iterations
    reach machine precision from any latitude, and the early exit
    keeps the common case at the usual ~5 Newton steps."""
    phi = np.asarray(phi, dtype=np.float64)
    rhs = np.pi * np.sin(phi)
    t = phi.copy()
    for _ in range(80):
        fp = 2.0 + 2.0 * np.cos(2.0 * t)
        safe = np.abs(fp) > 1e-12
        step = np.where(
            safe,
            (2.0 * t + np.sin(2.0 * t) - rhs) / np.where(safe, fp, 1.0),
            0.0,
        )
        t = t - step
        if np.all(np.abs(step) < 1e-15):
            break
    pole = np.abs(phi) >= np.pi / 2 - 1e-9
    return np.where(pole, np.sign(phi) * (np.pi / 2), t)


_SQRT2 = math.sqrt(2.0)


def _moll_forward(crs: CRS, lon, lat):
    r = crs.ellipsoid.a
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    lam = np.arctan2(np.sin(lam), np.cos(lam))
    t = _moll_theta(phi)
    x = fe + r * (2.0 * _SQRT2 / np.pi) * lam * np.cos(t)  # Snyder 31-1
    y = fn + r * _SQRT2 * np.sin(t)                        # Snyder 31-2
    return x, y


def _moll_inverse(crs: CRS, x, y):
    r = crs.ellipsoid.a
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    xr = np.asarray(x, dtype=np.float64) - fe
    yr = np.asarray(y, dtype=np.float64) - fn
    t = np.arcsin(np.clip(yr / (r * _SQRT2), -1.0, 1.0))   # Snyder 31-6
    phi = np.arcsin(np.clip(
        (2.0 * t + np.sin(2.0 * t)) / np.pi, -1.0, 1.0))   # Snyder 31-7
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.pi * xr / (2.0 * r * _SQRT2 * np.cos(t))  # Snyder 31-8
    # at the poles every longitude maps to x == 0
    pole = np.abs(np.cos(t)) < 1e-14
    if np.any(pole):
        lam = np.where(pole, 0.0, lam)
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Equal Earth (EPSG method 1078; Savric, Patterson & Jenny 2019, "The
# Equal Earth map projection", IJGIS 33(3) -- the published polynomial
# constants).  EPSG applies the spherical polynomial to the AUTHALIC
# latitude on the authalic radius Rq (same q/beta machinery as LAEA,
# EPSG Guidance Note 7-2), preserving exact equal-area on the ellipsoid.
# EPSG:8857/8858/8859 are WGS 84 / Equal Earth {Greenwich,Americas,Asia-
# Pacific}.  theta stays in [-pi/3, pi/3] (sin theta = (sqrt(3)/2) sin
# beta), so cos theta >= 1/2 -- no polar singularities anywhere.

_EE_A1, _EE_A2, _EE_A3, _EE_A4 = 1.340264, -0.081106, 0.000893, 0.003796
_EE_M = math.sqrt(3.0) / 2.0


def _eqearth_setup(crs: CRS):
    ell = crs.ellipsoid
    if ell.e2 == 0.0:
        qp = 2.0
        rq = ell.a

        def beta_of(phi):
            return phi

        def phi_of(beta):
            return beta
    else:
        e, e2 = ell.e, ell.e2

        def q_of(sphi):
            return (1 - e2) * (
                sphi / (1 - e2 * sphi * sphi)
                - (1 / (2 * e)) * np.log((1 - e * sphi) / (1 + e * sphi))
            )

        qp = q_of(1.0)
        rq = ell.a * math.sqrt(qp / 2)
        e4, e6 = e2 * e2, e2 * e2 * e2

        def beta_of(phi):
            return np.arcsin(np.clip(q_of(np.sin(phi)) / qp, -1.0, 1.0))

        def phi_of(beta):
            # authalic -> geographic series (Snyder eq. 3-18)
            return (
                beta
                + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040)
                * np.sin(2 * beta)
                + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta)
                + (761 * e6 / 45360) * np.sin(6 * beta)
            )
    return rq, beta_of, phi_of


def _eqearth_poly(t):
    """y / Rq as a function of theta (the paper's eq. 2)."""
    t2 = t * t
    return _EE_A1 * t + _EE_A2 * t * t2 + t2 * t2 * t2 * t * (
        _EE_A3 + _EE_A4 * t2)


def _eqearth_dpoly(t):
    """d(y/Rq)/dtheta -- strictly positive on [-pi/3, pi/3]."""
    t2 = t * t
    return _EE_A1 + 3 * _EE_A2 * t2 + t2 * t2 * t2 * (
        7 * _EE_A3 + 9 * _EE_A4 * t2)


def _eqearth_forward(crs: CRS, lon, lat):
    rq, beta_of, _ = _eqearth_setup(crs)
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    lam = np.arctan2(np.sin(lam), np.cos(lam))
    beta = beta_of(phi)
    t = np.arcsin(np.clip(_EE_M * np.sin(beta), -1.0, 1.0))
    x = fe + rq * (2.0 / math.sqrt(3.0)) * lam * np.cos(t) / (
        _eqearth_dpoly(t))
    y = fn + rq * _eqearth_poly(t)
    return x, y


def _eqearth_inverse(crs: CRS, x, y):
    rq, _, phi_of = _eqearth_setup(crs)
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    xr = np.asarray(x, dtype=np.float64) - fe
    yr = np.asarray(y, dtype=np.float64) - fn
    yn = yr / rq
    # Newton for theta: the polynomial's derivative is >= ~1.07 over the
    # whole domain, so convergence is quadratic and unconditional
    t = np.asarray(yn / _EE_A1, dtype=np.float64)
    for _ in range(10):
        t = t - (_eqearth_poly(t) - yn) / _eqearth_dpoly(t)
    beta = np.arcsin(np.clip(np.sin(t) / _EE_M, -1.0, 1.0))
    lam = xr * math.sqrt(3.0) * _eqearth_dpoly(t) / (2.0 * rq * np.cos(t))
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi_of(beta))


# ---------------------------------------------------------------------- #
# Ellipsoidal Mercator, 1SP (EPSG method 9804; Snyder 1987 sec. 7).
# ln(tan(pi/4 + phi/2) * ((1 - e sin phi)/(1 + e sin phi))^(e/2)) is the
# isometric latitude, computed as atanh(sin phi) - e atanh(e sin phi).

def _conformal_to_geographic(ell: _Ellipsoid, chi):
    """Conformal -> geographic latitude series (Snyder eq. 3-5)."""
    e2 = ell.e2
    e4, e6, e8 = e2 * e2, e2**3, e2**4
    return (
        chi
        + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * np.sin(2 * chi)
        + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * np.sin(4 * chi)
        + (7 * e6 / 120 + 81 * e8 / 1120) * np.sin(6 * chi)
        + (4279 * e8 / 161280) * np.sin(8 * chi)
    )


def _merc_forward(crs: CRS, lon, lat):
    ell = crs.ellipsoid
    e = ell.e
    k0 = crs.param("k_0", 1.0)
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    lam = np.arctan2(np.sin(lam), np.cos(lam))
    s = np.sin(phi)
    x = fe + ell.a * k0 * lam
    y = fn + ell.a * k0 * (np.arctanh(s) - e * np.arctanh(e * s))
    return x, y


def _merc_inverse(crs: CRS, x, y):
    ell = crs.ellipsoid
    k0 = crs.param("k_0", 1.0)
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    psi = (np.asarray(y, dtype=np.float64) - fn) / (ell.a * k0)
    chi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2
    phi = _conformal_to_geographic(ell, chi)
    lam = (np.asarray(x, dtype=np.float64) - fe) / (ell.a * k0)
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Lambert cylindrical equal area (EPSG method 9835 cylindrical case;
# Snyder 1987 sec. 10, ellipsoidal).  EASE-Grid 2.0 (EPSG:6933) is this
# projection with lat_ts = 30 on WGS84.

def _cea_setup(crs: CRS):
    ell = crs.ellipsoid
    e, e2 = ell.e, ell.e2

    def q_of(sphi):
        return (1 - e2) * (
            sphi / (1 - e2 * sphi * sphi)
            - (1 / (2 * e)) * np.log((1 - e * sphi) / (1 + e * sphi))
        )

    phi_ts = math.radians(crs.param("lat_ts"))
    s_ts = math.sin(phi_ts)
    k0 = math.cos(phi_ts) / math.sqrt(1 - e2 * s_ts * s_ts)
    qp = q_of(1.0)
    return q_of, k0, qp


def _cea_forward(crs: CRS, lon, lat):
    q_of, k0, _ = _cea_setup(crs)
    ell = crs.ellipsoid
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    lam = np.arctan2(np.sin(lam), np.cos(lam))
    x = fe + ell.a * k0 * lam
    y = fn + ell.a * q_of(np.sin(phi)) / (2.0 * k0)
    return x, y


def _cea_inverse(crs: CRS, x, y):
    q_of, k0, qp = _cea_setup(crs)
    ell = crs.ellipsoid
    e2 = ell.e2
    e4, e6 = e2 * e2, e2 * e2 * e2
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    q = 2.0 * (np.asarray(y, dtype=np.float64) - fn) * k0 / ell.a
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    # authalic -> geographic latitude series (Snyder eq. 3-18, the same
    # coefficients as the LAEA inverse)
    phi = (
        beta
        + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * np.sin(2 * beta)
        + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta)
        + (761 * e6 / 45360) * np.sin(6 * beta)
    )
    lam = (np.asarray(x, dtype=np.float64) - fe) / (ell.a * k0)
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Equidistant cylindrical (EPSG method 1028, ellipsoidal): easting scaled
# by the standard parallel's normal-radius cosine, northing = meridian arc.

def _eqc_forward(crs: CRS, lon, lat):
    ell = crs.ellipsoid
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi_ts = math.radians(crs.param("lat_ts"))
    s_ts = math.sin(phi_ts)
    nu_cos = ell.a * math.cos(phi_ts) / math.sqrt(1 - ell.e2 * s_ts * s_ts)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    lam = np.arctan2(np.sin(lam), np.cos(lam))
    return fe + nu_cos * lam, fn + _meridian_arc(ell, phi)


def _eqc_inverse(crs: CRS, x, y):
    ell = crs.ellipsoid
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi_ts = math.radians(crs.param("lat_ts"))
    s_ts = math.sin(phi_ts)
    nu_cos = ell.a * math.cos(phi_ts) / math.sqrt(1 - ell.e2 * s_ts * s_ts)
    phi = _meridian_arc_inverse(
        ell, np.asarray(y, dtype=np.float64) - fn
    )
    lam = (np.asarray(x, dtype=np.float64) - fe) / nu_cos
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Orthographic (EPSG method 9840, ellipsoidal; IOGP Guidance Note 7-2
# "Orthographic" formulas; CF grid_mapping_name "orthographic").  The
# perspective view from infinity -- used for satellite full-disk
# composites and local engineering grids.  Only the hemisphere facing
# the projection origin is mapped; back-hemisphere inputs return NaN
# (proj's +proj=ortho marks them out-of-domain the same way).

def _ortho_setup(crs: CRS):
    ell = crs.ellipsoid
    phi0 = math.radians(crs.param("lat_0"))
    s0, c0 = math.sin(phi0), math.cos(phi0)
    nu0 = ell.a / math.sqrt(1.0 - ell.e2 * s0 * s0)
    return ell, phi0, s0, c0, nu0


def _ortho_forward(crs: CRS, lon, lat):
    ell, phi0, s0, c0, nu0 = _ortho_setup(crs)
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    lam = np.arctan2(np.sin(lam), np.cos(lam))
    sphi, cphi = np.sin(phi), np.cos(phi)
    nu = ell.a / np.sqrt(1.0 - ell.e2 * sphi * sphi)
    # GN7-2: E = FE + nu cosphi sin(lam)
    #        N = FN + nu (sinphi cosphi0 - cosphi sinphi0 cos lam)
    #             + e2 (nu0 sinphi0 - nu sinphi) cosphi0
    x = fe + nu * cphi * np.sin(lam)
    y = (fn + nu * (sphi * c0 - cphi * s0 * np.cos(lam))
         + ell.e2 * (nu0 * s0 - nu * sphi) * c0)
    # visibility: spherical angular distance to the origin <= 90 deg
    visible = sphi * s0 + cphi * c0 * np.cos(lam) >= -1e-10
    return np.where(visible, x, np.nan), np.where(visible, y, np.nan)


def _ortho_inverse(crs: CRS, x, y):
    """Closed-form ellipsoidal inverse.

    The GN7-2 forward is EXACTLY the parallel projection of the
    ellipsoid surface point P onto the origin's tangent-plane axes:
    with unit east/north/up vectors (e, n, u) at the projection origin
    (work in the frame where lon_0 = 0),

        E - FE = e . P
        N - FN - e2 nu0 sinphi0 cosphi0 = n . P

    (expand P = (nu cosphi coslam, nu cosphi sinlam,
    nu (1 - e2) sinphi): the e2 term of the forward N equation is the
    constant above).  So the inverse is exact ray-ellipsoid
    intersection: P = E' e + N' n + w u with w from the quadratic
    (X^2 + Y^2)/a^2 + Z^2/b^2 = 1, larger root = the visible side;
    then phi = atan2(Z, (1 - e2) hypot(X, Y)) is the exact geodetic
    latitude of an on-surface point.  No iteration, no limb/pole
    singularities (a Newton solve on the forward equations was traced
    diverging near the fold at 87 deg angular distance).
    """
    ell, phi0, s0, c0, nu0 = _ortho_setup(crs)
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    ep = np.asarray(x, dtype=np.float64) - fe
    npp = (np.asarray(y, dtype=np.float64) - fn
           - ell.e2 * nu0 * s0 * c0)
    a2 = ell.a * ell.a
    b2 = a2 * (1.0 - ell.e2)
    # frame (lon_0 = 0): e = (0,1,0), n = (-s0,0,c0), u = (c0,0,s0)
    # P(w) = (w c0 - N' s0, E', w s0 + N' c0)
    A = c0 * c0 / a2 + s0 * s0 / b2
    B = 2.0 * npp * s0 * c0 * (1.0 / b2 - 1.0 / a2)
    C = ((npp * s0) ** 2 + ep * ep) / a2 + (npp * c0) ** 2 / b2 - 1.0
    with np.errstate(invalid="ignore"):
        disc = B * B - 4.0 * A * C
        # exactly-on-limb points are a double root; float cancellation
        # can push their discriminant epsilon-negative -> clamp those
        # to the tangency instead of NaN (genuinely off-disk inputs
        # have disc << 0 and still return NaN)
        eps = 1e-12 * (B * B + np.abs(4.0 * A * C))
        disc = np.where((disc < 0.0) & (disc >= -eps), 0.0, disc)
        w = (-B + np.sqrt(disc)) / (2.0 * A)  # off-disk -> NaN
        X = w * c0 - npp * s0
        Y = ep
        Z = w * s0 + npp * c0
        phi = np.arctan2(Z, (1.0 - ell.e2) * np.hypot(X, Y))
        lam = np.arctan2(Y, X)
    return _wrap_lon(np.degrees(lam) + lon0), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Rotated latitude/longitude (CF rotated_latitude_longitude; spherical
# rotation as in COSMO / proj ob_tran)

def _rot_pole_setup(crs: CRS):
    theta_p = math.radians(crs.param("pole_lat"))
    lam_p = crs.param("pole_lon")
    return math.sin(theta_p), math.cos(theta_p), lam_p


def _rot_pole_to_geographic(crs: CRS, lon_r, lat_r):
    """Rotated (grid) lon/lat -> true lon/lat."""
    sin_tp, cos_tp, lam_p = _rot_pole_setup(crs)
    lam_r = np.radians(np.asarray(lon_r, dtype=np.float64))
    phi_r = np.radians(np.asarray(lat_r, dtype=np.float64))
    sin_phi = sin_tp * np.sin(phi_r) + cos_tp * np.cos(phi_r) * np.cos(lam_r)
    phi = np.arcsin(np.clip(sin_phi, -1.0, 1.0))
    lam = np.arctan2(
        np.cos(phi_r) * np.sin(lam_r),
        cos_tp * np.sin(phi_r) - sin_tp * np.cos(phi_r) * np.cos(lam_r),
    )
    lon = lam_p + np.degrees(lam)
    # wrap to (-180, 180]
    lon = np.degrees(np.arctan2(
        np.sin(np.radians(lon)), np.cos(np.radians(lon))
    ))
    return lon, np.degrees(phi)


def _rot_pole_from_geographic(crs: CRS, lon, lat):
    """True lon/lat -> rotated (grid) lon/lat (inverse rotation)."""
    sin_tp, cos_tp, lam_p = _rot_pole_setup(crs)
    dlam = np.radians(np.asarray(lon, dtype=np.float64) - lam_p)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sin_phi_r = sin_tp * np.sin(phi) + cos_tp * np.cos(phi) * np.cos(dlam)
    phi_r = np.arcsin(np.clip(sin_phi_r, -1.0, 1.0))
    lam_r = np.arctan2(
        np.cos(phi) * np.sin(dlam),
        cos_tp * np.sin(phi) - sin_tp * np.cos(phi) * np.cos(dlam),
    )
    return np.degrees(lam_r), np.degrees(phi_r)


# ---------------------------------------------------------------------- #
# Hotine Oblique Mercator, variant B (EPSG method 9815; EPSG Guidance
# Note 7-2 "Hotine Oblique Mercator" formulas).  The projection of the
# Malaysian/Bornean RSO grids and (with alpha = 90) the Swiss and
# Hungarian national grids; false coordinates apply at the projection
# CENTER (variant B), not the aposphere's natural origin (variant A).


def _omerc_setup(crs: CRS):
    ell = crs.ellipsoid
    e, e2 = ell.e, ell.e2
    phi_c = math.radians(crs.param("lat_0"))
    lam_c = math.radians(crs.param("lonc"))
    alpha_c = math.radians(crs.param("alpha"))
    gamma_c = math.radians(crs.param("gamma", crs.param("alpha")))
    k_c = crs.param("k_0", 1.0)
    if abs(math.cos(alpha_c)) < 1e-12:
        raise NotImplementedError(
            "omerc with alpha == 90 (Swiss/Hungarian special case) "
            "not supported"
        )
    s_c = math.sin(phi_c)
    big_b = math.sqrt(1.0 + e2 * math.cos(phi_c) ** 4 / (1.0 - e2))
    big_a = (ell.a * big_b * k_c * math.sqrt(1.0 - e2)
             / (1.0 - e2 * s_c * s_c))
    t0 = (math.tan(math.pi / 4 - phi_c / 2)
          / ((1.0 - e * s_c) / (1.0 + e * s_c)) ** (e / 2))
    big_d = (big_b * math.sqrt(1.0 - e2)
             / (math.cos(phi_c) * math.sqrt(1.0 - e2 * s_c * s_c)))
    d2 = big_d * big_d if big_d >= 1.0 else 1.0
    sign_c = 1.0 if phi_c >= 0.0 else -1.0
    big_f = big_d + math.sqrt(d2 - 1.0) * sign_c
    big_h = big_f * t0 ** big_b
    big_g = (big_f - 1.0 / big_f) / 2.0
    gamma_0 = math.asin(math.sin(alpha_c) / big_d)
    lam_0 = lam_c - math.asin(big_g * math.tan(gamma_0)) / big_b
    u_c = (big_a / big_b) * math.atan2(
        math.sqrt(d2 - 1.0), math.cos(alpha_c)
    ) * sign_c
    # EPSG 9815 (variant B, the default) anchors the grid at the
    # projection centre by shifting u by u_c; EPSG 9812 (variant A,
    # param no_uoff=1, PROJ +no_uoff, WKT1 'Hotine_Oblique_Mercator')
    # anchors at the natural origin -- no shift
    u_off = 0.0 if crs.param("no_uoff", 0.0) else abs(u_c) * sign_c
    return (big_a, big_b, big_h, gamma_0, lam_0, gamma_c, u_off)


def _omerc_forward(crs: CRS, lon, lat):
    ell = crs.ellipsoid
    e = ell.e
    big_a, big_b, big_h, gamma_0, lam_0, gamma_c, u_off = (
        _omerc_setup(crs)
    )
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    s = np.sin(phi)
    t = (np.tan(np.pi / 4 - phi / 2)
         / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2))
    big_q = big_h / t ** big_b
    big_s = (big_q - 1.0 / big_q) / 2.0
    big_t = (big_q + 1.0 / big_q) / 2.0
    dl = big_b * (lam - lam_0)
    # keep the aposphere longitude in (-pi, pi]
    dl = np.arctan2(np.sin(dl), np.cos(dl))
    big_v = np.sin(dl)
    big_u = (-big_v * math.cos(gamma_0) + big_s * math.sin(gamma_0)) / big_t
    v = big_a * np.log((1.0 - big_u) / (1.0 + big_u)) / (2.0 * big_b)
    u = (big_a * np.arctan2(
        big_s * math.cos(gamma_0) + big_v * math.sin(gamma_0), np.cos(dl)
    ) / big_b) - u_off
    east = v * math.cos(gamma_c) + u * math.sin(gamma_c) + fe
    north = u * math.cos(gamma_c) - v * math.sin(gamma_c) + fn
    return east, north


def _omerc_inverse(crs: CRS, x, y):
    ell = crs.ellipsoid
    big_a, big_b, big_h, gamma_0, lam_0, gamma_c, u_off = (
        _omerc_setup(crs)
    )
    fe, fn = crs.param("x_0"), crs.param("y_0")
    dx = np.asarray(x, dtype=np.float64) - fe
    dy = np.asarray(y, dtype=np.float64) - fn
    v = dx * math.cos(gamma_c) - dy * math.sin(gamma_c)
    u = dy * math.cos(gamma_c) + dx * math.sin(gamma_c) + u_off
    big_q = np.exp(-big_b * v / big_a)
    big_s = (big_q - 1.0 / big_q) / 2.0
    big_t = (big_q + 1.0 / big_q) / 2.0
    big_v = np.sin(big_b * u / big_a)
    big_u = (big_v * math.cos(gamma_0) + big_s * math.sin(gamma_0)) / big_t
    t = (big_h / np.sqrt((1.0 + big_u) / (1.0 - big_u))) ** (1.0 / big_b)
    chi = np.pi / 2 - 2.0 * np.arctan(t)
    phi = _conformal_to_geographic(ell, chi)
    lam = lam_0 - np.arctan2(
        big_s * math.cos(gamma_0) - big_v * math.sin(gamma_0),
        np.cos(big_b * u / big_a),
    ) / big_b
    return _wrap_lon(np.degrees(lam)), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Swiss Oblique Mercator (EPSG method 9814; Rosenmund 1903, the
# swisstopo "Formulas and constants for the calculation of the Swiss
# conformal cylindrical projection" double projection): ellipsoid ->
# conformal sphere -> pseudo-equator rotation -> Mercator.  The
# projection of CH1903 / LV03 (EPSG:21781) and CH1903+ / LV95
# (EPSG:2056); equivalent to Hotine variant B with azimuth 90 (which
# _omerc_setup rejects -- this is that case's dedicated implementation).


def _somerc_setup(crs: CRS):
    ell = crs.ellipsoid
    e, e2 = ell.e, ell.e2
    phi0 = math.radians(crs.param("lat_0"))
    s0 = math.sin(phi0)
    alpha = math.sqrt(1.0 + (e2 / (1.0 - e2)) * math.cos(phi0) ** 4)
    b0 = math.asin(s0 / alpha)
    big_k = (
        math.log(math.tan(math.pi / 4 + b0 / 2))
        - alpha * math.log(math.tan(math.pi / 4 + phi0 / 2))
        + alpha * (e / 2) * math.log(
            (1.0 + e * s0) / (1.0 - e * s0)
        )
    )
    big_r = (ell.a * math.sqrt(1.0 - e2) / (1.0 - e2 * s0 * s0)
             * crs.param("k_0", 1.0))
    return alpha, b0, big_k, big_r


def _somerc_forward(crs: CRS, lon, lat):
    ell = crs.ellipsoid
    e = ell.e
    alpha, b0, big_k, big_r = _somerc_setup(crs)
    lam0 = math.radians(crs.param("lon_0"))
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    s = np.sin(phi)
    big_s = (
        alpha * np.log(np.tan(np.pi / 4 + phi / 2))
        - alpha * (e / 2) * np.log((1.0 + e * s) / (1.0 - e * s))
        + big_k
    )
    b = 2.0 * (np.arctan(np.exp(big_s)) - np.pi / 4)
    ell_lam = alpha * (lam - lam0)
    # rotate the conformal sphere so the projection center (b0, 0)
    # lands on the pseudo-equator origin (R_y(b0) in cartesian form)
    sb0, cb0 = math.sin(b0), math.cos(b0)
    b_bar = np.arcsin(np.clip(
        cb0 * np.sin(b) - sb0 * np.cos(b) * np.cos(ell_lam), -1.0, 1.0
    ))
    l_bar = np.arctan2(
        np.cos(b) * np.sin(ell_lam),
        cb0 * np.cos(b) * np.cos(ell_lam) + sb0 * np.sin(b),
    )
    east = big_r * l_bar + fe
    north = big_r * np.log(np.tan(np.pi / 4 + b_bar / 2)) + fn
    return east, north


def _somerc_inverse(crs: CRS, x, y):
    ell = crs.ellipsoid
    e = ell.e
    alpha, b0, big_k, big_r = _somerc_setup(crs)
    lam0 = math.radians(crs.param("lon_0"))
    fe, fn = crs.param("x_0"), crs.param("y_0")
    l_bar = (np.asarray(x, dtype=np.float64) - fe) / big_r
    b_bar = 2.0 * (np.arctan(np.exp(
        (np.asarray(y, dtype=np.float64) - fn) / big_r
    )) - np.pi / 4)
    sb0, cb0 = math.sin(b0), math.cos(b0)
    b = np.arcsin(np.clip(
        cb0 * np.sin(b_bar) + sb0 * np.cos(b_bar) * np.cos(l_bar),
        -1.0, 1.0,
    ))
    ell_lam = np.arctan2(
        np.cos(b_bar) * np.sin(l_bar),
        cb0 * np.cos(b_bar) * np.cos(l_bar) - sb0 * np.sin(b_bar),
    )
    lam = lam0 + ell_lam / alpha
    # conformal-sphere latitude -> ellipsoidal latitude by fixed point:
    # S = ln(tan(pi/4 + b/2)); phi_{k+1} from the forward S expression
    big_s = np.log(np.tan(np.pi / 4 + b / 2))
    phi = b
    for _ in range(12):
        s = np.sin(phi)
        phi = 2.0 * (np.arctan(np.exp(
            (big_s - big_k) / alpha
            + (e / 2) * np.log((1.0 + e * s) / (1.0 - e * s))
        )) - np.pi / 4)
    return _wrap_lon(np.degrees(lam)), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Krovak oblique conformal conic (EPSG method 9819; EPSG Guidance Note
# 7-2 "Krovak").  The S-JTSK national grid of Czechia and Slovakia:
# Gaussian sphere -> rotation to the oblique cone axis -> conformal
# conic at the pseudo standard parallel.  The native axes point SOUTH
# (X) and WEST (Y); EPSG:5514 "Krovak East North" negates both.  The
# historic Ferro prime meridian cancels out of every longitude
# DIFFERENCE, so Greenwich longitudes work throughout.


def _krovak_setup(crs: CRS):
    ell = crs.ellipsoid
    e, e2 = ell.e, ell.e2
    phi_c = math.radians(crs.param("lat_0"))
    alpha_c = math.radians(crs.param("alpha"))
    phi_p = math.radians(crs.param("lat_p"))
    k_p = crs.param("k_0", 1.0)
    s_c = math.sin(phi_c)
    big_a = ell.a * math.sqrt(1.0 - e2) / (1.0 - e2 * s_c * s_c)
    big_b = math.sqrt(1.0 + e2 * math.cos(phi_c) ** 4 / (1.0 - e2))
    gamma0 = math.asin(s_c / big_b)
    t0 = (
        math.tan(math.pi / 4 + gamma0 / 2)
        * ((1.0 + e * s_c) / (1.0 - e * s_c)) ** (e * big_b / 2)
        / math.tan(math.pi / 4 + phi_c / 2) ** big_b
    )
    n = math.sin(phi_p)
    r0 = k_p * big_a / math.tan(phi_p)
    return big_b, t0, n, r0, alpha_c, phi_p


def _krovak_forward(crs: CRS, lon, lat):
    ell = crs.ellipsoid
    e = ell.e
    big_b, t0, n, r0, alpha_c, phi_p = _krovak_setup(crs)
    lam0 = math.radians(crs.param("lon_0"))
    fe, fn = crs.param("x_0"), crs.param("y_0")
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    s = np.sin(phi)
    big_u = 2.0 * (np.arctan(
        t0 * np.tan(phi / 2 + np.pi / 4) ** big_b
        / ((1.0 + e * s) / (1.0 - e * s)) ** (e * big_b / 2)
    ) - np.pi / 4)
    big_v = big_b * (lam0 - lam)
    big_t = np.arcsin(np.clip(
        math.cos(alpha_c) * np.sin(big_u)
        + math.sin(alpha_c) * np.cos(big_u) * np.cos(big_v),
        -1.0, 1.0,
    ))
    # Full-quadrant rotated longitude: the EPSG arcsin form is only
    # valid while the point stays within 90 deg of the cone-pole
    # meridian; atan2 agrees with it there (cos D > 0) and keeps the
    # forward/inverse a bijection outside the official Czech domain.
    big_d = np.arctan2(
        np.cos(big_u) * np.sin(big_v),
        math.cos(alpha_c) * np.cos(big_u) * np.cos(big_v)
        - math.sin(alpha_c) * np.sin(big_u),
    )
    theta = n * big_d
    r = (r0 * math.tan(math.pi / 4 + phi_p / 2) ** n
         / np.tan(big_t / 2 + np.pi / 4) ** n)
    x_south = r * np.cos(theta)
    y_west = r * np.sin(theta)
    # EPSG:5514 East-North axes: E = -westing, N = -southing
    return -y_west + fe, -x_south + fn


def _krovak_inverse(crs: CRS, x, y):
    ell = crs.ellipsoid
    e = ell.e
    big_b, t0, n, r0, alpha_c, phi_p = _krovak_setup(crs)
    lam0 = math.radians(crs.param("lon_0"))
    fe, fn = crs.param("x_0"), crs.param("y_0")
    y_west = -(np.asarray(x, dtype=np.float64) - fe)
    x_south = -(np.asarray(y, dtype=np.float64) - fn)
    r = np.hypot(x_south, y_west)
    theta = np.arctan2(y_west, x_south)
    big_d = theta / n
    big_t = 2.0 * (np.arctan(
        (r0 / r) ** (1.0 / n) * math.tan(math.pi / 4 + phi_p / 2)
    ) - np.pi / 4)
    big_u = np.arcsin(np.clip(
        math.cos(alpha_c) * np.sin(big_t)
        - math.sin(alpha_c) * np.cos(big_t) * np.cos(big_d),
        -1.0, 1.0,
    ))
    big_v = np.arctan2(
        np.cos(big_t) * np.sin(big_d),
        math.sin(alpha_c) * np.sin(big_t)
        + math.cos(alpha_c) * np.cos(big_t) * np.cos(big_d),
    )
    lam = lam0 - big_v / big_b
    # Gaussian latitude -> ellipsoidal latitude by fixed point
    phi = big_u
    base = np.tan(big_u / 2 + np.pi / 4)
    for _ in range(12):
        s = np.sin(phi)
        phi = 2.0 * (np.arctan(
            (base / t0) ** (1.0 / big_b)
            * ((1.0 + e * s) / (1.0 - e * s)) ** (e / 2)
        ) - np.pi / 4)
    return _wrap_lon(np.degrees(lam)), np.degrees(phi)


# ---------------------------------------------------------------------- #
# Geostationary satellite view (the GOES-R ABI / MSG SEVIRI fixed grid;
# PROJ 'geos', CGMS LRIT/HRIT Global Specification sec. 4.4).  Grid
# coordinates are scan angles times the perspective height:
# x = h * (scan angle), satellite on the equator at lon_0, height h above
# the ellipsoid.  'sweep_angle_axis' follows the CF convention:
# "x" (GOES-R ABI) or "y" (MSG SEVIRI).

def _geos_setup(crs: CRS):
    ell = crs.ellipsoid
    h = crs.param("h")
    radius_g_1 = h / ell.a
    radius_g = 1.0 + radius_g_1
    big_c = radius_g * radius_g - 1.0
    radius_p = (1.0 - ell.f) if ell.f else 1.0  # b/a
    return h, radius_g_1, radius_g, big_c, radius_p


def _geos_forward(crs: CRS, lon, lat):
    ell = crs.ellipsoid
    h, radius_g_1, radius_g, _, radius_p = _geos_setup(crs)
    rp2 = radius_p * radius_p
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    sweep_x = crs.param("sweep_x", 0.0) != 0.0
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    lam = np.arctan2(np.sin(lam), np.cos(lam))
    # geocentric latitude and normalized geocentric radius
    phi_c = np.arctan(rp2 * np.tan(phi))
    sc, cc = np.sin(phi_c), np.cos(phi_c)
    r = radius_p / np.sqrt(rp2 * cc * cc + sc * sc)
    vx = r * np.cos(lam) * cc
    vy = r * np.sin(lam) * cc
    vz = r * sc
    tmp = radius_g - vx
    # visibility: the view ray must not pass through the Earth
    visible = ((radius_g - vx) * vx - vy * vy - vz * vz / rp2) >= 0.0
    with np.errstate(invalid="ignore", divide="ignore"):
        if sweep_x:
            x = radius_g_1 * np.arctan(vy / np.hypot(vz, tmp))
            y = radius_g_1 * np.arctan(vz / tmp)
        else:
            x = radius_g_1 * np.arctan(vy / tmp)
            y = radius_g_1 * np.arctan(vz / np.hypot(vy, tmp))
    x = np.where(visible, fe + ell.a * x, np.nan)
    y = np.where(visible, fn + ell.a * y, np.nan)
    return x, y


def _geos_inverse(crs: CRS, x, y):
    ell = crs.ellipsoid
    h, radius_g_1, radius_g, big_c, radius_p = _geos_setup(crs)
    rp2 = radius_p * radius_p
    lon0 = crs.param("lon_0")
    fe, fn = crs.param("x_0"), crs.param("y_0")
    sweep_x = crs.param("sweep_x", 0.0) != 0.0
    xn = (np.asarray(x, dtype=np.float64) - fe) / ell.a
    yn = (np.asarray(y, dtype=np.float64) - fn) / ell.a
    # unit view-direction components from the scan angles
    if sweep_x:
        vz = np.tan(yn / radius_g_1)
        vy = np.tan(xn / radius_g_1) * np.hypot(1.0, vz)
    else:
        vy = np.tan(xn / radius_g_1)
        vz = np.tan(yn / radius_g_1) * np.hypot(1.0, vy)
    # intersect the ray (from the satellite toward the Earth) with the
    # ellipsoid: quadratic in the ray parameter k
    a_q = vy * vy + (vz / radius_p) ** 2 + 1.0
    b_q = 2.0 * radius_g * (-1.0)
    det = b_q * b_q - 4.0 * a_q * big_c
    with np.errstate(invalid="ignore", divide="ignore"):
        k = (-b_q - np.sqrt(det)) / (2.0 * a_q)
        px = radius_g - k
        py = k * vy
        pz = k * vz
        lam = np.arctan2(py, px)
        phi = np.arctan(pz * np.cos(lam) / px)
        phi = np.arctan(np.tan(phi) / rp2)
    off = np.where(det < 0.0, np.nan, 0.0)
    return _wrap_lon(np.degrees(lam) + lon0 + off), np.degrees(phi) + off


# ---------------------------------------------------------------------- #
# Datum shifts: geodetic <-> geocentric plus the 7-parameter Helmert
# transformation, position-vector convention (EPSG method 9606; the
# 3-parameter geocentric-translation case is method 9603).  This is the
# same similarity-transform pipeline PROJ runs for +towgs84.

def _geodetic_to_geocentric(ell: _Ellipsoid, lon, lat):
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    s, c = np.sin(phi), np.cos(phi)
    nu = ell.a / np.sqrt(1 - ell.e2 * s * s)
    return (
        nu * c * np.cos(lam),
        nu * c * np.sin(lam),
        nu * (1 - ell.e2) * s,
    )


def _geocentric_to_geodetic(ell: _Ellipsoid, X, Y, Z):
    lam = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    # fixed-point iteration on phi (converges to sub-nanometer in < 10
    # rounds for |h| << a)
    phi = np.arctan2(Z, p * (1 - ell.e2))
    for _ in range(10):
        s = np.sin(phi)
        nu = ell.a / np.sqrt(1 - ell.e2 * s * s)
        phi = np.arctan2(Z + ell.e2 * nu * s, p)
    return np.degrees(lam), np.degrees(phi)


def _helmert(params: tuple, X, Y, Z, inverse: bool = False):
    """Apply a 3- or 7-parameter Helmert transform (position vector:
    rotations in arc-seconds rotate the POINT's position vector)."""
    dx, dy, dz = params[0], params[1], params[2]
    if len(params) >= 7:
        asec = math.pi / (180.0 * 3600.0)
        rx, ry, rz = (params[3] * asec, params[4] * asec, params[5] * asec)
        m = 1.0 + params[6] * 1e-6
    else:
        rx = ry = rz = 0.0
        m = 1.0
    if not inverse:
        X2 = dx + m * (X - rz * Y + ry * Z)
        Y2 = dy + m * (rz * X + Y - rx * Z)
        Z2 = dz + m * (-ry * X + rx * Y + Z)
        return X2, Y2, Z2
    # exact inverse of the forward similarity (invert the rotation+scale
    # matrix, not the small-angle approximation, so roundtrips close)
    Xs, Ys, Zs = X - dx, Y - dy, Z - dz
    r = np.array(
        [[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]], dtype=np.float64
    ) * m
    rinv = np.linalg.inv(r)
    X2 = rinv[0, 0] * Xs + rinv[0, 1] * Ys + rinv[0, 2] * Zs
    Y2 = rinv[1, 0] * Xs + rinv[1, 1] * Ys + rinv[1, 2] * Zs
    Z2 = rinv[2, 0] * Xs + rinv[2, 1] * Ys + rinv[2, 2] * Zs
    return X2, Y2, Z2


def _datum_shift(src: CRS, dst: CRS, lon, lat):
    """Shift geographic coordinates from src's datum to dst's datum via
    WGS84 geocentric (h = 0 on the source ellipsoid; the sub-mm height
    coupling is far below the shifts' own ~1 m grade)."""
    X, Y, Z = _geodetic_to_geocentric(src.ellipsoid, lon, lat)
    if src.towgs84:
        X, Y, Z = _helmert(src.towgs84, X, Y, Z)
    if dst.towgs84:
        X, Y, Z = _helmert(dst.towgs84, X, Y, Z, inverse=True)
    return _geocentric_to_geodetic(dst.ellipsoid, X, Y, Z)


def _needs_datum_shift(src: CRS, dst: CRS) -> bool:
    if src.towgs84 == dst.towgs84 and src.ellipsoid == dst.ellipsoid:
        return False
    return bool(src.towgs84 or dst.towgs84)


# ---------------------------------------------------------------------- #
# Transformer

class Transformer:
    """Transforms x,y between two CRS (always x,y order, like pyproj's
    ``Transformer.from_crs(..., always_xy=True)``; parity:
    reference reproject.py:124-126)."""

    def __init__(self, src: CRS, dst: CRS):
        self.src = src
        self.dst = dst

    @staticmethod
    def from_crs(src, dst) -> "Transformer":
        return Transformer(CRS.from_user_input(src), CRS.from_user_input(dst))

    def transform(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if self.src.equals(self.dst) or (
            self.src.kind == "geographic"
            and self.dst.kind == "geographic"
            and self.src.param("pm", 0.0) == self.dst.param("pm", 0.0)
            and not _needs_datum_shift(self.src, self.dst)
        ):
            return x, y
        # to geographic
        if self.src.kind == "tmerc":
            lon, lat = _tmerc_inverse(self.src, x, y)
        elif self.src.kind == "laea":
            lon, lat = _laea_inverse(self.src, x, y)
        elif self.src.kind == "webmerc":
            lon, lat = _webmerc_inverse(self.src, x, y)
        elif self.src.kind == "stere":
            lon, lat = _stere_inverse(self.src, x, y)
        elif self.src.kind == "rot_pole":
            lon, lat = _rot_pole_to_geographic(self.src, x, y)
        elif self.src.kind == "lcc":
            lon, lat = _lcc_inverse(self.src, x, y)
        elif self.src.kind == "aea":
            lon, lat = _aea_inverse(self.src, x, y)
        elif self.src.kind == "sinu":
            lon, lat = _sinu_inverse(self.src, x, y)
        elif self.src.kind == "merc":
            lon, lat = _merc_inverse(self.src, x, y)
        elif self.src.kind == "cea":
            lon, lat = _cea_inverse(self.src, x, y)
        elif self.src.kind == "eqc":
            lon, lat = _eqc_inverse(self.src, x, y)
        elif self.src.kind == "geos":
            lon, lat = _geos_inverse(self.src, x, y)
        elif self.src.kind == "omerc":
            lon, lat = _omerc_inverse(self.src, x, y)
        elif self.src.kind == "somerc":
            lon, lat = _somerc_inverse(self.src, x, y)
        elif self.src.kind == "krovak":
            lon, lat = _krovak_inverse(self.src, x, y)
        elif self.src.kind == "ortho":
            lon, lat = _ortho_inverse(self.src, x, y)
        elif self.src.kind == "moll":
            lon, lat = _moll_inverse(self.src, x, y)
        elif self.src.kind == "sterea":
            lon, lat = _sterea_inverse(self.src, x, y)
        elif self.src.kind == "aeqd":
            lon, lat = _aeqd_inverse(self.src, x, y)
        elif self.src.kind == "stere_obl":
            lon, lat = _stere_obl_inverse(self.src, x, y)
        elif self.src.kind == "nsper":
            lon, lat = _nsper_inverse(self.src, x, y)
        elif self.src.kind == "eqearth":
            lon, lat = _eqearth_inverse(self.src, x, y)
        else:
            lon, lat = x, y
            # geographic source on a non-Greenwich prime meridian
            # (pm param, e.g. EPSG:4807-style +pm=paris): its
            # longitudes are meridian-relative -- shift to Greenwich
            src_pm = self.src.param("pm", 0.0)
            if src_pm:
                lon = _wrap_lon(np.asarray(lon, dtype=np.float64)
                                + src_pm)
        # datum bridge: only when either side declares a towgs84 shift
        if _needs_datum_shift(self.src, self.dst):
            lon, lat = _datum_shift(self.src, self.dst, lon, lat)
        # from geographic
        if self.dst.kind == "tmerc":
            return _tmerc_forward(self.dst, lon, lat)
        if self.dst.kind == "laea":
            return _laea_forward(self.dst, lon, lat)
        if self.dst.kind == "webmerc":
            return _webmerc_forward(self.dst, lon, lat)
        if self.dst.kind == "stere":
            return _stere_forward(self.dst, lon, lat)
        if self.dst.kind == "rot_pole":
            return _rot_pole_from_geographic(self.dst, lon, lat)
        if self.dst.kind == "lcc":
            return _lcc_forward(self.dst, lon, lat)
        if self.dst.kind == "aea":
            return _aea_forward(self.dst, lon, lat)
        if self.dst.kind == "sinu":
            return _sinu_forward(self.dst, lon, lat)
        if self.dst.kind == "merc":
            return _merc_forward(self.dst, lon, lat)
        if self.dst.kind == "cea":
            return _cea_forward(self.dst, lon, lat)
        if self.dst.kind == "eqc":
            return _eqc_forward(self.dst, lon, lat)
        if self.dst.kind == "geos":
            return _geos_forward(self.dst, lon, lat)
        if self.dst.kind == "omerc":
            return _omerc_forward(self.dst, lon, lat)
        if self.dst.kind == "somerc":
            return _somerc_forward(self.dst, lon, lat)
        if self.dst.kind == "krovak":
            return _krovak_forward(self.dst, lon, lat)
        if self.dst.kind == "ortho":
            return _ortho_forward(self.dst, lon, lat)
        if self.dst.kind == "moll":
            return _moll_forward(self.dst, lon, lat)
        if self.dst.kind == "sterea":
            return _sterea_forward(self.dst, lon, lat)
        if self.dst.kind == "aeqd":
            return _aeqd_forward(self.dst, lon, lat)
        if self.dst.kind == "stere_obl":
            return _stere_obl_forward(self.dst, lon, lat)
        if self.dst.kind == "nsper":
            return _nsper_forward(self.dst, lon, lat)
        if self.dst.kind == "eqearth":
            return _eqearth_forward(self.dst, lon, lat)
        dst_pm = self.dst.param("pm", 0.0)
        if dst_pm:
            # geographic target on a non-Greenwich meridian: emit
            # meridian-relative longitudes
            lon = _wrap_lon(np.asarray(lon, dtype=np.float64) - dst_pm)
        return lon, lat

    def transform_bounds(self, x_min, y_min, x_max, y_max, densify_pts: int = 21):
        """Transform a bounding box by densifying its edges
        (parity: pyproj transform_bounds, used at reference
        reproject.py:347,398).

        Geographic outputs that straddle the antimeridian (edge longitudes
        spanning a gap > 180 deg) are normalized to lon-360 before min/max,
        so the returned bbox is monotonic (east > west, east possibly
        > 180) instead of near-global.  Callers clipping -180..180 coords
        against a > 180 east bound miss the western sliver -- acceptable for
        the scale/clip estimates this feeds.
        """
        xs = np.linspace(x_min, x_max, densify_pts)
        ys = np.linspace(y_min, y_max, densify_pts)
        edge_x = np.concatenate([
            xs, xs, np.full(densify_pts, x_min), np.full(densify_pts, x_max)])
        edge_y = np.concatenate([
            np.full(densify_pts, y_min), np.full(densify_pts, y_max), ys, ys])
        tx, ty = self.transform(edge_x, edge_y)
        if self.dst.is_geographic and np.isfinite(tx).any():
            if np.nanmax(tx) - np.nanmin(tx) > 180.0:
                tx = np.where(tx < 0.0, tx + 360.0, tx)
        return (float(np.nanmin(tx)), float(np.nanmin(ty)),
                float(np.nanmax(tx)), float(np.nanmax(ty)))
