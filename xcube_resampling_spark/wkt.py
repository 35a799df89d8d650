"""WKT and PROJ-string CRS parsing (no external deps).

The reference accepts any pyproj-understood CRS input -- EPSG codes,
WKT1/WKT2 text, PROJ strings (reference gridmapping/base.py:398-400
``pyproj.crs.CRS.from_user_input``).  This module closes most of that
gap for the projection methods this engine implements: it parses

* WKT1 (OGC 01-009 / GDAL dialect): ``PROJCS[...]``, ``GEOGCS[...]``,
  incl. ``TOWGS84[...]`` datum shifts and linear ``UNIT`` factors
  (US survey foot grids work),
* WKT2 (ISO 19162:2019): ``PROJCRS[...]``, ``GEOGCRS[...]``,
  ``BOUNDCRS[...]`` with an abridged Helmert transformation,
* PROJ strings: ``+proj=... +lat_0=... +ellps=...`` for every
  implemented projection, incl. ``+proj=utm`` zone expansion and
  ``+towgs84``.

and lowers them onto the same ``CRS(kind, params)`` model the rest of
the engine uses, so any WKT whose projection method is one of the ~26
implemented families transforms exactly like its registry twin.
Unknown methods raise ``ValueError`` with the method name -- same
failure mode as an unregistered EPSG code.

Grammar reference: OGC 12-063r5 (WKT2), OGC 01-009 sec. 7 (WKT1).
"""

from __future__ import annotations

import math
import re

from .crs import CRS, _Ellipsoid, CRS_WGS84

__all__ = ["crs_from_wkt", "crs_from_proj", "crs_to_wkt",
           "crs_to_proj"]


# ---------------------------------------------------------------------- #
# WKT tokenizer / tree builder


class _Node:
    __slots__ = ("keyword", "values")

    def __init__(self, keyword: str, values: list):
        self.keyword = keyword.upper()
        self.values = values

    def children(self, *keywords) -> list["_Node"]:
        ks = {k.upper() for k in keywords}
        return [v for v in self.values
                if isinstance(v, _Node) and v.keyword in ks]

    def child(self, *keywords) -> "_Node | None":
        cs = self.children(*keywords)
        return cs[0] if cs else None

    def strings(self) -> list[str]:
        return [v for v in self.values if isinstance(v, str)]

    def numbers(self) -> list[float]:
        return [v for v in self.values if isinstance(v, float)]


_TOKEN = re.compile(
    r'\s*(?:'
    r'"((?:[^"]|"")*)"'          # quoted string ("" = escaped quote)
    r"|([A-Za-z_][A-Za-z0-9_]*)"  # keyword / bareword
    r"|([-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)"  # number
    r"|([\[\](),])"               # structure
    r")"
)


def _tokenize(s: str):
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                return
            raise ValueError(f"bad WKT near {s[pos:pos + 30]!r}")
        pos = m.end()
        if m.group(1) is not None:
            yield ("str", m.group(1).replace('""', '"'))
        elif m.group(2) is not None:
            yield ("word", m.group(2))
        elif m.group(3) is not None:
            yield ("num", float(m.group(3)))
        elif m.group(4) in "[(":
            yield ("open", None)
        elif m.group(4) in "])":
            yield ("close", None)
        # commas are separators; drop them


def _parse_wkt(s: str) -> _Node:
    tokens = list(_tokenize(s))
    pos = 0

    def parse_node():
        nonlocal pos
        kind, kw = tokens[pos]
        if kind != "word":
            raise ValueError(f"expected WKT keyword, got {tokens[pos]!r}")
        pos += 1
        values: list = []
        if pos < len(tokens) and tokens[pos][0] == "open":
            pos += 1
            while tokens[pos][0] != "close":
                k, v = tokens[pos]
                if k == "word":
                    # nested node or bareword enum (e.g. AXIS north)
                    if pos + 1 < len(tokens) and tokens[pos + 1][0] == "open":
                        values.append(parse_node())
                    else:
                        values.append(str(v))
                        pos += 1
                elif k in ("str", "num"):
                    values.append(v)
                    pos += 1
                else:
                    raise ValueError(f"unexpected token {tokens[pos]!r}")
            pos += 1  # consume close
        return _Node(kw, values)

    node = parse_node()
    if pos != len(tokens):
        raise ValueError("trailing content after WKT root node")
    return node


# ---------------------------------------------------------------------- #
# method / parameter normalization

def _norm(name: str) -> str:
    return re.sub(r"[^a-z0-9]", "", name.lower())


# normalized EPSG / GDAL / ESRI method name -> engine kind
_METHODS = {
    # Transverse Mercator (EPSG 9807)
    "transversemercator": "tmerc",
    "gausskruger": "tmerc",
    # EPSG 9808 (the South African Lo grids); GDAL WKT1 spells it
    # "Transverse_Mercator_South_Orientated"
    "transversemercatorsouthorientated": "tmerc_so",
    "transversemercatorsouthoriented": "tmerc_so",
    # LAEA (9820)
    "lambertazimuthalequalarea": "laea",
    # Web / spherical Mercator (1024)
    "popularvisualisationpseudomercator": "webmerc",
    "mercatorauxiliarysphere": "webmerc",
    # Ellipsoidal Mercator (9804 variant A, 9805 variant B)
    "mercatorvarianta": "merc",
    "mercatorvariantb": "merc_b",
    "mercator1sp": "merc",
    "mercator2sp": "merc_b",
    # Polar stereographic (9810 variant A, 9829 variant B)
    "polarstereographic": "stere",
    "polarstereographicvarianta": "stere",
    "polarstereographicvariantb": "stere",
    # LCC 2SP (9802) + 1SP (9801)
    "lambertconicconformal2sp": "lcc",
    "lambertconformalconic2sp": "lcc",
    "lambertconicconformal1sp": "lcc_1sp",
    "lambertconformalconic1sp": "lcc_1sp",
    "lambertconformalconic": "lcc",
    # Albers (9822)
    "albersequalarea": "aea",
    "albersconicequalarea": "aea",
    "albers": "aea",
    # Sinusoidal (9835-adjacent; GDAL/ESRI name)
    "sinusoidal": "sinu",
    # Lambert cylindrical equal area (9835)
    "lambertcylindricalequalarea": "cea",
    "cylindricalequalarea": "cea",
    # Equidistant cylindrical (1028/1029)
    "equidistantcylindrical": "eqc",
    "equidistantcylindricalspherical": "eqc",
    "equirectangular": "eqc",
    # Hotine Oblique Mercator variant B (9815); bare
    # "Hotine_Oblique_Mercator" is GDAL's WKT1 name for variant A
    # (9812, natural-origin anchoring -> engine param no_uoff)
    "hotineobliquemercatorvariantb": "omerc",
    "hotineobliquemercatorazimuthcenter": "omerc",
    "obliquemercator": "omerc",
    "hotineobliquemercatorvarianta": "omerc_a",
    # ESRI Rectified Skew Orthomorphic: natural-origin = variant A
    # (no_uoff anchoring), center = variant B
    "rectifiedskeworthomorphicnaturalorigin": "omerc_a",
    "rectifiedskeworthomorphiccenter": "omerc",
    "rectifiedskeworthomorphiccentre": "omerc",
    # Krovak (9819) -- east-north axis handling is the CRS's job; the
    # engine's krovak kind IS the east-north (EPSG:5514) orientation
    "krovak": "krovak",
    "krovaknorthorientated": "krovak",
    "krovakeastnorth": "krovak",
    # Swiss Oblique Mercator (9814)
    "swissobliquemercator": "somerc",
    "swissobliquecylindrical": "somerc",
    "hotineobliquemercator": "omerc_a",
    # Geostationary
    "geostationarysatellitesweepx": "geos_x",
    "geostationarysatellitesweepy": "geos_y",
    "geostationarysatellite": "geos_y",  # GDAL WKT1 legacy default
    # Orthographic (9840)
    "orthographic": "ortho",
    # Mollweide (no EPSG method; GDAL/ESRI WKT name)
    "mollweide": "moll",
    # Oblique (double) Stereographic (9809) -- RD New etc.
    "obliquestereographic": "sterea",
    "doublestereographic": "sterea",
    # Azimuthal Equidistant (1125 spherical / 9832 modified); the
    # engine computes the oblique ellipsoidal aspect along true
    # geodesics, a superset of the 9832 small-extent series
    "azimuthalequidistant": "aeqd",
    "modifiedazimuthalequidistant": "aeqd",
    # ESRI/CF general (oblique) stereographic = PROJ stere semantics;
    # a polar origin is lowered onto the polar kind in the fixups
    "stereographic": "stere_obl",
    # Vertical Perspective (9838's near-side view, spherical)
    "verticalperspective": "nsper",
    # Equal Earth (1078)
    "equalearth": "eqearth",
}

# normalized WKT parameter name -> engine parameter key (per kind where
# ambiguous; resolved in _lower_params)
_PARAMS = {
    "latitudeoftopocentricorigin": "lat_0",
    "longitudeoftopocentricorigin": "lon_0",
    "viewpointheight": "h",
    "latitudeofnaturalorigin": "lat_0",
    "latitudeoforigin": "lat_0",
    "latitudeofprojectioncentre": "lat_0",
    "latitudeofprojectioncenter": "lat_0",
    "latitudeofcenter": "lat_0",
    "latitudeoffalseorigin": "lat_0",
    "longitudeofnaturalorigin": "lon_0",
    "centralmeridian": "lon_0",
    "longitudeoforigin": "lon_0",
    "longitudeoffalseorigin": "lon_0",
    "longitudeofprojectioncentre": "lonc",
    "longitudeofprojectioncenter": "lonc",
    "longitudeofcenter": "lonc",
    "scalefactoratnaturalorigin": "k_0",
    "scalefactor": "k_0",
    "scalefactoroninitialline": "k_0",
    "scalefactoronpseudostandardparallel": "k_0",
    "falseeasting": "x_0",
    "falsenorthing": "y_0",
    "eastingatfalseorigin": "x_0",
    "northingatfalseorigin": "y_0",
    "eastingatprojectioncentre": "x_0",
    "northingatprojectioncentre": "y_0",
    "standardparallel1": "lat_1",
    "standardparallel2": "lat_2",
    "latitudeof1ststandardparallel": "lat_1",
    "latitudeof2ndstandardparallel": "lat_2",
    "latitudeofstandardparallel": "lat_ts",
    "standardparallel": "lat_1",
    "azimuthofinitialline": "alpha",
    "azimuth": "alpha",
    "anglefromrectifiedtoskewgrid": "gamma",
    "rectifiedgridangle": "gamma",
    "latitudeofpseudostandardparallel": "lat_p",
    "colatitudeofconeaxis": "_cone_colat",  # Krovak; alpha equivalent
    "satelliteheight": "h",
    "heightabovereferenceellipsoid": "h",
    "perspectivepointheight": "h",
    "sweepangleaxis": "_sweep",
    "pseudostandardparallel1": "lat_p",
}

_DEG_PER_RAD = 180.0 / math.pi

# known ellipsoid aliases (PROJ +ellps= names -> our table keys)
# engine keys holding angles in degrees (everything else is linear
# metres or a unitless scale)
_ANGULAR_KEYS = {
    "lat_0", "lon_0", "lat_1", "lat_2", "lat_ts", "lonc", "alpha",
    "gamma", "lat_p", "pole_lat", "pole_lon",
}

_ELLPS_ALIASES = {
    "wgs84": ("WGS84", 6378137.0, 298.257223563),
    "grs80": ("GRS80", 6378137.0, 298.257222101),
    "intl": ("Intl1924", 6378388.0, 297.0),
    "international1924": ("Intl1924", 6378388.0, 297.0),
    "hayford1909": ("Intl1924", 6378388.0, 297.0),
    "bessel": ("Bessel1841", 6377397.155, 299.1528128),
    "bessel1841": ("Bessel1841", 6377397.155, 299.1528128),
    "airy": ("Airy1830", 6377563.396, 299.3249646),
    "airy1830": ("Airy1830", 6377563.396, 299.3249646),
    "clrk66": ("Clarke1866", 6378206.4, 294.978698214),
    "clarke1866": ("Clarke1866", 6378206.4, 294.978698214),
    "evrst69": ("Everest1967", 6377298.556, 300.8017),
    "everest1967": ("Everest1967", 6377298.556, 300.8017),
    "clrk80ign": ("Clarke1880IGN", 6378249.2, 293.4660212936269),
    "clarke1880ign": ("Clarke1880IGN", 6378249.2, 293.4660212936269),
    "krass": ("Krassowsky1940", 6378245.0, 298.3),
    "krassowsky1940": ("Krassowsky1940", 6378245.0, 298.3),
    "wgs72": ("WGS72", 6378135.0, 298.26),
    "clrk80": ("Clarke1880RGS", 6378249.145, 293.465),
    "sphere": ("Sphere", 6370997.0, float("inf")),
}

# +datum shorthands PROJ expands to an ellipsoid (+ implicit grids/
# shifts this engine does not model -- the towgs84-less cases behave
# like PROJ without datum grids)
_DATUM_ELLPS = {
    "wgs84": "wgs84", "nad83": "grs80", "nad27": "clrk66",
    "potsdam": "bessel", "ire65": "airy", "osgb36": "airy",
}


def _unit_factor(node: _Node | None, default: float) -> float:
    """Conversion factor to the SI base (metre or radian) from a
    UNIT / LENGTHUNIT / ANGLEUNIT node.  WKT conventionally quotes the
    degree factor truncated (0.0174532925199433); snap anything within
    1e-10 relative of radians(1) to the exact value so degree-valued
    parameters survive a parse bit-for-bit."""
    if node is None:
        return default
    nums = node.numbers()
    if not nums:
        return default
    f = nums[0]
    rad1 = math.radians(1.0)
    if abs(f - rad1) < 1e-10 * rad1:
        return rad1
    return f


# the PROJ known-meridian table (Greenwich longitudes, degrees) -- used
# to disambiguate the WKT1 PRIMEM dialect split: strict OGC 01-009 puts
# the PRIMEM longitude in the GEOGCS angular UNIT, while the GDAL/ESRI
# dialect always writes degrees.  PROJ special-cases exactly this on
# import (e.g. Paris is 2.5969213 in grads OR 2.33722917 in degrees).
_KNOWN_MERIDIANS = {
    "greenwich": 0.0,
    "lisbon": -9.131906111111112,
    "paris": 2.33722917,
    "bogota": -74.08091666666667,
    "madrid": -3.687938888888889,
    "rome": 12.45233333333333,
    "bern": 7.439583333333333,
    "jakarta": 106.80771944444444,
    "ferro": -17.66666666666667,
    "brussels": 4.367975,
    "stockholm": 18.05827777777778,
    "athens": 23.7163375,
    "oslo": 10.72291666666667,
}


def _primem_deg(pm_node: "_Node", geog_unit_node) -> float:
    """PRIMEM longitude in Greenwich degrees.  A per-node ANGLEUNIT
    wins (WKT2); otherwise the WKT1 dialect split is disambiguated
    against the known-meridian table: the value is accepted as-is when
    it matches the named meridian's degree longitude (GDAL dialect),
    else scaled by the GEOGCS angular unit (strict OGC 01-009)."""
    nums = pm_node.numbers()
    if not nums:
        return 0.0
    val = nums[0]
    f = _unit_factor(pm_node.child("ANGLEUNIT", "UNIT"), None)
    if f is not None:
        return val * _ang_to_deg(f)
    g = _unit_factor(geog_unit_node, None)
    gdeg = _ang_to_deg(g) if g is not None else 1.0
    if gdeg == 1.0:
        return val
    names = pm_node.strings()
    known = _KNOWN_MERIDIANS.get(names[0].lower()) if names else None
    scaled = val * gdeg
    if known is not None:
        if abs(scaled - known) < 1e-6:
            return scaled      # strict OGC: value was in the CS unit
        if abs(val - known) < 1e-6:
            return val         # GDAL dialect: value already degrees
    return scaled


def _ang_to_deg(f: float) -> float:
    """Radian unit factor -> degree conversion factor, with the degree
    case snapped to exactly 1.0 (f * 180/pi != 1.0 in floats even when
    f == radians(1), which would smear every angular parameter by an
    ulp through a parse)."""
    return 1.0 if f == math.radians(1.0) else f * _DEG_PER_RAD


def _find_params(node: _Node) -> list[_Node]:
    out = list(node.children("PARAMETER"))
    # WKT2 nests parameters inside CONVERSION[...]
    conv = node.child("CONVERSION")
    if conv is not None:
        out.extend(conv.children("PARAMETER"))
    return out


def _find_method(node: _Node) -> str | None:
    conv = node.child("CONVERSION")
    scope = conv if conv is not None else node
    meth = scope.child("METHOD", "PROJECTION")
    if meth is None:
        meth = node.child("PROJECTION")
    if meth is None:
        return None
    names = meth.strings()
    return names[0] if names else None


def _parse_ellipsoid(node: _Node) -> tuple[_Ellipsoid, tuple]:
    """Extract (ellipsoid, towgs84) from a GEOGCS/GEOGCRS/BASEGEOGCRS
    subtree (searching DATUM -> SPHEROID/ELLIPSOID)."""
    # WKT2:2019 wraps modern datums in ENSEMBLE["...", MEMBER[...],
    # ELLIPSOID[...]] (WGS84/ETRS89); the ellipsoid child reads the same
    datum = node.child("DATUM", "TRF", "GEODETICDATUM", "ENSEMBLE")
    towgs84: tuple = ()
    ell = _Ellipsoid(6378137.0, 298.257223563)
    if datum is not None:
        sph = datum.child("SPHEROID", "ELLIPSOID")
        if sph is not None:
            nums = sph.numbers()
            if len(nums) >= 2:
                a, inv_f = nums[0], nums[1]
                # LENGTHUNIT inside ELLIPSOID (WKT2) may scale a
                lu = sph.child("LENGTHUNIT", "UNIT")
                a *= _unit_factor(lu, 1.0)
                ell = _Ellipsoid(a, inv_f if inv_f != 0.0 else float("inf"))
        tw = datum.child("TOWGS84")
        if tw is not None:
            towgs84 = tuple(tw.numbers())
            if all(v == 0.0 for v in towgs84):
                towgs84 = ()
    return ell, towgs84


def _bound_towgs84(root: _Node) -> tuple:
    """BOUNDCRS abridged transformation -> towgs84 7-tuple.

    WKT2 ABRIDGEDTRANSFORMATION parameters use EPSG names; rotations
    arrive in arc-seconds and scale as (1 + s*1e-6), matching the
    position-vector convention the engine's Helmert bridge expects.
    """
    tr = root.child("ABRIDGEDTRANSFORMATION")
    if tr is None:
        return ()
    # the engine's Helmert bridge is position-vector (EPSG 9606); a
    # Coordinate Frame rotation method (EPSG 9607/1032...) carries the
    # rotations with the OPPOSITE sign -- copying them verbatim would
    # move points ~30 m per arc-second of rotation
    method = tr.child("METHOD")
    mname = _norm(method.strings()[0]) if method and method.strings() \
        else ""
    cf = "coordinateframe" in mname
    vals = {}
    for p in tr.children("PARAMETER"):
        names = p.strings()
        nums = p.numbers()
        if names and nums:
            vals[_norm(names[0])] = nums[0]
    dx = vals.get("xaxistranslation", 0.0)
    dy = vals.get("yaxistranslation", 0.0)
    dz = vals.get("zaxistranslation", 0.0)
    rx = vals.get("xaxisrotation")
    ry = vals.get("yaxisrotation")
    rz = vals.get("zaxisrotation")
    ds = vals.get("scaledifference")
    if rx is None and ry is None and rz is None and ds is None:
        return (dx, dy, dz)
    if cf:
        rx = -rx if rx is not None else None
        ry = -ry if ry is not None else None
        rz = -rz if rz is not None else None
    if ds is not None and abs(ds - 1.0) < 0.01:
        # abridged WKT2 stores scale as (1 + ds in ppm) per ISO 19162
        # B.4; accept either the ppm difference or the ratio.  The
        # ratio subtraction smears the low bits ((1.0000040725 - 1) *
        # 1e6 = 4.072499999896451), so snap to 9 significant digits --
        # EPSG publishes ppm values to at most 7
        ds = float(f"{(ds - 1.0) * 1e6:.9g}")
    return (dx, dy, dz, rx or 0.0, ry or 0.0, rz or 0.0, ds or 0.0)


def _map_params(raw: dict, lin_f: float, ang_f_deg: float) -> dict:
    """Normalized-WKT-name params -> engine keys with unit conversion
    (no method fixups -- those run exactly once in _apply_kind_fixups)."""
    p: dict[str, float] = {}
    for name, value in raw.items():
        key = _PARAMS.get(name)
        if key is None:
            continue
        if key in ("x_0", "y_0", "h"):
            value *= lin_f
        elif key not in ("k_0", "_sweep"):
            value *= ang_f_deg
        p[key] = value
    return p


def _apply_kind_fixups(kind: str, p: dict) -> tuple:
    """Per-method parameter fixups.  Must be applied exactly once to the
    complete parameter dict: several fixups install defaults
    (setdefault), which would clobber real values if a second partial
    pass merged over them."""
    if kind == "merc_b":
        kind = "merc"
        # variant B: standard parallel instead of k_0; exact EPSG 9805
        # equivalence k_0 = cos(p1)/sqrt(1 - e2 sin^2 p1) is applied by
        # the caller (needs the ellipsoid) -- stash lat_1 under lat_ts
        p.setdefault("lat_ts", p.pop("lat_1", 0.0))
    if kind == "tmerc_so":
        kind = "tmerc"
        p["south_orient"] = 1.0
    if kind == "lcc_1sp":
        kind = "lcc"
        # 1SP: both standard parallels coincide with the origin
        lat0 = p.get("lat_0", 0.0)
        p.setdefault("lat_1", lat0)
        p.setdefault("lat_2", lat0)
    if kind == "stere_obl":
        lat0 = p.get("lat_0", 0.0)
        if abs(abs(lat0) - 90.0) < 1e-12:
            kind = "stere"
            p.setdefault("lat_ts", lat0)
        else:
            p.setdefault("k_0", 1.0)
    if kind == "stere":
        # variant A carries k_0 + lat_0=+-90 (engine's stere applies k_0
        # directly when the standard parallel is the pole); variant B
        # carries lat_ts
        p.setdefault("lat_0", 90.0 if p.get("lat_ts", 90.0) >= 0 else -90.0)
        if "lat_ts" not in p:
            p["lat_ts"] = p.get("lat_0", 90.0)
    if kind == "cea" or kind == "eqc":
        p.setdefault("lat_ts", p.pop("lat_1", 0.0))
    if kind == "aea" or kind == "lcc":
        p.setdefault("lat_1", p.get("lat_ts", 0.0))
        p.setdefault("lat_2", p.get("lat_1", 0.0))
        p.pop("lat_ts", None)
    if kind in ("omerc", "omerc_a"):
        if kind == "omerc_a":
            kind = "omerc"
            p["no_uoff"] = 1.0
        p.setdefault("lonc", p.pop("lon_0", 0.0))
        p.setdefault("gamma", p.get("alpha", 0.0))
    if kind in ("krovak", "somerc"):
        # EPSG 9819/9814 name the origin longitude "longitude of
        # projection centre" -> engine lon_0 (Krovak also stores the
        # co-latitude of the cone axis, the engine's alpha)
        if "_cone_colat" in p:
            p["alpha"] = p.pop("_cone_colat")
        if "lonc" in p:
            p.setdefault("lon_0", p.pop("lonc"))
        if kind == "krovak":
            p.setdefault("lat_p", 78.5)
    if kind.startswith("geos"):
        sweep_x = 1.0 if kind == "geos_x" else 0.0
        kind = "geos"
        p["sweep_x"] = sweep_x
        p.pop("_sweep", None)
    if kind not in ("omerc", "krovak", "somerc") and "lonc" in p:
        # GDAL WKT1 spells the center longitude of laea/aea/aeqd/sinu
        # (EPSG:3035 et al.) "longitude_of_center" -> engine lon_0; the
        # engine kernels outside the oblique-Mercator family never read
        # lonc, so dropping it would silently shift the projection
        # center (e.g. 3035 by ~700 km)
        p.setdefault("lon_0", p.pop("lonc"))
    p.pop("_cone_colat", None)
    p.pop("_sweep", None)
    return kind, tuple(sorted(p.items()))


def _merc_b_k0(ell: _Ellipsoid, lat_ts_deg: float) -> float:
    s = math.sin(math.radians(lat_ts_deg))
    return math.cos(math.radians(lat_ts_deg)) / math.sqrt(
        1.0 - ell.e2 * s * s)


def crs_from_wkt(wkt: str) -> CRS:
    """Parse WKT1 or WKT2 CRS text into an engine CRS."""
    root = _parse_wkt(wkt)
    kw = root.keyword
    if kw == "BOUNDCRS":
        src = root.child("SOURCECRS")
        if src is None:
            raise ValueError("BOUNDCRS without SOURCECRS")
        inner = [v for v in src.values if isinstance(v, _Node)][0]
        crs = _crs_from_node(inner)
        tw = _bound_towgs84(root)
        if tw:
            return CRS(crs.kind, crs.name, crs.ellipsoid, crs.params,
                       crs.auth_code, towgs84=tw)
        return crs
    return _crs_from_node(root)


def _crs_from_node(root: _Node) -> CRS:
    kw = root.keyword
    names = root.strings()
    name = names[0] if names else kw
    if kw in ("GEOGCS", "GEOGCRS", "GEODCRS"):
        # engine treats all geographic CRSs as lon-lat degrees on their
        # ellipsoid; datum shift still honored through towgs84.  A
        # non-Greenwich PRIMEM becomes a ``pm`` param the Transformer
        # shifts by (same modeling as crs_from_proj's +pm=).
        ell, towgs84 = _parse_ellipsoid(root)
        auth = _authority(root)
        pm_node = root.child("PRIMEM")
        pm = 0.0
        if pm_node is not None:
            pm = _primem_deg(pm_node, root.child("UNIT", "ANGLEUNIT"))
        if pm:
            return CRS("geographic", name, ell, (("pm", pm),),
                       auth_code=auth, towgs84=towgs84)
        if not towgs84 and abs(ell.a - 6378137.0) < 1e-6:
            return CRS_WGS84 if auth in (None, "EPSG:4326") else CRS(
                "geographic", name, ell, auth_code=auth)
        return CRS("geographic", name, ell, auth_code=auth,
                   towgs84=towgs84)
    if kw not in ("PROJCS", "PROJCRS"):
        raise ValueError(f"unsupported WKT root {kw!r}")

    geog = root.child("GEOGCS", "BASEGEOGCRS", "BASEGEODCRS")
    if geog is None:
        raise ValueError("projected WKT without a geographic base")
    ell, towgs84 = _parse_ellipsoid(geog)

    # non-Greenwich prime meridian (EPSG Krovak WKT references Ferro):
    # longitude parameters are expressed relative to it
    pm_node = geog.child("PRIMEM")
    pm_deg = 0.0
    if pm_node is not None:
        pm_deg = _primem_deg(pm_node, geog.child("UNIT", "ANGLEUNIT"))

    method_name = _find_method(root)
    if method_name is None:
        raise ValueError("projected WKT without METHOD/PROJECTION")
    kind = _METHODS.get(_norm(method_name))
    if kind is None:
        raise ValueError(
            f"unsupported projection method {method_name!r}")

    # units: WKT1 puts the linear UNIT at PROJCS level and the angular
    # UNIT inside GEOGCS; WKT2 attaches per-parameter LENGTHUNIT /
    # ANGLEUNIT and a CS-level unit
    lin_f = _unit_factor(
        root.child("UNIT", "LENGTHUNIT")
        or (root.child("CS").child("LENGTHUNIT")
            if root.child("CS") else None),
        1.0)
    ang_node = geog.child("UNIT", "ANGLEUNIT")
    ang_f_deg = _ang_to_deg(_unit_factor(ang_node, math.radians(1.0)))

    raw_plain: dict[str, float] = {}  # CS-level units apply
    raw_si: dict[str, float] = {}     # per-parameter unit already applied
    for pnode in _find_params(root):
        pnames = pnode.strings()
        pnums = pnode.numbers()
        if not pnames or not pnums:
            continue
        value = pnums[0]
        # WKT2 per-parameter units override the CS-level ones
        pu = pnode.child("LENGTHUNIT", "ANGLEUNIT", "SCALEUNIT", "UNIT")
        key = _norm(pnames[0])
        if pu is not None:
            f = _unit_factor(pu, 1.0)
            if pu.keyword == "UNIT":
                # generic WKT2 UNIT keyword: classify by what the
                # parameter MEANS, not by the factor's magnitude (a
                # centimetre false easting is linear despite f < 0.1,
                # a radian latitude is angular despite f == 1)
                angular = _PARAMS.get(key) in _ANGULAR_KEYS
            else:
                angular = pu.keyword == "ANGLEUNIT"
            if angular:
                raw_si[key] = value * _ang_to_deg(f)
            else:
                raw_si[key] = value * f
        else:
            raw_plain[key] = value

    p = _map_params(raw_plain, lin_f, ang_f_deg)
    p.update(_map_params(raw_si, 1.0, 1.0))
    kind2, params = _apply_kind_fixups(kind, p)

    if kind == "merc_b":
        merged = dict(params)
        lat_ts = merged.pop("lat_ts", 0.0)
        merged["k_0"] = _merc_b_k0(ell, lat_ts)
        params = tuple(sorted(merged.items()))

    if pm_deg:
        # same unconditional-shift rule as crs_from_proj: a missing
        # central meridian still means "0 east of this meridian"
        merged = dict(params)
        if "lonc" in merged:
            merged["lonc"] += pm_deg
        elif "pole_lon" in merged:
            merged["pole_lon"] += pm_deg
        else:
            merged["lon_0"] = merged.get("lon_0", 0.0) + pm_deg
        params = tuple(sorted(merged.items()))

    return CRS(kind2, name, ell, params, _authority(root),
               towgs84=towgs84)


def _authority(node: _Node) -> str | None:
    auth = node.child("AUTHORITY", "ID")
    if auth is None:
        return None
    parts = auth.strings()
    nums = auth.numbers()
    if len(parts) >= 2:
        return f"{parts[0]}:{parts[1]}"
    if parts and nums:
        return f"{parts[0]}:{int(nums[0])}"
    return None


# ---------------------------------------------------------------------- #
# PROJ strings

_PROJ_KINDS = {
    "longlat": "geographic",
    "latlong": "geographic",
    "lonlat": "geographic",
    "tmerc": "tmerc",
    "utm": "tmerc",
    "laea": "laea",
    "merc": "merc",      # refined below: +k vs +lat_ts vs spherical
    "webmerc": "webmerc",
    "stere": "stere",
    "lcc": "lcc",
    "aea": "aea",
    "sinu": "sinu",
    "cea": "cea",
    "eqc": "eqc",
    "omerc": "omerc",
    "somerc": "somerc",
    "krovak": "krovak",
    "geos": "geos",
    "ortho": "ortho",
    "moll": "moll",
    "eqearth": "eqearth",
    "sterea": "sterea",
    "aeqd": "aeqd",
    "nsper": "nsper",
    "ob_tran": "rot_pole",  # +o_proj=longlat rotated pole
}

_PROJ_PARAM_KEYS = {
    "lat_0": "lat_0", "lon_0": "lon_0", "k": "k_0", "k_0": "k_0",
    "x_0": "x_0", "y_0": "y_0", "lat_1": "lat_1", "lat_2": "lat_2",
    "lat_ts": "lat_ts", "lonc": "lonc", "alpha": "alpha",
    "gamma": "gamma", "h": "h",
    # not a real PROJ key (PROJ hardcodes Krovak's 78.5) but accepted so
    # crs_to_proj round-trips parameter-faithfully
    "lat_p": "lat_p",
}


def crs_from_proj(s: str) -> CRS:
    """Parse a PROJ string (``+proj=... +key=value ...``)."""
    kv: dict[str, str] = {}
    flags: set[str] = set()
    for tok in s.split():
        tok = tok.lstrip("+")
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            kv[k] = v
        else:
            flags.add(tok)
    proj = kv.get("proj")
    if proj is None:
        raise ValueError("PROJ string without +proj=")
    kind = _PROJ_KINDS.get(proj)
    if kind is None:
        raise ValueError(f"unsupported +proj={proj!r}")

    # ellipsoid: +ellps name, +a/+rf/+b overrides, +R sphere, +datum
    ell = _Ellipsoid(6378137.0, 298.257223563)
    datum = kv.get("datum", "").lower()
    if datum and datum not in _DATUM_ELLPS:
        raise ValueError(f"unsupported +datum={kv['datum']!r}")
    ellps = kv.get("ellps", "").lower() or _DATUM_ELLPS.get(
        datum, "wgs84")
    if ellps in _ELLPS_ALIASES:
        _, a, inv_f = _ELLPS_ALIASES[ellps]
        ell = _Ellipsoid(a, inv_f)
    elif "a" not in kv and "R" not in kv:
        # silently falling back to WGS84 would shift grids by up to
        # hundreds of metres (e.g. krass vs wgs84) -- same failure mode
        # as an unknown +units
        raise ValueError(f"unsupported +ellps={kv.get('ellps')!r}")
    if "R" in kv:
        ell = _Ellipsoid(float(kv["R"]), float("inf"))
    if "a" in kv:
        a = float(kv["a"])
        if "rf" in kv:
            ell = _Ellipsoid(a, float(kv["rf"]))
        elif "b" in kv:
            b = float(kv["b"])
            ell = _Ellipsoid(a, float("inf") if b == a else a / (a - b))
        else:
            ell = _Ellipsoid(a, float("inf"))

    towgs84: tuple = ()
    if "towgs84" in kv:
        towgs84 = tuple(float(v) for v in kv["towgs84"].split(","))
        if all(v == 0.0 for v in towgs84):
            towgs84 = ()

    # +pm= prime meridian: longitudes in the string are relative to it;
    # the engine stores Greenwich longitudes, so shift lon_0/lonc
    # (matching the WKT path's PRIMEM handling).  Ignoring it would
    # land e.g. NTF Paris-meridian grids ~260 km west.
    pm_raw = kv.get("pm")
    if pm_raw is not None:
        pms = {"greenwich": 0.0, "paris": 2.33722917,
               "ferro": -17.66666666666667, "rome": 12.45233333333333,
               "madrid": -3.687938888888889}
        try:
            pm_deg = float(pm_raw)
        except ValueError:
            if pm_raw.lower() not in pms:
                raise ValueError(f"unsupported +pm={pm_raw!r}")
            pm_deg = pms[pm_raw.lower()]
    else:
        pm_deg = 0.0

    if kind == "geographic":
        if pm_deg:
            # model the meridian: longitudes in this CRS are relative
            # to it (EPSG:4807 NTF-Paris style); the Transformer shifts
            # to/from Greenwich.  Silently dropping it was ~2.34 deg
            # wrong for +proj=longlat +pm=paris.
            return CRS("geographic", f"+proj={proj}", ell,
                       (("pm", pm_deg),), towgs84=towgs84)
        if not towgs84 and abs(ell.a - 6378137.0) < 1e-6 and \
                abs(ell.inv_f - 298.257223563) < 1e-6:
            return CRS_WGS84
        return CRS("geographic", f"+proj={proj}", ell, towgs84=towgs84)

    if kind == "rot_pole":
        if kv.get("o_proj", "longlat") not in ("longlat", "latlong",
                                               "lonlat"):
            raise ValueError("+proj=ob_tran only supported with "
                             "+o_proj=longlat (rotated pole)")
        if float(kv.get("o_lon_p", 0.0)) != 0.0:
            raise ValueError("+proj=ob_tran with o_lon_p != 0 (axial "
                             "rotation) is not supported")
        # PROJ <-> CF: grid_north_pole_latitude = o_lat_p,
        # grid_north_pole_longitude = lon_0 - 180; +lon_0 is relative
        # to the prime meridian, so shift to Greenwich here
        params = (
            ("pole_lat", float(kv.get("o_lat_p", 90.0))),
            ("pole_lon", float(kv.get("lon_0", 0.0)) + pm_deg - 180.0),
        )
        return CRS("rot_pole", "Rotated pole", ell, params,
                   towgs84=towgs84)

    p: dict[str, float] = {}
    for k, key in _PROJ_PARAM_KEYS.items():
        if k in kv:
            p[key] = float(kv[k])

    if proj == "utm":
        zone = int(kv["zone"])
        south = "south" in flags or "south" in kv
        p = {
            "k_0": 0.9996, "lat_0": 0.0, "lon_0": float(zone * 6 - 183),
            "x_0": 500000.0, "y_0": 10000000.0 if south else 0.0,
        }
    axis = kv.get("axis", "enu")
    if axis == "wsu":
        if kind != "tmerc":
            raise ValueError(
                f"+axis=wsu only supported for +proj=tmerc (EPSG 9808), "
                f"not +proj={proj}")
        p["south_orient"] = 1.0
    elif axis != "enu":
        raise ValueError(f"+axis={axis} is not supported")
    if proj == "merc":
        if "lat_ts" in p and "k_0" not in p:
            if math.isinf(ell.inv_f):
                # spherical Mercator with lat_ts: fold into k via sphere
                p["k_0"] = math.cos(math.radians(p.pop("lat_ts")))
            else:
                p["k_0"] = _merc_b_k0(ell, p.pop("lat_ts"))
        p.setdefault("k_0", 1.0)
        if math.isinf(ell.inv_f) and p.get("k_0") == 1.0:
            # unit-scale sphere IS the web-mercator kernel; any other
            # scale must keep the merc kernel (webmerc has no k_0 --
            # lowering would silently drop the scale, ~15.5%% at
            # lat_ts=30)
            kind = "webmerc"
            p.pop("k_0", None)
            p.pop("lat_ts", None)
    if kind == "stere":
        # PROJ defaults +lat_0 to 0 (equatorial), NOT the pole
        lat0 = p.get("lat_0", 0.0)
        if abs(lat0) != 90.0:
            # non-polar +proj=stere: PROJ's oblique conformal-latitude
            # stereographic.  PROJ ignores +lat_ts outside the polar
            # aspects -- mirror that (the parameter only defines the
            # polar scale).
            kind = "stere_obl"
            p["lat_0"] = lat0
            p.pop("lat_ts", None)
            p.setdefault("k_0", 1.0)
        else:
            p.setdefault("lat_ts", lat0)
    if kind == "lcc":
        p.setdefault("lat_1", p.get("lat_0", 0.0))
        p.setdefault("lat_2", p["lat_1"])
    if kind == "aea":
        p.setdefault("lat_1", 29.5)
        p.setdefault("lat_2", 45.5)
    if kind in ("cea", "eqc"):
        p.setdefault("lat_ts", 0.0)
    if kind == "omerc":
        if "no_uoff" in flags or "no_off" in flags:
            p["no_uoff"] = 1.0  # EPSG 9812 variant A
        p.setdefault("lonc", p.pop("lon_0", 0.0))
        p.setdefault("gamma", p.get("alpha", 0.0))
        p.setdefault("k_0", 1.0)
    if kind == "krovak":
        if "czech" in flags:
            raise NotImplementedError(
                "+proj=krovak +czech (positive southing/westing axes, "
                "EPSG:5513) is not supported; use the east-north form "
                "(EPSG:5514)")
        p.setdefault("lat_0", 49.5)
        p.setdefault("lon_0", 24.0 + 50.0 / 60)
        p.setdefault("alpha", 30.0 + 17.0 / 60 + 17.3031 / 3600)
        p.setdefault("lat_p", 78.5)
        p.setdefault("k_0", 0.9999)
    if kind == "geos":
        p["sweep_x"] = 1.0 if kv.get("sweep", "y") == "x" else 0.0
        if "h" not in p:
            raise ValueError("+proj=geos requires +h=")
    if kind == "nsper":
        if "h" not in p:
            raise ValueError("+proj=nsper requires +h=")

    # engine convention: projected axes are always metres (WKT parsing
    # normalizes foot grids the same way).  +units/+to_meter scale the
    # false origin; other linear params (+h) are metres in PROJ already.
    unit = kv.get("units", "m")
    to_m = {"m": 1.0, "meter": 1.0, "metre": 1.0,
            "us-ft": 1200.0 / 3937.0, "ft": 0.3048}.get(unit)
    if "to_meter" in kv:
        to_m = float(kv["to_meter"])
    if to_m is None:
        raise ValueError(f"unsupported +units={unit!r}")
    if to_m != 1.0:
        for fk in ("x_0", "y_0"):
            if fk in p:
                p[fk] *= to_m

    p.setdefault("x_0", 0.0)
    p.setdefault("y_0", 0.0)
    if pm_deg:
        # shift the kind's canonical longitude unconditionally: PROJ
        # defaults +lon_0 to 0 RELATIVE TO THE MERIDIAN, so a string
        # without an explicit +lon_0 still means lon_0 = pm at
        # Greenwich (the old `if lk in p` guard silently kept 0)
        if "lonc" in p:
            p["lonc"] += pm_deg
        else:
            p["lon_0"] = p.get("lon_0", 0.0) + pm_deg
    return CRS(kind, f"+proj={proj}", ell, tuple(sorted(p.items())),
               towgs84=towgs84)


# ---------------------------------------------------------------------- #
# WKT2 emission (pyproj CRS.to_wkt parity for the implemented families)

_DEG_UNIT = 'ANGLEUNIT["degree",0.0174532925199433]'
_M_UNIT = 'LENGTHUNIT["metre",1]'


def _q(name: str) -> str:
    """Quote a WKT string value, escaping embedded quotes as \"\"
    (the tokenizer's own escape), so names containing quotes survive
    the parse-emit closure instead of producing malformed WKT."""
    return '"' + str(name).replace('"', '""') + '"'

# kind -> (EPSG method name, [(wkt param name, engine key, kind_)])
# kind_ 'a' = angular (degree), 'l' = linear (metre), 's' = scale
_EMIT = {
    "tmerc": ("Transverse Mercator", [
        ("Latitude of natural origin", "lat_0", "a"),
        ("Longitude of natural origin", "lon_0", "a"),
        ("Scale factor at natural origin", "k_0", "s"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "laea": ("Lambert Azimuthal Equal Area", [
        ("Latitude of natural origin", "lat_0", "a"),
        ("Longitude of natural origin", "lon_0", "a"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "webmerc": ("Popular Visualisation Pseudo Mercator", [
        ("Longitude of natural origin", "lon_0", "a"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "merc": ("Mercator (variant A)", [
        ("Longitude of natural origin", "lon_0", "a"),
        ("Scale factor at natural origin", "k_0", "s"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "cea": ("Lambert Cylindrical Equal Area", [
        ("Latitude of 1st standard parallel", "lat_ts", "a"),
        ("Longitude of natural origin", "lon_0", "a"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "eqc": ("Equidistant Cylindrical", [
        ("Latitude of 1st standard parallel", "lat_ts", "a"),
        ("Longitude of natural origin", "lon_0", "a"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "stere": ("Polar Stereographic (variant B)", [
        ("Latitude of standard parallel", "lat_ts", "a"),
        ("Longitude of origin", "lon_0", "a"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "lcc": ("Lambert Conic Conformal (2SP)", [
        ("Latitude of false origin", "lat_0", "a"),
        ("Longitude of false origin", "lon_0", "a"),
        ("Latitude of 1st standard parallel", "lat_1", "a"),
        ("Latitude of 2nd standard parallel", "lat_2", "a"),
        ("Easting at false origin", "x_0", "l"),
        ("Northing at false origin", "y_0", "l"),
    ]),
    "aea": ("Albers Equal Area", [
        ("Latitude of false origin", "lat_0", "a"),
        ("Longitude of false origin", "lon_0", "a"),
        ("Latitude of 1st standard parallel", "lat_1", "a"),
        ("Latitude of 2nd standard parallel", "lat_2", "a"),
        ("Easting at false origin", "x_0", "l"),
        ("Northing at false origin", "y_0", "l"),
    ]),
    "sinu": ("Sinusoidal", [
        ("Longitude of natural origin", "lon_0", "a"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "krovak": ("Krovak", [
        ("Latitude of projection centre", "lat_0", "a"),
        ("Longitude of projection centre", "lon_0", "a"),
        ("Co-latitude of cone axis", "alpha", "a"),
        ("Latitude of pseudo standard parallel", "lat_p", "a"),
        ("Scale factor on pseudo standard parallel", "k_0", "s"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "somerc": ("Swiss Oblique Mercator", [
        ("Latitude of projection centre", "lat_0", "a"),
        ("Longitude of projection centre", "lon_0", "a"),
        ("Scale factor at natural origin", "k_0", "s"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "omerc": ("Hotine Oblique Mercator (variant B)", [
        ("Latitude of projection centre", "lat_0", "a"),
        ("Longitude of projection centre", "lonc", "a"),
        ("Azimuth of initial line", "alpha", "a"),
        ("Angle from Rectified to Skew Grid", "gamma", "a"),
        ("Scale factor on initial line", "k_0", "s"),
        ("Easting at projection centre", "x_0", "l"),
        ("Northing at projection centre", "y_0", "l"),
    ]),
    "ortho": ("Orthographic", [
        ("Latitude of natural origin", "lat_0", "a"),
        ("Longitude of natural origin", "lon_0", "a"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "stere_obl": ("Stereographic", [
        ("Latitude of natural origin", "lat_0", "a"),
        ("Longitude of natural origin", "lon_0", "a"),
        ("Scale factor at natural origin", "k_0", "s"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "nsper": ("Vertical Perspective", [
        ("Latitude of topocentric origin", "lat_0", "a"),
        ("Longitude of topocentric origin", "lon_0", "a"),
        ("Viewpoint height", "h", "l"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "aeqd": ("Azimuthal Equidistant", [
        ("Latitude of natural origin", "lat_0", "a"),
        ("Longitude of natural origin", "lon_0", "a"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "sterea": ("Oblique Stereographic", [
        ("Latitude of natural origin", "lat_0", "a"),
        ("Longitude of natural origin", "lon_0", "a"),
        ("Scale factor at natural origin", "k_0", "s"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "moll": ("Mollweide", [
        ("Longitude of natural origin", "lon_0", "a"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
    "eqearth": ("Equal Earth", [
        ("Longitude of natural origin", "lon_0", "a"),
        ("False easting", "x_0", "l"),
        ("False northing", "y_0", "l"),
    ]),
}


def _num(v: float) -> str:
    return repr(float(v))


def _emit_ellipsoid(ell: _Ellipsoid) -> str:
    name = "unnamed"
    for alias, (key, a, inv_f) in _ELLPS_ALIASES.items():
        if abs(ell.a - a) < 1e-9 and (
                math.isinf(ell.inv_f) and math.isinf(inv_f)
                or abs(ell.inv_f - inv_f) < 1e-9):
            name = key
            break
    inv_f = 0.0 if math.isinf(ell.inv_f) else ell.inv_f
    return (f'ELLIPSOID["{name}",{_num(ell.a)},{_num(inv_f)},{_M_UNIT}]')


def _emit_geog(crs: CRS, name: str) -> str:
    pm = crs.param("pm", 0.0) if crs.kind == "geographic" else 0.0
    primem = f'PRIMEM["unknown",{pm!r},{_DEG_UNIT}],' if pm else ""
    return (
        f'GEOGCRS[{_q(name)},'
        f'DATUM[{_q(name)},{_emit_ellipsoid(crs.ellipsoid)}],'
        f'{primem}'
        f'CS[ellipsoidal,2],'
        f'AXIS["geodetic latitude (Lat)",north,{_DEG_UNIT}],'
        f'AXIS["geodetic longitude (Lon)",east,{_DEG_UNIT}]]'
    )


def crs_to_wkt(crs: CRS) -> str:
    """Emit ISO 19162 WKT2 for an engine CRS.

    ``crs_from_wkt(crs_to_wkt(c))`` is transform-identical to ``c`` for
    every implemented projected family (whole-registry property test);
    datum-shifted CRSs wrap in a BOUNDCRS with the abridged Helmert.
    Rotated-pole grids have no standard WKT projected form -- use
    ``to_cf()`` / PROJ ``+proj=ob_tran`` for those.
    """
    if crs.kind == "geographic":
        body = _emit_geog(crs, crs.name or "unknown")
    elif crs.kind == "rot_pole":
        raise ValueError(
            "rotated-pole grids have no standard WKT form; use to_cf() "
            "or a +proj=ob_tran string")
    else:
        if crs.kind == "geos":
            sweep = "X" if crs.param("sweep_x", 0.0) == 1.0 else "Y"
            method = f"Geostationary Satellite (Sweep {sweep})"
            plist = [
                ("Longitude of natural origin", "lon_0", "a"),
                ("Satellite height", "h", "l"),
                ("False easting", "x_0", "l"),
                ("False northing", "y_0", "l"),
            ]
        else:
            if crs.kind not in _EMIT:
                raise ValueError(f"no WKT emitter for kind {crs.kind!r}")
            method, plist = _EMIT[crs.kind]
            if crs.kind == "tmerc" and crs.param("south_orient", 0.0):
                # EPSG 9808: same parameters, reflected axes
                method = "Transverse Mercator (South Orientated)"
            if crs.kind == "stere" and \
                    abs(crs.param("lat_ts", 90.0)) >= 90.0 - 1e-12 and \
                    crs.param("k_0", 1.0) != 1.0:
                # EPSG 9810 variant A (UPS): the k_0-at-the-pole form;
                # emitting variant B's standard parallel would silently
                # drop the 0.994 scale factor
                method = "Polar Stereographic (variant A)"
                plist = [
                    ("Latitude of natural origin", "lat_0", "a"),
                    ("Longitude of natural origin", "lon_0", "a"),
                    ("Scale factor at natural origin", "k_0", "s"),
                    ("False easting", "x_0", "l"),
                    ("False northing", "y_0", "l"),
                ]
            if crs.kind == "lcc" and crs.param("k_0", 1.0) != 1.0:
                # EPSG 9801 (1SP): the only LCC method that carries a
                # scale factor; requires coincident parallels at the
                # natural origin
                if not (crs.param("lat_1") ==
                        crs.param("lat_2", crs.param("lat_1")) ==
                        crs.param("lat_0")):
                    raise ValueError(
                        "LCC with k_0 != 1 and distinct standard "
                        "parallels has no WKT method")
                method = "Lambert Conic Conformal (1SP)"
                plist = [
                    ("Latitude of natural origin", "lat_0", "a"),
                    ("Longitude of natural origin", "lon_0", "a"),
                    ("Scale factor at natural origin", "k_0", "s"),
                    ("False easting", "x_0", "l"),
                    ("False northing", "y_0", "l"),
                ]
            if crs.kind == "omerc" and crs.param("no_uoff", 0.0):
                # EPSG 9812: natural-origin anchoring and FE/FN names
                method = "Hotine Oblique Mercator (variant A)"
                plist = [
                    ("False easting" if k == "x_0" else
                     "False northing" if k == "y_0" else n, k, u)
                    for n, k, u in plist
                ]
        params = ",".join(
            # scale factors default to 1.0 (param()'s generic 0.0 would
            # emit k_0=0 for a CRS that never stored it -- the engine
            # kernels read k_0 with default 1, so the reparse must too)
            f'PARAMETER["{pname}",'
            f'{_num(crs.param(key, 1.0 if k == "s" else 0.0))},'
            + (_DEG_UNIT if k == "a" else _M_UNIT if k == "l"
               else 'SCALEUNIT["unity",1]')
            + "]"
            for pname, key, k in plist
        )
        base = _emit_geog(crs, "base geographic CRS")
        # GEOGCRS -> BASEGEOGCRS (same structure, base role keyword)
        base = "BASEGEOGCRS" + base[len("GEOGCRS"):]
        ident = ""
        if crs.auth_code and ":" in crs.auth_code:
            auth, code = crs.auth_code.split(":", 1)
            if code.isdigit():
                ident = f',ID["{auth}",{code}]'
        if crs.kind == "tmerc" and crs.param("south_orient", 0.0):
            axes = (f'AXIS["westing (Y)",west,{_M_UNIT}],'
                    f'AXIS["southing (X)",south,{_M_UNIT}]')
        else:
            axes = (f'AXIS["(E)",east,{_M_UNIT}],'
                    f'AXIS["(N)",north,{_M_UNIT}]')
        body = (
            f'PROJCRS[{_q(crs.name or "unnamed")},'
            f"{base},"
            f'CONVERSION["unnamed",METHOD["{method}"],{params}],'
            f'CS[Cartesian,2],'
            f"{axes}"
            f"{ident}]"
        )
    if not crs.towgs84:
        return body
    tw = crs.towgs84 + (0.0,) * (7 - len(crs.towgs84))
    # ISO 19162 abridged Helmert: rotations in arc-seconds, scale as
    # the (1 + ds-ppm * 1e-6) ratio
    t_params = ",".join(
        f'PARAMETER["{n}",{_num(v)}]'
        for n, v in (
            ("X-axis translation", tw[0]),
            ("Y-axis translation", tw[1]),
            ("Z-axis translation", tw[2]),
            ("X-axis rotation", tw[3]),
            ("Y-axis rotation", tw[4]),
            ("Z-axis rotation", tw[5]),
            ("Scale difference", 1.0 + tw[6] * 1e-6),
        )
    )
    return (
        f"BOUNDCRS[SOURCECRS[{body}],"
        f'TARGETCRS[{_emit_geog(CRS_WGS84, "WGS 84")}],'
        f'ABRIDGEDTRANSFORMATION["to WGS 84",'
        f'METHOD["Position Vector transformation (geog2D domain)"],'
        f"{t_params}]]"
    )


# ---------------------------------------------------------------------- #
# PROJ-string emission (pyproj CRS.to_proj4 parity)

_PROJ_NAMES = {v: k for k, v in _PROJ_KINDS.items()
               if v not in ("geographic", "rot_pole")}
_PROJ_NAMES["merc"] = "merc"
_PROJ_NAMES["stere_obl"] = "stere"
_PROJ_NAMES["webmerc"] = "webmerc"
_PROJ_NAMES["tmerc"] = "tmerc"


def _ellps_token(ell: _Ellipsoid) -> str:
    for alias, (_, a, inv_f) in _ELLPS_ALIASES.items():
        if alias in ("international1924", "hayford1909", "bessel1841",
                     "airy1830", "clarke1866", "everest1967",
                     "clarke1880ign"):
            continue  # emit the canonical short PROJ names only
        if abs(ell.a - a) < 1e-9 and not math.isinf(ell.inv_f) \
                and abs(ell.inv_f - inv_f) < 1e-9:
            return f"+ellps={alias.upper() if alias in ('wgs84', 'grs80') else alias}"
    if math.isinf(ell.inv_f):
        return f"+R={ell.a!r}"
    return f"+a={ell.a!r} +rf={ell.inv_f!r}"


def crs_to_proj(crs: CRS) -> str:
    """Emit a PROJ string for an engine CRS; ``crs_from_proj`` of the
    result is parameter-identical (closure-tested).  Rotated pole emits
    the ``+proj=ob_tran`` form."""
    ell = _ellps_token(crs.ellipsoid)
    tw = ""
    if crs.towgs84:
        tw = " +towgs84=" + ",".join(repr(float(v)) for v in crs.towgs84)
    if crs.kind == "geographic":
        pm = crs.param("pm", 0.0)
        pm_tok = f" +pm={float(pm)!r}" if pm else ""
        return f"+proj=longlat{pm_tok} {ell}{tw} +no_defs"
    if crs.kind == "rot_pole":
        return (
            f"+proj=ob_tran +o_proj=longlat"
            f" +o_lat_p={crs.param('pole_lat')!r}"
            f" +lon_0={crs.param('pole_lon') + 180.0!r}"
            f" {ell}{tw} +no_defs"
        )
    name = _PROJ_NAMES.get(crs.kind)
    if name is None:
        raise ValueError(f"no PROJ emitter for kind {crs.kind!r}")
    parts = [f"+proj={name}"]
    skip = {"sweep_x", "no_uoff", "south_orient"}
    key_map = {"k_0": "k"}
    for k, v in crs.params:
        if k in skip:
            continue
        parts.append(f"+{key_map.get(k, k)}={float(v)!r}")
    if crs.kind == "geos":
        parts.append(
            "+sweep=" + ("x" if crs.param("sweep_x") == 1.0 else "y"))
    if crs.kind == "omerc" and crs.param("no_uoff", 0.0):
        parts.append("+no_uoff")
    if crs.kind == "tmerc" and crs.param("south_orient", 0.0):
        parts.append("+axis=wsu")  # PROJ's spelling of EPSG 9808
    parts.append(ell)
    if tw:
        parts.append(tw.strip())
    parts.append("+no_defs")
    return " ".join(parts)
