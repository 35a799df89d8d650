"""Scan target-grid candidates for a geostationary rectify driver query.

Emulates the DuckDB rectify oracle (quads -> barycentric -> winners ->
nearest) in numpy over the geos-swath lon/lat coords, and reports the
margins that decide cross-engine hash stability:
  - min |frac(src_if/jf) - 0.5|  (nearest rounding flips)
  - min distance of u/v from the -0.001 / 1.002 epsilon thresholds
  - x/y scale vs target res (must stay >= ~1.05 so SCALE_LIMIT=0.95
    never fires)
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from xcube_resampling_spark.crs import CRS, CRS_WGS84, Transformer

RW, RH = 25, 40

GEO_H_SAT = 35785831.0
GEO_LON0 = 9.0

# swath in geos scan space (meters), sheared
SX0, SAX, SBX = -300.0, 55.0, 7.0
SY0, SCY, SDY = 4719800.0, -52.0, 6.0


def swath_lonlat():
    jj, ii = np.meshgrid(np.arange(RH), np.arange(RW), indexing="ij")
    sx = SX0 + SAX * ii + SBX * jj
    sy = SY0 + SCY * jj + SDY * ii
    geo = CRS.geostationary(lon_0=GEO_LON0, sweep="x", h=GEO_H_SAT)
    tr = Transformer.from_crs(geo, CRS_WGS84)
    lon, lat = tr.transform(sx.ravel(), sy.ravel())
    return lon.reshape(RH, RW), lat.reshape(RH, RW)


def margins(lon, lat, tw, th, x0, ymax, res):
    eps_lo, eps_hi = -0.001, 1.002
    min_half = np.inf
    min_eps = np.inf
    n_cover = 0
    winners = {}
    for j0 in range(RH - 1):
        for i0 in range(RW - 1):
            p = [
                (lon[j0, i0], lat[j0, i0]),
                (lon[j0, i0 + 1], lat[j0, i0 + 1]),
                (lon[j0 + 1, i0], lat[j0 + 1, i0]),
                (lon[j0 + 1, i0 + 1], lat[j0 + 1, i0 + 1]),
            ]
            (p0x, p0y), (p1x, p1y), (p2x, p2y), (p3x, p3y) = p
            xs = [q[0] for q in p]
            ys = [q[1] for q in p]
            bi0 = max(int(min(np.floor((x - x0) / res) for x in xs)), 0)
            bi1 = min(int(max(np.floor((x - x0) / res) for x in xs)), tw - 1)
            bj0 = max(int(min(np.floor((y - ymax) / -res) for y in ys)), 0)
            bj1 = min(int(max(np.floor((y - ymax) / -res) for y in ys)),
                      th - 1)
            if bi1 < bi0 or bj1 < bj0:
                continue
            det_a = (p0x - p1x) * (p0y - p2y) - (p0x - p2x) * (p0y - p1y)
            det_b = (p3x - p2x) * (p3y - p1y) - (p3x - p1x) * (p3y - p2y)
            if det_a == 0.0 and det_b == 0.0:
                continue
            for dj in range(bj0, bj1 + 1):
                for di in range(bi0, bi1 + 1):
                    dx = x0 + (di + 0.5) * res
                    dy = ymax + (dj + 0.5) * -res
                    tri = None
                    if det_a != 0.0:
                        u = ((p0x - dx) * (p0y - p2y)
                             - (p0y - dy) * (p0x - p2x)) / det_a
                        v = ((p0y - dy) * (p0x - p1x)
                             - (p0x - dx) * (p0y - p1y)) / det_a
                        d = min(abs(u - eps_lo), abs(v - eps_lo),
                                abs(u + v - eps_hi))
                        min_eps = min(min_eps, d)
                        if u >= eps_lo and v >= eps_lo and u + v <= eps_hi:
                            tri = 0
                            sif = i0 + min(max(u, 0.0), 1.0)
                            sjf = j0 + min(max(v, 0.0), 1.0)
                    if tri is None and det_b != 0.0:
                        u = ((p3x - dx) * (p3y - p1y)
                             - (p3y - dy) * (p3x - p1x)) / det_b
                        v = ((p3y - dy) * (p3x - p2x)
                             - (p3x - dx) * (p3y - p2y)) / det_b
                        d = min(abs(u - eps_lo), abs(v - eps_lo),
                                abs(u + v - eps_hi))
                        min_eps = min(min_eps, d)
                        if u >= eps_lo and v >= eps_lo and u + v <= eps_hi:
                            tri = 1
                            sif = i0 + 1 - min(max(u, 0.0), 1.0)
                            sjf = j0 + 1 - min(max(v, 0.0), 1.0)
                    if tri is None:
                        continue
                    key = (dj, di)
                    cand = (j0, i0, tri, sif, sjf)
                    if key not in winners or cand[:3] < winners[key][:3]:
                        winners[key] = cand
    for (dj, di), (j0, i0, tri, sif, sjf) in winners.items():
        n_cover += 1
        min_half = min(min_half,
                       abs(sif - np.floor(sif) - 0.5),
                       abs(sjf - np.floor(sjf) - 0.5))
    return min_half, min_eps, n_cover


def main():
    lon, lat = swath_lonlat()
    print(f"lon range {lon.min():.6f}..{lon.max():.6f}")
    print(f"lat range {lat.min():.6f}..{lat.max():.6f}")
    # ground res of the swath in degrees (i and j steps)
    dlon_i = np.abs(np.diff(lon, axis=1)).mean()
    dlat_j = np.abs(np.diff(lat, axis=0)).mean()
    print(f"mean dlon/i {dlon_i:.8f}  mean dlat/j {dlat_j:.8f}")

    # target res: must be >= coord-res/0.95; try a few, offsets scanned
    rng = np.random.default_rng(7)
    best = None
    for res in (max(dlon_i, dlat_j) * 1.1, max(dlon_i, dlat_j) * 1.25):
        tw = int((lon.max() - lon.min()) / res) + 2
        th = int((lat.max() - lat.min()) / res) + 2
        for _ in range(40):
            x0 = lon.min() - res * rng.uniform(0.2, 0.9)
            ymax = lat.max() + res * rng.uniform(0.2, 0.9)
            mh, me, nc = margins(lon, lat, tw, th, x0, ymax, res)
            score = min(mh, me)
            cand = (score, mh, me, nc, res, tw, th, x0, ymax)
            if best is None or score > best[0]:
                best = cand
                print(f"best: half={mh:.2e} eps={me:.2e} cover={nc}"
                      f"/{tw*th} res={res:.8f} tw={tw} th={th}"
                      f" x0={x0!r} ymax={ymax!r}")
    print("FINAL", best)


if __name__ == "__main__":
    main()
