"""Distributed reverse geocode: (lat, lon) points -> region assignments.

Re-expresses the reference's computational core
``utilities.reverse_geocode`` (/root/reference/geocode/utilities.py:238-289):

  1. points reprojected into the regions' space     -> prep normalizes
     regions to WGS84 instead (regions.py), same assignments
  2. R-tree candidate lookup + exact ``contains``   -> covering-cell equi-join
     (broadcast) + ray-cast PIP in Arrow batches; *interior* cells skip the
     exact test (raster/vector shortcut)
  3. boundary-tie dedup keep-first                  -> min(region_seq) per row
     (region_seq = stable region input order, GeoPandas keep-first parity)
  4. bounded nearest for misses (sjoin_nearest)     -> k-ring expansion over
     neighbour cells + exact point-to-polygon distance, take argmin
  5. NA -> None normalization                       -> SQL NULL natively

Two physical strategies, both shuffle-free on the candidate side:

* ``fused`` (default): one ``mapInPandas`` pass per partition — cell encode,
  candidate probe against the broadcast cover map, ray-cast, dedup, and kNN
  fallback all inside a single Arrow batch. Zero shuffles; the plan is
  scan -> mapInPandas -> (sink). Skew-proof: no shuffle keys exist.
* ``join``: Catalyst-visible BroadcastHashJoin of points vs the covering-cell
  map, then mapInPandas PIP on candidates, then one aggregation shuffle per
  row_id. Useful when the candidate set should be materialized / audited.

At 100 TB the fused path streams straight off the scan with per-partition
Python workers doing vectorized numpy; nothing is collected to the driver.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from ..cells import cell_of, cell_to_ij, cell_from_ij
from ..geometry import (METERS_PER_DEG, PreparedPolygon,
                        dist_to_polygon_m_prepared, dist_to_polygon_prepared,
                        points_in_polygon_prepared)
from ..regions import PreparedRegions


class _CoverIndex:
    """Executor-side probe structure over one broadcast (cover, geoms) pair,
    built ONCE per python worker and reused across every Arrow batch.

    The previous per-batch ``pandas.merge`` against the cover DataFrame
    re-factorized the FULL cover map for every ~10k-row batch (work and
    memory traffic proportional to |cover|, not |batch|) and materialized
    object-dtype candidate frames. This index pays one sort at build time,
    then probes are ``searchsorted`` + ragged gathers over int arrays:
    per-batch work proportional to the batch, no per-batch pandas objects,
    and region geometry is edge-decomposed once (PreparedPolygon y-bucket
    tables) instead of per call.

    Everything is derived from the broadcast values, so the index is pure
    cache: same candidates, same keep-first ordering, same kernels.
    """

    __slots__ = ("cover", "geoms", "cells", "starts", "cand_rid", "cand_seq",
                 "cand_interior", "rids", "bbox", "_pp", "_knn")

    def __init__(self, cover: pd.DataFrame, geoms: dict):
        self.cover = cover    # strong refs pin the id()-based cache key
        self.geoms = geoms
        if cover is None or len(cover) == 0:
            z = np.empty(0, np.int64)
            self.cells = z
            self.starts = np.zeros(1, np.int64)
            self.cand_rid = z
            self.cand_seq = z
            self.cand_interior = np.empty(0, bool)
            self.rids = np.empty(0, object)
        else:
            cells = cover["cell"].to_numpy(np.int64)
            codes, rids = pd.factorize(cover["region_id"])
            self.rids = np.asarray(rids, dtype=object)
            order = np.argsort(cells, kind="stable")
            sc = cells[order]
            first = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
            self.cells = sc[first]
            self.starts = np.r_[first, len(sc)].astype(np.int64)
            self.cand_rid = np.asarray(codes, np.int64)[order]
            self.cand_seq = cover["region_seq"].to_numpy(np.int64)[order]
            self.cand_interior = cover["interior"].to_numpy(bool)[order]
        self.bbox = [geoms[r][3] for r in self.rids]
        self._pp: list = [None] * len(self.rids)  # lazy PreparedPolygon
        self._knn = None

    def prepared(self, r: int) -> PreparedPolygon:
        pp = self._pp[r]
        if pp is None:
            xs, ys, offs, _bbox = self.geoms[self.rids[r]]
            pp = self._pp[r] = PreparedPolygon(xs, ys, offs)
        return pp

    def lookup(self, pcells: np.ndarray):
        """cells -> (pt, slot): pt indexes the probe arrays, slot the
        candidate arrays (one row per matching cover entry)."""
        if len(self.cells) == 0 or len(pcells) == 0:
            z = np.empty(0, np.int64)
            return z, z
        loc = np.searchsorted(self.cells, pcells)
        np.minimum(loc, len(self.cells) - 1, out=loc)
        h = np.flatnonzero(self.cells[loc] == pcells)
        s = self.starts[loc[h]]
        cnt = self.starts[loc[h] + 1] - s
        tot = int(cnt.sum())
        if tot == 0:
            z = np.empty(0, np.int64)
            return z, z
        slot = np.repeat(s - np.r_[np.int64(0), np.cumsum(cnt)[:-1]], cnt) \
            + np.arange(tot, dtype=np.int64)
        return np.repeat(h, cnt), slot

    def knn_table(self):
        """Deduplicated (cell -> region) table for the ring expansion,
        cover-row order preserved within each cell (tie parity with the
        previous merge-based probe)."""
        if self._knn is None:
            if self.cover is None or len(self.cover) == 0:
                z = np.empty(0, np.int64)
                self._knn = (z, np.zeros(1, np.int64), z)
            else:
                small = self.cover[["cell", "region_id"]].drop_duplicates()
                kcells = small["cell"].to_numpy(np.int64)
                rmap = {r: i for i, r in enumerate(self.rids)}
                krid = small["region_id"].map(rmap).to_numpy(np.int64)
                order = np.argsort(kcells, kind="stable")
                sc = kcells[order]
                first = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
                self._knn = (sc[first],
                             np.r_[first, len(sc)].astype(np.int64),
                             krid[order])
        return self._knn


# Per-worker index cache: (id(cover), id(geoms)) -> _CoverIndex. Strong refs
# inside the index pin both id()s (no stale-alias risk); python workers are
# single-threaded per process, so no lock. FIFO-bounded — the index is a few
# MB (ints parallel to the cover rows + edge tables), entries only turn over
# when a worker serves many distinct region sets.
_INDEX_CACHE: OrderedDict = OrderedDict()
_INDEX_CACHE_SIZE = 4


def _get_prepared_geoms(geoms: dict) -> dict:
    """Per-worker lazy {region_id -> PreparedPolygon} cache for code paths
    that carry only the geometry broadcast (join strategy). Same FIFO bound
    and id-pinning discipline as _get_index."""
    key = ("geoms", id(geoms))
    hit = _INDEX_CACHE.get(key)
    if hit is not None and hit[0] is geoms:
        _INDEX_CACHE.move_to_end(key)
        return hit[1]
    entry = (geoms, {})
    _INDEX_CACHE[key] = entry
    while len(_INDEX_CACHE) > _INDEX_CACHE_SIZE:
        _INDEX_CACHE.popitem(last=False)
    return entry[1]


def _get_index(cover: pd.DataFrame, geoms: dict) -> _CoverIndex:
    key = (id(cover), id(geoms))
    hit = _INDEX_CACHE.get(key)
    if hit is not None and hit.cover is cover and hit.geoms is geoms:
        _INDEX_CACHE.move_to_end(key)
        return hit
    idx = _CoverIndex(cover, geoms)
    _INDEX_CACHE[key] = idx
    while len(_INDEX_CACHE) > _INDEX_CACHE_SIZE:
        _INDEX_CACHE.popitem(last=False)
    return idx


def _assign_batch(index: _CoverIndex, lat: np.ndarray, lon: np.ndarray,
                  res: int) -> np.ndarray:
    """One batch of finite points -> object array of region ids (None=miss).

    Same pipeline as before, all-numpy: covering-cell probe, interior-cell
    raster shortcut, bbox prefilter + bucketed ray-cast per region for
    boundary candidates, keep-first (min region_seq) per point — GeoPandas
    keep-first parity (utilities.py:268-269)."""
    rid_out = np.full(len(lat), None, dtype=object)
    pt, slot = index.lookup(cell_of(lat, lon, res))
    if len(pt) == 0:
        return rid_out
    inside = index.cand_interior[slot].copy()
    bnd = np.flatnonzero(~inside)
    if bnd.size:
        ridb = index.cand_rid[slot[bnd]]
        px = lon[pt[bnd]]
        py = lat[pt[bnd]]
        ok = np.zeros(bnd.size, dtype=bool)
        order = np.argsort(ridb, kind="stable")
        rs = ridb[order]
        gb = np.flatnonzero(np.r_[True, rs[1:] != rs[:-1]])
        ge = np.r_[gb[1:], len(rs)]
        for g0, g1 in zip(gb, ge):         # one ray-cast batch per polygon
            rows = order[g0:g1]
            r = int(rs[g0])
            bb = index.bbox[r]
            pxg = px[rows]
            pyg = py[rows]
            in_bbox = ((pxg >= bb[0]) & (pxg <= bb[2])
                       & (pyg >= bb[1]) & (pyg <= bb[3]))
            m = np.zeros(rows.size, dtype=bool)
            if in_bbox.any():
                m[in_bbox] = points_in_polygon_prepared(
                    pxg[in_bbox], pyg[in_bbox], index.prepared(r))
            ok[rows] = m
        inside[bnd] = ok
    hit = np.flatnonzero(inside)
    if hit.size == 0:
        return rid_out
    hp = pt[hit]
    hs = index.cand_seq[slot[hit]]
    o = np.lexsort((hs, hp))
    keep = np.r_[True, hp[o][1:] != hp[o][:-1]]
    sel = hit[o[keep]]
    rid_out[pt[sel]] = index.rids[index.cand_rid[slot[sel]]]
    return rid_out


def _knn_fallback(miss_pos: np.ndarray, px: np.ndarray, py: np.ndarray,
                  index: _CoverIndex, res: int, max_distance: float,
                  max_k: int | None = None,
                  metric: bool = False) -> pd.DataFrame:
    """Ring-expansion bounded nearest-region (sjoin_nearest semantics,
    utilities.py:270-284).

    Distance unit: degrees (prep space) when ``metric=False``, METRES when
    ``metric=True`` (local equirectangular scaling — the reference's
    ``max_distance`` is in the regions' CRS units, which is metres for every
    BNG-sourced dataset, utilities.py:253-255).

    Fully vectorized: each round k expands every unresolved point's
    neighbour disc at once (broadcasted i/j grids), one searchsorted probe
    against the index's (cell -> region) table, then per-region batched
    exact distances. A point is final once its best distance is provably
    inside the already-searched radius (no closer region can appear in a
    later ring)."""
    n = np.int64(1) << res
    out_rid = np.full(len(miss_pos), None, dtype=object)
    out_dist = np.full(len(miss_pos), np.inf)
    _, ci, cj = cell_to_ij(cell_of(py, px, res))
    unresolved = np.arange(len(miss_pos))
    # conservative per-ring guarantee radius uses the SMALLER (lat) step
    cell_deg = 180.0 / float(n)
    if metric:
        # metres per searched degree: the lon step shrinks by cos(lat), so
        # the conservative per-point ring guarantee must scale by
        # min(1, 2*cos) — cells are 2x wider in lon-degrees than lat-degrees
        cos_pt = np.maximum(np.cos(np.radians(py)), 1e-3)
        ring_scale = METERS_PER_DEG * np.minimum(1.0, 2.0 * cos_pt)
    else:
        ring_scale = np.ones(len(miss_pos))
    if max_k is None:
        # enough rings that safe_radius(max_k) >= max_distance for the
        # slowest point: a region inside the bound can never be missed by
        # early exhaustion (sjoin_nearest(max_distance) parity)
        worst = float(ring_scale.min()) if len(miss_pos) else 1.0
        max_k = int(np.ceil(2.0 * max_distance / (cell_deg * worst) + 0.5)) + 1
        max_k = min(max(max_k, 1), 4096)
    kcells, kstarts, krid = index.knn_table()
    n_rids = max(len(index.rids), 1)
    dist_fn = dist_to_polygon_m_prepared if metric else dist_to_polygon_prepared
    for k in range(1, max_k + 1):
        if len(unresolved) == 0:
            break
        # probe only the NEW cells of round k: the full 3x3 disc on the
        # first round, the 8k-cell perimeter ring afterwards. Best distances
        # persist across rounds, so interior cells never need re-probing —
        # cumulative work is O(k^2) per point instead of O(k^3)
        if k == 1:
            di = np.arange(-1, 2)
            dij = np.stack(np.meshgrid(di, di, indexing="ij"), -1).reshape(-1, 2)
        else:
            side = np.arange(-k, k + 1)
            edge = np.concatenate([
                np.stack([np.full(2 * k + 1, -k), side], 1),
                np.stack([np.full(2 * k + 1, k), side], 1),
                np.stack([side[1:-1], np.full(2 * k - 1, -k)], 1),
                np.stack([side[1:-1], np.full(2 * k - 1, k)], 1),
            ])
            dij = edge
        ii = (ci[unresolved, None] + dij[None, :, 0]) % n
        jj = np.clip(cj[unresolved, None] + dij[None, :, 1], 0, n - 1)
        u_rep = np.broadcast_to(unresolved[:, None], ii.shape).ravel()
        ring_cells = cell_from_ij(ii.ravel(), jj.ravel(), res)
        if len(kcells) == 0:
            break
        loc = np.searchsorted(kcells, ring_cells)
        np.minimum(loc, len(kcells) - 1, out=loc)
        h = np.flatnonzero(kcells[loc] == ring_cells)
        if h.size:
            s = kstarts[loc[h]]
            cnt = kstarts[loc[h] + 1] - s
            tot = int(cnt.sum())
            kslot = np.repeat(s - np.r_[np.int64(0), np.cumsum(cnt)[:-1]],
                              cnt) + np.arange(tot, dtype=np.int64)
            pu = np.repeat(u_rep[h], cnt)
            prid = krid[kslot]
            # dedup (point, region) keep-first; then visit regions in
            # first-appearance order — equal-distance ties resolve exactly
            # as the previous pandas groupby(sort=False) iteration did
            key = pu * n_rids + prid
            _, fidx = np.unique(key, return_index=True)
            fidx.sort()
            pu = pu[fidx]
            prid = prid[fidx]
            urf, rfirst = np.unique(prid, return_index=True)
            rank = np.empty(n_rids, np.int64)
            rank[urf[np.argsort(rfirst)]] = np.arange(len(urf))
            order = np.argsort(rank[prid], kind="stable")
            ps = prid[order]
            gb = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
            ge = np.r_[gb[1:], len(ps)]
            for g0, g1 in zip(gb, ge):
                rows = order[g0:g1]
                r = int(ps[g0])
                uu = pu[rows]
                d = dist_fn(px[uu], py[uu], index.prepared(r))
                better = d < out_dist[uu]
                upd = uu[better]
                out_dist[upd] = d[better]
                out_rid[upd] = index.rids[r]
        safe_radius = (k - 0.5) * cell_deg * 0.5 * ring_scale[unresolved]
        done = (out_dist[unresolved]
                <= np.minimum(max_distance, safe_radius))
        unresolved = unresolved[~done]
    valid = out_dist <= max_distance
    return pd.DataFrame({
        "__pos": miss_pos[valid],
        "region_id": out_rid[valid],
        "dist": out_dist[valid],
    })


# (SparkContext id, PreparedRegions id) -> (sc, prep, cover b., geoms b.).
# Re-broadcasting the SAME prepared table on every reverse_geocode call
# re-serializes the cover map + geometries driver-side each time — a pure
# per-run serial floor that caps scaling efficiency of short pipeline
# runs. BOUNDED LRU, by ESTIMATED BYTES with an entry-count backstop: at
# high cell resolutions a single cover map can reach GBs, so an
# entry-count bound alone could pin several of them driver-side; eviction
# runs until the cached estimate fits the byte budget (the newest entry
# always stays, however large). Eviction unpersists (executors drop their
# copies; a still-lazy plan holding an evicted broadcast just re-fetches
# from the driver on next use — unpersist, never destroy). The cache
# holds STRONG refs to both sc and prep: that pins their id()s, so a
# recycled address can never alias a cache key (id reuse requires the old
# object freed). All mutation is under a lock — drivers may submit jobs
# from several threads (ADVICE round 4).
_BCAST_CACHE: OrderedDict = OrderedDict()
_BCAST_CACHE_SIZE = 8
_BCAST_CACHE_BYTES = 512 * 1024 * 1024
_BCAST_LOCK = threading.Lock()


def _prep_nbytes(prep: "PreparedRegions") -> int:
    """Driver-side estimate of what broadcasting this prep pins: the
    cover DataFrame (deep) + every geometry array."""
    n = 0
    if prep.cover is not None:
        n += int(prep.cover.memory_usage(deep=True).sum())
    for xs, ys, offs, _bbox in prep.geoms.values():
        n += xs.nbytes + ys.nbytes + getattr(offs, "nbytes", 64) + 64
    return n


def _broadcast_prep(sc, prep: "PreparedRegions"):
    key = (id(sc), id(prep))
    with _BCAST_LOCK:
        hit = _BCAST_CACHE.get(key)
        if hit is not None and hit[0] is sc and hit[1] is prep:
            _BCAST_CACHE.move_to_end(key)
            return hit[2], hit[3]
    # broadcast outside the lock (serialization can take seconds); a rare
    # concurrent double-build of the same prep just wastes one broadcast,
    # which the insert below detects and unpersists
    b_cover = sc.broadcast(prep.cover)
    b_geoms = sc.broadcast(prep.geoms)
    # size the entry OUTSIDE the lock too: memory_usage(deep=True) walks
    # every object in the cover map — seconds on GB-scale preps, which
    # would stall every other thread's cache-hit fast path
    nbytes = _prep_nbytes(prep)
    stale = []
    with _BCAST_LOCK:
        hit = _BCAST_CACHE.get(key)
        if hit is not None and hit[0] is sc and hit[1] is prep:
            stale = [b_cover, b_geoms]  # lost the race: keep the winner
            b_cover, b_geoms = hit[2], hit[3]
        else:
            _BCAST_CACHE[key] = (sc, prep, b_cover, b_geoms, nbytes)
            while len(_BCAST_CACHE) > 1 and (
                    len(_BCAST_CACHE) > _BCAST_CACHE_SIZE
                    or sum(e[4] for e in _BCAST_CACHE.values())
                    > _BCAST_CACHE_BYTES):
                _, _, old_c, old_g, _ = _BCAST_CACHE.popitem(last=False)[1]
                stale.extend((old_c, old_g))
    for b in stale:
        try:
            b.unpersist(blocking=False)
        except Exception:
            pass  # stopped context: nothing to free
    return b_cover, b_geoms


def reverse_geocode(
    points: DataFrame,
    prep: PreparedRegions,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    out_col: str = "region_id",
    max_distance: float | None = None,
    distance_unit: str | None = None,
    strategy: str = "fused",
    keep_cell: bool = False,
    keep_distance: bool = False,
    output_cols: list[str] | None = None,
    salt_partitions: int | None = None,
) -> DataFrame:
    """Assign each point row the containing region's id (NULL if none).

    All input columns pass through (or only ``output_cols`` when given —
    trims the Arrow return path, which matters when the caller only needs
    the assignment); adds ``out_col`` (and ``cell_id`` when ``keep_cell``,
    ``knn_dist`` when ``keep_distance`` — NULL for direct PIP hits).
    Equivalent of utilities.reverse_geocode + the dataset adapters' rename
    (ons_nrs.py:384, neso.py:298, eurostat.py:151).

    ``max_distance`` unit follows the reference's contract — the REGIONS'
    source CRS units (utilities.py:253-255): metres when the prepared set
    was built from EPSG:27700 data, degrees for native-WGS84 data. Override
    with ``distance_unit`` = "m" | "deg" (e.g. metre bounds against a
    WGS84-sourced region set). Metre distances use a local equirectangular
    scaling (geometry.dist_to_polygon_m).

    ``salt_partitions``: pre-repartition the points on a salted hash — use
    when the upstream partitioning is spatially clustered (e.g. a crawl
    sharded by site puts all of London in a few partitions). The fused path
    has no shuffle of its own, so skew only enters through input layout;
    salting rebalances it at the cost of one explicit shuffle.
    """
    spark = points.sparkSession
    sc = spark.sparkContext
    b_cover, b_geoms = _broadcast_prep(sc, prep)
    res = prep.res

    if distance_unit is None:
        # reference parity: unit = the regions' source CRS units
        distance_unit = "m" if prep.crs == "EPSG:27700" else "deg"
    if distance_unit not in ("m", "deg"):
        raise ValueError("distance_unit must be 'm' or 'deg'")
    metric = distance_unit == "m"

    if salt_partitions:
        # deterministic salt key only: a nondeterministic component (e.g.
        # monotonically_increasing_id) would re-route rows differently when
        # a stage is recomputed after shuffle-fetch failure, duplicating or
        # dropping rows (the SPARK-23207 failure class). Repartition
        # directly on the coordinate columns: HashPartitioning applies its
        # own Murmur3 over the full values, which spreads clustered
        # coordinates evenly — pre-folding with pmod(hash, n) would leave
        # only n distinct keys for that hash and birthday-collide buckets.
        points = points.repartition(salt_partitions,
                                    F.col(lat_col), F.col(lon_col))

    if strategy == "fused":
        keep_fields = (points.schema.fields if output_cols is None else
                       [f for f in points.schema.fields
                        if f.name in output_cols])
        out_fields = keep_fields + [StructField(out_col, StringType())]
        if keep_cell:
            out_fields = out_fields + [StructField("cell_id", LongType())]
        if keep_distance:
            out_fields = out_fields + [StructField("knn_dist", DoubleType())]
        out_schema = StructType(out_fields)
        in_cols = [f.name for f in keep_fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            index = _get_index(b_cover.value, b_geoms.value)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                lat_all = pdf[lat_col].to_numpy(np.float64)
                lon_all = pdf[lon_col].to_numpy(np.float64)
                finite = np.isfinite(lat_all) & np.isfinite(lon_all)
                rid = np.full(len(pdf), None, dtype=object)
                vpos = np.flatnonzero(finite)
                if vpos.size:
                    rid[vpos] = _assign_batch(index, lat_all[vpos],
                                              lon_all[vpos], res)
                kdist = np.full(len(pdf), np.nan)
                if max_distance is not None:
                    miss = np.flatnonzero(pd.isna(rid) & finite)
                    if len(miss):
                        near = _knn_fallback(miss, lon_all[miss], lat_all[miss],
                                             index, res, max_distance,
                                             metric=metric)
                        npos = near["__pos"].to_numpy()
                        rid[npos] = near["region_id"].to_numpy()
                        kdist[npos] = near["dist"].to_numpy()
                out = pdf[in_cols].copy()
                out[out_col] = rid
                if keep_distance:
                    # nullable Float64 so no-match rows surface as SQL NULL
                    # (a plain float column would ship NaN through Arrow)
                    kd = pd.array(kdist, dtype="Float64")
                    kd[np.isnan(kdist)] = pd.NA
                    out["knn_dist"] = kd
                if keep_cell:
                    cid = np.full(len(pdf), None, dtype=object)
                    if finite.any():
                        cid[finite] = cell_of(lat_all[finite], lon_all[finite], res)
                    out["cell_id"] = pd.array(cid, dtype="Int64")
                yield out

        return points.mapInPandas(run, schema=out_schema)

    if strategy == "join":
        if max_distance is not None or output_cols is not None or keep_distance:
            raise ValueError(
                "strategy='join' does not support max_distance/output_cols/"
                "keep_distance yet — use the default fused strategy (silently "
                "ignoring them would change assignments between strategies)")
        return _reverse_geocode_join(points, prep, lat_col, lon_col, out_col,
                                     keep_cell)
    raise ValueError(f"unknown strategy {strategy!r}")


def reverse_geocode_multi(
    points: DataFrame,
    assignments: list,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    output_cols: list[str] | None = None,
    keep_cell: bool = False,
) -> DataFrame:
    """Assign each point a region id from EVERY prepared set in ONE Arrow
    pass. ``assignments`` is a list of ``(prep, out_col)`` or
    ``(prep, out_col, opts)`` with opts keys ``max_distance`` /
    ``distance_unit`` (same semantics as :func:`reverse_geocode`).

    At 100 TB this is the difference between k full-data passes (chained
    reverse_geocode calls: k mapInPandas stages, the points crossing the
    JVM/Python boundary and re-decoding coordinates k times) and one: a
    single Python stage reuses the decoded coordinate arrays for every
    lookup. Same per-lookup kernels (_assign_batch / _knn_fallback over the
    shared _CoverIndex), so assignments match the chained form exactly.

    ``keep_cell`` adds one ``cell_id`` column at the FIRST assignment's
    resolution (the chained equivalent of keep_cell on the first call)."""
    if not assignments:
        # fail on the driver, not inside an executor task (keep_cell=True
        # would otherwise call cell_of(..., res=None) at run time)
        raise ValueError("assignments must name at least one prepared set")
    spark = points.sparkSession
    sc = spark.sparkContext
    specs = []
    for a in assignments:
        prep, out_col = a[0], a[1]
        opts = a[2] if len(a) > 2 else {}
        unit = opts.get("distance_unit") or (
            "m" if prep.crs == "EPSG:27700" else "deg")
        if unit not in ("m", "deg"):
            raise ValueError("distance_unit must be 'm' or 'deg'")
        b_cover, b_geoms = _broadcast_prep(sc, prep)
        specs.append((b_cover, b_geoms, prep.res, (prep.name, prep.crs),
                      out_col, opts.get("max_distance"), unit == "m"))
    keep_fields = (points.schema.fields if output_cols is None else
                   [f for f in points.schema.fields
                    if f.name in output_cols])
    out_fields = (keep_fields
                  + [StructField(s[4], StringType()) for s in specs])
    if keep_cell:
        out_fields = out_fields + [StructField("cell_id", LongType())]
    out_schema = StructType(out_fields)
    in_cols = [f.name for f in keep_fields]
    cell_res = specs[0][2] if specs else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Build (or fetch) every spec's index ONCE per stage and hold
        # direct references across batches: with more specs than the
        # FIFO cache holds, per-batch _get_index calls would thrash the
        # cache and re-sort every cover map on every batch.
        indexes = [_get_index(s[0].value, s[1].value) for s in specs]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf[in_cols].copy()
            lat_all = pdf[lat_col].to_numpy(np.float64)
            lon_all = pdf[lon_col].to_numpy(np.float64)
            finite = np.isfinite(lat_all) & np.isfinite(lon_all)
            vpos = np.flatnonzero(finite)
            for (b_cover, b_geoms, res, (name, crs), out_col, max_d,
                 metric), index in zip(specs, indexes):
                rid = np.full(len(pdf), None, dtype=object)
                if vpos.size:
                    rid[vpos] = _assign_batch(index, lat_all[vpos],
                                              lon_all[vpos], res)
                if max_d is not None:
                    miss = np.flatnonzero(pd.isna(rid) & finite)
                    if len(miss):
                        near = _knn_fallback(
                            miss, lon_all[miss], lat_all[miss],
                            index, res, max_d, metric=metric)
                        rid[near["__pos"].to_numpy()] = \
                            near["region_id"].to_numpy()
                out[out_col] = rid
            if keep_cell:
                cid = np.full(len(pdf), None, dtype=object)
                if finite.any():
                    cid[finite] = cell_of(lat_all[finite], lon_all[finite],
                                          cell_res)
                out["cell_id"] = pd.array(cid, dtype="Int64")
            yield out

    return points.mapInPandas(run, schema=out_schema)


def _reverse_geocode_join(points, prep, lat_col, lon_col, out_col, keep_cell):
    """Catalyst-visible variant: BroadcastHashJoin on cell, PIP on candidates,
    min(region_seq) aggregation per input row."""
    spark = points.sparkSession
    sc = spark.sparkContext
    _, b_geoms = _broadcast_prep(sc, prep)
    res = prep.res

    @F.pandas_udf(LongType())
    def cell_udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(cell_of(lat.to_numpy(np.float64),
                                 lon.to_numpy(np.float64), res))

    cover_df = spark.createDataFrame(prep.cover)
    # Deterministic per-row key: xxhash64 of the hashable columns under two
    # seeds (128-bit composite). monotonically_increasing_id here would be
    # the SPARK-23207 failure class — a stage recompute after shuffle-fetch
    # failure could renumber rows, duplicating/dropping assignments when the
    # uncached pts subtree is evaluated independently on both join branches.
    # Rows that share a key are safe BECAUSE lat/lon are always hashed:
    # key-colliding rows have identical coordinates, hence the identical
    # (single) aggregated assignment from the groupBy below. Columns of
    # types xxhash64 cannot digest (MapType) are skipped — they never
    # affect the assignment.
    def _has_map(dt) -> bool:
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    # Spark hash functions SKIP null arguments (no null marker is mixed in),
    # so two distinct rows could share a key when a NULL shifts identical
    # hash-input values across adjacent columns. Interleave a never-null
    # isnull flag before each column: each column contributes either
    # [1] (null) or [0, value] — a prefix-free token stream, so null
    # placement always changes the digest.
    in_cols = [part
               for f in points.schema.fields if not _has_map(f.dataType)
               for part in (F.isnull(f.name).cast("int"), F.col(f.name))]
    pts = (points
           .withColumn("__rg_row", F.xxhash64(*in_cols))
           .withColumn("__rg_row2", F.xxhash64(F.lit(1), *in_cols)))
    pts = pts.withColumn("cell_id", cell_udf(F.col(lat_col), F.col(lon_col)))
    cand = pts.join(F.broadcast(cover_df),
                    pts["cell_id"] == cover_df["cell"], "left")

    pip_schema = StructType([
        StructField("__rg_row", LongType()),
        StructField("__rg_row2", LongType()),
        StructField("region_id", StringType()),
        StructField("region_seq", LongType()),
    ])

    def pip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        geoms = b_geoms.value
        pps = _get_prepared_geoms(geoms)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            has_cand = pdf["region_id"].notna()
            sub = pdf[has_cand]
            keep = np.zeros(len(sub), dtype=bool)
            interior = np.where(sub["interior"].isna(), False,
                                sub["interior"]).astype(bool)
            keep |= interior
            bnd = ~interior
            if bnd.any():
                b = sub[bnd]
                okk = np.zeros(len(b), dtype=bool)
                for rid, grp in b.groupby("region_id", sort=False):
                    pp = pps.get(rid)
                    if pp is None:
                        xs, ys, offs, _bbox = geoms[rid]
                        pp = pps[rid] = PreparedPolygon(xs, ys, offs)
                    px = grp[lon_col].to_numpy(np.float64)
                    py = grp[lat_col].to_numpy(np.float64)
                    okk[b.index.get_indexer(grp.index)] = \
                        points_in_polygon_prepared(px, py, pp)
                keep[bnd] = okk
            inside = sub[keep]
            yield pd.DataFrame({
                "__rg_row": inside["__rg_row"].astype(np.int64),
                "__rg_row2": inside["__rg_row2"].astype(np.int64),
                "region_id": inside["region_id"],
                "region_seq": inside["region_seq"].astype(np.int64),
            })

    assignments = (
        cand.select("__rg_row", "__rg_row2", lat_col, lon_col, "region_id",
                    "region_seq", "interior")
        .mapInPandas(pip, schema=pip_schema)
        .groupBy("__rg_row", "__rg_row2")
        .agg(F.min_by("region_id", "region_seq").alias(out_col))
    )
    out = pts.join(assignments, ["__rg_row", "__rg_row2"], "left")
    drop = ["__rg_row", "__rg_row2"] + ([] if keep_cell else ["cell_id"])
    return out.drop(*drop)
