package graft.geo

import org.locationtech.jts.geom.{Coordinate, Envelope, Geometry, GeometryFactory}

/** Deterministic hierarchical spatial cell index (H3/S2-style API over
  * a quadkey-on-equirectangular scheme), built from scratch — no H3/S2
  * jars exist in this environment and the scheme must be SQL-mirrorable
  * for the DuckDB oracle.
  *
  * Cell id layout (64-bit long, always positive):
  * {{{
  *   id = (res << 58) | (x << 29) | y
  * }}}
  * where at resolution `res` (0..28) the world [-180,180)x[-90,90) is a
  * 2^res x 2^res grid; `x` indexes longitude, `y` latitude. 29 bits per
  * axis leaves room far beyond res 15 (the max used here, ~0.01° cells).
  *
  * Re-imagines the geometry partitioning the reference delegates to
  * osm2rdf's GeometryHandler (/root/reference/src/osm/Osm2ttl.cpp:112-133)
  * as an explicit, joinable key — the core of the north-rule spatial join.
  */
object CellIndex {
  val MaxRes = 28
  final val ResShift = 58
  final val XShift = 29
  final val AxisMask = (1L << 29) - 1

  @inline def width(res: Int): Long = 1L << res

  /** Cell at (lon, lat) for resolution res. Clamps to the valid grid so
    * lon=180 / lat=90 fall into the last cell. */
  def cellAt(lon: Double, lat: Double, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"res $res out of [0,$MaxRes]")
    val n = width(res)
    val x = clamp(math.floor((lon + 180.0) / 360.0 * n).toLong, n)
    val y = clamp(math.floor((lat + 90.0) / 180.0 * n).toLong, n)
    pack(res, x, y)
  }

  @inline private def clamp(v: Long, n: Long): Long =
    if (v < 0) 0 else if (v >= n) n - 1 else v

  @inline def pack(res: Int, x: Long, y: Long): Long =
    (res.toLong << ResShift) | (x << XShift) | y

  @inline def res(cell: Long): Int = (cell >>> ResShift).toInt
  @inline def x(cell: Long): Long = (cell >> XShift) & AxisMask
  @inline def y(cell: Long): Long = cell & AxisMask

  /** Parent cell at `res-1` (or coarser `targetRes`). */
  def parent(cell: Long): Long = parentAt(cell, res(cell) - 1)

  def parentAt(cell: Long, targetRes: Int): Long = {
    val r = res(cell)
    require(targetRes >= 0 && targetRes <= r, s"targetRes $targetRes invalid for res $r")
    val shift = r - targetRes
    pack(targetRes, x(cell) >> shift, y(cell) >> shift)
  }

  /** The four children at `res+1`. */
  def children(cell: Long): Seq[Long] = {
    val r = res(cell) + 1
    require(r <= MaxRes)
    val (cx, cy) = (x(cell) << 1, y(cell) << 1)
    for (dx <- 0 to 1; dy <- 0 to 1) yield pack(r, cx + dx, cy + dy)
  }

  /** All cells within Chebyshev distance k (the (2k+1)^2 block).
    * Longitude wraps around the antimeridian; latitude clamps at the
    * poles (rows beyond the pole are dropped, not mirrored). */
  def kRing(cell: Long, k: Int): Seq[Long] = {
    val r = res(cell)
    val n = width(r)
    val (cx, cy) = (x(cell), y(cell))
    for {
      dy <- -k to k
      yy = cy + dy
      if yy >= 0 && yy < n
      dx <- -k to k
    } yield pack(r, java.lang.Math.floorMod(cx + dx, n), yy)
  }

  def neighbors(cell: Long): Seq[Long] = kRing(cell, 1).filterNot(_ == cell)

  /** Geographic bounds of a cell: (lonMin, latMin, lonMax, latMax). */
  def bounds(cell: Long): (Double, Double, Double, Double) = {
    val n = width(res(cell)).toDouble
    val lonMin = x(cell) / n * 360.0 - 180.0
    val latMin = y(cell) / n * 180.0 - 90.0
    (lonMin, latMin, lonMin + 360.0 / n, latMin + 180.0 / n)
  }

  private val gf = new GeometryFactory()

  def cellPolygon(cell: Long): Geometry = {
    val (x0, y0, x1, y1) = bounds(cell)
    gf.createPolygon(Array(
      new Coordinate(x0, y0), new Coordinate(x1, y0),
      new Coordinate(x1, y1), new Coordinate(x0, y1), new Coordinate(x0, y0)))
  }

  /** Cells at `res` intersecting `geom` (envelope scan + exact JTS
    * refine). Fan-out is the caller's concern — pick `res` from the
    * geometry's size via [[coverRes]] to bound multiplicity. */
  def coverGeometry(geom: Geometry, res: Int): Seq[Long] = {
    val env: Envelope = geom.getEnvelopeInternal
    val lo = cellAt(env.getMinX, env.getMinY, res)
    val hi = cellAt(env.getMaxX, env.getMaxY, res)
    val cells = for {
      cx <- x(lo) to x(hi)
      cy <- y(lo) to y(hi)
    } yield pack(res, cx, cy)
    cells.filter(c => geom.intersects(cellPolygon(c)))
  }

  /** Coarsest resolution whose cell edge is <= the envelope's max edge —
    * bounds cover multiplicity to a small constant per geometry
    * (the explode-fan-out control of SURVEY.md §4.3). */
  def coverRes(geom: Geometry, maxRes: Int = 12, minRes: Int = 0): Int = {
    val env = geom.getEnvelopeInternal
    val target = math.max(env.getWidth / 360.0, env.getHeight / 180.0)
    if (target <= 0) maxRes
    else {
      val r = math.floor(-math.log(target) / math.log(2.0)).toInt
      math.max(minRes, math.min(maxRes, r))
    }
  }
}
