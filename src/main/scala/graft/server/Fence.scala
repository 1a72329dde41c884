package graft.server

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo-fencing — the reference's fence service
  * (`services/fence/{fence,geometry,manager}.go`, HTTP surface
  * `httpd/handler_fence.go`): fences register by WRITING line-protocol
  * rows into the `fence` measurement (tag `id`, string field
  * `geometry` = `"circle,<lat>,<lon>,<radiusMeters>"` —
  * `ParseFenceFromRow`, fence.go:62), points match over
  * `GET /fence/match_batch?points=[lat,lon,…]`, and
  * `POST /fence/delete_fence?fenceId=…` removes one. The reference
  * supports ONLY the circle geometry (ParseFence fence.go:105 —
  * rect/polygon are declared constants with no parser arm) and so do
  * we, with the same error text for other types.
  *
  * Scale note: the reference accelerates point→fence lookup with an
  * S2 cell index; the HTTP matcher here linearly scans the (small,
  * driver-resident) fence set, and the SCALE path is
  * [[matchColumn]] — the fence list folds into pure column math
  * (haversine per fence, no UDF), so tagging a 100 TB point stream is
  * a broadcast-free narrow map over codegen'd expressions. */
object Fence {
  /** Earth mean radius, the reference's constant (geo.go:26). */
  val EarthRadiusKm = 6371.01

  case class Circle(id: String, lat: Double, lon: Double,
                    radiusM: Double) {
    def contains(plat: Double, plon: Double): Boolean =
      haversineM(lat, lon, plat, plon) <= radiusM
    def geometryText: String = s"circle,$lat,$lon,$radiusM"
  }

  /** Great-circle distance in meters (the s2 LatLng.Distance the
    * reference converts via AngleToKm, geometry.go:119-127). */
  def haversineM(lat1: Double, lon1: Double,
                 lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * math.asin(math.min(1.0, math.sqrt(a))) * EarthRadiusKm * 1000.0
  }

  /** Parse `"<type>,<floats…>"` (ParseFence, fence.go:91): circle takes
    * lat, lon, radius-in-meters. Unsupported types and malformed float
    * lists fail with the reference's messages. */
  def parse(id: String, geometry: String): Circle = {
    val idx = geometry.indexOf(',')
    require(idx > 0, s"invalid geometry: $geometry")
    val typ = geometry.substring(0, idx)
    require(typ == "circle", s"unsupported geometry type: $typ")
    val parts = geometry.substring(idx + 1).split(",").map(_.trim)
    val f64s =
      try parts.map(_.toDouble)
      catch { case _: NumberFormatException =>
        sys.error(s"invalid geometry: $geometry") }
    require(f64s.length >= 3, s"invalid circle: ${f64s.mkString(",")}")
    Circle(id, f64s(0), f64s(1), f64s(2))
  }

  /** Array of matched fence ids for a (lat, lon) column pair — each
    * fence becomes one haversine comparison in the plan, folded over a
    * literal list; null-free and codegen-friendly. */
  def matchColumn(fences: Seq[Circle], lat: Column, lon: Column): Column =
    if (fences.isEmpty) array().cast("array<string>")
    else filter(array(fences.map { f =>
      val dLat = radians(lat - lit(f.lat))
      val dLon = radians(lon - lit(f.lon))
      val a = pow(sin(dLat / 2), 2) +
        cos(radians(lit(f.lat))) * cos(radians(lat)) *
          pow(sin(dLon / 2), 2)
      val distM = asin(least(lit(1.0), sqrt(a))) *
        lit(2 * EarthRadiusKm * 1000.0)
      when(distM <= f.radiusM, lit(f.id)).otherwise(lit(null))
    }: _*), x => x.isNotNull)
}
