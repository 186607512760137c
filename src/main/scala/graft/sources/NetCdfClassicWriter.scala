package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

/** Minimal netCDF *classic* (CDF-1) writer — the counterpart of
  * [[NetCdfClassic]], producing the same layout the reference's mwrf
  * export emits (`xarray.to_netcdf(engine="scipy")`,
  * mwrf/extract_n_export_mwrf.py:44): one unlimited record dim, float
  * coordinate + data variables, NC_CHAR attributes.
  *
  * Scope: float variables only (all the reference's grids are f32),
  * one optional record dimension first in any variable's dim list.
  * Enough to round-trip WRF-shaped grids and to generate test/demo
  * inputs without any Python toolchain.
  */
object NetCdfClassicWriter {

  final case class Dim(name: String, length: Int) // length 0 = record dim
  final case class Attr(name: String, value: String)
  /** Float variable: `dimIds` index into the dims list; `data` is
    * row-major over the full shape (record dim resolved to numRecs). */
  final case class FloatVar(name: String, dimIds: Seq[Int], attrs: Seq[Attr],
                            data: Array[Float])

  def write(path: String, dims: Seq[Dim], vars: Seq[FloatVar],
            numRecs: Int): Unit =
    Files.write(Paths.get(path), bytes(dims, vars, numRecs))

  def bytes(dims: Seq[Dim], vars: Seq[FloatVar], numRecs: Int): Array[Byte] = {
    def be32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def beF(f: Float): Array[Byte] = be32(java.lang.Float.floatToIntBits(f))
    def padded(b: Array[Byte]): Array[Byte] =
      b ++ Array.fill[Byte]((4 - b.length % 4) % 4)(0)
    def name(s: String): Array[Byte] = be32(s.length) ++ padded(s.getBytes("UTF-8"))

    def isRecordVar(v: FloatVar): Boolean =
      v.dimIds.headOption.exists(i => dims(i).length == 0)
    def slabElems(v: FloatVar): Int =
      v.dimIds.filter(i => dims(i).length > 0).map(i => dims(i).length).product
    def vsize(v: FloatVar): Int = { val n = 4 * slabElems(v); n + (4 - n % 4) % 4 }

    def header(begins: Map[String, Int]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      def w(b: Array[Byte]): Unit = o.write(b)
      w(Array('C'.toByte, 'D'.toByte, 'F'.toByte, 1.toByte))
      w(be32(numRecs))
      w(be32(0x0A)); w(be32(dims.size))
      dims.foreach { d => w(name(d.name)); w(be32(d.length)) }
      w(be32(0)); w(be32(0)) // no global attrs
      w(be32(0x0B)); w(be32(vars.size))
      vars.foreach { v =>
        w(name(v.name)); w(be32(v.dimIds.size)); v.dimIds.foreach(i => w(be32(i)))
        if (v.attrs.isEmpty) { w(be32(0)); w(be32(0)) }
        else {
          w(be32(0x0C)); w(be32(v.attrs.size))
          v.attrs.foreach { a =>
            w(name(a.name)); w(be32(2)); w(be32(a.value.length))
            w(padded(a.value.getBytes("UTF-8")))
          }
        }
        w(be32(5)) // NC_FLOAT
        w(be32(vsize(v)))
        w(be32(begins.getOrElse(v.name, 0)))
      }
      o.toByteArray
    }

    // layout: header | fixed vars (declaration order) | records
    val hlen = header(Map.empty).length
    val (fixedVars, recordVars) = vars.partition(v => !isRecordVar(v))
    var offset = hlen
    val begins = scala.collection.mutable.Map[String, Int]()
    fixedVars.foreach { v => begins(v.name) = offset; offset += vsize(v) }
    val recStart = offset
    recordVars.foreach { v => begins(v.name) = offset; offset += vsize(v) }

    val o = new ByteArrayOutputStream()
    o.write(header(begins.toMap))
    fixedVars.foreach { v =>
      v.data.foreach(f => o.write(beF(f)))
      o.write(Array.fill[Byte](vsize(v) - 4 * v.data.length)(0))
    }
    for (r <- 0 until numRecs; v <- recordVars) {
      val n = slabElems(v)
      require(v.data.length == n * numRecs,
        s"${v.name}: data length ${v.data.length} != $numRecs recs × $n")
      (0 until n).foreach(i => o.write(beF(v.data(r * n + i))))
      o.write(Array.fill[Byte](vsize(v) - 4 * n)(0))
    }
    o.toByteArray
  }

  /** Convenience: write a WRF-shaped file — record dim Time plus
    * (south_north, west_east), XLAT/XLONG vectors, XTIME with a units
    * description, and one cumulative data variable. */
  def writeWrfGrid(path: String, lats: Array[Float], lons: Array[Float],
                   timesMinutes: Array[Float], baseIso: String,
                   valueVar: String, values: Array[Float]): Unit = {
    val ny = lats.length; val nx = lons.length; val nt = timesMinutes.length
    require(values.length == nt * ny * nx, "values must be (time, lat, lon) row-major")
    val dims = Seq(Dim("Time", 0), Dim("south_north", ny), Dim("west_east", nx))
    val xlat = Array.tabulate(nt * ny * nx)(i => lats((i / nx) % ny))
    val xlong = Array.tabulate(nt * ny * nx)(i => lons(i % nx))
    write(path, dims, Seq(
      FloatVar("XLAT", Seq(0, 1, 2), Nil, xlat),
      FloatVar("XLONG", Seq(0, 1, 2), Nil, xlong),
      FloatVar("XTIME", Seq(0),
        Seq(Attr("description", s"minutes since $baseIso")), timesMinutes),
      FloatVar(valueVar, Seq(0, 1, 2), Nil, values)), nt)
  }
}
