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
    // nelems is the BYTE count: s.length counts UTF-16 chars, which
    // diverges from the UTF-8 byte length on any non-ASCII name and
    // leaves the reader mid-string for every later header field
    def name(s: String): Array[Byte] = {
      val b = s.getBytes("UTF-8")
      be32(b.length) ++ padded(b)
    }

    def isRecordVar(v: FloatVar): Boolean =
      v.dimIds.headOption.exists(i => dims(i).length == 0)
    def slabElems(v: FloatVar): Int = {
      val n = v.dimIds.filter(i => dims(i).length > 0)
        .map(i => dims(i).length.toLong).product
      // CDF-1 carries vsize/begin as 32-bit fields — a wrapped Int
      // would silently write garbage begins; fail loudly instead
      require(4L * n <= Int.MaxValue,
        s"${v.name}: slab of $n floats exceeds the CDF-1 2 GiB limit")
      n.toInt
    }
    def vsize(v: FloatVar): Int = { val n = 4 * slabElems(v); n + (4 - n % 4) % 4 }

    def header(begins: Map[String, Int]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      def w(b: Array[Byte]): Unit = o.write(b)
      w(Array('C'.toByte, 'D'.toByte, 'F'.toByte, 1.toByte))
      w(be32(numRecs))
      // an empty list is spelled ABSENT (two zero words), not
      // tag + nelems 0 — strict readers reject the latter
      if (dims.isEmpty) { w(be32(0)); w(be32(0)) }
      else { w(be32(0x0A)); w(be32(dims.size)) }
      dims.foreach { d => w(name(d.name)); w(be32(d.length)) }
      w(be32(0)); w(be32(0)) // no global attrs
      if (vars.isEmpty) { w(be32(0)); w(be32(0)) }
      else { w(be32(0x0B)); w(be32(vars.size)) }
      vars.foreach { v =>
        w(name(v.name)); w(be32(v.dimIds.size)); v.dimIds.foreach(i => w(be32(i)))
        if (v.attrs.isEmpty) { w(be32(0)); w(be32(0)) }
        else {
          w(be32(0x0C)); w(be32(v.attrs.size))
          v.attrs.foreach { a =>
            val ab = a.value.getBytes("UTF-8") // byte count, as in name()
            w(name(a.name)); w(be32(2)); w(be32(ab.length))
            w(padded(ab))
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
    // the begin table is keyed by NAME: a duplicate would silently
    // collapse two variables onto one begin, pointing the header's
    // second entry at the first one's slab while the data still
    // writes sequentially — the reader then returns the wrong
    // variable's values with no error
    require(vars.map(_.name).distinct.size == vars.size,
      s"duplicate variable names: ${vars.map(_.name).mkString(", ")}")
    val (fixedVars, recordVars) = vars.partition(v => !isRecordVar(v))
    var offset = hlen.toLong
    val begins = scala.collection.mutable.Map[String, Int]()
    def claim(v: FloatVar): Unit = {
      require(offset <= Int.MaxValue,
        s"${v.name}: begin $offset exceeds the CDF-1 2 GiB limit")
      begins(v.name) = offset.toInt; offset += vsize(v)
    }
    fixedVars.foreach(claim)
    recordVars.foreach(claim)

    // validate BOTH variable classes up front: a fixed var with the
    // wrong data length would silently shift every later variable off
    // its header begin (negative pad fills are empty in Scala), and a
    // record var at numRecs = 0 would silently drop its data without
    // ever reaching an in-loop check
    fixedVars.foreach { v =>
      require(v.data.length == slabElems(v),
        s"${v.name}: data length ${v.data.length} != slab ${slabElems(v)}")
    }
    recordVars.foreach { v =>
      require(v.data.length == slabElems(v) * numRecs,
        s"${v.name}: data length ${v.data.length} != $numRecs recs × " +
          s"${slabElems(v)}")
    }
    val o = new ByteArrayOutputStream()
    o.write(header(begins.toMap))
    fixedVars.foreach { v =>
      v.data.foreach(f => o.write(beF(f)))
      o.write(Array.fill[Byte](vsize(v) - 4 * v.data.length)(0))
    }
    for (r <- 0 until numRecs; v <- recordVars) {
      val n = slabElems(v)
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
