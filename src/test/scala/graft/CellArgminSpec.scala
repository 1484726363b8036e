package graft

import org.apache.spark.sql.functions._

/** r15 optimization: the native CellArgmin expression must compute
  * the SAME exact-integer (d², cell-id-tie-break) argmin as both
  * assignment forms it replaced — the k-way least(struct(d2_literal,
  * id)) expression and the broadcast-join min_by — including ties,
  * and must yield NULL (never a wrong cell) on a length mismatch. */
class CellArgminSpec extends SparkSpec {

  private def centsFor(k: Int, dim: Int,
      rnd: scala.util.Random): Seq[(Long, Array[Long])] =
    (0 until k).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextInt(2000000).toLong - 1000000L)))

  /** The replaced literal form, verbatim. */
  private def leastForm(cents: Seq[(Long, Array[Long])]) =
    least(cents.map { case (id, c) =>
      struct(c.indices.map { i =>
        val diff = element_at(col("x"), i + 1) - lit(c(i))
        diff * diff
      }.reduce(_ + _).as("d"), lit(id).as("cell"))
    }: _*).getField("cell")

  test("cell_argmin == literal least() form on seeded random vectors, and d2 == l2mu of the winner") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val rnd = new scala.util.Random(15042L)
    val dim = 16
    val cents = centsFor(12, dim, rnd)
    val rows = (0 until 500).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextInt(2000000).toLong - 1000000L)))
    val df = rows.toDF("vec_id", "x")
    val got = df.select(col("vec_id"),
        graft.ops.Ivf.argminStruct(col("x"), cents).as("b"))
      .select(col("vec_id"), col("b").getField("cell").as("cell"),
        col("b").getField("d2").as("d2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = df.select(col("vec_id"), leastForm(cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._1).toMap === want)
    // d2 equals a driver-side exact recompute of the winner's distance
    rows.foreach { case (id, x) =>
      val (cell, d2) = got(id)
      val c = cents(cell.toInt)._2
      val dd = c.zip(x).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(d2 == dd, s"vec $id d2 $d2 != recomputed $dd")
    }
  }

  test("ties break to the LOWEST cell id (the struct-min rule)") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    // two identical centroids under different ids, plus a far one:
    // the winner must be the lower id, and scan order must not matter
    val c = Array(5L, 5L)
    val cents = Seq((7L, Array(9L, 9L)), (3L, c), (1L, c))
    val got = Seq((0L, Seq(5L, 5L))).toDF("vec_id", "x")
      .select(graft.ops.Ivf.argminStruct(col("x"), cents)
        .getField("cell").as("cell"))
      .head().getLong(0)
    assert(got == 1L)
  }

  test("length mismatch yields NULL, never a wrong cell") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val cents = Seq((0L, Array(1L, 2L)), (1L, Array(3L, 4L, 5L)))
    val r = Seq((0L, Seq(1L, 2L))).toDF("vec_id", "x")
      .select(graft.ops.Ivf.argminStruct(col("x"), cents).as("b"))
      .head()
    assert(r.isNullAt(0))
  }
}
