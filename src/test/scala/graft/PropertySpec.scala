package graft

import graft.etl.Sanitize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Property-style tests (SURVEY.md §5.4): the invariants the
  * reference's OFFSET paging violates, plus sanitize round-trips.
  * Deterministic seeded generation (scalatestplus is not in the
  * offline cache, so cases are driven by seeded Random directly). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("written multiset == read multiset for arbitrary rows × partitions") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val data = List.fill(10 + rnd.nextInt(60))(
        (rnd.nextLong() % 1000, rnd.alphanumeric.take(rnd.nextInt(9)).mkString))
      val nParts = 1 + rnd.nextInt(7)
      val df = data.toDF("k", "s")
      val out = java.nio.file.Files.createTempDirectory("prop_t").toString
      df.repartition(nParts).write.mode("overwrite").parquet(out)
      val back = spark.read.parquet(out)
      assert(back.count() == data.size, s"seed=$seed")
      assert(df.exceptAll(back).isEmpty && back.exceptAll(df).isEmpty,
        s"multiset broken at seed=$seed nParts=$nParts")
    }
  }

  test("substring dedup: an exact copy is one full-length extent") {
    // for arbitrary random corpora, appending a verbatim copy of doc A
    // under a higher id makes EVERY window of the copy a duplicate —
    // one extent spanning the whole doc, dup_ppm exactly 1e6
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(400 + seed)
      def doc() = List.fill(10 + rnd.nextInt(30))(
        "tok" + rnd.nextInt(40)).mkString(" ")
      val originals = (1L to 5L).map(i => (i, doc()))
      val copies = originals.map { case (i, t) => (100L + i, t) }
      val out = graft.ops.Dedup.substringDedup(
          (originals ++ copies).toDF("doc_id", "text"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_tokens"),
            r.getAs[Long]("n_extents"), r.getAs[Long]("dup_ppm"))).toMap
      copies.foreach { case (id, _) =>
        val (nTok, nDup, nExt, ppm) = out(id)
        assert(nDup == nTok && nExt == 1L && ppm == 1000000L,
          s"seed=$seed copy $id: $nTok/$nDup/$nExt/$ppm")
      }
    }
  }

  test("setSimJoin == brute force for random corpora × thresholds") {
    // the PPJoin prefix/length/positional filters are the subtle part
    // of q126 — stress their completeness on random corpora where
    // near-dup structure varies with the seed, at three thresholds
    for (seed <- 1 to 3; tPpm <- Seq(500000L, 700000L, 900000L)) {
      val rnd = new scala.util.Random(4200 + seed)
      def doc() = List.fill(4 + rnd.nextInt(12))(
        "w" + rnd.nextInt(12)).mkString(" ")
      val base = (1L to 12L).map(i => (i, doc()))
      // mutated copies create pairs across the jaccard spectrum
      val edited = base.take(6).map { case (i, t) =>
        (100L + i, if (rnd.nextBoolean()) t
          else t.replaceFirst("w\\d+", "w" + rnd.nextInt(12))) }
      val docs = (base ++ edited).toDF("doc_id", "text")
      val grams = docs.select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, greatest(length(text) - 7, 1))," +
          " i -> substring(text, i, 8))"))).as("gram"))
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val brute = grams.select(col("doc_id").as("doc_a"), col("gram"))
        .join(grams.select(col("doc_id").as("doc_b"), col("gram")),
          Seq("gram"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")),
          Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")),
          Seq("doc_b"))
        .filter(col("ni") * lit(1000000L) >=
          lit(tPpm) * (col("na") + col("nb") - col("ni")))
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = graft.ops.Dedup.setSimJoin(docs, "doc_id", tPpm)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute,
        s"seed=$seed t=$tPpm missing=${brute -- got} extra=${got -- brute}")
    }
  }

  test("setSimJoinIncremental == brute force cross pairs for random splits") {
    // the asymmetric variant's subtlety is the SHARED prefix order
    // built from corpus-side df only (unseen increment grams take
    // df = 0) — completeness must survive corpora where the increment
    // carries vocabulary the corpus has never seen
    for (seed <- 1 to 3; tPpm <- Seq(500000L, 800000L)) {
      val rnd = new scala.util.Random(7700 + seed)
      def doc(vocab: Int) = List.fill(4 + rnd.nextInt(12))(
        "w" + rnd.nextInt(vocab)).mkString(" ")
      val corpus = (1L to 10L).map(i => (i, doc(10))).toDF("doc_id", "text")
      // batch: mutated corpus copies (cross near-dups) + docs over a
      // WIDER vocab (grams with corpus df = 0 in their prefixes)
      val batchRows = (1L to 5L).map { i =>
        val t = corpus.collect()(rnd.nextInt(10)).getString(1)
        (100L + i, if (rnd.nextBoolean()) t
          else t.replaceFirst("w\\d+", "w" + rnd.nextInt(18)))
      } ++ (6L to 9L).map(i => (100L + i, doc(18)))
      val batch = batchRows.toDF("doc_id", "text")
      def gramsOf(df: org.apache.spark.sql.DataFrame, as: String) =
        df.select(col("doc_id").as(as), explode(array_distinct(expr(
          "transform(sequence(1, greatest(length(text) - 7, 1))," +
            " i -> substring(text, i, 8))"))).as("gram"))
      val gn = gramsOf(batch, "new_doc_id")
      val gc = gramsOf(corpus, "corpus_doc_id")
      val sn = gn.groupBy("new_doc_id").agg(count(lit(1)).as("na"))
      val sc = gc.groupBy("corpus_doc_id").agg(count(lit(1)).as("nb"))
      val brute = gn.join(gc, Seq("gram"))
        .groupBy("new_doc_id", "corpus_doc_id").agg(count(lit(1)).as("ni"))
        .join(sn, Seq("new_doc_id")).join(sc, Seq("corpus_doc_id"))
        .filter(col("ni") * lit(1000000L) >=
          lit(tPpm) * (col("na") + col("nb") - col("ni")))
        .select("new_doc_id", "corpus_doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = graft.ops.Dedup
        .setSimJoinIncremental(corpus, "doc_id", batch, "doc_id", tPpm)
        .select("new_doc_id", "corpus_doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute,
        s"seed=$seed t=$tPpm missing=${brute -- got} extra=${got -- brute}")
    }
  }

  test("KS distance: zero against itself, invariant to cohort swap") {
    // write a random lineitem-shaped table where R and A carry the
    // SAME multiset -> ks 0; then check swap symmetry on skewed data
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(500 + seed)
      val vals = List.fill(40 + rnd.nextInt(60))(
        (1 + rnd.nextInt(500)) * 1.0)
      val same = vals.flatMap(v => Seq(("O", "R", v), ("O", "A", v)))
      val dir1 = java.nio.file.Files.createTempDirectory("ksp1").toString
      same.toDF("l_linestatus", "l_returnflag", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir1/lineitem.parquet")
      val ks1 = graft.ops.Profiling.ksDrift(spark, dir1).collect()
      assert(ks1.forall(_.getAs[Long]("ks_ppm") == 0L), s"seed=$seed: ${ks1.mkString}")

      val skewed = vals.map(v => ("O", "R", v)) ++
        vals.map(v => ("O", "A", v * (1 + rnd.nextInt(3))))
      def ksOf(rows: Seq[(String, String, Double)]): Long = {
        val d = java.nio.file.Files.createTempDirectory("ksp2").toString
        rows.toDF("l_linestatus", "l_returnflag", "l_extendedprice")
          .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
        graft.ops.Profiling.ksDrift(spark, d).head().getAs[Long]("ks_ppm")
      }
      val swapped = skewed.map { case (s, f, v) =>
        (s, if (f == "R") "A" else "R", v) }
      assert(ksOf(skewed) == ksOf(swapped), s"seed=$seed swap asymmetry")
    }
  }

  test("sanitize JSON round-trip: parse(canonical(x)) == parse(x)") {
    val schema = StructType.fromDDL("k LONG, s STRING")
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(100 + seed)
      val docs = List.fill(25) {
        val k = rnd.nextLong() % 100000
        val s = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
        val sp = Seq("", " ", "  ")(rnd.nextInt(3))
        s"""{$sp"s":$sp"$s",$sp"k":$sp$k}"""
      }
      val df = docs.toDF("j")
      val mismatched = df.select(
          from_json(col("j"), schema).as("direct"),
          from_json(Sanitize.canonicalJson(col("j"), schema), schema)
            .as("via_canonical"))
        .filter(col("direct") =!= col("via_canonical") || col("direct").isNull)
        .count()
      assert(mismatched == 0, s"seed=$seed")
    }
  }

  test("numeric coercion: garbage -> NULL, numerics survive exactly") {
    val df = Seq("123", "-7", "12.9", "garbage", "", "9999999999999")
      .toDF("s").select(col("s"), Sanitize.toLongOrNull(col("s")).as("l"))
    val got = df.collect().map(r =>
      r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got("123").contains(123L) && got("-7").contains(-7L))
    assert(got("garbage").isEmpty && got("").isEmpty)
    assert(got("9999999999999").contains(9999999999999L))
  }
}
