package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property-style pins for the hand-written bounded-heap partial top-k:
  * against a plain sort-and-take oracle, under arbitrary partitioning,
  * with duplicate scores, ties, and k larger than the group (seeded
  * deterministic random inputs).
  */
class TopKProps extends AnyFunSuite with SparkTestBase {

  test("TopK.topCands == sort-take-k for random inputs, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val n = 50 + rnd.nextInt(400)
      val k = 1 + rnd.nextInt(12)
      val rows = Seq.fill(n)((
        rnd.nextInt(5).toLong,
        rnd.nextInt(60).toLong,
        // quantized scores force plenty of exact ties
        if (rnd.nextBoolean()) rnd.nextInt(5) * 0.25 - 0.5 else rnd.nextDouble() * 2 - 1))
      val df = rows.toDF("query_id", "neighbor_id", "cosine").repartition(1 + rnd.nextInt(9))
      val got = Similarity.topK(df, k).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (q, g) =>
        g.map { case (_, id, c) => (id, c) }
          .sortBy { case (id, c) => (-c, id) }
          .take(k).zipWithIndex
          .map { case ((id, c), i) => (q, i + 1, id, c) }
      }.sortBy(t => (t._1, t._2))
      assert(got == expected, s"trial $trial (n=$n k=$k)")
    }
  }

  test("TopK.topKeyCounts ranks like the window it replaced (nulls first on ties)") {
    import spark.implicits._
    val rows = Seq(
      ("d1", Some("b"), 5L), ("d1", None, 5L), ("d1", Some("a"), 5L), ("d1", Some("z"), 9L),
      ("d2", Some("x"), 1L))
    val df = rows.map { case (d, k, c) => (d, k.orNull, c) }.toDF("dim", "key", "cnt").repartition(5)
    val got = df.groupBy(col("dim"))
      .agg(TopK.topKeyCounts(3)(col("key"), col("cnt")).as("top"))
      .select(col("dim"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("dim"), col("e.key"), col("e.cnt"), (col("pos") + 1).as("rank"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2), r.getInt(3))).toSet
    assert(got == Set(
      ("d1", Some("z"), 9L, 1), ("d1", None, 5L, 2), ("d1", Some("a"), 5L, 3),
      ("d2", Some("x"), 1L, 1)))
  }
}
