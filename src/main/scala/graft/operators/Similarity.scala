package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - bruteTopK: exact baseline — broadcast the (small) query set against the
  *   corpus, one pass, per-query top-k via window. At scale the corpus side
  *   stays partition-parallel and nothing shuffles except k rows per query
  *   per partition (partial top-k would be the next refinement).
  * - lshTopK: the scale path — random-hyperplane signatures bucket the
  *   corpus; queries probe their own bucket (+ multiprobe neighbors), so each
  *   query scores only a fraction of the corpus.
  */
object Similarity {

  /** deterministic random hyperplanes: plane (table,p) component d in {-1,+1}
    * from splitmix of the (table, plane, dim) triple
    */
  def hyperplaneSig(v: Seq[Float], planes: Int, table: Int): Int = {
    var sig = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < v.length) {
        val r = graft.sources.TranscriptGen.mix((table.toLong * 8191L + p.toLong) * 131071L + d.toLong)
        dot += v(d) * (if ((r & 1L) == 0L) -1.0 else 1.0)
        d += 1
      }
      if (dot > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** per-table signatures, encoded as table*2^planes + sig so one equi-join
    * key covers all L tables
    */
  def tableSigs(v: Seq[Float], planes: Int, tables: Int): Array[Long] =
    Array.tabulate(tables)(t => t.toLong * (1L << planes) + hyperplaneSig(v, planes, t))

  private def sigsUdf(planes: Int, tables: Int) =
    udf((v: Seq[Float]) => tableSigs(v, planes, tables))

  /** exact cosine top-k neighbors for each query vector (excluding self). */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", Dedup.cosineCol(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** LSH-bucketed ANN: L independent hyperplane tables, candidates = union
    * of same-bucket hits across tables (single equi-join on the encoded
    * (table, bucket) key), then exact rescoring of candidates only.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 5, tables: Int = 16): DataFrame = {
    val su = sigsUdf(planes, tables)
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      explode(su(col("embedding"))).as("sig"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      explode(su(col("embedding"))).as("sig"))
    val scored = broadcast(q).join(c, Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "q_emb", "neighbor_id", "c_emb")
      .distinct() // union over tables
      .withColumn("cosine", Dedup.cosineCol(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** LSH near-dup pairs over embeddings (the scale path for
    * Dedup.embeddingNearDups): bucket join instead of cross join.
    */
  def lshNearDups(emb: DataFrame, threshold: Double,
      planes: Int = 5, tables: Int = 16): DataFrame = {
    val su = sigsUdf(planes, tables)
    val sigs = emb.select(col("vec_id"), col("embedding"), explode(su(col("embedding"))).as("sig"))
    sigs.alias("a")
      .join(sigs.alias("b"), col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        col("a.embedding").as("a_emb"), col("b.embedding").as("b_emb"))
      .distinct()
      .withColumn("cosine", Dedup.cosineCol(col("a_emb"), col("b_emb")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }
}
