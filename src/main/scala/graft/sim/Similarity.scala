package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design: the brute-force path broadcasts the (small) query
  * set against a full scan of the corpus — one pass, no shuffle of
  * the corpus, per-partition top-k via window. The IVF path prunes
  * candidates to the query's cell before scoring; with a bucketed /
  * partitioned-by-cell corpus layout the scan itself prunes. The dot
  * product is a codegen'd expression fold (zip_with + aggregate) in
  * float64 — no UDF.
  */
object Similarity {

  /** Elementwise dot product of two array<double> columns
    * (compositional higher-order-function form — CodegenFallback;
    * kept as the differential-test reference for [[cosine]]). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Compositional cosine — three interpreted array passes; see
    * [[graft.functions.CosineSim]] for why the native form wins. */
  def cosineComposed(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** Cosine similarity: fused single-pass native Catalyst expression
    * with whole-stage codegen (accepts array<float> or array<double>;
    * accumulates in float64 either way). */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim(a, b)

  /** Brute-force cosine top-k: for each query row, the k nearest
    * corpus rows. Similarity is rounded to 3 decimals with an id
    * tiebreak so ranking is reproducible across engines.
    *
    * @param corpus  (cid, cv: array<double>) — the full collection
    * @param queries (qid, qv: array<double>) — small, broadcast
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = broadcast(queries).crossJoin(corpus)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("qv"), col("cv")), 3).as("sim3"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim3").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
  }

  /** IVF coarse quantization: assign every vector to its
    * highest-cosine centroid (deterministic id tiebreak). The
    * centroid set is broadcast; assignment is one narrow pass over
    * the corpus — at scale the assigned corpus is then written
    * partitioned by cell so probes prune at the scan.
    *
    * @param corpus    (cid, cv) full collection
    * @param centroids (cell, centv) small, broadcast
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .select(col("cid"), col("cv"), col("cell"),
        round(cosine(col("cv"), col("centv")), 6).as("_cs"))
    val w = Window.partitionBy(col("cid")).orderBy(col("_cs").desc, col("cell").asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_cs")
  }

  /** IVF-style pruned top-k: candidates restricted to the query's
    * cell (either a precomputed partition column or [[ivfAssign]]'s
    * output; a full build would probe n>1 cells). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = broadcast(queries).join(corpus, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("qv"), col("cv")), 3).as("sim3"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim3").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
  }
}
