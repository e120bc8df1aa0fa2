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
    * Scale shape: the row_number-over-window + `rank <= k` filter is
    * rewritten by Spark into a map-side partial `WindowGroupLimit`
    * BEFORE the exchange (verified in the physical plan), so each map
    * partition forwards at most k rows per query — the shuffle
    * carries O(k × partitions) rows per query, not the scored corpus.
    *
    * @param corpus  (cid, cv: array<float|double>) — the full collection
    * @param queries (qid, qv: array<float|double>) — small, broadcast
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

  /** Above this many centroids, the per-centroid-literal expression
    * tree stops being viable: k struct literals are k expression
    * nodes, and whole-stage codegen hits JVM method-size /
    * constant-pool limits in the thousands (plan pretty-printing and
    * analysis also go quadratic). Past the cutover the SAME driver
    * data ships as ONE constant array literal instead — O(1)
    * expression nodes regardless of k — scored via a higher-order
    * `transform` + `array_max` fold. That path evaluates interpreted
    * (HOFs are CodegenFallback), so below the threshold the inlined,
    * codegen'd form stays the default; both are narrow zero-shuffle
    * projections, and the constant ships to executors once inside the
    * broadcast task binary — the same transport a broadcast-join
    * relation uses, without the |corpus|×k row expansion and
    * re-aggregation shuffle a join + argmax formulation would pay. */
  val CentroidInlineThreshold = 256

  /** The per-row argmax column over the centroid set: an
    * array<struct<cs, negCell>> whose max is (best cosine, smallest
    * cell on ties). Since r13 this is ONE native
    * [[graft.functions.CentroidScores]] expression — the centroid
    * matrix ships as a single codegen reference object and the
    * scoring is a primitive double loop, so generated-code size is
    * constant in k (the composed per-centroid-literal form silently
    * left whole-stage codegen in the low-k-tens and evaluated
    * interpreted: 30× slower at k=80 on the sf1 sweep).
    * [[centroidArgmaxComposed]] keeps the composed form as the
    * differential reference; CentroidScoresSpec pins them equal
    * row-for-row. */
  private def centroidArgmax(vecCol: Column, centroids: DataFrame,
                             inlineThreshold: Int): Column = {
    val (cells, matrix) = collectCentroids(centroids)
    graft.functions.CentroidScores(vecCol, cells, matrix)
  }

  /** Collect a (cell, centv) relation to the driver as (cells,
    * matrix), widening float lanes to double exactly as [[CosineSim]]
    * does (per-element, exact). Centroid sets are coarse-quantizer-
    * sized by contract — bounded by [[IvfCellCap]]·64 lanes. */
  private def collectCentroids(centroids: DataFrame)
      : (Array[Long], Array[Array[Double]]) = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val rows = centroids.select(col("cell").cast("long"), col("centv")).collect()
    require(rows.nonEmpty, "centroid argmax needs at least one centroid")
    val elemIsFloat = centroids.schema("centv").dataType
      .asInstanceOf[ArrayType].elementType == FloatType
    val cells = rows.map(_.getLong(0))
    val matrix =
      if (elemIsFloat) rows.map(_.getSeq[Float](1).map(_.toDouble).toArray)
      else rows.map(_.getSeq[Double](1).toArray)
    (cells, matrix)
  }

  /** Test access: the per-row score array of `vecCol`-shaped input
    * (`vec_id`, `v`) against `centroids`, native or composed —
    * CentroidScoresSpec's differential surface. */
  private[graft] def centroidScoresForTest(vecs: DataFrame, centroids: DataFrame,
      composed: Boolean): DataFrame = {
    val scores =
      if (composed) centroidArgmaxComposed(col("v"), centroids)
      else centroidArgmax(col("v"), centroids, CentroidInlineThreshold)
    vecs.select(col("vec_id"), scores.as("scores"))
  }

  /** The pre-r13 composed form of [[centroidArgmax]] — per-centroid
    * struct literals below `inlineThreshold`, one constant-array
    * `transform` above. Retained ONLY as the differential-test
    * reference for the native expression (CentroidScoresSpec); no
    * production path calls it. */
  private[graft] def centroidArgmaxComposed(vecCol: Column, centroids: DataFrame,
      inlineThreshold: Int = CentroidInlineThreshold): Column = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val rows = centroids.select(col("cell").cast("long"), col("centv")).collect()
    require(rows.nonEmpty, "centroid argmax needs at least one centroid")
    val elemIsFloat = centroids.schema("centv").dataType
      .asInstanceOf[ArrayType].elementType == FloatType
    if (rows.length <= inlineThreshold) {
      val scored = rows.map { r =>
        val vec =
          if (elemIsFloat) typedLit(r.getSeq[Float](1))
          else typedLit(r.getSeq[Double](1))
        struct(round(cosine(vecCol, vec), 6).as("cs"),
          lit(-r.getLong(0)).as("negCell"))
      }
      array(scored.toIndexedSeq: _*)
    } else {
      // one literal for the whole centroid matrix (negCell precomputed
      // so the lambda body stays two expressions)
      val centLit =
        if (elemIsFloat)
          typedLit(rows.map(r => (-r.getLong(0), r.getSeq[Float](1))).toSeq)
        else
          typedLit(rows.map(r => (-r.getLong(0), r.getSeq[Double](1))).toSeq)
      transform(centLit, c =>
        struct(round(cosine(vecCol, c.getField("_2")), 6).as("cs"),
          c.getField("_1").as("negCell")))
    }
  }

  /** IVF coarse quantization: assign every vector to its
    * highest-cosine centroid (deterministic smaller-cell tiebreak).
    *
    * The centroid set is coarse-quantizer-sized, so it is collected
    * to the driver and embedded in the plan: assignment is then a
    * genuinely NARROW per-row argmax — no crossJoin row expansion, no
    * shuffle, no window. (A crossJoin + window formulation would
    * hash-shuffle the |corpus|×|centroids| expansion just to pick
    * each row's max.) How the centroids embed depends on k — see
    * [[CentroidInlineThreshold]] for the inline-literals vs
    * constant-array cutover. At scale the assigned corpus is written
    * partitioned by cell so probes prune at the scan.
    *
    * @param corpus    (cid, cv) full collection
    * @param centroids (cell, centv) small — collected to the driver
    */
  /** Hard ceiling on the scaled IVF cell count. The engine sizes
    * cells as N/250 so the per-cell candidate set stays constant.
    * r15 capped k at 2048 because FLAT assignment is N·k = N²/250
    * cosines (the r15 sf1→sf10 decade measured the curve live:
    * q_ann_cell_balance 75.7×), but a frozen k let the within-cell
    * PAIR term grow back ∝N²/k past the cap. r16's two-level
    * assignment ([[graft.functions.HierCentroidAssign]]) costs
    * N·2√k, so k keeps scaling and the cap retreats to a DRIVER
    * bound, not an asymptotic one: 2¹⁸ cells × 64 lanes × 8 B =
    * 128 MB of collected centroids (the matrix ships to executors
    * once, inside the task binary, like any broadcast relation).
    * The cap now fires at N = 250·2¹⁸ ≈ 65.5M vectors — beyond it
    * assignment is N·1024 cosines and cell size grows ∝N/2¹⁸ (at
    * N = 10⁹ that is ~3.8k-vector cells; the pair faces remain
    * O(N·cell)). Inert at every tested SF (sf10 = 200k vectors,
    * k=800); IvfCellCapSpec pins both sides of the boundary. */
  val IvfCellCap = 262144L

  /** Centroid count at which [[ivfAssign]] switches from flat argmax
    * (N·k cosines) to two-level assignment (N·(m + k/m) ≈ N·2√k).
    * Below the cutover flat is cheap and BIT-IDENTICAL to the
    * pre-r16 engine: every tested small SF resolves k=8 (N ≤ 2000
    * ⇒ N/250 ≤ 8), so sf0.001/0.01/0.1 oracle artifacts are
    * unchanged; sf1 (k=80) and up take the hierarchical path, whose
    * DuckDB mirror lives in SimQueries.annPairCtes. 32 sits between
    * the regimes: at k=32, 2√k ≈ 11 already beats 32. */
  val IvfHierCutover = 32

  /** Meta-centroid count for a k-cell two-level index: m = ⌈√k⌉ —
    * minimizes m + k/m, the per-row cosine count. One formula,
    * mirrored by the oracle SQL (`ceil(sqrt(k))`, exact in IEEE
    * double for any k ≤ 2⁵³). */
  def ivfMetaCount(k: Long): Long =
    math.ceil(math.sqrt(k.toDouble)).toLong

  /** Scaled IVF cell count for an N-vector corpus: max(8, N/250)
    * capped at [[IvfCellCap]]. The ONE formula both the Spark
    * builders and the DuckDB oracle SQL must mirror. */
  def ivfCellCount(n: Long): Long =
    math.max(8L, math.min(n / 250L, IvfCellCap))

  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
                inlineThreshold: Int = CentroidInlineThreshold): DataFrame = {
    val (cells, matrix) = collectCentroids(centroids)
    if (cells.length < IvfHierCutover) {
      corpus
        .withColumn("_best",
          array_max(graft.functions.CentroidScores(col("cv"), cells, matrix)))
        .withColumn("cell", -col("_best.negCell"))
        .drop("_best")
    } else {
      val (metas, off, childCells, childVecs) = hierStructure(cells, matrix)
      corpus.withColumn("cell", graft.functions.HierCentroidAssign(
        col("cv"), metas, off, childCells, childVecs))
    }
  }

  /** Build the two-level structure from a collected centroid set:
    * sort by cell id ascending; metas = the m = ⌈√k⌉ SMALLEST cell
    * ids (for the `vec_id < k` centroid convention that is exactly
    * `cell < m`, which the oracle SQL writes); every meta is its own
    * child (so no meta's candidate list is ever empty); every other
    * centroid joins its highest-round6-cosine meta, keep-first tie =
    * smaller meta cell — the same argmax kernel the row-level
    * expression runs, so the driver map and the per-row scoring
    * cannot drift. Segments stay cell-ascending by construction
    * (sorted input, in-order appends), which is what makes the
    * expression's keep-first tiebreak mean "smaller cell". */
  private[graft] def hierStructure(cells: Array[Long],
                                   matrix: Array[Array[Double]])
      : (Array[Array[Double]], Array[Int], Array[Long], Array[Array[Double]]) = {
    val order = cells.indices.sortBy(cells(_)).toArray
    val sc = order.map(cells(_))
    val sm = order.map(matrix(_))
    val k = sc.length
    val m = ivfMetaCount(k.toLong).toInt
    val metas = sm.take(m)
    val groups = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var i = 0
    while (i < k) {
      val g =
        if (i < m) i
        else graft.functions.HierCentroidAssign.argmaxRound6(sm(i), metas, 0, m)
      groups(g) += i
      i += 1
    }
    val off = new Array[Int](m + 1)
    val cc = new Array[Long](k)
    val cv = new Array[Array[Double]](k)
    var p = 0
    var g = 0
    while (g < m) {
      off(g) = p
      groups(g).foreach { idx => cc(p) = sc(idx); cv(p) = sm(idx); p += 1 }
      g += 1
    }
    off(m) = p
    (metas, off, cc, cv)
  }

  /** Query-side multi-cell probe: emit each query row once per probed
    * cell — its `nprobe` highest-cosine centroids (deterministic
    * smaller-cell tiebreak on the 6-decimal-rounded score, matching
    * [[ivfAssign]]). Like assignment, this is a NARROW per-row
    * projection over driver-inlined centroid literals: score all
    * centroids into one in-row struct array, sort it descending, keep
    * the first nprobe, explode — no join, no shuffle, no window. Feed
    * the result to [[ivfTopK]]: its per-qid rank window then picks the
    * global top-k across the probed cells, closing the recall cliff a
    * single-cell probe has at cell boundaries (a query near a Voronoi
    * face also searches the neighboring cell).
    *
    * @param queries   (qid, qv) — small
    * @param centroids (cell, centv) — small, collected to the driver
    * @return (qid, qv, cell) with ≤ nprobe rows per qid
    */
  def ivfProbeCells(queries: DataFrame, centroids: DataFrame, nprobe: Int,
                    inlineThreshold: Int = CentroidInlineThreshold): DataFrame = {
    require(nprobe >= 1, s"nprobe=$nprobe must be >= 1")
    queries
      .withColumn("_probe",
        slice(sort_array(centroidArgmax(col("qv"), centroids, inlineThreshold),
          asc = false), 1, nprobe))
      .select(col("qid"), col("qv"), explode(col("_probe")).as("_p"))
      .select(col("qid"), col("qv"), (-col("_p.negCell")).as("cell"))
  }

  /** Number of SRP hyperplanes (signature bits). 32 bits = 4 bands of
    * 8: coarse enough that true near-neighbors share a band, wide
    * enough that full-signature collisions are meaningful (16 bits
    * left hamming-0 pairs with NEGATIVE dots on the test corpus). */
  val SrpPlanes = 32

  /** SRP band layout: [[SrpBands]] consecutive [[SrpBandBits]]-bit
    * slices of the signature; a pair is a candidate iff it collides
    * in at least one band (classic LSH banding). */
  val SrpBands = 4
  val SrpBandBits = 8

  /** Mega-bucket drop for the banded SRP self-join (the MinHash
    * maxBucket discipline applied to sign-random-projection buckets):
    * a band bucket with more than this many members contributes
    * C(n,2) candidate pairs from its WEAKEST evidence class (an
    * 8-bit band value shared by a crowd is near-noise), and bucket
    * sizes grow ∝ N under a fixed band width — the uncapped self-join
    * is the quadratic term the r13 slope sweep measured at 12.4× on
    * 10× data. Dropping buckets past the cap bounds per-bucket work
    * at C(cap,2) while close pairs survive through their other,
    * discriminative bands (a pair lost entirely had mega-bucket-only
    * collisions — the weakest candidates). 250 > the observed sf0.1
    * max bucket (113), so tested-SF results are bit-identical; sf1's
    * max (1030) is exactly the blow-up being bounded. */
  val SrpBucketCap = 250

  /** The coefficient table strides at 64 lanes per plane (the
    * testdata embedding width); correct for any len(vec) ≤ 64. */
  val SrpStride = 64L

  /** Quantize an embedding to integer micro-units: qᵢ =
    * floor(xᵢ·10⁶ + 0.5) — one IEEE multiply+add+floor per lane,
    * bit-identical in any engine (the q_embed_norm_stats discipline).
    * Every SRP dot product downstream is then PURE BIGINT. */
  def srpQuantize(vec: Column): Column =
    transform(vec.cast("array<double>"),
      x => floor(x * lit(1000000.0) + lit(0.5)).cast("long"))

  /** Signed-random-projection (hyperplane) LSH signature (Charikar
    * 2002): bit p = sign of the quantized vector's dot product
    * against pseudo-random hyperplane p, coefficients from a shared
    * integer LCG any engine reproduces bit-for-bit. Fused native
    * Catalyst expression with whole-stage codegen — quantization +
    * 32 plane dots + sign pack in one primitive loop (see
    * [[graft.functions.SrpSignature]] for why the compositional HOF
    * form is the wrong hot path). A narrow per-row projection: at
    * 100 TB this runs inside the scan with zero shuffles, and
    * signatures persist as one BIGINT column per vector. */
  def srpSignature(vec: Column): Column = graft.functions.SrpSignature(vec)

  /** Compositional HOF form of [[srpSignature]] over an
    * ALREADY-QUANTIZED long array — nested aggregate/sequence folds,
    * CodegenFallback (planes×dims boxed lambda calls per row); kept
    * as the differential-test reference for the native expression
    * (the [[cosineComposed]] pattern). */
  def srpSignatureComposed(q: Column, planes: Int = SrpPlanes): Column = {
    require(planes >= 1 && planes <= 62, s"planes=$planes must fit a BIGINT")
    aggregate(sequence(lit(0L), lit(planes - 1L)), lit(0L), (acc, p) =>
      acc + when(
        aggregate(sequence(lit(1), size(q)), lit(0L), (a2, i) =>
          a2 + ((lit(1103515245L) * (p * lit(SrpStride) + i.cast("long") - lit(1L))
            + lit(12345L)) % lit(2048L) - lit(1024L)) * element_at(q, i)) >= 0,
        call_function("shiftleft", lit(1L), p)).otherwise(lit(0L)))
  }

  /** Explode a signature column into its LSH bands: (bi, bv) rows,
    * one per band — band j is bits [8j, 8j+8). Non-negative sig, so
    * shift+mask equals the oracle's `(sig // 256^j) % 256`. */
  def srpBands(df: DataFrame): DataFrame =
    (0 until SrpBands).map { j =>
      df.withColumn("bi", lit(j.toLong))
        .withColumn("bv",
          shiftright(col("sig"), j * SrpBandBits).bitwiseAND(lit(255L)))
    }.reduce(_ union _)

  /** PRODUCT QUANTIZATION encode (Jégou et al. 2011): split each
    * MICRO-QUANTIZED vector into `m` subvectors of `dsub` lanes and
    * assign every subvector its nearest codebook entry by INTEGER
    * squared L2 distance (pure BIGINT — micro-quantization happens
    * before any distance, so codes are bit-identical in any engine;
    * deterministic smaller-code tiebreak). Returns one row per
    * (vector, subspace): (vec_id, sub_j, code, dist_pico2) — dist is
    * the subspace's squared reconstruction error in pico² units.
    *
    * The codebook (k entries × m·dsub lanes) is coarse-quantizer-
    * sized, so like [[ivfAssign]] it is collected to the driver and
    * embedded as literals: encoding is a genuinely NARROW per-row
    * projection — no join, no shuffle; at 100 TB the m small codes
    * replace the full vector in the lake (64 dims × f32 → 8 bytes)
    * and asymmetric-distance search scans codes, not vectors.
    *
    * The hot path is the native [[graft.functions.PqEncode]]
    * expression: the composed k·m·dsub literal tree (kept below as
    * [[pqCodesComposed]], differential-pinned) exceeds Janino's
    * 64 KB method limit even at k=16 — codegen fails and the encode
    * runs interpreted at ~5000 nodes/row, the round-8 bench
    * regression. The native form is three primitive loops over a
    * reference-object codebook: constant generated-code size at any
    * k·m·dsub.
    *
    * @param corpus   (vec_id, q: array<long>) micro-quantized vectors
    * @param codebook (code, cq: array<long>) small — collected
    */
  /** Collect + validate a PQ codebook for driver inlining. */
  private def pqCollect(codebook: DataFrame, m: Int, dsub: Int): Array[(Long, Array[Long])] = {
    val cents = codebook.select(col("code").cast("long"), col("cq")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    require(cents.nonEmpty, "PQ needs a non-empty codebook")
    require(cents.forall(_._2.length == m * dsub),
      s"codebook entries must have m*dsub = ${m * dsub} lanes")
    cents
  }

  /** The integer squared-L2 distance of subspace `j` of the row's
    * `q` column to one inlined codeword. */
  private def pqSubDist(j: Int, dsub: Int, cv: Array[Long]) =
    (1 to dsub).map { i =>
      val d = element_at(col("q"), j * dsub + i) - lit(cv(j * dsub + i - 1))
      d * d
    }.reduce(_ + _)

  def pqCodes(corpus: DataFrame, codebook: DataFrame,
              m: Int, dsub: Int): DataFrame = {
    val cents = pqCollect(codebook, m, dsub)
    corpus.select(col("vec_id"),
        explode(graft.functions.PqEncode(col("q"),
          cents.map(_._1), cents.map(_._2), m, dsub)).as("s"))
      .select(col("vec_id"), col("s.sub_j").as("sub_j"),
        col("s.code").as("code"), col("s.dist_pico2").as("dist_pico2"))
  }

  /** The pre-native composed encode — k struct literals × m
    * subspaces of inlined element_at arithmetic. Kept ONLY as the
    * differential-test reference for [[graft.functions.PqEncode]]
    * (PqEncodeSpec pins row-for-row equality): at k·m·dsub = 1024
    * its single projection breaks whole-stage codegen (Janino 64 KB)
    * and falls back to a ~5000-node interpreted walk per row. */
  def pqCodesComposed(corpus: DataFrame, codebook: DataFrame,
                      m: Int, dsub: Int): DataFrame = {
    val cents = pqCollect(codebook, m, dsub)
    val subs = (0 until m).map { j =>
      val scored = cents.map { case (code, cv) =>
        struct(pqSubDist(j, dsub, cv).as("d"), lit(code).as("code"))
      }
      val best = array_min(array(scored.toIndexedSeq: _*))
      struct(lit(j.toLong).as("sub_j"), best.getField("code").as("code"),
        best.getField("d").as("dist_pico2"))
    }
    corpus.select(col("vec_id"), explode(array(subs.toIndexedSeq: _*)).as("s"))
      .select(col("vec_id"), col("s.sub_j").as("sub_j"),
        col("s.code").as("code"), col("s.dist_pico2").as("dist_pico2"))
  }

  /** PQ ASYMMETRIC-DISTANCE lookup table: for each query row, the
    * integer squared-L2 distance of every (subspace, codeword) pair —
    * m·k rows per query. ADC search is then
    * `broadcast(lut) ⨝ codes on (sub_j, code)` + a per-(qid, cid)
    * sum: the corpus contributes only its codes (8 BIGINTs per
    * vector), never raw vectors — the scan-side payoff product
    * quantization exists for.
    *
    * Hot path is the native [[graft.functions.PqLut]] expression —
    * the composed m·k-literal explode (kept below as
    * [[pqLutComposed]], differential-pinned) blew Janino's 64 KB
    * method limit inside the Generate consume and silently fell back
    * to interpreted execution in the broadcast build (the residual
    * r9 `ERROR CodeGenerator` events).
    *
    * @param queries  (vec_id, q: array<long>) — small
    * @param codebook (code, cq: array<long>) — small, collected
    */
  def pqLut(queries: DataFrame, codebook: DataFrame,
            m: Int, dsub: Int): DataFrame = {
    val cents = pqCollect(codebook, m, dsub)
    queries.select(col("vec_id").as("qid"),
        explode(graft.functions.PqLut(col("q"),
          cents.map(_._1), cents.map(_._2), m, dsub)).as("c"))
      .select(col("qid"), col("c.sub_j").as("sub_j"),
        col("c.code").as("code"), col("c.d").as("d"))
  }

  /** The pre-native composed LUT — m·k struct literals of inlined
    * element_at arithmetic under one explode. Kept ONLY as the
    * differential-test reference for [[graft.functions.PqLut]]
    * (PqEncodeSpec pins row-for-row equality): at m·k·dsub = 1024 its
    * Generate consume exceeds Janino's 64 KB limit, codegen fails,
    * and the projection runs interpreted. */
  def pqLutComposed(queries: DataFrame, codebook: DataFrame,
                    m: Int, dsub: Int): DataFrame = {
    val cents = pqCollect(codebook, m, dsub)
    val cells = for { j <- 0 until m; (code, cv) <- cents } yield
      struct(lit(j.toLong).as("sub_j"), lit(code).as("code"),
        pqSubDist(j, dsub, cv).as("d"))
    queries.select(col("vec_id").as("qid"), explode(array(cells.toIndexedSeq: _*)).as("c"))
      .select(col("qid"), col("c.sub_j").as("sub_j"),
        col("c.code").as("code"), col("c.d").as("d"))
  }

  /** IVF-style pruned top-k: candidates restricted to the query's
    * cell(s) — either a precomputed partition column, [[ivfAssign]]'s
    * single cell, or [[ivfProbeCells]]'s nprobe-expanded rows (the
    * per-qid rank window spans all probed cells, so multi-probe needs
    * no extra merge step; corpus rows live in exactly one cell, so no
    * pair is scored twice). */
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
