package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorExprs.dotf

/** Similarity search over an embedding column (array<float>).
  *
  * - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *   One partitioned cross-join + per-query top-k window; fine when the
  *   query set is small (broadcast) even against a 100 TB corpus.
  * - `hyperplaneBuckets` / `annTopK`: random-hyperplane LSH — the scale
  *   path. Corpus is bucketed once (a narrow (bucket, id) shuffle);
  *   queries probe only their own bucket. Recall is tested against the
  *   brute-force baseline in the spec.
  *
  * All vector math runs through the codegen'd `dotf` Catalyst expression
  * (graft.functions.DotProduct) — a primitive loop inside whole-stage
  * codegen, ~300× faster per pair than interpreted zip_with/aggregate —
  * with norms precomputed once per vector, not once per pair.
  */
object SimilarityOps {

  /** Cosine similarity of two array<float/double> columns, in double.
    * For pairwise joins prefer precomputing norms once per side (see
    * bruteForceTopK) — this form recomputes both norms per pair. */
  def cosine(a: Column, b: Column): Column =
    dotf(a, b) / (sqrt(dotf(a, a)) * sqrt(dotf(b, b)))

  /** Exact top-k neighbors for each query vector (queries broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norm > 0 on BOTH sides: a zero vector's sim is 0/0 = NaN, which
    // Spark ranks ABOVE every real neighbor — one zero row would sit at
    // rn = 1 of every query (the usableVectors contract, enforced here
    // too; null embeddings already yield null norms, which sort last)
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      sqrt(dotf(col("embedding"), col("embedding"))).as("qnorm"))
      .filter(usable(col("qnorm")))
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("nv"),
      sqrt(dotf(col("embedding"), col("embedding"))).as("nnorm"))
      .filter(usable(col("nnorm")))
    val scored = q.crossJoin(c)
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dotf(col("qv"), col("nv")) / (col("qnorm") * col("nnorm"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  // ---- random-hyperplane LSH ----
  // 2^planes buckets + Hamming-1 multi-probe: each query scans
  // ~(planes+1)/2^planes of the corpus. `NumPlanes` is the floor;
  // callers at scale pass `adaptivePlanes(corpusRows)` so bucket
  // population — and hence per-query candidate count — stays constant
  // as the corpus grows.
  val NumPlanes = 6

  /** Hyperplane count sized to the corpus: enough sign bits that each
    * bucket holds ~`targetBucketRows` vectors, floored at [[NumPlanes]].
    * Candidates per query ≈ (planes+1) × targetBucketRows stays O(1) in
    * corpus size, so a fixed query set probes in constant time and an
    * all-corpus query set stays linear — the property that breaks when
    * the plane count is pinned (r5's p64 lesson, there for IVF). */
  def adaptivePlanes(corpusRows: Long, targetBucketRows: Long = 50): Int =
    math.max(NumPlanes,
      math.ceil(math.log(math.max(1L, corpusRows).toDouble /
        targetBucketRows) / math.log(2.0)).toInt)

  /** IVF cell count sized to the corpus: cells of ~`targetCellRows`
    * vectors, floored at 16. Per-query candidates = nprobe ×
    * targetCellRows stay O(1) as the corpus grows (pinning nlist makes
    * them ∝ n — p64 measured 20.3× for 10× data at r5). At 100 TB the
    * same rule gives cells of ~targetCellRows vectors; train on a
    * bounded sample, assignment stays one linear pass. */
  def adaptiveNlist(corpusRows: Long, targetCellRows: Long = 125,
                    floor: Int = 16): Int =
    math.max(floor, math.ceil(corpusRows.toDouble / targetCellRows).toInt)

  /** Deterministic pseudo-random hyperplane component in [-1, 1).
    * `z >>> 11` keeps 53 bits, so the divisor must be 2^53 (review r10:
    * 2^52 mapped onto [-1, 3) — ~76% of components positive, clustering
    * hyperplane normals in the positive orthant; on non-zero-mean
    * embeddings the sign bits skewed one way and buckets degenerated
    * toward one mega-bucket. The oracles render the same constants, so
    * this was a recall/pruning-quality bug the gate could not see). */
  private def unit(seed: Long): Double = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** Usable-vector guard: positive AND NOT NaN. NaN compares GREATEST
    * in both engines, so `norm > 0` alone passes a NaN norm (one NaN
    * component), and the NaN sim then ranks first everywhere — the
    * zero-vector failure mode all over again (review r10). Faces use
    * [[usable]]; oracles the SQL twin. */
  private[ops] def usable(norm: Column): Column = norm > 0 && !isnan(norm)

  def usableSql(v: String): String =
    s"(list_inner_product($v, $v) > 0 AND NOT isnan(list_inner_product($v, $v)))"

  private def planeLit(p: Int, dims: Int): Column =
    array((0 until dims).map(d => lit(unit(p.toLong * 8192 + d))): _*)

  /** Sign-bit bucket id of the embedding under `planes` hyperplanes. */
  def bucketId(emb: Column, dims: Int, planes: Int = NumPlanes): Column =
    (0 until planes).map { p =>
      when(dotf(emb, planeLit(p, dims)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Corpus bucketing: (vec_id, embedding, bucket). At scale, write this
    * out partitioned by bucket so probes prune to one partition. */
  def hyperplaneBuckets(corpus: DataFrame, dims: Int,
                        planes: Int = NumPlanes): DataFrame =
    corpus.withColumn("bucket", bucketId(col("embedding"), dims, planes))

  /** DuckDB rendering of `bucketId` from the SAME unit() constants:
    * both engines widen the float vector to double and accumulate the
    * dot product sequentially in double, so the sign bits — and hence
    * the buckets — agree bit-for-bit. `v` must be a DOUBLE[] expr. */
  def bucketIdSql(v: String, dims: Int, planes: Int = NumPlanes): String =
    (0 until planes).map { p =>
      val plane = (0 until dims).map(d => unit(p.toLong * 8192 + d).toString)
        .mkString("[", ", ", "]::DOUBLE[]")
      s"(CASE WHEN list_inner_product($v, $plane) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Full DuckDB oracle for `annTopK` (bucket + Hamming-1 multi-probe +
    * exact cosine rank within candidates), for queries vec_id < maxQid. */
  def annTopKSql(k: Int, dims: Int, maxQid: Int,
                 planes: Int = NumPlanes): String = {
    val flips = (0L +: (0 until planes).map(p => 1L << p)).mkString("(", "), (", ")")
    s"""WITH cb AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    ${bucketIdSql("CAST(embedding AS DOUBLE[])", dims, planes)} AS bucket
       |  FROM embeddings
       |  WHERE ${usableSql("CAST(embedding AS DOUBLE[])")}
       |), flips(flip) AS (VALUES $flips),
       |qp AS (
       |  SELECT vec_id AS qid, v AS qv, xor(bucket, flip) AS bucket
       |  FROM cb, flips WHERE vec_id < $maxQid
       |), scored AS (
       |  SELECT qp.qid, c.vec_id AS nid, list_cosine_similarity(qp.qv, c.v) AS sim
       |  FROM qp JOIN cb c USING (bucket) WHERE c.vec_id != qp.qid
       |)
       |SELECT qid, nid, ${OracleSql.roundD("sim", 4)} AS sim, rn FROM (
       |  SELECT qid, nid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
       |  FROM scored) t
       |WHERE rn <= $k ORDER BY qid, rn""".stripMargin
  }

  // ---- IVF (inverted-file) ANN: k-means coarse quantizer ----
  // The second scale path beside sign-LSH: corpus vectors are normalized
  // (so euclidean k-means ≈ spherical clustering and dot = cosine) and
  // assigned to their nearest of `nlist` centroids; a query probes only
  // the `nprobe` cells whose centroids are closest. Cells shard the
  // corpus ~evenly (data-adaptive, unlike fixed hyperplanes), so probing
  // nprobe/nlist of the cells scans ~nprobe/nlist of the corpus. At
  // 100 TB: train on a sample, write the corpus partitioned by cell, and
  // nlist grows ∝ corpus (cells of ~1 M vectors).

  /** Normalize an array-vector column to unit length (double); null for
    * zero vectors — a NaN vector inside KMeans.fit poisons centroid
    * updates for the whole corpus, where brute force would only degrade
    * for the one bad row. */
  private[ops] def normalized(v: Column): Column = {
    val n = sqrt(dotf(v, v))
    when(usable(n), transform(v, x => x.cast("double") / n)).otherwise(lit(null))
  }

  /** Count of INDEXABLE vectors in `corpus` — non-null, non-zero after
    * [[normalized]] (zero vectors are unsearchable under cosine and
    * excluded from every index here). This is the number both the
    * empty-table guard and the nlist cap must use: a table whose raw
    * row count clears the guard but whose usable count is below k
    * would otherwise reach MLlib and fail with a raw KMeans stack. */
  def usableVectors(corpus: DataFrame, vecCol: String = "embedding"): Long =
    corpus.withColumn("__nv", normalized(col(vecCol)))
      .filter(col("__nv").isNotNull).count()

  /** (model, corpus with `cell`): k-means fit over normalized vectors.
    * The quantizer trains on a bounded sample (~trainPerCell × nlist
    * rows) — at 100 TB you never fit on the full corpus; centroids from
    * a sample are statistically equivalent and training cost stays
    * constant as the corpus grows. Assignment of the FULL corpus is one
    * linear transform pass. */
  def ivfIndex(corpus: DataFrame, nlist: Int, seed: Long = 7L,
               trainPerCell: Int = 64)
  : (org.apache.spark.ml.clustering.KMeansModel, DataFrame) = {
    import org.apache.spark.ml.functions.array_to_vector
    // zero vectors are unsearchable under cosine and excluded from the
    // index (normalized() yields null for them)
    val c = corpus.withColumn("nvec", normalized(col("embedding")))
      .filter(col("nvec").isNotNull)
      .withColumn("fv", array_to_vector(col("nvec")))
    val km = new org.apache.spark.ml.clustering.KMeans()
      // 5 Lloyd iterations: each is Spark jobs over the sample, and the
      // quantizer only needs balanced-ish cells — recall is governed by
      // nprobe, and the recall/exactness specs hold at 5 as at 10
      .setK(nlist).setSeed(seed).setMaxIter(5)
      // random init, not k-means||: the parallel init alone runs several
      // extra Spark jobs over the sample; on a bounded training sample
      // Lloyd iterations converge the centroids either way, and IVF only
      // needs balanced-ish cells, not an optimal clustering
      .setInitMode("random")
      .setFeaturesCol("fv").setPredictionCol("cell")
      // deterministic training sample: limit() alone has no defined row
      // order (the PqOps.pqIndex discipline), so trained centroids — and
      // every persisted IVF artifact and published ivf_probe binding —
      // would differ across runs/partition layouts. TakeOrdered by the
      // HASH of vec_id, not vec_id itself: a head-of-table sample is
      // biased whenever ids correlate with the embedding distribution
      // (time-ordered ids under encoder drift train centroids on the
      // oldest vectors only, unbalancing every cell) — the hash order
      // is equally deterministic and distribution-blind.
      .fit(c.select(col("vec_id"), col("fv"))
        .orderBy(xxhash64(col("vec_id")), col("vec_id"))
        .limit(nlist * trainPerCell).select("fv"))
    (km, km.transform(c).drop("fv"))
  }

  /** IVF ANN top-k: probe the `nprobe` nearest cells per query, exact
    * cosine within them. Recall vs bruteForceTopK is spec-asserted. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int, nprobe: Int): DataFrame = {
    val (km, assigned) = ivfIndex(corpus, nlist)
    ivfTopKWith(km, assigned, queries, k, nprobe)
  }

  /** Probe a prebuilt IVF index (train once, probe many — the reusable
    * form; ivfTopK is the self-contained convenience). Probe cells rank
    * by the SAME objective k-means assigns with: argmin ||q-c||² ⇔
    * argmax (q·c − |c|²/2) — ranking by raw dot product alone would skip
    * the cell a neighbor was assigned to whenever centroid norms differ. */
  def ivfTopKWith(km: org.apache.spark.ml.clustering.KMeansModel, assigned: DataFrame,
                  queries: DataFrame, k: Int, nprobe: Int): DataFrame =
    ivfTopKFrom(centersOf(km, queries.sparkSession), assigned, queries, k, nprobe)

  /** (qid, qv, cell) for each query's nprobe best cells — the shared
    * IVF probe-selection stage.
    *
    * Centroids ride as a small broadcast DataFrame, NOT as plan
    * literals: nlist grows ∝ corpus (10⁴–10⁵ cells at 100 TB), and
    * nlist × dims literal arrays would blow up analysis/codegen long
    * before any data moves. A broadcast join keeps the plan O(1) in
    * nlist while the probe math is unchanged. */
  /** The trained centroids as DATA — `cell, cv (centroid), hn2 (|c|²/2)`
    * — the persistable form of the quantizer (saveIvfIndex). */
  def centersOf(km: org.apache.spark.ml.clustering.KMeansModel,
                spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val centerRows = km.clusterCenters.zipWithIndex.map { case (v, i) =>
      val arr = v.toArray
      (i, arr, arr.map(x => x * x).sum / 2.0)
    }.toSeq
    import spark.implicits._
    centerRows.toDF("cell", "cv", "hn2")
  }

  /** Persist an IVF index as two plain parquet tables — centroids and
    * the assigned (normalized) corpus. Build once per corpus snapshot,
    * probe many: at 100 TB the quantizer is a batch artifact, not
    * something re-trained per query session, and parquet round-trips it
    * through any catalog/object store the rest of the lakehouse uses. */
  def saveIvfIndex(km: org.apache.spark.ml.clustering.KMeansModel,
                   assigned: DataFrame, dir: String): Unit = {
    centersOf(km, assigned.sparkSession)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    assigned.select("vec_id", "nvec", "cell")
      .write.mode("overwrite").parquet(s"$dir/assigned")
  }

  /** Load a saved IVF index: (centers, assigned) for `ivfTopKFrom`. */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/centroids"), spark.read.parquet(s"$dir/assigned"))

  /** Probe a LOADED index (the persisted-artifact face of ivfTopKWith —
    * same plan: broadcast centroid join, cell-pruned exact cosine). */
  def ivfTopKFrom(centers: DataFrame, assigned: DataFrame,
                  queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val bc = assigned.select(col("vec_id").as("nid"), col("nvec").as("nv"), col("cell"))
    val probes = probeCellsFrom(centers, queries, nprobe)
    val scored = probes.join(bc, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), dotf(col("qv"), col("nv")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  private def probeCells(km: org.apache.spark.ml.clustering.KMeansModel,
                         queries: DataFrame, nprobe: Int): DataFrame =
    probeCellsFrom(centersOf(km, queries.sparkSession), queries, nprobe)

  private def probeCellsFrom(centers: DataFrame,
                             queries: DataFrame, nprobe: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), normalized(col("embedding")).as("qv"))
      .filter(col("qv").isNotNull)
      .crossJoin(broadcast(centers))
      .select(col("qid"), col("qv"), col("cell"),
        (dotf(col("qv"), col("cv")) - col("hn2")).as("cscore"))
    val wc = Window.partitionBy(col("qid")).orderBy(col("cscore").desc, col("cell"))
    q.withColumn("cr", row_number().over(wc)).filter(col("cr") <= nprobe)
      .select("qid", "qv", "cell")
  }

  /** IVF pruning × int8-quantized scoring — the IVF-PQ-style production
    * composition: cells prune WHICH vectors are scanned (float centroid
    * math, tiny), quantization shrinks WHAT is scanned (int8 vectors,
    * 4× fewer bytes through scan and shuffle than the float path).
    * Probe selection is identical to ivfTopKWith; candidate scoring is
    * the p25 exact-integer cosine (`quant8` + `dotl`, both codegen),
    * still bit-replayable in SQL given the trained centroids. */
  def ivfQuantizedTopKWith(km: org.apache.spark.ml.clustering.KMeansModel,
                           assigned: DataFrame, queries: DataFrame,
                           k: Int, nprobe: Int): DataFrame = {
    import graft.functions.VectorExprs.dotl
    val bcq = assigned.select(col("vec_id").as("nid"),
        quantize(col("nvec")).as("qb"), col("cell"))
      .withColumn("nb", dotl(col("qb"), col("qb")))
    // quantize each query ONCE and join the tiny result onto the probe
    // cells — quantizing after the nprobe explode would run the O(dims)
    // kernel nprobe times per query and drag the float vector through
    // the probe shuffle just to discard it
    val qq = queries.select(col("vec_id").as("qid"),
        quantize(normalized(col("embedding"))).as("qa"))
      .filter(col("qa").isNotNull)
      .withColumn("na", dotl(col("qa"), col("qa")))
    val probes = probeCells(km, queries, nprobe)
      .select("qid", "cell")
      .join(broadcast(qq), Seq("qid"))
    val scored = probes.join(bcq, Seq("cell"))
      .filter(col("qid") =!= col("nid") && col("na") > 0 && col("nb") > 0)
      .select(col("qid"), col("nid"),
        (dotl(col("qa"), col("qb")).cast("double") /
          sqrt((col("na") * col("nb")).cast("double"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "nid", "sim", "rn")
  }

  /** DuckDB oracle for ivfQuantizedTopKWith: the ivfTopKSql replay
    * (assignment + probes from the trained centroids) with the p25
    * quantized score over the same normalized doubles — exact integer
    * arithmetic, so no rounding in the compare. */
  /** Trained centroids as a DuckDB VALUES list `(cell, cv, hn2)` —
    * shared by every oracle that replays a k-means quantizer
    * (ivfTopKSql, ivfQuantizedTopKSql, DedupOps.semanticDedupSql).
    * `Double.toString` renders shortest-round-trip literals, which
    * DuckDB parses back to the same bits. */
  private[ops] def centersValuesSql(centers: Seq[Array[Double]]): String =
    centers.zipWithIndex.map { case (c, i) =>
      val arr = c.map(_.toString).mkString("[", ", ", "]::DOUBLE[]")
      val hn2 = c.map(x => x * x).sum / 2.0
      s"($i, $arr, $hn2)"
    }.mkString(", ")

  /** The normalized-corpus CTE body shared by the quantizer-replay
    * oracles: unit-normalized double vectors, zero vectors excluded
    * (exactly SimilarityOps.normalized). */
  private[ops] val NormalizedCorpusSql: String =
    s"""SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> x / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
       |                                       CAST(embedding AS DOUBLE[])))) AS v
       |  FROM embeddings
       |  WHERE ${usableSql("CAST(embedding AS DOUBLE[])")}""".stripMargin

  def ivfQuantizedTopKSql(centers: Seq[Array[Double]], k: Int, nprobe: Int,
                          maxQid: Int): String = {
    val values = centersValuesSql(centers)
    s"""WITH centers(cell, cv, hn2) AS (VALUES $values),
       |nv AS (
       |  $NormalizedCorpusSql
       |), qz AS (
       |  SELECT vec_id,
       |    CASE WHEN mx > 0
       |      THEN list_transform(v, x -> floor(x * 127.0 / mx + 0.5))
       |      ELSE list_transform(v, x -> 0.0) END AS q
       |  FROM (SELECT vec_id, v,
       |          list_max(list_transform(v, x -> abs(x))) AS mx FROM nv)
       |), cellrank AS (
       |  SELECT nv.vec_id, c.cell,
       |    row_number() OVER (PARTITION BY nv.vec_id
       |      ORDER BY (list_inner_product(nv.v, c.cv) - c.hn2) DESC, c.cell) AS cr
       |  FROM nv, centers c
       |), assigned AS (
       |  SELECT cr.vec_id, z.q, cr.cell FROM cellrank cr
       |  JOIN qz z ON z.vec_id = cr.vec_id WHERE cr.cr = 1
       |), probes AS (
       |  SELECT cr.vec_id AS qid, z.q AS qa, cr.cell FROM cellrank cr
       |  JOIN qz z ON z.vec_id = cr.vec_id
       |  WHERE cr.vec_id < $maxQid AND cr.cr <= $nprobe
       |), scored AS (
       |  SELECT p.qid, a.vec_id AS nid,
       |    list_dot_product(p.qa, a.q) /
       |      sqrt(list_dot_product(p.qa, p.qa) * list_dot_product(a.q, a.q)) AS sim
       |  FROM probes p JOIN assigned a USING (cell)
       |  WHERE a.vec_id != p.qid
       |    AND list_dot_product(p.qa, p.qa) > 0
       |    AND list_dot_product(a.q, a.q) > 0
       |)
       |SELECT qid, nid, sim, rn FROM (
       |  SELECT qid, nid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
       |  FROM scored) t
       |WHERE rn <= $k ORDER BY qid, rn""".stripMargin
  }

  /** Full DuckDB oracle for `ivfTopKWith` given the TRAINED centroids
    * (the p07 pattern, with runtime-trained constants instead of seeded
    * ones): one scored-cells CTE replays both corpus assignment (rank-1
    * cell) and query probing (rank ≤ nprobe) with the argmax objective
    * dot(v,c) − |c|²/2, ties to the lowest cell id, over the same
    * double-normalized vectors. Probe ranking and final sims replay the
    * Spark arithmetic exactly (`Double.toString` renders shortest-round-
    * trip literals, which DuckDB parses back to the same bits). Corpus
    * assignment is mathematically the same argmin KMeansModel.transform
    * computes but NOT the same floating-point path (Spark ML's
    * findClosest uses norm-based fastSquaredDistance with ~1e-6 relative
    * bounds); a vector that close to equidistant between two centroids
    * could be assigned differently. Both sides are deterministic on
    * fixed data, so the tri-SF oracle pass means agreement holds for
    * these datasets — keeping transform's map-only assignment (no
    * corpus×nlist shuffle) is worth that bounded, gate-tested risk. */
  /** CTE chain shared by the quantizer-replay oracles (factored r15
    * late so p13's and p102's IVF replays cannot drift): trained
    * centers as VALUES → normalized corpus → per-vector cell ranks →
    * assigned cells + the first maxQid queries' nprobe probe cells →
    * scored(qid, nid, sim). Callers append their own ranking/report. */
  private def ivfScoredCoreSql(values: String, nprobe: Int,
                               maxQid: Int): String =
    s"""centers(cell, cv, hn2) AS (VALUES $values),
       |nv AS (
       |  $NormalizedCorpusSql
       |), cellrank AS (
       |  SELECT nv.vec_id, nv.v, c.cell,
       |    row_number() OVER (PARTITION BY nv.vec_id
       |      ORDER BY (list_inner_product(nv.v, c.cv) - c.hn2) DESC, c.cell) AS cr
       |  FROM nv, centers c
       |), assigned AS (
       |  SELECT vec_id, v, cell FROM cellrank WHERE cr = 1
       |), probes AS (
       |  SELECT vec_id AS qid, v AS qv, cell FROM cellrank
       |  WHERE vec_id < $maxQid AND cr <= $nprobe
       |), scored AS (
       |  SELECT p.qid, a.vec_id AS nid, list_inner_product(p.qv, a.v) AS sim
       |  FROM probes p JOIN assigned a USING (cell)
       |  WHERE a.vec_id != p.qid
       |)""".stripMargin

  def ivfTopKSql(centers: Seq[Array[Double]], k: Int, nprobe: Int, maxQid: Int): String = {
    val values = centersValuesSql(centers)
    s"""WITH ${ivfScoredCoreSql(values, nprobe, maxQid)}
       |SELECT qid, nid, ${OracleSql.roundD("sim", 4)} AS sim, rn FROM (
       |  SELECT qid, nid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
       |  FROM scored) t
       |WHERE rn <= $k ORDER BY qid, rn""".stripMargin
  }

  /** p102's oracle: BOTH sides of the recall report re-derived
    * independently — the exact top-k from the raw brute-force cosine
    * join (p06's core) and the approximate top-k from the IVF replay
    * over the same trained centroids (p13's core) — then the hit
    * count and integer-ppm recall from their join. */
  def annRecallSql(centers: Seq[Array[Double]], k: Int, nprobe: Int,
                   maxQid: Int): String = {
    val values = centersValuesSql(centers)
    val usableA = usableSql("CAST(a.embedding AS DOUBLE[])")
    val usableB = usableSql("CAST(b.embedding AS DOUBLE[])")
    s"""WITH ${ivfScoredCoreSql(values, nprobe, maxQid)},
       |appr AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rn
       |    FROM scored) t WHERE rn <= $k
       |), exact AS (
       |  SELECT qid, nid FROM (
       |    SELECT a.vec_id qid, b.vec_id nid,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                                        CAST(b.embedding AS DOUBLE[])) DESC,
       |                 b.vec_id) rn
       |    FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
       |    WHERE a.vec_id < $maxQid AND $usableA AND $usableB
       |  ) t WHERE rn <= $k
       |), hits AS (
       |  SELECT qid, count(*) AS n_hit
       |  FROM exact JOIN appr USING (qid, nid) GROUP BY qid
       |), ex AS (
       |  SELECT qid, count(*) AS n_exact FROM exact GROUP BY qid
       |)
       |SELECT ex.qid AS qid, n_exact, coalesce(n_hit, 0) AS n_hit,
       |  coalesce(n_hit, 0) * 1000000 // n_exact AS recall_ppm
       |FROM ex LEFT JOIN hits USING (qid) ORDER BY qid""".stripMargin
  }

  /** ANN index-quality report (r15 late): per-query recall@k of the
    * IVF probe against exact brute-force ground truth, on a BOUNDED
    * query sample — the "measure the index before trusting it" face
    * every production ANN deployment ships (Jégou et al. 2011 evaluate
    * IVF indexes exactly this way; recall@k is THE figure of merit a
    * pipeline reads before routing dedup/retrieval through the index).
    *
    * The exact side is a declared linear scan over the corpus for the
    * SAMPLED queries only (O(sample · corpus), the p06 baseline shape
    * — paid on purpose, that is what ground truth costs); the
    * approximate side rides the SHARED IVF index (cell-pruned probes,
    * the p13 plan). Hits join two parameter-bounded top-k lists —
    * O(sample · k) rows — and recall lands in integer ppm so the
    * report replays exactly at any partitioning. */
  def annRecallReport(corpus: DataFrame,
                      km: org.apache.spark.ml.clustering.KMeansModel,
                      assigned: DataFrame, queries: DataFrame,
                      k: Int, nprobe: Int): DataFrame = {
    val exact = bruteForceTopK(corpus, queries, k)
      .select(col("qid"), col("nid"))
    val appr = ivfTopKWith(km, assigned, queries, k, nprobe)
      .select(col("qid"), col("nid"))
    val ex = exact.groupBy(col("qid")).agg(count(lit(1)).as("n_exact"))
    val hits = exact.join(appr, Seq("qid", "nid"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    ex.join(hits, Seq("qid"), "left")
      .select(col("qid"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall_ppm", expr("n_hit * 1000000 DIV n_exact"))
      .orderBy(col("qid"))
  }

  /** MMR diversity re-rank (r15 late): maximal marginal relevance
    * (Carbonell & Goldstein 1998) over the SHARED IVF index's top-k0
    * candidates — the standard post-step between retrieval and a
    * context window, trading relevance against redundancy:
    * pick argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), m times.
    *
    * Plan: candidates come from the p13 probe (cell-pruned, k0 per
    * query); the pairwise candidate-similarity matrix is k0² rows per
    * query (parameter-bounded — never corpus-proportional); the greedy
    * itself runs DISTRIBUTED per query via cogroup over bounded groups
    * (no driver collect anywhere). All scores are integer µ-units
    * (floor(cos·10⁶), the p99 quantization whose cross-engine parity
    * is oracle-proven), so λ·rel − (1−λ)·maxSel is exact Long
    * arithmetic and the selection replays bit-for-bit in the oracle's
    * 3-step unrolled SQL. Ties break on the lower vec_id at every
    * step. */
  def mmrRerank(centers: DataFrame, assigned: DataFrame, queries: DataFrame,
                k0: Int, m: Int, nprobe: Int, lambdaPpm: Long): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cand = ivfTopKFrom(centers, assigned, queries, k0, nprobe)
      .select(col("qid"), col("nid"),
        floor(col("sim") * lit(1000000.0)).as("rel_u"))
    val cv = cand.join(
      assigned.select(col("vec_id").as("nid"), col("nvec").as("nv")), "nid")
    val pairs = cv.select(col("qid"), col("nid").as("a_nid"), col("nv").as("av"))
      .join(cv.select(col("qid"), col("nid").as("b_nid"), col("nv").as("bv")), "qid")
      .filter(col("a_nid") =!= col("b_nid"))
      .select(col("qid"), col("a_nid"), col("b_nid"),
        floor(dotf(col("av"), col("bv")) * lit(1000000.0)).as("pair_u"))
    val candG = cand.as[(Long, Long, Long)].groupByKey(_._1)
    val pairG = pairs.as[(Long, Long, Long, Long)].groupByKey(_._1)
    candG.cogroup(pairG) { (qid, cs, ps) =>
      val rel = cs.map(c => (c._2, c._3)).toArray
      val pu = ps.map(p => (p._2, p._3) -> p._4).toMap
      val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      while (chosen.size < m && chosen.size < rel.length) {
        var bestN = -1L
        var bestS = Long.MinValue
        rel.foreach { case (nid, ru) =>
          if (!chosen.exists(_._1 == nid)) {
            val score =
              if (chosen.isEmpty) lambdaPpm * ru
              else lambdaPpm * ru - (1000000L - lambdaPpm) *
                chosen.iterator.map(s => pu((nid, s._1))).max
            if (score > bestS || (score == bestS && (bestN < 0 || nid < bestN))) {
              bestN = nid; bestS = score
            }
          }
        }
        chosen += ((bestN, bestS))
      }
      chosen.iterator.zipWithIndex.map { case ((nid, s), i) =>
        (qid, i + 1, nid, s)
      }
    }.toDF("qid", "rank", "nid", "score_u").orderBy("qid", "rank")
  }

  /** p103's oracle: the full MMR selection re-derived in SQL — IVF
    * candidates from the shared quantizer-replay core, the pairwise
    * µ-unit matrix from the same normalized vectors, and the 3-step
    * greedy unrolled as CTE stages (each step's argmax re-derived, not
    * rendered — the p96 unrolled-iteration pattern). Fixed to m = 3
    * picks; the declared face passes the same m. */
  def mmrRerankSql(centers: Seq[Array[Double]], k0: Int, nprobe: Int,
                   maxQid: Int, lambdaPpm: Long): String = {
    val values = centersValuesSql(centers)
    val lam = lambdaPpm
    val om = 1000000L - lambdaPpm
    s"""WITH ${ivfScoredCoreSql(values, nprobe, maxQid)},
       |cand AS (
       |  SELECT qid, nid, CAST(floor(sim * 1000000.0) AS BIGINT) AS rel_u
       |  FROM (SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid
       |          ORDER BY sim DESC, nid) AS rn FROM scored) t
       |  WHERE rn <= $k0),
       |cvec AS (
       |  SELECT c.qid, c.nid, a.v FROM cand c
       |  JOIN assigned a ON a.vec_id = c.nid),
       |prs AS (
       |  SELECT a.qid, a.nid AS a_nid, b.nid AS b_nid,
       |    CAST(floor(list_inner_product(a.v, b.v) * 1000000.0) AS BIGINT)
       |      AS pair_u
       |  FROM cvec a JOIN cvec b ON a.qid = b.qid AND a.nid != b.nid),
       |s1 AS (
       |  SELECT qid, nid, $lam * rel_u AS score_u FROM (
       |    SELECT qid, nid, rel_u, row_number() OVER (PARTITION BY qid
       |      ORDER BY rel_u DESC, nid) AS rr FROM cand) t
       |  WHERE rr = 1),
       |r2 AS (
       |  SELECT c.qid, c.nid,
       |    $lam * c.rel_u - $om * max(p.pair_u) AS score_u
       |  FROM cand c
       |  JOIN s1 ON s1.qid = c.qid AND c.nid != s1.nid
       |  JOIN prs p ON p.qid = c.qid AND p.a_nid = c.nid
       |            AND p.b_nid = s1.nid
       |  GROUP BY c.qid, c.nid, c.rel_u),
       |s2 AS (
       |  SELECT qid, nid, score_u FROM (
       |    SELECT qid, nid, score_u, row_number() OVER (PARTITION BY qid
       |      ORDER BY score_u DESC, nid) AS rr FROM r2) t
       |  WHERE rr = 1),
       |r3 AS (
       |  SELECT c.qid, c.nid,
       |    $lam * c.rel_u - $om * max(p.pair_u) AS score_u
       |  FROM cand c
       |  JOIN s1 ON s1.qid = c.qid
       |  JOIN s2 ON s2.qid = c.qid
       |  JOIN prs p ON p.qid = c.qid AND p.a_nid = c.nid
       |            AND p.b_nid IN (s1.nid, s2.nid)
       |  WHERE c.nid != s1.nid AND c.nid != s2.nid
       |  GROUP BY c.qid, c.nid, c.rel_u),
       |s3 AS (
       |  SELECT qid, nid, score_u FROM (
       |    SELECT qid, nid, score_u, row_number() OVER (PARTITION BY qid
       |      ORDER BY score_u DESC, nid) AS rr FROM r3) t
       |  WHERE rr = 1)
       |SELECT qid, 1 AS rank, nid, score_u FROM s1
       |UNION ALL SELECT qid, 2 AS rank, nid, score_u FROM s2
       |UNION ALL SELECT qid, 3 AS rank, nid, score_u FROM s3
       |ORDER BY qid, rank""".stripMargin
  }

  // ---- hard-negative mining (retrieval-training data prep) ----

  /** Mine HARD NEGATIVES for contrastive retrieval training: for each
    * query vector, the top-k most-similar corpus vectors whose `label`
    * DIFFERS from the query's — the semantically-closest wrong answers,
    * the examples a dual-encoder learns most from (the in-batch-negative
    * upgrade of DPR, Karpukhin 2020 §3.2 / ANCE, Xiong 2021: negatives
    * mined from an ANN index over the current corpus, not random).
    *
    * Rides the SHARED IVF index (probe the nprobe nearest cells, exact
    * cosine within them — the p13 plan) with one extra predicate: the
    * label filter runs BEFORE the rank window, so mined negatives are
    * dense even when a query's own class dominates its probe cells.
    * `labeled` is the persisted IVF `assigned` table joined with its
    * label column; at 100 TB labels live alongside the codes in the
    * index artifact and this is the same one-pass probe scan. */
  def hardNegativesFrom(centers: DataFrame, labeled: DataFrame,
                        queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val bc = labeled.select(col("vec_id").as("nid"), col("nvec").as("nv"),
      col("cell"), col("label").as("n_label"))
    val ql = queries.select(col("vec_id").as("qid"), col("label").as("q_label"))
    val probes = probeCellsFrom(centers, queries, nprobe)
      .join(broadcast(ql), Seq("qid"))
    val scored = probes.join(bc, Seq("cell"))
      .filter(col("qid") =!= col("nid") && col("n_label") =!= col("q_label"))
      .select(col("qid"), col("q_label"), col("nid"), col("n_label"),
        dotf(col("qv"), col("nv")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** DuckDB oracle for hardNegativesFrom: the ivfTopKSql replay with the
    * label join + exclusion predicate in the same place (before the
    * rank), over the same trained centroids. */
  def hardNegativesSql(centers: Seq[Array[Double]], k: Int, nprobe: Int,
                       maxQid: Int): String = {
    val values = centersValuesSql(centers)
    s"""WITH centers(cell, cv, hn2) AS (VALUES $values),
       |nv AS (
       |  $NormalizedCorpusSql
       |), cellrank AS (
       |  SELECT nv.vec_id, nv.v, c.cell,
       |    row_number() OVER (PARTITION BY nv.vec_id
       |      ORDER BY (list_inner_product(nv.v, c.cv) - c.hn2) DESC, c.cell) AS cr
       |  FROM nv, centers c
       |), assigned AS (
       |  SELECT cr.vec_id, cr.v, cr.cell, e.label
       |  FROM cellrank cr JOIN embeddings e ON e.vec_id = cr.vec_id
       |  WHERE cr.cr = 1
       |), probes AS (
       |  SELECT cr.vec_id AS qid, cr.v AS qv, e.label AS q_label, cr.cell
       |  FROM cellrank cr JOIN embeddings e ON e.vec_id = cr.vec_id
       |  WHERE cr.vec_id < $maxQid AND cr.cr <= $nprobe
       |), scored AS (
       |  SELECT p.qid, p.q_label, a.vec_id AS nid, a.label AS n_label,
       |    list_inner_product(p.qv, a.v) AS sim
       |  FROM probes p JOIN assigned a USING (cell)
       |  WHERE a.vec_id != p.qid AND a.label != p.q_label
       |)
       |SELECT qid, q_label, nid, n_label,
       |  ${OracleSql.roundD("sim", 4)} AS sim, rn FROM (
       |  SELECT qid, q_label, nid, n_label, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
       |  FROM scored) t
       |WHERE rn <= $k ORDER BY qid, rn""".stripMargin
  }

  // ---- kNN label propagation (semi-supervised label expansion) ----

  /** Propagate labels from a SEED subset to every unlabeled vector by
    * k-nearest-neighbor majority vote through the shared IVF index —
    * the classic semi-supervised expansion of a small annotated set
    * over a large corpus (the non-parametric cousin of FineWeb-Edu's
    * classifier-scaling step: label thousands, propagate to billions).
    *
    * Per query: probe the nprobe nearest cells, rank the SEED vectors
    * within them by exact cosine, keep k, majority-vote their labels
    * (ties: higher count first, then the smaller label — both integer
    * comparisons). `queries` carry their own `label` column so the
    * output includes `agree` — in-place eval of the propagation against
    * held-out truth, the number you watch before trusting the expansion.
    *
    * Scale: the probe scan is the p13 plan (nprobe/nlist of the seed
    * set per query); voting is two integer aggregations on the tiny
    * top-k result. Seed labels ride the index artifact. */
  def labelPropagationFrom(centers: DataFrame, seedLabeled: DataFrame,
                           queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val bc = seedLabeled.select(col("vec_id").as("nid"), col("nvec").as("nv"),
      col("cell"), col("label").as("n_label"))
    val truth = queries.select(col("vec_id").as("qid"), col("label").as("true_label"))
    val probes = probeCellsFrom(centers, queries, nprobe)
    val scored = probes.join(bc, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("n_label"),
        dotf(col("qv"), col("nv")).as("sim"))
    val wk = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    val topk = scored.withColumn("rn", row_number().over(wk)).filter(col("rn") <= k)
    val votes = topk.groupBy("qid", "n_label").agg(count(lit(1)).as("votes"))
    val wv = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("n_label"))
    votes.withColumn("vr", row_number().over(wv)).filter(col("vr") === 1)
      .select(col("qid"), col("n_label").as("pred_label"), col("votes"))
      .join(broadcast(truth), Seq("qid"))
      .withColumn("agree", col("pred_label") === col("true_label"))
  }

  /** DuckDB oracle for labelPropagationFrom with seed = vec_id %
    * seedMod == 0 and queries = the rest (the p64 split), over the
    * rendered centroids. */
  def labelPropagationSql(centers: Seq[Array[Double]], k: Int, nprobe: Int,
                          seedMod: Long): String = {
    val values = centersValuesSql(centers)
    s"""WITH centers(cell, cv, hn2) AS (VALUES $values),
       |nv AS (
       |  $NormalizedCorpusSql
       |), cellrank AS (
       |  SELECT nv.vec_id, nv.v, c.cell,
       |    row_number() OVER (PARTITION BY nv.vec_id
       |      ORDER BY (list_inner_product(nv.v, c.cv) - c.hn2) DESC, c.cell) AS cr
       |  FROM nv, centers c
       |), seed AS (
       |  SELECT cr.vec_id, cr.v, cr.cell, e.label
       |  FROM cellrank cr JOIN embeddings e ON e.vec_id = cr.vec_id
       |  WHERE cr.cr = 1 AND cr.vec_id % $seedMod = 0
       |), probes AS (
       |  SELECT cr.vec_id AS qid, cr.v AS qv, e.label AS true_label, cr.cell
       |  FROM cellrank cr JOIN embeddings e ON e.vec_id = cr.vec_id
       |  WHERE cr.vec_id % $seedMod != 0 AND cr.cr <= $nprobe
       |), topk AS (
       |  SELECT qid, true_label, n_label FROM (
       |    SELECT p.qid, p.true_label, s.label AS n_label,
       |      row_number() OVER (PARTITION BY p.qid
       |        ORDER BY list_inner_product(p.qv, s.v) DESC, s.vec_id) AS rn
       |    FROM probes p JOIN seed s USING (cell)
       |    WHERE s.vec_id != p.qid) t
       |  WHERE rn <= $k
       |), votes AS (
       |  SELECT qid, true_label, n_label, count(*) AS votes
       |  FROM topk GROUP BY ALL
       |)
       |SELECT qid, pred_label, votes, true_label,
       |  pred_label = true_label AS agree
       |FROM (
       |  SELECT qid, n_label AS pred_label, votes, true_label,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY votes DESC, n_label) AS vr
       |  FROM votes) t
       |WHERE vr = 1 ORDER BY qid""".stripMargin
  }

  /** DuckDB oracle for cluster-balanced sampling over a trained IVF
    * index (p77): assignment re-derived from the rendered centroids,
    * then the p28 md5-order quota per cell. */
  def diverseSampleSql(centers: Seq[Array[Double]], n: Int): String = {
    val values = centersValuesSql(centers)
    s"""WITH centers(cell, cv, hn2) AS (VALUES $values),
       |nv AS (
       |  $NormalizedCorpusSql
       |), cellrank AS (
       |  SELECT nv.vec_id, c.cell,
       |    row_number() OVER (PARTITION BY nv.vec_id
       |      ORDER BY (list_inner_product(nv.v, c.cv) - c.hn2) DESC, c.cell) AS cr
       |  FROM nv, centers c
       |), assigned AS (SELECT vec_id, cell FROM cellrank WHERE cr = 1)
       |SELECT cell, vec_id, rk FROM (
       |  SELECT cell, vec_id,
       |    ${SampleOps.stratifiedRankSql("cell", "vec_id")} AS rk
       |  FROM assigned) t
       |WHERE rk <= $n ORDER BY cell, rk""".stripMargin
  }

  // ---- margin-based aligned-pair mining (bitext-mining prep) ----

  /** Mine ALIGNED PAIRS across two corpus sides with the margin
    * criterion (r14, p99) — the bitext-mining primitive behind
    * CCMatrix/CCAligned/LASER (Artetxe & Schwenk 2019): absolute cosine
    * over-claims in dense hubs and under-claims for isolated pairs, so
    * each candidate pair is scored by its cosine RELATIVE to both
    * endpoints' neighborhoods,
    *
    *   margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)
    *
    * and a pair is mined when x's best match y clears a margin
    * threshold. Sides here are `label % 2` over the embeddings corpus
    * (the "two languages"); k-NN neighborhoods come through the SHARED
    * persisted IVF index in BOTH directions (A probes B's cells, B
    * probes A's — two instances of the p13 probe plan, never
    * all-pairs).
    *
    * Arithmetic: cosines quantize to integer µ-units
    * (floor(sim · 10⁶) — the p95 RRF discipline) BEFORE any Σ, so
    * neighborhood sums are order-invariant, and the margin is one
    * integer expression
    *
    *   margin_ppm = (cosµ · 2·kA·kB · 10⁶) DIV (ΣAµ·kB + ΣBµ·kA)
    *
    * (cross-multiplied so the two avg divisions never leave integers;
    * kA/kB are each side's FOUND neighbor counts, ≤ k, so sparse
    * IVF cells degrade exactly like the published method — average
    * over what was retrieved). Positive-denominator guard in both
    * engines: an all-negative neighborhood has no meaningful margin.
    *
    * Scale shape: two probe joins (each O(side · nprobe) fan-out into
    * cell-bounded candidate sets), two rank windows keyed by qid, one
    * broadcast-sized join to stitch the reverse sums onto forward best
    * matches. Margins and sums are per-vector rows — nothing grows
    * past O(corpus · k). */
  def marginMiningFrom(centers: DataFrame, labeled: DataFrame,
                       emb: DataFrame, k: Int, nprobe: Int,
                       minMarginPpm: Long): DataFrame = {
    val sided = labeled.select(col("vec_id").as("nid"), col("nvec").as("nv"),
      col("cell"), pmod(col("label"), lit(2)).as("nside"))
    // per-direction candidates: side s queries probe the OTHER side's
    // cell-pruned vectors; rank + µ-quantized cosine per candidate
    def cands(side: Int): DataFrame = {
      val q = emb.filter(pmod(col("label"), lit(2)) === side)
      val probes = probeCellsFrom(centers, q, nprobe)
      val scored = probes.join(sided.filter(col("nside") === (1 - side)), Seq("cell"))
        .select(col("qid"), col("nid"), dotf(col("qv"), col("nv")).as("sim"))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select(col("qid"), col("nid"), col("rn"),
          floor(col("sim") * lit(1000000.0)).as("cosu"))
    }
    // r15: ab has TWO consumers (the per-qid neighborhood sum and the
    // rn=1 best-match filter) — without materialization the whole
    // side-0 probe pipeline (centroid cross join + rank window + cell
    // join + top-k window) executes twice. The frame is
    // O(side0 · k) rows of ids and integers — the §8 proxy shape.
    // ba has one consumer and stays lazy.
    val ab = cands(0).localCheckpoint(true)
    val ba = cands(1)
    val sumA = ab.groupBy(col("qid"))
      .agg(sum(col("cosu")).as("suma"), count(lit(1)).as("ka"))
    val sumB = ba.groupBy(col("qid"))
      .agg(sum(col("cosu")).as("sumb"), count(lit(1)).as("kb"))
    ab.filter(col("rn") === 1)
      .join(sumA, Seq("qid"))
      .join(sumB.withColumnRenamed("qid", "nid"), Seq("nid"))
      .filter(expr("suma * kb + sumb * ka") > 0)
      .select(col("qid"), col("nid"), col("cosu"),
        expr("(cosu * 2 * ka * kb * 1000000) DIV (suma * kb + sumb * ka)")
          .as("margin_ppm"))
      .filter(col("margin_ppm") >= minMarginPpm)
      .orderBy(col("qid"))
  }

  /** DuckDB oracle for [[marginMiningFrom]]: both directions' probe
    * replays from the rendered centroids, the same µ-quantization,
    * neighborhood sums, and integer margin. */
  def marginMiningSql(centers: Seq[Array[Double]], k: Int, nprobe: Int,
                      minMarginPpm: Long): String = {
    val values = centersValuesSql(centers)
    s"""WITH centers(cell, cv, hn2) AS (VALUES $values),
       |nv AS (
       |  $NormalizedCorpusSql
       |), cellrank AS (
       |  SELECT nv.vec_id, nv.v, c.cell,
       |    row_number() OVER (PARTITION BY nv.vec_id
       |      ORDER BY (list_inner_product(nv.v, c.cv) - c.hn2) DESC, c.cell) AS cr
       |  FROM nv, centers c
       |), sided AS (
       |  -- ((x % 2) + 2) % 2 = Spark's pmod(label, 2) for negative
       |  -- labels too; DuckDB's % keeps the dividend's sign, so a
       |  -- negative-label corpus would otherwise produce side -1 rows
       |  -- that vanish from the oracle only (ADVICE r14)
       |  SELECT cr.vec_id AS nid, cr.v AS nv, cr.cell,
       |    ((e.label % 2) + 2) % 2 AS nside
       |  FROM cellrank cr JOIN embeddings e ON e.vec_id = cr.vec_id
       |  WHERE cr.cr = 1
       |), probes AS (
       |  SELECT cr.vec_id AS qid, cr.v AS qv,
       |    ((e.label % 2) + 2) % 2 AS qside, cr.cell
       |  FROM cellrank cr JOIN embeddings e ON e.vec_id = cr.vec_id
       |  WHERE cr.cr <= $nprobe
       |), cand AS (
       |  SELECT qid, qside, nid, rn,
       |    CAST(floor(sim * 1000000.0) AS BIGINT) AS cosu
       |  FROM (
       |    SELECT p.qid, p.qside, s.nid, list_inner_product(p.qv, s.nv) AS sim,
       |      row_number() OVER (PARTITION BY p.qid
       |        ORDER BY list_inner_product(p.qv, s.nv) DESC, s.nid) AS rn
       |    FROM probes p JOIN sided s USING (cell)
       |    WHERE s.nside = 1 - p.qside) t
       |  WHERE rn <= $k
       |), suma AS (
       |  SELECT qid, CAST(sum(cosu) AS BIGINT) AS suma, count(*) AS ka
       |  FROM cand WHERE qside = 0 GROUP BY qid
       |), sumb AS (
       |  SELECT qid, CAST(sum(cosu) AS BIGINT) AS sumb, count(*) AS kb
       |  FROM cand WHERE qside = 1 GROUP BY qid
       |)
       |SELECT c.qid, c.nid, c.cosu,
       |  (c.cosu * 2 * a.ka * b.kb * 1000000) // (a.suma * b.kb + b.sumb * a.ka)
       |    AS margin_ppm
       |FROM cand c
       |JOIN suma a ON a.qid = c.qid
       |JOIN sumb b ON b.qid = c.nid
       |WHERE c.qside = 0 AND c.rn = 1
       |  AND a.suma * b.kb + b.sumb * a.ka > 0
       |  AND (c.cosu * 2 * a.ka * b.kb * 1000000) //
       |      (a.suma * b.kb + b.sumb * a.ka) >= $minMarginPpm
       |ORDER BY c.qid""".stripMargin
  }

  /** ANN top-k with Hamming-1 multi-probe: each query probes its own
    * bucket plus the `planes` buckets one sign-flip away — recall
    * recovers near-boundary neighbors while still pruning most of the
    * corpus. Recall vs bruteForceTopK is asserted in the spec. Pass
    * `planes = adaptivePlanes(corpusRows)` so candidate counts stay
    * O(1) as the corpus grows. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, dims: Int,
              planes: Int = NumPlanes): DataFrame = {
    val bc = hyperplaneBuckets(corpus, dims, planes)
      .select(col("vec_id").as("nid"), col("embedding").as("nv"), col("bucket"),
        sqrt(dotf(col("embedding"), col("embedding"))).as("nnorm"))
      .filter(usable(col("nnorm"))) // zero/NaN vector => NaN sim => rn 1
    val bq = hyperplaneBuckets(queries, dims, planes)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        sqrt(dotf(col("embedding"), col("embedding"))).as("qnorm"),
        explode(array(lit(0L) +: (0 until planes).map(p => lit(1L << p)): _*))
          .as("flip"), col("bucket"))
      .select(col("qid"), col("qv"), col("qnorm"),
        col("bucket").bitwiseXOR(col("flip")).as("bucket"))
      .filter(usable(col("qnorm")))
    val scored = bq.join(bc, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dotf(col("qv"), col("nv")) / (col("qnorm") * col("nnorm"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  // ---- int8 quantized similarity (the storage/IO scale path) ----

  /** Per-vector symmetric int8 quantization: q_i = floor(x_i·127/mx +
    * 0.5) with mx = max|x| (an all-zero vector quantizes to zeros).
    * floor(y + 0.5) instead of round(): Spark's round(double) goes
    * through BigDecimal HALF_UP while DuckDB rounds the binary value —
    * floor(+0.5) is the same IEEE op sequence in both engines, so the
    * quantizer replays bit-for-bit in the oracle.
    *
    * Stored as array<long> here for exact integer math downstream; a
    * production table would persist array<tinyint> — 4× smaller than
    * float32, the point of quantized ANN at 100 TB (scan bytes and
    * shuffle bytes both shrink 4×; recall loss is bounded by the
    * quantization error and asserted in the spec). */
  def quantize(v: Column): Column = graft.functions.VectorExprs.quant8(v)

  /** Exact top-k by QUANTIZED cosine for each query id < maxQid: the
    * brute-force scan with int8 vectors — dot products in exact integer
    * arithmetic (codegen `dotl`), then one sqrt + one division per pair.
    * Every intermediate is an integer below 2^53, so the score is
    * bit-replayable in DuckDB (list_dot_product over the same quantized
    * doubles is exact) — no rounding needed in the oracle compare.
    *
    * Plan: quantized queries broadcast; corpus side streams — same
    * shape as bruteForceTopK but at 1/4 the scan+shuffle bytes. Composes
    * with the IVF/LSH pruning paths (quantize the residuals) when scan
    * cost, not memory, dominates. */
  def quantizedTopK(emb: DataFrame, k: Int, maxQid: Int): DataFrame = {
    import graft.functions.VectorExprs.dotl
    // NaN-component vectors are excluded BEFORE quantization (review
    // r10): the JVM quantizer maps NaN elements to 0 (floor(NaN)=0 and
    // NaN never updates the max) while DuckDB's replay propagates NaN —
    // the one input class where the bit-replay contract would diverge;
    // the oracle carries the same isnan filter
    val q = emb
      .filter(!isnan(dotf(col("embedding"), col("embedding"))))
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dotl(col("q"), col("q")))
    val queries = q.filter(col("vec_id") < maxQid)
      .select(col("vec_id").as("qid"), col("q").as("qa"), col("nq").as("na"))
    val scored = q.select(col("vec_id").as("nid"), col("q").as("qb"), col("nq").as("nb"))
      .crossJoin(broadcast(queries))
      .filter(col("nid") =!= col("qid") && col("na") > 0 && col("nb") > 0)
      .select(col("qid"), col("nid"),
        (dotl(col("qa"), col("qb")).cast("double") /
          sqrt((col("na") * col("nb")).cast("double"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "nid", "sim", "rn")
  }

  /** Retrieval over the CHUNKED corpus (p38) — the capstone of the
    * text→vector→search path: chunk the documents (TextOps.chunkTexts),
    * featurize each chunk as its 26-dim integer letter profile
    * (TextOps.letterVector — real, cheap, deterministic), and return
    * exact cosine top-k corpus chunks for every query-doc chunk.
    *
    * Exactness: integer vectors make every dot product exact under
    * IEEE doubles (dotl, |v|² ≤ 26·len² ≪ 2⁵³), so sim = dot/√(n²·m²)
    * is a fixed rounding sequence both engines share — the oracle needs
    * NO tolerance. A learned encoder drops into the featurize slot
    * (mapInPandas-style batch, p11's pattern); the join/rank dataflow —
    * query side broadcast, corpus side streamed, one window — is
    * unchanged. Zero-letter chunks (no signal) are excluded. */
  def chunkRetrieval(docs: DataFrame, k: Int, maxQdoc: Long): DataFrame = {
    val ch = TextOps.chunkTexts(docs)
      .select(col("doc_id"), col("start_tok"),
        TextOps.letterVector(col("text")).as("__v"))
      .withColumn("__n2", graft.functions.VectorExprs.dotl(col("__v"), col("__v")))
      .filter(col("__n2") > 0)
    val q = ch.filter(col("doc_id") < maxQdoc)
      .select(col("doc_id").as("qdoc"), col("start_tok").as("qstart"),
        col("__v").as("__qv"), col("__n2").as("__qn2"))
    broadcast(q)
      .join(ch,
        !(col("qdoc") === col("doc_id") && col("qstart") === col("start_tok")))
      // norms cast to double BEFORE the product: a long·long product of
      // two large-chunk norms can exceed 2⁶³ (ANSI-mode exception) —
      // doubles match the oracle, which multiplies doubles, and stay
      // exact for any product below 2⁵³
      .withColumn("sim",
        graft.functions.VectorExprs.dotl(col("__qv"), col("__v")).cast("double") /
          sqrt(col("__qn2").cast("double") * col("__n2").cast("double")))
      .withColumn("rn", row_number().over(Window.partitionBy("qdoc", "qstart")
        .orderBy(col("sim").desc, col("doc_id"), col("start_tok"))))
      .filter(col("rn") <= k)
      .select(col("qdoc"), col("qstart"), col("doc_id").as("ndoc"),
        col("start_tok").as("nstart"), round(col("sim"), 4).as("sim"), col("rn"))
  }

  /** DuckDB oracle for chunkRetrieval: same chunks, same integer
    * profiles (cast to DOUBLE[] — exact for counts), same rank. */
  def chunkRetrievalSql(k: Int, maxQdoc: Long,
                        size: Int = TextOps.ChunkSize,
                        stride: Int = TextOps.ChunkStride,
                        table: String = "documents"): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') w FROM $table),
       |ch AS (
       |  SELECT doc_id, c.start AS stt, c.txt FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(w) + 1, $stride),
       |      i -> struct_pack(start := i,
       |                       txt := array_to_string(w[i:i+${size - 1}], ' ')))) AS c
       |    FROM toks)),
       |lv AS (
       |  SELECT doc_id, stt,
       |    CAST(${TextOps.letterVectorSql("txt")} AS DOUBLE[]) AS v
       |  FROM ch),
       |n AS (
       |  SELECT doc_id, stt, v, list_dot_product(v, v) AS n2 FROM lv
       |  WHERE list_dot_product(v, v) > 0),
       |p AS (
       |  SELECT a.doc_id qdoc, a.stt qstart, b.doc_id ndoc, b.stt nstart,
       |    list_dot_product(a.v, b.v) / sqrt(a.n2 * b.n2) AS sim
       |  FROM n a JOIN n b ON NOT (a.doc_id = b.doc_id AND a.stt = b.stt)
       |  WHERE a.doc_id < $maxQdoc)
       |SELECT qdoc, qstart, ndoc, nstart, ${OracleSql.roundD("sim", 4)} AS sim, rn
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qdoc, qstart
       |    ORDER BY sim DESC, ndoc, nstart) AS rn FROM p) t
       |WHERE rn <= $k ORDER BY qdoc, qstart, rn""".stripMargin

  /** DuckDB oracle for quantizedTopK: replays the quantizer and the
    * integer-domain score over the same parquet floats. */
  def quantizedTopKSql(k: Int, maxQid: Int): String =
    s"""WITH dv AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS d FROM embeddings
       |  WHERE NOT isnan(list_inner_product(CAST(embedding AS DOUBLE[]),
       |                                     CAST(embedding AS DOUBLE[])))),
       |m AS (
       |  SELECT vec_id, d, list_max(list_transform(d, x -> abs(x))) AS mx FROM dv),
       |qz AS (
       |  SELECT vec_id,
       |    CASE WHEN mx > 0
       |      THEN list_transform(d, x -> floor(x * 127.0 / mx + 0.5))
       |      ELSE list_transform(d, x -> 0.0) END AS q
       |  FROM m),
       |n AS (
       |  SELECT vec_id, q, list_dot_product(q, q) AS nq FROM qz),
       |p AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS nid,
       |    list_dot_product(a.q, b.q) / sqrt(a.nq * b.nq) AS sim
       |  FROM n a JOIN n b ON b.vec_id != a.vec_id
       |  WHERE a.vec_id < $maxQid AND a.nq > 0 AND b.nq > 0)
       |SELECT qid, nid, sim, rn FROM (
       |  SELECT qid, nid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
       |  FROM p) t
       |WHERE rn <= $k ORDER BY qid, rn""".stripMargin
}
