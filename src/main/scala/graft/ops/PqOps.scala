package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorExprs.dotf

/** Product-quantization ANN (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the third leg of the
  * repo's ANN family: IVF prunes WHICH vectors a query scans (p13),
  * int8 scalar quantization shrinks each vector 4× (p25); PQ compresses
  * each vector to `M` one-byte codes (64× here: 8 bytes vs 64 floats),
  * making the EXHAUSTIVE scan cheap — and it composes with IVF the same
  * way p27 composes IVF×int8.
  *
  * Shape: the embedding splits into [[M]] subvectors; each subspace gets
  * its own Ksub-centroid k-means codebook (trained on a bounded sample —
  * the ivfIndex discipline); a corpus vector is stored as its M nearest-
  * sub-centroid codes (map-only `KMeansModel.transform` per subspace).
  * A query builds a lookup table of its subvector·sub-centroid dot
  * products (M×Ksub doubles, one tiny broadcast), and every candidate's
  * approximate cosine is M table lookups summed — the "asymmetric
  * distance computation" of the paper, §4.1: queries stay exact floats,
  * only the corpus side is quantized.
  *
  * At 100 TB: codebooks are a per-corpus batch artifact (train once on a
  * sample, M×Ksub×sub doubles — kilobytes); encoding is one map-only
  * pass; the scan reads M-byte codes instead of dims×4-byte floats, so
  * scan+shuffle bytes drop 64×. Recall vs bruteForceTopK is spec-
  * asserted; the DuckDB oracle replays the trained codebooks exactly.
  *
  * Exact-replay discipline: the ADC sum is rendered as an EXPLICIT
  * left-associated 8-term addition in both engines (never a float SUM()
  * aggregate, whose accumulation order is partition-dependent), and the
  * per-term doubles are identical IEEE ops on both sides, so ranking
  * replays bit-for-bit; emitted sims round to 4 decimals like the rest
  * of the ANN family.
  */
object PqOps {
  /** Subspaces (codes per vector). dims must divide evenly. */
  val M = 8

  /** Centroids per subspace codebook (one byte of code space is 256;
    * 16 keeps the test-scale codebooks tiny — raise at scale, the model
    * stays broadcast-sized either way). */
  val Ksub = 16

  /** Trained PQ index: per-subspace codebooks (as in-JVM arrays for the
    * oracle render + probe math) and the encoded corpus
    * `(vec_id, nvec, codes[M])`. */
  final case class PqIndex(books: Array[Array[Array[Double]]], codes: DataFrame)

  /** Train codebooks on a bounded sample and encode the full corpus.
    *
    * Training is DRIVER-LOCAL Lloyd over one collected sample (the
    * b503626 BPE-loop discipline: when the working set is bounded by
    * design — Ksub·64 vectors here, at any corpus size — a driver loop
    * beats scheduling 8 × 5 tiny cluster jobs; the 8 Spark ML fits this
    * replaces cost ~9 s of pure job overhead at bench scale). Codebooks
    * need balanced-ish cells, not an optimal clustering (the ivfIndex
    * reasoning), so 5 seeded Lloyd rounds on the sample suffice.
    *
    * Encoding is ONE map-only projection: per subspace, argmax
    * (x·c − |c|²/2) over the Ksub codebook entries as a codegen'd
    * array_position(array_max) expression. Codebook literals are FIXED
    * size (M·Ksub·sub doubles — unlike IVF's corpus-proportional
    * nlist), so inlining them in the plan is safe at any scale; ties
    * resolve to the lowest code in both engines (array_position takes
    * the first maximum; the oracle ranks `ORDER BY d DESC, c`). */
  def pqIndex(corpus: DataFrame, dims: Int, seed: Long = 11L,
              trainPerCell: Int = 64): PqIndex = {
    require(dims % M == 0, s"dims=$dims not divisible by M=$M")
    val sub = dims / M
    val nv = corpus.withColumn("nvec", SimilarityOps.normalized(col("embedding")))
      .filter(col("nvec").isNotNull)
    // deterministic sample: limit() alone has no defined row order, so
    // the trained books (and every PQ result) could differ across runs
    // or partition layouts; the vec_id sort pins them (same seeded-
    // reproducibility discipline as the Lloyd loop below)
    val sample = nv.orderBy(col("vec_id")).select("nvec")
      .limit(Ksub * trainPerCell).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= Ksub, s"corpus too small: ${sample.length} < $Ksub")
    val books = Array.tabulate(M) { j =>
      lloyd(sample.map(_.slice(j * sub, (j + 1) * sub)), Ksub,
        seed * 31 + j, iters = 5)
    }
    val codes = nv.select(col("vec_id"), col("nvec"),
      array((0 until M).map(j => codeExpr(books(j), col("nvec"), j, sub)): _*)
        .as("codes"))
    PqIndex(books, codes)
  }

  /** Map-only nearest-codebook-entry code for subspace `j`: argmax
    * (x·c − |c|²/2), first max wins (lowest code id). */
  private def codeExpr(book: Array[Array[Double]], nvec: Column,
                       j: Int, sub: Int): Column = {
    val ds = book.map { cv =>
      dotf(slice(nvec, j * sub + 1, sub), lit(cv)) -
        lit(cv.map(x => x * x).sum / 2.0)
    }
    val arr = array(ds.toIndexedSeq: _*)
    (array_position(arr, array_max(arr)) - 1).cast("int")
  }

  /** Seeded Lloyd iterations over an in-memory sample. Assignment uses
    * the same argmax objective (ties to the lowest center) as encoding;
    * a center that loses all points keeps its previous position. */
  private def lloyd(pts: Array[Array[Double]], k: Int, seed: Long,
                    iters: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val centers = rnd.shuffle(pts.indices.toList).take(k)
      .map(i => pts(i).clone).toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](pts.head.length))
      val ns = new Array[Int](k)
      // half-norms are per-iteration invariants — hoist out of the
      // per-point loop (they change only when centers move)
      val hn2 = centers.map(c => c.map(x => x * x).sum / 2.0)
      pts.foreach { p =>
        var best = 0; var bestScore = Double.NegativeInfinity
        for (c <- 0 until k) {
          var d = 0.0
          var i = 0
          while (i < p.length) { d += p(i) * centers(c)(i); i += 1 }
          val score = d - hn2(c)
          if (score > bestScore) { bestScore = score; best = c }
        }
        ns(best) += 1
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
      }
      for (c <- 0 until k if ns(c) > 0; i <- centers(c).indices)
        centers(c)(i) = sums(c)(i) / ns(c)
    }
    centers
  }

  /** The trained codebooks as a view-shaped frame `(j, c, cv)` — THE
    * `_pq_books` schema the server publishes and p85's probe SQL reads;
    * one spelling so the published view and the oracle-gated SQL face
    * can never drift apart. */
  def booksDf(spark: org.apache.spark.sql.SparkSession,
              books: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cv, c) => (j, c, cv.toSeq) }
    }.toSeq.toDF("j", "c", "cv")
  }

  /** Shortlist multiplier for the exact re-rank stage: the ADC scan
    * keeps `RerankFactor`·k candidates, which then re-rank by exact
    * cosine (the paper's IVFADC+R refinement, §5.3 — at scale the
    * shortlist fetch is k·RerankFactor full vectors per query, not a
    * corpus scan). */
  val RerankFactor = 5

  /** Two-stage PQ top-k over a trained index.
    *
    * Stage 1 (compressed exhaustive scan): per query, one M×Ksub
    * dot-product LUT (computed once, against the codebooks riding as a
    * small broadcast DataFrame — the centersOf discipline, plans stay
    * O(1) in codebook size); every corpus row's approximate score is M
    * array lookups, explicitly left-assoc summed; keep the top
    * RerankFactor·k shortlist per query.
    *
    * Stage 2 (exact re-rank): fetch the shortlist's full vectors and
    * rank the final k by exact cosine — quantization error then only
    * costs recall when a true neighbor misses the whole shortlist. */
  def pqTopKFrom(index: PqIndex, queries: DataFrame, k: Int,
                 dims: Int): DataFrame = {
    val sub = dims / M
    val spark = queries.sparkSession
    import spark.implicits._
    // the ONE codebook-frame spelling (review r10: this was a second
    // inline copy of booksDf, whose doc exists precisely so the probe
    // path and the published _pq_books view cannot drift)
    val cents = booksDf(spark, index.books)
    val q = queries
      .select(col("vec_id").as("qid"),
        SimilarityOps.normalized(col("embedding")).as("qv"))
      .filter(col("qv").isNotNull)
    // LUT rows are (j,c)-unique, so the array_sort(struct(j,c,d)) order
    // is total and lut[j*Ksub+c] is well-defined in both engines
    val lut = q.crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"),
        struct(col("j"), col("c"),
          dotf(slice(col("qv"), col("j") * sub + 1, lit(sub)), col("cv"))
            .as("d")).as("e"))
      .groupBy("qid")
      .agg(first(col("qv")).as("qv"),
        transform(array_sort(collect_list(col("e"))), x => x("d")).as("lut"))
    val adcSim = (0 until M)
      .map(j => element_at(col("lut"),
        lit(j * Ksub + 1) + element_at(col("codes"), j + 1)))
      .reduceLeft(_ + _)
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("nid"))
    val shortlist = index.codes.select(col("vec_id").as("nid"), col("codes"))
      .crossJoin(broadcast(lut))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("qv"), col("nid"), adcSim.as("adc"))
      .withColumn("ra", row_number().over(wAdc))
      .filter(col("ra") <= k * RerankFactor)
    val exact = shortlist
      .join(index.codes.select(col("vec_id").as("nid"), col("nvec")), "nid")
      .select(col("qid"), col("nid"), dotf(col("qv"), col("nvec")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    exact.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "nid", "sim", "rn")
  }

  /** DuckDB oracle: replays codebook assignment (argmax dot−|c|²/2 per
    * subspace — the centersValuesSql device), the query LUTs, the SAME
    * explicit left-assoc ADC sum over list lookups, the shortlist cut,
    * and the exact-cosine re-rank. Ranks on raw doubles, emits rounded
    * — exactly the Spark plan's arithmetic at every stage. */
  def pqTopKSql(books: Seq[Array[Array[Double]]], k: Int, maxQid: Int,
                dims: Int): String = {
    val sub = dims / M
    val values = books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cv, c) =>
        val arr = cv.map(_.toString).mkString("[", ", ", "]::DOUBLE[]")
        val hn2 = cv.map(x => x * x).sum / 2.0
        s"($j, $c, $arr, $hn2)"
      }
    }.mkString(", ")
    // lut[j*Ksub + cs[j+1] + 1], explicitly left-assoc: ((t0 + t1) + t2)...
    val simExpr = (0 until M)
      .map(j => s"q.lut[${j * Ksub} + n.cs[${j + 1}] + 1]")
      .reduceLeft((a, b) => s"($a + $b)")
    s"""WITH books(j, c, cv, hn2) AS (VALUES $values),
       |nv AS (
       |  ${SimilarityOps.NormalizedCorpusSql}
       |), parts AS (
       |  SELECT nv.vec_id, b.j, b.c,
       |    list_inner_product(
       |      list_slice(nv.v, b.j*$sub + 1, b.j*$sub + $sub), b.cv) AS d,
       |    b.hn2
       |  FROM nv, books b
       |), coderank AS (
       |  SELECT vec_id, j, c,
       |    row_number() OVER (PARTITION BY vec_id, j
       |      ORDER BY (d - hn2) DESC, c) AS rr
       |  FROM parts
       |), ncodes AS (
       |  SELECT vec_id AS nid, list(c ORDER BY j) AS cs
       |  FROM coderank WHERE rr = 1 GROUP BY vec_id
       |), qlut AS (
       |  SELECT vec_id AS qid, list(d ORDER BY j, c) AS lut
       |  FROM parts WHERE vec_id < $maxQid GROUP BY vec_id
       |), adc AS (
       |  SELECT q.qid, n.nid, $simExpr AS adc
       |  FROM qlut q, ncodes n WHERE n.nid != q.qid
       |), shortlist AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid,
       |      row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS ra
       |    FROM adc) t
       |  WHERE ra <= ${k * RerankFactor}
       |), exact AS (
       |  SELECT s.qid, s.nid, list_inner_product(q.v, n.v) AS sim
       |  FROM shortlist s
       |  JOIN nv q ON q.vec_id = s.qid
       |  JOIN nv n ON n.vec_id = s.nid
       |)
       |SELECT qid, nid, ${OracleSql.roundD("sim", 4)} AS sim, rn FROM (
       |  SELECT qid, nid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
       |  FROM exact) t
       |WHERE rn <= $k ORDER BY qid, rn""".stripMargin
  }
}
