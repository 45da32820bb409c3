package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `ivf_probe(vec, nprobe)` — the `nprobe` nearest IVF cells of `vec`
  * under a TRAINED quantizer bound at registration time (the SQL face
  * of `SimilarityOps.probeCellsFrom`; VERDICT r5 #5: artifact-backed
  * pipeline lookups must be reachable from POSTed SQL).
  *
  * The trained centroids ride the expression as ONE boxed field — not
  * nlist literal child nodes — so the analyzed plan stays O(1) in
  * nlist (the probeCellsFrom discipline); the array serializes once
  * into the task closure, the same cost class as the broadcast the
  * DataFrame path uses. Probe ranking replays k-means assignment
  * exactly: argmax (q·c − |c|²/2) over the NORMALIZED query, ties to
  * the lower cell; a zero vector is unsearchable → null.
  *
  * Usage (cells then drive a hash join against the published
  * `<prefix>_ivf_assigned` view — the identical plan shape to
  * `ivfTopKFrom`):
  * {{{
  * SELECT q.vec_id, c.cell FROM queries q
  * LATERAL VIEW explode(ivf_probe(q.embedding, 4)) p AS cell
  * JOIN docs_ivf_assigned c USING (cell) ...
  * }}}
  *
  * Evaluation is per QUERY row (probe selection, not corpus scan), so
  * interpreted eval is off the hot path; candidate scoring downstream
  * stays on the codegen'd `dotf`. */
case class IvfProbeCells(vec: Expression, nprobe: Expression,
                         centers: Array[Array[Double]])
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = vec
  override def right: Expression = nprobe

  override def prettyName: String = "ivf_probe"

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, nprobe.dataType) match {
      case (ArrayType(t, _), IntegerType) if t == FloatType || t == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "ivf_probe requires (array<float|double>, int), got " +
          s"${vec.dataType.sql}, ${nprobe.dataType.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // nullable even over non-null children: a zero vector (unsearchable
  // under cosine) yields null, and without this override CodegenFallback
  // would hardcode isNull=false and NPE downstream
  override def nullable: Boolean = true

  private lazy val elem = vec.dataType.asInstanceOf[ArrayType].elementType
  // |c|²/2 per cell, precomputed once per task like centersOf's hn2
  private lazy val hn2 = centers.map(c => c.map(x => x * x).sum / 2.0)

  override protected def nullSafeEval(v: Any, np: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val q = new Array[Double](n)
    var i = 0
    var sq = 0.0
    while (i < n) {
      // isNullAt BEFORE the typed getter (the DotProduct discipline):
      // ColumnarArray returns stale buffer garbage for null slots. A
      // null slot makes the vector unusable — treated like NaN below.
      val xv =
        if (x.isNullAt(i)) Double.NaN
        else if (elem == FloatType) x.getFloat(i).toDouble
        else x.getDouble(i)
      q(i) = xv; sq += xv * xv; i += 1
    }
    // usable-vector guard, scalar edition (review r10, matching
    // SimilarityOps.usable): !(sq > 0) also catches NaN under JVM
    // comparison semantics — the old `sq <= 0.0` let a NaN norm through
    // and the probe returned the first nprobe cells regardless of the
    // vector; an Inf component degrades the ranking the same way
    if (!(sq > 0.0) || java.lang.Double.isInfinite(sq)) return null
    val norm = math.sqrt(sq)
    i = 0
    while (i < n) { q(i) /= norm; i += 1 }
    val k = math.min(np.asInstanceOf[Int], centers.length)
    if (k <= 0) return new GenericArrayData(Array.empty[Int])
    // score every cell, rank (score desc, cell asc) — selection sort of
    // the top k over nlist scores (k and nlist are both index-sized)
    val scores = new Array[Double](centers.length)
    var c = 0
    while (c < centers.length) {
      val cv = centers(c)
      val m = math.min(n, cv.length)
      var acc = 0.0
      var j = 0
      while (j < m) { acc += q(j) * cv(j); j += 1 }
      scores(c) = acc - hn2(c)
      c += 1
    }
    val taken = new Array[Boolean](centers.length)
    val out = new Array[Int](k)
    var r = 0
    while (r < k) {
      var best = -1
      var c2 = 0
      while (c2 < centers.length) {
        if (!taken(c2) && (best < 0 || scores(c2) > scores(best))) best = c2
        c2 += 1
      }
      taken(best) = true; out(r) = best; r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, nprobe = newRight)
}
