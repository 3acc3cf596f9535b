package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Dense-vector column math over `array<float>` / `array<double>` embedding
  * columns, built entirely from Catalyst higher-order functions
  * (`zip_with` + `aggregate`) — codegen'd, no UDF, no driver-side work
  * (SURVEY §7.1 phase 4, similarity search).
  *
  * All math is done in DOUBLE with strict left-to-right summation so results
  * are bit-deterministic and reproducible by the SQL oracle.
  */
object VectorFunctions {

  /** Cast an `array<float>` embedding to `array<double>` for stable math.
    * A plain `Cast` (codegen'd array cast), not a higher-order `transform`.
    */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product, left-to-right double accumulation, as a native codegen'd
    * Catalyst expression ([[graft.expressions.DotProduct]]). The HOF
    * formulation (`aggregate(zip_with(...))`) computes the same value but
    * sits outside whole-stage codegen — ~20× slower on 64-dim vectors.
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(graft.expressions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0.0 for zero-norm AND NaN/Inf-poisoned inputs —
    * total and deterministic, never NaN. The NaN clause matters at scale:
    * Spark orders NaN ABOVE every double, so a NaN score would float a
    * corrupt vector's pairs to the TOP of any descending top-k / dedup
    * threshold — one bad vector silently reordering a 100 TB pipeline.
    * (Note `nn > 0` alone does NOT catch it: SQL comparison semantics
    * make `NaN > 0` TRUE, unlike Java — the pre-r14 formulation returned
    * NaN here while the native [[graft.expressions.CosineByIds]] kernel
    * returned 0.0; both now score bad vectors 0.0, parity spec-pinned.)
    */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = norm(a) * norm(b)
    nanvl(when(nn > 0, d / nn).otherwise(lit(0.0)), lit(0.0))
  }

  /** Cosine from a pair dot and precomputed per-vector norms. For quadratic
    * pair pipelines: norms are computed once per VECTOR on the linear-size
    * base table, so each of the O(n²) pairs costs one dot instead of three
    * array reductions. Arithmetic (`d / (norm_a * norm_b)`) is identical to
    * [[cosine]], so results match bit-for-bit.
    */
  def cosinePrenormed(d: Column, normA: Column, normB: Column): Column = {
    val nn = normA * normB
    // nanvl: same bad-vector-scores-0.0 contract as [[cosine]] (see there)
    nanvl(when(nn > 0, d / nn).otherwise(lit(0.0)), lit(0.0))
  }

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Element-wise SUM aggregate over an `array<double>` column (a
    * [[graft.expressions.VectorSumAgg]] TypedImperativeAggregate — primitive
    * buffer, map-side partial aggregation).
    */
  def vecSum(v: Column): Column =
    ColumnBridge.column(graft.expressions.VectorSumAgg(ColumnBridge.expression(v))
      .toAggregateExpression())


  /** A literal query vector as a Column (broadcast as a constant into
    * codegen — no join needed for single-query scoring).
    */
  def vecLit(q: Seq[Double]): Column = lit(q.toArray)

  /** Random-hyperplane signature: for each hyperplane, 1 if `dot(v, h) >= 0`
    * else 0, packed MSB-first into a Long bucket id. Hyperplanes are plain
    * Scala literals (generated deterministically by the caller) — the whole
    * signature is one codegen'd expression per row, no shuffle.
    */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.foldLeft(lit(0L)) { (acc, p) =>
      acc * 2 + when(dot(v, vecLit(p)) >= 0, 1L).otherwise(0L)
    }

  /** Deterministic Gaussian-ish hyperplanes from a seed (driver-side, tiny). */
  def randomHyperplanes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Driver-side signature of a query vector against the same hyperplanes —
    * must mirror `hyperplaneBucket` exactly.
    */
  def bucketOf(v: Seq[Double], planes: Seq[Seq[Double]]): Long =
    planes.foldLeft(0L) { (acc, p) =>
      val d = v.zip(p).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      acc * 2 + (if (d >= 0) 1L else 0L)
    }
}
