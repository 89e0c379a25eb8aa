package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * All computation is done in double with a sequential left-fold so results
  * are bit-identical to the DuckDB oracle's equivalent expressions. Built
  * entirely from codegen'd higher-order functions — no UDFs.
  */
object Vectors {

  def toDoubleArray(c: Column): Column = c.cast("array<double>")

  /** Left-fold dot product in double via the native `DotProduct` Catalyst
    * expression (tight codegen'd loop; the `aggregate(zip_with(...))`
    * formulation interprets its lambda per element and is ~1000× slower on
    * pairwise hot paths). Sequential left fold from 0.0 — bit-identical to
    * the lambda formulation and the oracle's list_reduce convention.
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) = dot(a,b) / (|a| * |b|); inputs cast to double first. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDoubleArray(a)
    val bd = toDoubleArray(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Random-hyperplane LSH bucket id from `nPlanes` deterministic planes.
    * Plane weights are generated driver-side from a seeded PRNG and inlined
    * as literals (cheap: nPlanes × dim doubles).
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val vd = toDoubleArray(vec)
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.toIndexedSeq.map(lit): _*)
      when(dot(vd, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Deterministic pseudo-random unit-ish planes. */
  def makePlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
