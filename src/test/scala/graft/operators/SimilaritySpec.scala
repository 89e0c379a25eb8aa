package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("topKCosine: k rows per query, descending, self excluded") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.where($"vec_id" < 5)
    val out = Similarity.topKCosine(emb, q, "vec_id", "embedding", k = 3)
      .orderBy("q_id", "rank").collect()
    assert(out.length == 15)
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rows =>
      val cos = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.sliding(2).forall { case Array(a, b) => a >= b })
      assert(rows.forall(r => r.getAs[Long]("n_id") != r.getAs[Long]("q_id")))
    }
  }

  test("vec_dot: mismatched lengths yield NULL, equal lengths the exact fold") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)), // 32.0
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))       // malformed -> NULL, not 14.0
    ).toDF("a", "b")
    val out = df.select(
      graft.expressions.VectorExpressions.vecDot($"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
    // interpreted path (nullSafeEval, the codegen-fallback route) agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def litArr(xs: Double*) = Literal.create(xs.toArray, ArrayType(DoubleType))
    assert(graft.expressions.DotProduct(litArr(1, 2, 3), litArr(4, 5, 6)).eval(null) == 32.0)
    assert(graft.expressions.DotProduct(litArr(1, 2, 3), litArr(4, 5)).eval(null) == null)
  }

  test("multi-table LSH ANN recall vs brute force (>= 0.6 on random data)") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.where($"vec_id" < 20)
    val exact = Similarity.topKCosine(emb, q, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.topKCosineLsh(emb, q, "vec_id", "embedding", k = 5,
      nPlanes = 4, nTables = 8)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
    // every approx hit must still be a real neighbor pair (subset sanity)
    assert(approx.forall { case (qid, nid) => qid != nid })
  }

  test("IVF ANN: every vector gets exactly one list; probe recall >= 0.5") {
    val emb = Tables.embeddings(spark, dir)
    val nVec = emb.count()
    val cents = IvfIndex.centroids(emb, "vec_id", "embedding", stride = 16)
    val assigned = IvfIndex.assign(emb, cents, "vec_id", "embedding")
    assert(assigned.count() == nVec)
    assert(assigned.select("id").distinct().count() == nVec)

    val q = emb.where($"vec_id" < 20)
    val exact = Similarity.topKCosine(emb, q, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ~31 lists at stride 16 over 500 vectors; probing 10 of them is the
    // realistic accuracy/cost point for weakly-clustered random data
    val approx = IvfIndex.topKCosineIvf(emb, q, "vec_id", "embedding", k = 5,
      stride = 16, nProbe = 10)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
    assert(approx.forall { case (qid, nid) => qid != nid })
  }
}
