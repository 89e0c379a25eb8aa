package graft.operators

import graft.SparkSpec

@org.scalatest.tags.Slow
class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def flatten(rows: Seq[(Long, Option[Long])]) =
    Hierarchy.flatten(rows.toDF("id", "parent"), "id", "parent")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap

  test("flatten: forest resolves roots and depths, NULL and self-parent roots") {
    //  1            5 (self-parent root)
    //  └2 └3        └6
    //    └4
    val out = flatten(Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(1L)), (4L, Some(2L)),
      (5L, Some(5L)), (6L, Some(5L))))
    assert(out == Map(
      1L -> (1L, 0), 2L -> (1L, 1), 3L -> (1L, 1), 4L -> (1L, 2),
      5L -> (5L, 0), 6L -> (5L, 1)))
  }

  test("flatten: a deep chain needs only log rounds (doubling actually doubles)") {
    // chain 1<-2<-...<-200: depth 199 resolves in ceil(log2(199)) = 8
    // doubling rounds + 1 fixpoint-confirmation round (changed = 0) only
    // if each round doubles the known path; a naive one-hop loop would
    // need ~200 rounds and throw here
    val chain = (1L to 200L).map(i => (i, if (i == 1) None else Some(i - 1)))
    val out = Hierarchy.flatten(chain.toDF("id", "parent"), "id", "parent",
      maxIter = 9, driverLimit = 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out(200L) == (1L, 199))
    assert(out(1L) == (1L, 0))
    assert(out(100L) == (1L, 99))
  }

  test("flatten: dangling parent becomes an orphan-subtree root") {
    // 7's parent 99 is not a node: 7 roots at 99 (depth 1), child follows
    val out = flatten(Seq((7L, Some(99L)), (8L, Some(7L))))
    assert(out(7L) == (99L, 1) && out(8L) == (99L, 2))
  }

  test("flatten: driver path equals the distributed doubling loop") {
    val nodes = (1L to 300L).map(i => (i, if (i <= 1) None else Some(i / 2)))
    val driver = Hierarchy.flatten(nodes.toDF("id", "parent"), "id", "parent")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val dist = Hierarchy.flatten(nodes.toDF("id", "parent"), "id", "parent",
      driverLimit = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(driver == dist)
  }

  test("flatten: parent cycles fail loudly instead of fabricating roots") {
    val even = Seq((1L, Some(2L)), (2L, Some(1L)), (3L, Some(1L)))
    val e1 = intercept[IllegalStateException] {
      Hierarchy.flatten(even.toDF("id", "parent"), "id", "parent",
        driverLimit = 0)
    }
    assert(e1.getMessage.contains("cycle"))
    val odd = Seq((1L, Some(2L)), (2L, Some(3L)), (3L, Some(1L)))
    val e2 = intercept[IllegalStateException] {
      Hierarchy.flatten(odd.toDF("id", "parent"), "id", "parent", maxIter = 6,
        driverLimit = 0)
    }
    assert(e2.getMessage.contains("cycle") || e2.getMessage.contains("oscillating"))
    // the driver path detects the same cycles
    val e3 = intercept[IllegalStateException] {
      Hierarchy.flatten(even.toDF("id", "parent"), "id", "parent")
    }
    assert(e3.getMessage.contains("cycle"))
  }
}
