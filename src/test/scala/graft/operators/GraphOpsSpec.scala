package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {

  import spark.implicits._

  test("pageRank: symmetric two-node graph splits rank evenly, mass ≈ 1") {
    val pr = GraphOps.pageRank(Seq((1L, 2L)).toDF("id_a", "id_b"), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) == pr(2L))
    assert(math.abs(pr.values.sum - 1.0) < 1e-5)
  }

  test("pageRank: star center outranks leaves; leaves tie") {
    // star: 0 — {1,2,3,4}
    val edges = (1L to 4L).map(i => (0L, i)).toDF("id_a", "id_b")
    val pr = GraphOps.pageRank(edges, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((1L to 4L).map(pr).distinct.size == 1, "leaves must tie")
    assert(pr(0L) > 2 * pr(1L), s"center ${pr(0L)} vs leaf ${pr(1L)}")
    assert(math.abs(pr.values.sum - 1.0) < 1e-5)
  }

  test("pageRank: hand-computed one iteration on a path graph") {
    // path 1—2—3, damping .85, start 1/3:
    // it1: r1 = .05 + .85·(r2/2) = .05 + .85/6 ≈ .191667
    //      r2 = .05 + .85·(r1/1 + r3/1) = .05 + .85·(2/3) ≈ .616667
    val pr = GraphOps.pageRank(Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b"),
        iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr(1L) - (0.05 + 0.85 / 6)) < 1e-6)
    assert(math.abs(pr(2L) - (0.05 + 0.85 * 2 / 3)) < 1e-6)
    assert(pr(1L) == pr(3L))
  }

  test("pageRank is deterministic across runs and repartitioning") {
    val edges = spark.read.parquet(s"$sf/documents.parquet")
      .limit(40).select(col("doc_id").as("id_a"),
        (col("doc_id") % 7 + 1000L).as("id_b"))
    val a = GraphOps.pageRank(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = GraphOps.pageRank(edges.repartition(5), 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("degrees counts neighbors per endpoint") {
    val d = GraphOps.degrees(Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("triangleCount: counts each closed triple once") {
    // K4 on {1..4}: C(4,3) = 4 triangles
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
      .toDF("id_a", "id_b")
    assert(GraphOps.triangleCount(k4).head().getLong(0) == 4L)
    // path graph: none
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    assert(GraphOps.triangleCount(path).head().getLong(0) == 0L)
    // one triangle plus a dangling edge
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 9L)).toDF("id_a", "id_b")
    assert(GraphOps.triangleCount(tri).head().getLong(0) == 1L)
  }

  test("localClustering: triangle node scores 1, chain node 0, leaf null") {
    // triangle {1,2,3} + chain 3—4—5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val c = GraphOps.localClustering(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(c(1L) == ((2L, 1L, Some(1.0))), s"got ${c(1L)}")
    // node 3: degree 3, one triangle → 2·1/(3·2) = 0.3333
    assert(c(3L) == ((3L, 1L, Some(0.3333))))
    assert(c(4L) == ((2L, 0L, Some(0.0))))
    assert(c(5L)._3.isEmpty, "degree-1 node has no defined coefficient")
  }

  test("empty edge list yields an empty ranking") {
    val e = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(GraphOps.pageRank(e).count() == 0)
    assert(GraphOps.degrees(e).count() == 0)
  }
}
