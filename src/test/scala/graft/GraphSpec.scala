package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // docs engineered so exact-Jaccard >= 0.7 wires: {1,2,3,4} a clique
  // (identical text => J = 1.0), 5 isolated, 6-7 a pair-only family
  private def cliqueDocs = {
    val fam = (1 to 100).map(i => s"w$i").mkString(" ")
    val other = (1 to 100).map(i => s"v$i").mkString(" ")
    Seq(
      1L -> fam, 2L -> fam, 3L -> fam, 4L -> fam,
      5L -> (1 to 100).map(i => s"u$i").mkString(" "),
      6L -> other, 7L -> other
    ).toDF("doc_id", "text")
  }

  test("triangleCounts: a 4-clique gives C(3,2)=3 triangles per member; pairs and isolates none") {
    val out = Graph.triangleCounts(cliqueDocs).as[(Long, Long)].collect().toMap
    // each member of a 4-clique sits in C(3,2) = 3 triangles
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: triangle-free graph is empty") {
    // a path 1-2, 2-3 built from two 2-doc families sharing doc 2's text?
    // simplest triangle-free case: one pair family only
    val fam = (1 to 100).map(i => s"w$i").mkString(" ")
    val d = Seq(1L -> fam, 2L -> fam,
      3L -> (1 to 100).map(i => s"z$i").mkString(" ")).toDF("doc_id", "text")
    assert(Graph.triangleCounts(d).count() == 0)
  }
}
