package graft

import graft.extensions.Dedup
import org.apache.spark.sql.functions._
import scala.util.Random

/** Correctness of the large-star/small-star connected components against a
  * driver-side union-find reference on seeded random graphs, plus the shape
  * properties h23 relies on (minimal reps, chain flattening, determinism
  * across partitionings).
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  private def ccMap(edges: Seq[(Long, Long)], partitions: Int = 4): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b").repartition(partitions)
    Dedup.connectedComponents(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("random graphs match a union-find reference") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 40 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(ccMap(edges) === unionFind(n, edges), s"trial $trial")
    }
  }

  test("a long chain flattens to one min-rooted component (log-round case)") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val comps = ccMap(chain)
    assert(comps.values.toSet === Set(0L))
    assert(comps.keySet === (0L to 63L).toSet)
  }

  test("cluster reps are minimal ids and members of their own cluster") {
    val edges = Seq((10L, 20L), (20L, 30L), (5L, 6L), (100L, 7L), (7L, 6L))
    val comps = ccMap(edges)
    // rep of each component is the minimum member
    comps.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.keys.min === rep)
      assert(members.contains(rep))
    }
    assert(comps(30L) === 10L)
    assert(comps(100L) === 5L) // 100-7-6-5 transitively connected
  }

  test("result is invariant under partitioning and edge orientation") {
    val edges = Seq((3L, 9L), (9L, 1L), (12L, 3L), (40L, 41L))
    val flipped = edges.map { case (a, b) => (b, a) }
    assert(ccMap(edges, 1) === ccMap(flipped, 7))
  }

  test("empty edge set yields empty labels") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(empty, "a", "b").count() === 0)
  }

  test("h23 clusters agree with h16 drops: every dropped doc is a non-rep member") {
    val clusters = graft.queries.GroupH.h23.run(spark, sf)
    val kept = graft.queries.GroupH.h16.run(spark, sf)
    val reps = Dedup.exactReps(Tables.documents(spark, sf), "doc_id", "text")
      .select("doc_id")
    val dropped = reps.except(kept).collect().map(_.getLong(0)).toSet
    val nonRepMembers = clusters.filter(col("doc_id") =!= col("cluster_rep"))
      .collect().map(_.getLong(0)).toSet
    // greedy pairwise dropping can only drop docs that sit in some cluster
    // as a non-minimal member; transitive clustering may drop more
    assert(dropped.subsetOf(nonRepMembers), s"dropped=$dropped nonRep=$nonRepMembers")
  }
}
