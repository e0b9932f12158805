package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Runs BOTH the driver union-find fast path and the distributed loop
    * and asserts they agree — every case pins both implementations. */
  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = pairs.toDF("id_1", "id_2")
    val viaDriver = ConnectedComponents.run(df, "id_1", "id_2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCluster = ConnectedComponents.run(df, "id_1", "id_2", driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaCluster)
    viaDriver
  }

  test("single pair") {
    assert(components(Seq((1L, 2L))) == Map(1L -> 1L, 2L -> 1L))
  }

  test("transitive chain collapses to one component") {
    assert(components(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("the case where per-pair id_2 dropping under-merges") {
    // pairs (2,9) and (1,9): 2 is never an id_2, so dropping id_2s keeps
    // both 1 and 2 even though they share component via 9
    val comp = components(Seq((2L, 9L), (1L, 9L)))
    assert(comp == Map(1L -> 1L, 2L -> 1L, 9L -> 1L))
    val perPairDropped = Set(9L) // what drop-id_2 would remove
    val ccDropped = comp.collect { case (n, c) if n != c => n }.toSet
    assert(ccDropped == Set(2L, 9L) && perPairDropped != ccDropped)
  }

  test("disjoint components keep separate labels") {
    assert(components(Seq((5L, 6L), (10L, 11L), (11L, 12L))) ==
      Map(5L -> 5L, 6L -> 5L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("long chain converges (diameter rounds)") {
    val chain = (0L until 40L).map(i => (i, i + 1))
    val comp = components(chain)
    assert(comp.size == 41 && comp.values.forall(_ == 0L))
  }

  test("cycle plus tail") {
    assert(components(Seq((3L, 4L), (4L, 5L), (3L, 5L), (5L, 7L))) ==
      Map(3L -> 3L, 4L -> 3L, 5L -> 3L, 7L -> 3L))
  }
}
