package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ShardedPrefix must be row-for-row identical to the classic single
  * per-group window for ANY order-key distribution — uniform, clustered,
  * or constant — because callers rely on it as a drop-in replacement
  * whose only difference is the bounded per-task sort. */
class ShardedPrefixSpec extends SparkSpec {
  import spark.implicits._

  private def reference(rows: Seq[(String, Long, Long, Long)]) = {
    // (group, order, tie, value) -> (group, tie) -> (rank, cum)
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      var cum = 0L
      sorted.zipWithIndex.map { case (r, i) =>
        cum += r._4
        (g, r._3) -> ((i + 1).toLong, cum)
      }
    }
  }

  private val genRows: Gen[(List[(String, Long, Long, Long)], Int)] = for {
    n <- Gen.choose(1, 60)
    shards <- Gen.oneOf(1, 2, 3, 7, 32)
    // order keys from a deliberately nasty mix: tight cluster around 0,
    // a far outlier band, and negatives — range sharding must stay exact
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      o <- Gen.oneOf(Gen.choose(-3L, 3L), Gen.choose(1000000L, 1000005L),
        Gen.const(42L))
      t <- Gen.choose(0L, 1000L) // tie key; (o, t) may still collide ->
      v <- Gen.choose(0L, 9L)    // make rank deterministic via distinct t
    } yield (g, o, t, v))
  } yield (rows.zipWithIndex.map { case ((g, o, _, v), i) =>
    (g, o, i.toLong, v) }, shards) // distinct tie per row

  test("rank and running sum match the single-window reference") {
    val prop = Prop.forAll(genRows) { case (rows, shards) =>
      val df = rows.toDF("g", "o", "t", "v")
      val expect = reference(rows)
      val got = ShardedPrefix
        .withRankAndSum(df, Seq("g"), "o", "t", shards = shards,
          rankName = "rk", sumCol = Some("v"), cumName = "cm")
        .select("g", "t", "rk", "cm")
        .as[(String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      // static-range path with deliberately LOOSE bounds: looseness may
      // empty some shards but must never change the result
      val gotStatic = ShardedPrefix
        .withRankAndSum(df, Seq("g"), "o", "t", shards = shards,
          rankName = "rk", sumCol = Some("v"), cumName = "cm",
          orderRange = Some((-2000000L, 3000000L)))
        .select("g", "t", "rk", "cm")
        .as[(String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      got == expect && gotStatic == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("null order keys rank first (nulls-first window order), never dropped") {
    val df = Seq(
      ("a", Some(5L), 1L, 10L), ("a", None, 2L, 20L), ("a", Some(-2L), 3L, 30L),
      ("a", None, 0L, 5L), ("b", None, 4L, 7L))
      .toDF("g", "o", "t", "v")
    val w = Window.partitionBy($"g").orderBy($"o", $"t")
    val expect = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cm", sum($"v").over(w))
      .select("g", "t", "rk", "cm").as[(String, Long, Long, Long)].collect().toSet
    val got = ShardedPrefix.withRankAndSum(df, Seq("g"), "o", "t",
        shards = 4, rankName = "rk", sumCol = Some("v"), cumName = "cm")
      .select("g", "t", "rk", "cm").as[(String, Long, Long, Long)].collect().toSet
    assert(got == expect) // nulls first, present in the output, exact cumsums
    val gotStatic = ShardedPrefix.withRankAndSum(df, Seq("g"), "o", "t",
        shards = 4, rankName = "rk", sumCol = Some("v"), cumName = "cm",
        orderRange = Some((-10L, 10L)))
      .select("g", "t", "rk", "cm").as[(String, Long, Long, Long)].collect().toSet
    assert(gotStatic == expect)
  }

  test("a group whose order-key span overflows Long fails loudly, not wrongly") {
    val df = Seq(("a", Long.MinValue, 1L), ("a", Long.MaxValue, 2L))
      .toDF("g", "o", "t")
    val e = intercept[Exception] {
      ShardedPrefix.withRankAndSum(df, Seq("g"), "o", "t", rankName = "rk")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("order-key span overflows Long")),
      s"expected the named guard, got: ${messages(e).mkString(" | ")}")
  }

  test("rank-only call matches row_number over the plain window") {
    val df = Seq(("a", 5L, 1L), ("a", 5L, 0L), ("a", -2L, 2L), ("b", 7L, 3L))
      .toDF("g", "o", "t")
    val w = Window.partitionBy($"g").orderBy($"o", $"t")
    val expect = df.withColumn("rk", row_number().over(w).cast("long"))
      .select("g", "t", "rk").as[(String, Long, Long)].collect().toSet
    val got = ShardedPrefix.withRankAndSum(df, Seq("g"), "o", "t",
        shards = 4, rankName = "rk")
      .select("g", "t", "rk").as[(String, Long, Long)].collect().toSet
    assert(got == expect)
    assert(!ShardedPrefix.withRankAndSum(df, Seq("g"), "o", "t", rankName = "rk")
      .columns.contains("cum"))
  }
}
