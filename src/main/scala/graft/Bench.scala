package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-bench")
    // warm the session (JIT, codegen, FS metadata) outside the measurements
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    // Per-query time = min of two back-to-back runs. The first run pays the
    // one-off Janino codegen compile + JIT warm-up for that query's plan;
    // running the second immediately (rather than in a separate warm-up
    // pass over the whole catalog) keeps the generated classes inside the
    // bounded codegen cache, so the min reflects steady-state execution and
    // round-over-round deltas are signal instead of cold-JVM noise.
    // r20: a failing query no longer fails SILENTLY — it is counted,
    // named on stderr, and reported in a bench_failures JSON line (its
    // fast failure time would otherwise flatter the total with rc=0).
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch {
          case e: Throwable =>
            failures += name
            System.err.println(
              s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // 3-decimal (ms) resolution: methodology unchanged, but the one-line
    // JSON shrinks from ~5.1 KB toward the driver's truncated tail capture
    def f3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // The driver's captured BENCH_r{N}.json tail truncates mid-line once the
    // catalog outgrew it; the full sorted per-query map lands in-repo as
    // BENCH.json so round-over-round comparisons always cover every query.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), line + "\n")
    val uniq = failures.distinct.sorted
    if (uniq.nonEmpty)
      println(s"""{"metric":"bench_failures","n":${uniq.size},""" +
        s""""queries":${uniq.map("\"" + _ + "\"").mkString("[", ",", "]")}}""")
    // Compact twin as the FINAL stdout line: the full line above (~4 KB at
    // 175 queries) outgrows the driver's 2 KB tail capture, which has
    // nulled PERF per-query comparison since round 18 — this line always
    // fits the tail whole; the per-query map stays in BENCH.json.
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","detail":"BENCH.json"}""")
    spark.stop()
  }
}
