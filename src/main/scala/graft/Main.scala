package graft

import graft.restructure.{Cleaner, ConfigLoader, Restructure, Service}

/** CLI entry point, mirroring the reference application's modes
  * (Application.kt:177-207): one-shot restructure, optional cleaner, or
  * long-running service.
  *
  * {{{
  * runMain graft.Main --config app.properties            # one restructure pass
  * runMain graft.Main --config app.properties --clean    # + cleaner pass
  * runMain graft.Main --config app.properties --service \
  *   --interval 300000 --cleaner-interval 1260000        # polling mode
  * runMain graft.Main --config app.properties --stream   # one streaming
  *   # catch-up pass per topic via the DSv2 Avro source (checkpointed
  *   # under <output>/_checkpoints/<topic>)
  * }}}
  */
object Main {
  def main(args: Array[String]): Unit = {
    var configPath: Option[String] = None
    var service = false
    var stream = false
    var clean = false
    var interval = 300000L
    var cleanerInterval = 1260000L
    var cleanerAgeMs = 7L * 24 * 3600 * 1000
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--config"           => configPath = Some(args(i + 1)); i += 2
        case "--service"          => service = true; i += 1
        case "--stream"           => stream = true; i += 1
        case "--clean"            => clean = true; i += 1
        case "--interval"         => interval = args(i + 1).toLong; i += 2
        case "--cleaner-interval" => cleanerInterval = args(i + 1).toLong; i += 2
        case "--cleaner-age-ms"   => cleanerAgeMs = args(i + 1).toLong; i += 2
        case other =>
          System.err.println(s"unknown argument: $other"); sys.exit(2)
      }
    }
    val config = ConfigLoader.fromFile(configPath.getOrElse {
      System.err.println("usage: graft.Main --config <properties> [--service] [--clean]")
      sys.exit(2); throw new IllegalStateException
    })
    val spark = Sessions.build("graft")
    val job = new Restructure(spark, config)
    val cleaner = new Cleaner(spark, config, cleanerAgeMs)
    if (service) {
      val svc = new Service(
        restructure = () => println(s"[graft] ${job.run()}"),
        cleaner = if (clean) Some(() => println(s"[graft] cleaned ${cleaner.run()}")) else None,
        restructureIntervalMs = interval,
        cleanerIntervalMs = cleanerInterval)
      svc.start()
      sys.addShutdownHook { svc.stop(); spark.stop() }
      Thread.currentThread().join() // run until interrupted
    } else if (stream) {
      // start every topic's stream CONCURRENTLY (they are independent
      // queries sharing the session's scheduler), then await all — wall
      // clock is the slowest topic, not the sum. A topic dir with no
      // readable sink files yet cannot provide a stream schema: catch and
      // skip it this pass (catch rather than pre-list — a filter would
      // re-list every topic dir the source is about to list anyway).
      val queries = job.listTopics().flatMap { t =>
        try Some(t -> graft.streaming.Streaming
          .restructureStream(spark, config, t, s"${config.outputDir}/_checkpoints/$t"))
        catch {
          case e: IllegalArgumentException =>
            System.err.println(s"[graft] skipping topic $t: ${e.getMessage}")
            None
        }
      }
      queries.foreach(_._2.awaitTermination())
      println(s"[graft] streamed topics=${queries.size}")
      spark.stop()
    } else {
      val result = job.run()
      println(s"[graft] topics=${result.topics} files=${result.files}")
      if (clean) {
        val (deleted, reprocess) = cleaner.run()
        println(s"[graft] cleaned deleted=${deleted.size} reprocess=${reprocess.size}")
      }
      spark.stop()
    }
  }
}
