package graft
import org.apache.spark.sql.SparkSession

/** One session recipe for all local mains (Verify/Bench/Explain) — the
  * nanosAsLong conf is load-bearing (events.ts is TIMESTAMP(NANOS)) and
  * must never drift between the tool that debugs and the tool that
  * measures. */
object Sessions {
  def local(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
              sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // r19 (guide §6/§1): above this many paths, partition discovery
      // launches a distributed LISTING JOB. On a local FS the job pays
      // ~0.6-0.7 s of scheduler latency to list directories the driver
      // walks in ~0.1 s (measured: 365-dir day lake, 0.77 s vs 0.11 s),
      // and every read of a day-partitioned rollup/lake crosses the
      // default threshold of 32. Parameterized: a cluster reading an
      // object store with thousands of partitions SHOULD distribute the
      // listing — set the env to Spark's default 32 there; the local
      // default only raises the cutover.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
              sys.env.getOrElse("SPARK_GRAFT_LIST_PARALLEL_THRESHOLD", "4096"))
      // r19 note (guide §6): committer algorithm v2 was trialed and
      // REJECTED — its apparent plain-partitioned-write win did not
      // survive an interleaved same-JVM A/B (ambient I/O drift; this
      // box's write regime swings ~4× over minutes), and it regressed
      // dynamic-partition-overwrite jobs. The committer stays v1.
      // long multi-query runs accumulate localCheckpoint blocks that are
      // only reclaimed after a GC proves them unreachable; with a large
      // heap a full GC may never happen inside a 15-minute batch, so ask
      // the ContextCleaner to force one periodically
      .config("spark.cleaner.periodicGC.interval", "5min")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Functions.registerAll(s)
    s
  }
}
