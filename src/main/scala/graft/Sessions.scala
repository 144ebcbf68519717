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
