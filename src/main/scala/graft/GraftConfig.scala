package graft

import java.io.FileInputStream
import java.util.Properties
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Job configuration (reference R15, `DataStreamProcessingJob.java:68-96`):
  * the reference assembles its job from a properties file (`-c`), a CLI
  * parallelism override (`-p`), and hardcoded defaults (parallelism 8
  * `:92`, 5 s checkpoint pacing `:104-105`, batch thresholds `:157-158`).
  *
  * Same layering here, adapted to this engine's env-var driver contract.
  * Precedence per field: CLI flag > environment > properties file >
  * default.
  *
  * Properties keys: `parallelism`, `sf_dir`, `checkpoint_dir`,
  * `source_dir`, `trigger_ms`, `batch_num`, `batch_time_sec`.
  * CLI: `-c <file>` properties file, `-p <n>` parallelism override
  * (the reference's flags, `:70-77`); a bare first argument is an
  * `sf_dir` override (back-compat with `runMain graft.StreamDemo <dir>`).
  * Env: `SPARK_GRAFT_CPUS`, `SPARK_GRAFT_SF_DIR`,
  * `SPARK_GRAFT_CHECKPOINT_DIR`, `SPARK_GRAFT_SOURCE_DIR`,
  * `SPARK_GRAFT_TRIGGER_MS`.
  *
  * `source_dir` exists because a file-stream source path is PART of the
  * checkpoint contract: resuming a checkpoint whose source dir was a
  * previous run's temp directory reads a nonexistent path. Jobs that
  * configure `checkpoint_dir` for real resume should pin `source_dir`
  * alongside it; jobs that leave the source ephemeral get a per-run
  * namespaced checkpoint instead (see `StreamDemo`).
  */
final case class GraftConfig(
    parallelism: Int,
    sfDir: String,
    checkpointDir: Option[String],
    sourceDir: Option[String],
    triggerMs: Long,
    batchNum: Int,
    batchTimeSec: Long) {

  /** Session builder with the config applied: `local[parallelism]` and one
    * shuffle partition per core (not the 200 default — SURVEY.md env
    * notes), UTC, UI off. Callers add job-specific confs before build. */
  def sessionBuilder(appName: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$parallelism]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // legacy testdata generations wrote events.ts as TIMESTAMP(NANOS),
      // readable only via this conf (Tables.events dispatches on the loaded
      // type). Set once here so loaders never mutate session state.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // TypedImperativeAggregate consumers (TopKAgg in topKPerQuery /
      // ivfProbesJoin, the SimhashAgg sketch merge) plan as
      // ObjectHashAggregate, which falls back to SORT-BASED aggregation
      // once a task's hash map passes this many keys — at the 128-key
      // default, any such aggregate over more than 128 groups per
      // partition silently becomes a full per-partition sort of the input
      // (measured on a TopKAgg grouped over >128 qids: ~250 µs/row sorted
      // vs ~2 µs hashed). Declarative array-buffer aggregates
      // (first/max_by over array columns) never reach ObjectHashAggregate
      // — they always plan as SortAggregate — so this conf cannot affect
      // them. Sizing is per-OPERATOR per-TASK: worst-case pre-fallback
      // footprint = threshold × widest buffer × concurrent tasks. At
      // 2^18 keys × ~2 KB (a k≈100 TopKAgg heap, the engine's widest) ×
      // 32 concurrent tasks = 16 GB ceiling vs the 128 GiB harness heap,
      // and the engine's real group keys (qids, band keys) stay far
      // below 2^18 per partition; the fallback still guards genuinely
      // unbounded cardinalities.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 18).toString)
}

object GraftConfig {

  val Default: GraftConfig = GraftConfig(
    parallelism = 8, // DataStreamProcessingJob.java:92
    sfDir = "/root/testdata/sf0.1",
    checkpointDir = None,
    sourceDir = None,
    triggerMs = 5000L, // checkpoint pacing, DataStreamProcessingJob.java:104-105
    batchNum = 1000, // CTSDB thresholds, DataStreamProcessingJob.java:157-158
    batchTimeSec = 5L)

  def load(args: Array[String], env: Map[String, String] = sys.env,
      defaults: GraftConfig = Default): GraftConfig = {
    var propsFile: Option[String] = None
    var cliParallelism: Option[String] = None
    var cliSfDir: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-c" => require(i + 1 < args.length, "-c needs a file"); propsFile = Some(args(i + 1)); i += 2
        case "-p" => require(i + 1 < args.length, "-p needs a value"); cliParallelism = Some(args(i + 1)); i += 2
        case bare if i == 0 && !bare.startsWith("-") => cliSfDir = Some(bare); i += 1
        case other => throw new IllegalArgumentException(s"unknown argument '$other' (use -c <file> -p <n>)")
      }
    }
    val props: Map[String, String] = propsFile.map { f =>
      val p = new Properties()
      val in = new FileInputStream(f)
      try p.load(in) finally in.close()
      p.asScala.toMap
    }.getOrElse(Map.empty)

    def pick(cli: Option[String], envKey: String, propKey: String): Option[String] =
      cli.orElse(env.get(envKey)).orElse(props.get(propKey))

    GraftConfig(
      parallelism = pick(cliParallelism, "SPARK_GRAFT_CPUS", "parallelism")
        .map(_.toInt).getOrElse(defaults.parallelism),
      sfDir = pick(cliSfDir, "SPARK_GRAFT_SF_DIR", "sf_dir").getOrElse(defaults.sfDir),
      checkpointDir = pick(None, "SPARK_GRAFT_CHECKPOINT_DIR", "checkpoint_dir")
        .orElse(defaults.checkpointDir),
      sourceDir = pick(None, "SPARK_GRAFT_SOURCE_DIR", "source_dir")
        .orElse(defaults.sourceDir),
      triggerMs = pick(None, "SPARK_GRAFT_TRIGGER_MS", "trigger_ms")
        .map(_.toLong).getOrElse(defaults.triggerMs),
      batchNum = props.get("batch_num").map(_.toInt).getOrElse(defaults.batchNum),
      batchTimeSec = props.get("batch_time_sec").map(_.toLong).getOrElse(defaults.batchTimeSec))
  }
}
