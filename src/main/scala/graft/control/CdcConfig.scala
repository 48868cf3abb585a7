package graft.control

/** Engine configuration from the environment (reference C2,
  * utils/cdc_config.py:9-17 — host/slot/publication fields become
  * stream/feed/checkpoint paths in the Spark build; the capture side
  * stays external per BASELINE). */
final case class CdcConfig(
    streamId: String,
    framesDir: String,
    eventsOutDir: String,
    stateDir: String,
    checkpointDir: String,
    publishedTables: Set[String],
    healthPort: Int,
    workerHint: Int) // reference CDC_WORKER_COUNT analogue: shuffle partitions

object CdcConfig {
  def fromEnv(env: Map[String, String] = sys.env): CdcConfig = CdcConfig(
    streamId = env.getOrElse("CDC_STREAM_ID", "graft_cdc"),
    framesDir = env.getOrElse("CDC_FRAMES_DIR", "/tmp/graft/frames"),
    eventsOutDir = env.getOrElse("CDC_EVENTS_DIR", "/tmp/graft/events"),
    stateDir = env.getOrElse("CDC_STATE_DIR", "/tmp/graft/state"),
    checkpointDir = env.getOrElse("CDC_CHECKPOINT_DIR", "/tmp/graft/checkpoint"),
    publishedTables = env.get("CDC_PUBLICATION_TABLES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set("users")),
    healthPort = env.getOrElse("PORT", "8080").toInt,
    workerHint = env.getOrElse("CDC_WORKER_COUNT", "32").toInt)
}
