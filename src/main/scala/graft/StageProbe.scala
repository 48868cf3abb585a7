package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Per-STAGE diagnostic for the ScaleStress operators: the task-level
  * listener in [[ScaleStress]] proves a straggler exists but not WHERE
  * it lives. This main runs one operator end-to-end (no barriers — the
  * exact plan under suspicion) and prints, AS EACH STAGE COMPLETES
  * (so a crashed run still yields its profile): stage id, task count,
  * max/median task ms, records+bytes read/written over the shuffle,
  * and memory/disk spill — an AQE-coalesced, skewed, or spill-bound
  * stage is identified by number, not guesswork.
  * Usage: StageProbe [op] [scale] — op ∈ ppjoin (default) | cc |
  * minhash, matching the ScaleStress measures of the same names. */
object StageProbe {

  private final class StageStats extends SparkListener {
    private val taskDur = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null && t.taskInfo.successful) {
        taskDur.computeIfAbsent(t.stageId, _ => new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]())
          .add(t.taskInfo.duration)
      }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      import scala.jdk.CollectionConverters._
      val info = s.stageInfo
      val m = info.taskMetrics
      val ds = Option(taskDur.get(info.stageId)).map(_.asScala.toSeq.map(_.longValue).sorted).getOrElse(Seq.empty)
      val (mx, md) = if (ds.isEmpty) (0L, 0L) else (ds.last, ds(ds.size / 2))
      def mb(b: Long): String = f"${b / 1e6}%.0fMB"
      // println is line-buffered to the log — survives a crash
      println(
        f"STAGE ${info.stageId}%4d tasks=${info.numTasks}%5d max_ms=$mx%7d med_ms=$md%6d " +
          f"sread=${m.shuffleReadMetrics.recordsRead}%11d/${mb(m.shuffleReadMetrics.totalBytesRead)}%9s " +
          f"swrite=${m.shuffleWriteMetrics.recordsWritten}%11d/${mb(m.shuffleWriteMetrics.bytesWritten)}%9s " +
          f"spillM=${mb(m.memoryBytesSpilled)}%9s spillD=${mb(m.diskBytesSpilled)}%9s " +
          info.name)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val op = args.headOption.filterNot(_.forall(_.isDigit)).getOrElse("ppjoin")
    val scale = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stage-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark.sparkContext.addSparkListener(new StageStats)

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val docs = ScaleStress.amplifyDocs(docs0, scale)
    val t0 = System.nanoTime()
    val rows = op match {
      case "cc" =>
        operators.Graph.connectedComponents(
          Dedup.nearDupPairsShingled(docs, "doc_id", "text",
            n = 3, k = 12, rowsPerBand = 3, threshold = 0.5),
          "id_a", "id_b").count()
      case "minhash" =>
        Dedup.nearDupPairsShingled(docs, "doc_id", "text",
          n = 3, k = 12, rowsPerBand = 3, threshold = 0.5).count()
      case "incr" =>
        // mirrors the ScaleStress incremental_curation arm; history
        // build stages print before the marker line
        val oldDocs = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(7)) === 3,
              concat(col("text"), lit(" drifted crawl content here")))
              .otherwise(col("text")).as("text"))
        val newDocs = docs.select("doc_id", "text")
        val tmp = s"${sys.props("java.io.tmpdir")}/graft-probe-incr-$scale"
        operators.Curation.report(oldDocs, "doc_id", "text",
            n = 3, k = 12, rowsPerBand = 3, threshold = 0.5)
          .join(oldDocs.select(col("doc_id"),
            Dedup.fingerprint(col("text")).as("fingerprint")), Seq("doc_id"))
          .write.mode("overwrite").parquet(s"$tmp/old_report")
        Dedup.minhashIndex(oldDocs, "doc_id", "text", n = 3, k = 12)
          .write.mode("overwrite").parquet(s"$tmp/old_index")
        println("== history built; incremental stages follow")
        operators.Curation.incrementalReport(newDocs, "doc_id", "text",
          spark.read.parquet(s"$tmp/old_report"),
          spark.read.parquet(s"$tmp/old_index"),
          n = 3, k = 12, rowsPerBand = 3, threshold = 0.5,
          minAgree = 0.5).count()
      case _ =>
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5).count()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    println(f"== $op scale=$scale rows=$rows sec=$sec%.1f")
    spark.stop()
  }
}
