package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.select(col("ts"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("fmt")).show(3, false)
    } catch { case e: Throwable => println("EVENTS READ FAILED: " + e.toString.take(600)) }
    val df = spark.range(1).select(
      to_json(struct(lit("click").as("event_type"), lit(12L).as("user_id"))).as("j"),
      expr("try_cast('' as bigint)").as("tc"), expr("try_cast('87' as bigint)").as("tc2"))
    df.show(false)
    println("DONE_SCRATCH")
    spark.stop()
  }
}
