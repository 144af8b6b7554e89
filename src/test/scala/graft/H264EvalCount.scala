package graft
import org.apache.spark.sql.functions._
object H264EvalCount {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.H264DecodeCounter.n.set(0)
    SparkEntry.queries("media_h264_pcm")(s, "/root/testdata/sf0.01")
      .write.format("noop").mode("overwrite").save()
    println(s"decode invocations=${graft.functions.H264DecodeCounter.n.get} for 500 docs")
    s.stop()
  }
}
