package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("cate_segments","bradley_terry","adamic_adar","mom_yoy_growth","huber_irls","harmonic_centrality")) {
      val df = SparkEntry.queries(q)(s, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      println(s"=== $q")
      "ReadSchema: [^\n]*".r.findAllIn(plan).toList.distinct.foreach(x => println("  " + x.take(160)))
      println("  bhj=" + "BroadcastHashJoin".r.findAllIn(plan).size +
        " smj=" + "SortMergeJoin".r.findAllIn(plan).size +
        " shj=" + "ShuffledHashJoin".r.findAllIn(plan).size)
    }
    s.stop()
  }
}
