package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Dbg extends App {
  val s = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val d = "/root/testdata/sf0.1"
  def t[A](tag: String)(f: => A): A = { val t0=System.nanoTime; val r=f; println(f"$tag%-18s ${(System.nanoTime-t0)/1e9}%.2f s"); r }
  // variant A: with inner distinct (current)
  val liA = s.read.parquet(d + "/lineitem.parquet").select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
  val eA = liA.as("a").join(liA.as("b"), col("a.ok")===col("b.ok") && col("a.pk")<col("b.pk"))
    .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
  t("A inner-distinct")(println(eA.count()))
  // variant B: no inner distinct
  val liB = s.read.parquet(d + "/lineitem.parquet").select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
  val eB = liB.as("a").join(liB.as("b"), col("a.ok")===col("b.ok") && col("a.pk")<col("b.pk"))
    .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
  t("B no-inner")(println(eB.count()))
  s.stop()
}
