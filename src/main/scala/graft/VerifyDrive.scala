package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(n: String)(f: => Unit) = { val t = System.nanoTime(); f
      println(f"$n%-40s ${(System.nanoTime()-t)/1e9}%.2f") }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val dec = (colname: String) => col(colname).cast("decimal(18,4)")
    (1 to 2).foreach { r =>
      time(s"r$r scan+count only")(li.count())
      time(s"r$r decimal revenue agg only") {
        li.groupBy("l_orderkey").agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,4)") - dec("l_discount"))).cast("double").as("rev")).count()
      }
      time(s"r$r double revenue agg only") {
        li.groupBy("l_orderkey").agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev")).count()
      }
      time(s"r$r joins only") {
        li.join(o, col("l_orderkey") === col("o_orderkey")).join(broadcast(c), col("o_custkey") === col("c_custkey")).where(col("c_acctbal") > 0).count()
      }
      time(s"r$r full q3")(SparkEntry.queries("rel_q3_top_orders")(spark, dir).count())
    }
    spark.stop()
  }
}
