package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
object Q18ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/sfx100"
    val spark = Bench.session(dir)
    def t(name: String)(f: => Any): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9
      }
      println(f"[v] $name%-26s min=${times.min}%.2f  runs=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    val o = sources.Tables.load(spark, dir, "orders")
    def l = sources.Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    def clAgg = graft.operators.ClusteredAgg.groupByClustered(l, "l_orderkey",
      Seq(sum(col("l_quantity").cast(LongType)).as("total_qty")))
      .filter(col("total_qty") > 150)
    def fin(big: org.apache.spark.sql.DataFrame) =
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast(LongType).as("total_c"),
          col("total_qty"))
        .orderBy(desc_nulls_last("total_qty"), asc_nulls_first("o_orderkey"))
        .limit(100)
    // warm the gate + cache once
    val gatedSide = graft.operators.Broadcasts.gated(clAgg)
    gatedSide.count()
    fin(gatedSide).count()
    t("clustered+gatedBcast") { fin(graft.operators.Broadcasts.gated(clAgg)).count() }
    // shuffle join over the SAME persisted side (hint away the broadcast)
    t("clustered+shuffleJoin") { fin(gatedSide.hint("shuffle_hash")).count() }
    t("clustered+mergeJoin") { fin(gatedSide.hint("merge")).count() }
    spark.stop()
  }
}
