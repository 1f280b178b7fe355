package graft
import graft.icelite._
import org.apache.spark.sql.functions._
class DeltaPlanProbe extends SparkSpec {
  test("probe partitioned MoR update full read") {
    val wh = scratch("probe_pud2")
    spark.conf.set("spark.sql.catalog.ice_probe2", "graft.sources.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_probe2.warehouse", wh)
    spark.conf.set("graft.delete.mode", "merge-on-read")
    try {
      val fsCat = new FsCatalog(spark, wh)
      fsCat.createOrReplaceTable("graft", "orders_probe2",
        Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority", "o_totalprice"),
        Seq("o_orderpriority"))
      spark.sql("UPDATE ice_probe2.graft.orders_probe2 SET o_totalprice = o_totalprice + 1 WHERE o_orderkey < 100")
      val t = fsCat.loadTable("graft", "orders_probe2")
      println("==== STEP lib full read")
      t.scan().collect().take(2).foreach(println)
      println("==== STEP v2 full read")
      spark.read.format("icelite").option("location", t.location.toString).load()
        .collect().take(2).foreach(println)
      println("==== STEP all green")
    } finally {
      spark.conf.unset("graft.delete.mode")
      spark.conf.unset("spark.sql.catalog.ice_probe2")
      spark.conf.unset("spark.sql.catalog.ice_probe2.warehouse")
    }
  }
}
