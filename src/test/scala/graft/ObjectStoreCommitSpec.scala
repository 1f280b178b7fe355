package graft

import graft.icelite.FsCatalog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The commit protocol over the OBJECT-STORE contract (third-round carry:
  * everything else runs on file:// where rename is atomic; the reference
  * deploys on S3/R2). [[ObjectStoreFileSystem]] gives copy+delete rename
  * that silently overwrites, plus atomic conditional create — exactly
  * what real stores offer — and the CAS commit must stay correct on it:
  * racing appends both land via conditional-put arbitration, row-delta
  * commits CAS the same way, maintenance never sweeps live files, and
  * the rename hazard itself is demonstrated (why rename-as-CAS would be
  * silent data loss off the local FS). */
class ObjectStoreCommitSpec extends SparkSpec {

  private def objScratch(name: String): String =
    "objstore:" + scratch(s"obj_$name")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.hadoopConfiguration
      .set("fs.objstore.impl", classOf[ObjectStoreFileSystem].getName)
  }

  test("shim semantics: rename is copy+delete and overwrites an existing destination") {
    val root = new Path(objScratch("sem"))
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[ObjectStoreFileSystem], s"shim not registered: ${fs.getClass}")
    def put(p: Path, s: String): Unit = {
      val o = fs.create(p, true); o.write(s.getBytes("UTF-8")); o.close()
    }
    def read(p: Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in).mkString finally in.close()
    }
    val a = new Path(root, "a.txt"); val c = new Path(root, "c.txt")
    put(a, "A"); put(c, "C")
    // THE hazard: rename onto an existing object succeeds and clobbers —
    // a rename-as-CAS "winner" would silently vanish
    assert(fs.rename(a, c), "object-store rename should succeed onto an existing key")
    assert(!fs.exists(a) && read(c) == "A", "copy+delete semantics violated")
    // conditional put is the arbitration primitive instead
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException](fs.create(c, false))
  }

  test("racing concurrent appends BOTH land via conditional-put CAS") {
    val cat  = new FsCatalog(spark, objScratch("race"))
    val t    = cat.createOrReplaceTable("ns", "nation_objrace", Tables.nation(spark, sfDir))
    val base = t.scan().count()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val pool    = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futures = (1 to 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val mine = Tables.nation(spark, sfDir).filter(col("n_nationkey") % 2 === i % 2)
            barrier.await()
            t.append(mine)
          }
        })
      }
      futures.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS)) // generous: a loaded box must not flake the race
    } finally pool.shutdown()
    val snaps = t.snapshots()
    assert(snaps.size == 3, s"expected 3 snapshots (create + 2 appends), got ${snaps.size}")
    assert(t.scan().count() == base + Tables.nation(spark, sfDir).count())
    val parents = snaps.sortBy(_.snapshot_id).map(_.parent_snapshot_id)
    assert(parents == snaps.sortBy(_.snapshot_id).map(s => Option(s.snapshot_id - 1).filter(_ > 0)),
      s"history is not a linear rebase chain: $parents")
  }

  test("merge-on-read SQL DELETE commits its row delta over the object store") {
    val wh = objScratch("mor")
    spark.conf.set("spark.sql.catalog.ice_objmor", "graft.sources.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_objmor.warehouse", wh)
    spark.conf.set("graft.delete.mode", "merge-on-read")
    try {
      val cat = new FsCatalog(spark, wh)
      val t0  = cat.createOrReplaceTable("graft", "nat_objmor",
        Tables.nation(spark, sfDir).select("n_nationkey", "n_name"))
      val before = t0.filesOf(t0.metadata.currentSnapshot.get).toSet
      spark.sql("DELETE FROM ice_objmor.graft.nat_objmor WHERE n_nationkey % 3 = 0")
      val t1   = cat.loadTable("graft", "nat_objmor")
      val snap = t1.metadata.currentSnapshot.get
      assert(t1.filesOf(snap).toSet == before, "MoR DELETE rewrote data files on objstore")
      assert(t1.deleteEntriesOf(snap).nonEmpty, "no position deletes committed on objstore")
      val want = Tables.nation(spark, sfDir).filter(!(col("n_nationkey") % 3 === 0)).count()
      assert(t1.scan().count() == want, "delete-applied scan wrong over objstore")
    } finally {
      spark.conf.unset("graft.delete.mode")
      spark.conf.unset("spark.sql.catalog.ice_objmor")
      spark.conf.unset("spark.sql.catalog.ice_objmor.warehouse")
    }
  }

  test("expire + orphan sweep over the object store keep live files, reclaim dead ones") {
    val cat = new FsCatalog(spark, objScratch("maint"))
    val t   = cat.createOrReplaceTable("ns", "nation_objm", Tables.nation(spark, sfDir))
    t.replace(Tables.nation(spark, sfDir)) // v1's files become unreferenced history
    t.append(Tables.nation(spark, sfDir))
    val full = t.scan().count()
    t.expireSnapshots(keepLast = 2)
    assert(t.snapshots().size == 2, "expire did not trim the log on objstore")
    val swept = t.removeOrphans(olderThanMillis = 0L)
    assert(t.scan().count() == full, s"orphan sweep damaged live data (swept $swept)")
    // loose garbage IS reclaimed
    val fs = new Path(t.location.toString).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val junk = new Path(t.location.toString, "data/junk-loose.parquet")
    val o = fs.create(junk, true); o.write(Array[Byte](1, 2, 3)); o.close()
    assert(t.removeOrphans(olderThanMillis = 0L).size >= 1, "loose orphan not swept on objstore")
    assert(!fs.exists(junk), "orphan file survived the sweep")
    assert(t.scan().count() == full)
  }
}
