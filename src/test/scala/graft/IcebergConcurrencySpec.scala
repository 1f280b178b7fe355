package graft

import graft.icelite.IcebergFormat
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Concurrent-writer commit safety for the standard-Iceberg writer (the
  * round-15 verdict's open race): a 100 TB warehouse has parallel jobs
  * appending to one table, so the Writer's commit must be optimistic-
  * concurrency safe — snapshot-scoped metadata names (manifest, manifest
  * list, vN.metadata.json) are claimed exactly once via rename-as-CAS, a
  * loser rolls its partial artifacts back and surfaces
  * ConcurrentModificationException, and [[IcebergFormat.appendWithRetry]]
  * resumes from the winner's metadata and re-publishes (metadata-only —
  * staged data files are immutable). */
class IcebergConcurrencySpec extends SparkSpec {

  private def nation = Tables.nation(spark, sfDir)

  private def fsOf(loc: String) =
    new Path(loc).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All metadata-dir files reachable from the given metadata versions:
    * the version JSONs, every snapshot's manifest list, and every
    * manifest those lists carry. */
  private def reachableMetadata(loc: String): Set[String] = {
    val fs = fsOf(loc)
    val mdDir = new Path(loc, "metadata")
    val versions = fs.listStatus(mdDir).map(_.getPath)
      .filter(_.getName.endsWith(".metadata.json"))
    val lists = versions.flatMap { v =>
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmts: Formats = DefaultFormats
      val in = fs.open(v)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      (JsonMethods.parse(txt) \ "snapshots").extract[List[JObject]]
        .map(s => (s \ "manifest-list").extract[String])
    }.toSet
    val manifests = lists.flatMap { lp =>
      IcebergFormat.readAvroForTest(fs, new Path(lp))
        .map(_.get("manifest_path").toString)
    }
    versions.map(_.getName).toSet ++
      lists.map(new Path(_).getName) ++
      manifests.map(new Path(_).getName) + "version-hint.text"
  }

  test("sequential conflict: second writer at a stale base fails cleanly and retries to success") {
    val root = scratch("conc_seq")
    val loc  = s"$root/t_conc"
    val base = nation.filter(col("n_nationkey") < 10).orderBy("n_nationkey")
    val w0 = new IcebergFormat.Writer(spark, loc, nation.schema)
    w0.commit(Seq(IcebergFormat.writeSingleFile(spark, root, loc, "base", base)))

    // two writers resumed at the same base version
    val wA = IcebergFormat.resumeWriter(spark, loc)
    val wB = IcebergFormat.resumeWriter(spark, loc)
    val fA = IcebergFormat.writeSingleFile(spark, root, loc, "a",
      nation.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 20))
    val fB = IcebergFormat.writeSingleFile(spark, root, loc, "b",
      nation.filter(col("n_nationkey") >= 20))
    wA.commit(Seq(fA)) // wins snapshot 2

    val fs = fsOf(loc)
    val filesBeforeLoss = fs.listStatus(new Path(loc, "metadata")).map(_.getPath.getName).toSet
    intercept[java.util.ConcurrentModificationException] { wB.commit(Seq(fB)) }
    // clean failure: the losing attempt left no new metadata files behind
    val filesAfterLoss = fs.listStatus(new Path(loc, "metadata")).map(_.getPath.getName).toSet
    assert(filesAfterLoss == filesBeforeLoss,
      s"loser leaked metadata: ${(filesAfterLoss -- filesBeforeLoss).mkString(",")}")

    // retry from current metadata lands the append as snapshot 3
    IcebergFormat.appendWithRetry(spark, loc, Seq(fB))
    val scanned = IcebergFormat.scan(spark, IcebergFormat.currentMetadataPath(spark, loc))
    assert(scanned.count() == nation.count(), "retried append lost rows")
  }

  test("threaded race: both appends land, versions stay contiguous, no orphan metadata") {
    val root = scratch("conc_race")
    val loc  = s"$root/t_race"
    val w0 = new IcebergFormat.Writer(spark, loc, nation.schema)
    w0.commit(Seq(IcebergFormat.writeSingleFile(spark, root, loc, "base",
      nation.filter(col("n_nationkey") < 5))))

    // stage both deltas up front — the race is purely over commits
    val staged = Seq(
      IcebergFormat.writeSingleFile(spark, root, loc, "t1",
        nation.filter(col("n_nationkey") >= 5 && col("n_nationkey") < 15)),
      IcebergFormat.writeSingleFile(spark, root, loc, "t2",
        nation.filter(col("n_nationkey") >= 15)))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errors  = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = staged.map { f =>
      new Thread(() => {
        try {
          barrier.await()
          IcebergFormat.appendWithRetry(spark, loc, Seq(f))
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(threads.forall(!_.isAlive), "a racing append hung past the join timeout")
    assert(errors.isEmpty, s"racing append failed: ${errors.peek()}")

    // final state: base + both deltas, regardless of commit order
    val mdPath  = IcebergFormat.currentMetadataPath(spark, loc)
    val scanned = IcebergFormat.scan(spark, mdPath)
    assert(scanned.count() == nation.count(), "a racing append was lost")

    // version list is monotone and gapless: v00001..v00003
    val fs = fsOf(loc)
    val versions = fs.listStatus(new Path(loc, "metadata")).map(_.getPath.getName)
      .filter(_.endsWith(".metadata.json")).sorted.toSeq
    assert(versions == Seq("v00001.metadata.json", "v00002.metadata.json", "v00003.metadata.json"),
      s"non-contiguous version history: $versions")

    // no orphan metadata: every file in metadata/ is reachable from a
    // committed version (losing attempts rolled their artifacts back)
    val onDisk    = fs.listStatus(new Path(loc, "metadata")).map(_.getPath.getName).toSet
    val reachable = reachableMetadata(loc)
    assert((onDisk -- reachable).isEmpty,
      s"orphan metadata files: ${(onDisk -- reachable).mkString(",")}")
  }
}
