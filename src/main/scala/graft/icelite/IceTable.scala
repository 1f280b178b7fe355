package graft.icelite

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** A snapshot-versioned parquet table (the IceLite format):
  *
  * {{{
  * <location>/
  *   data/snap-<id>-<uuid>/part-*.parquet       // files of one commit
  *   metadata/manifests/m-<id>-<uuid>/part-*.json // file list + stats of one commit
  *   metadata/v<N>.json                          // TableMetadata versions
  *   metadata/version-hint.text                  // latest N (fast lookup)
  * }}}
  *
  * Commit protocol (SURVEY.md §7.5): executors write parquet data files
  * first, then the commit's manifest (per-file stats, computed and written
  * executor-side); the driver then writes `v<N>.json` — holding only the
  * snapshot log with manifest POINTERS, so its size is O(commits), not
  * O(files) — to a temp name and atomically `FileSystem.rename`s it into
  * place, finally updating the version hint. Readers resolve the hint (or
  * highest vN) and plan from the snapshot's manifests — so a reader never
  * observes a half-committed version. Single-writer per table, like the
  * reference's drop-and-recreate loader.
  *
  * STORE CONTRACT. The protocol needs exactly two guarantees from the
  * underlying store: (1) per-object atomic visibility — a written file is
  * either fully visible or absent, never partial (every object store's
  * PUT; local FS via temp+rename); (2) an atomic PUBLISH-IF-ABSENT for
  * the `v<N>.json` CAS. On rename-atomic filesystems (file://, HDFS) that
  * is exists+rename under a commit lock; on object stores — which have NO
  * atomic rename (rename is copy+delete and silently overwrites) — it is
  * conditional create (`PUT If-None-Match`, Hadoop `create(p,
  * overwrite=false)`), selected by URI scheme via
  * [[IceTable.conditionalPutSchemes]]. Nothing else in the protocol
  * renames at commit time, so eventual-consistency of LIST (S3-classic)
  * only delays the walk-forward hint, never correctness.
  * ObjectStoreCommitSpec runs the CAS, racing-append, row-delta and
  * orphan flows over an in-process shim with exactly those semantics.
  *
  * Scans hand Spark the snapshot's file list with the frozen schema —
  * filters/projections push into the parquet reader exactly as for a plain
  * `spark.read.parquet`, and partition-parallelism follows file/row-group
  * splits, so a 1000-executor cluster scans an IceLite table at full width.
  */
final class IceTable private (val spark: SparkSession, val location: Path) {

  private def fs: FileSystem = location.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metadataDir = new Path(location, "metadata")
  private def hintFile    = new Path(metadataDir, "version-hint.text")

  // ------------------------------------------------------------- metadata io

  private def readFile(p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n   = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeFileAtomic(p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + "." + java.util.UUID.randomUUID() + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) throw new IllegalStateException(s"commit rename failed: $tmp -> $p")
  }

  /** Rename-as-CAS: land `content` at `p` ONLY if `p` does not exist yet —
    * the compare-and-swap the filesystem commit protocol needs so a
    * concurrent writer's `vN.json` is never clobbered (the REST catalog
    * path has a server-side CAS at RestCatalog.scala; this is the
    * filesystem twin). Content is fully staged to a tmp file first, so no
    * reader ever observes a partial metadata file. Atomicity: HDFS-like
    * stores guarantee rename-fails-if-destination-exists; for the local FS
    * a per-location JVM lock + existence check makes same-process racers
    * (the realistic local case, incl. the MaintenanceSpec race) fully
    * safe. Returns false when the version was taken — caller rebases. */
  /** Publish `content` at `p` iff nothing is there — the ONE primitive the
    * whole commit protocol reduces to. Two arms, by what the store can
    * promise (see the class-header contract):
    *  - object stores (no atomic rename, but conditional create — S3/GCS/
    *    R2 `PUT If-None-Match`, mapped to `fs.create(p, overwrite=false)`):
    *    write the final object conditionally; the store arbitrates races.
    *    Rename-as-CAS would be UNSAFE here: object-store rename is
    *    copy+delete and silently overwrites (ObjectStoreCommitSpec proves
    *    the hazard on the shim).
    *  - rename-atomic filesystems (file://, HDFS): temp write + exists/
    *    rename under a per-path JVM lock (single-writer-process per table,
    *    or an external lock service, is the documented requirement there).
    */
  private def writeFileIfAbsent(p: Path, content: String): Boolean =
    if (IceTable.conditionalPutSchemes.contains(
        Option(location.toUri.getScheme).getOrElse("file"))) {
      try {
        val out = fs.create(p, false)
        try out.write(content.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException        => false
      }
    } else {
      val tmp = new Path(p.getParent, p.getName + "." + java.util.UUID.randomUUID() + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val won = IceTable.commitLock(p.toString).synchronized {
        !fs.exists(p) && fs.rename(tmp, p)
      }
      if (!won) fs.delete(tmp, false)
      won
    }

  /** Latest committed version. The hint file is a HINT, not truth: a
    * concurrent writer may have advanced past it (its update is
    * best-effort after the CAS), so walk forward from it until the next
    * version is absent — O(1) amortized, correct under stale hints. */
  def currentVersion: Int = {
    val hinted =
      if (fs.exists(hintFile)) scala.util.Try(readFile(hintFile).trim.toInt).getOrElse(0)
      else 0
    if (hinted <= 0) {
      val versions = listVersions()
      if (versions.isEmpty) 0 else versions.max
    } else {
      var v = hinted
      while (fs.exists(new Path(metadataDir, s"v${v + 1}.json"))) v += 1
      v
    }
  }

  private def listVersions(): Seq[Int] =
    if (!fs.exists(metadataDir)) Seq.empty
    else {
      // a racing writer's staging tmp — or the hint file mid-update (its
      // rewrite is delete+rename on local FS) — can vanish between the
      // directory read and the per-entry stat (RawLocalFileSystem shells
      // out for permissions and throws RuntimeException, and object-store
      // listings are similarly non-atomic) — retry with backoff past the
      // racer's window; the vN.json files we are after are immutable once
      // committed, so a clean listing always converges
      // only the RACE shapes retry: an entry that vanished between the
      // directory read and the per-entry stat (FileNotFound cause, or the
      // shell-stat message RawLocalFileSystem wraps it in). A persistent
      // failure (permissions, bad config) surfaces immediately.
      def isVanishedEntry(e: Throwable): Boolean = {
        val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).toSeq
        chain.exists {
          case _: java.io.FileNotFoundException => true
          case t =>
            val m = Option(t.getMessage).getOrElse("")
            m.contains("No such file") || m.contains("does not exist") ||
              m.contains("Error while running command to get file permissions")
        }
      }
      def attempt(left: Int): Seq[org.apache.hadoop.fs.FileStatus] =
        try fs.listStatus(metadataDir).toIndexedSeq
        catch {
          case e: RuntimeException if left > 0 && isVanishedEntry(e) =>
            Thread.sleep(5L << (6 - left)); attempt(left - 1)
        }
      attempt(6)
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".json") => n.stripPrefix("v").stripSuffix(".json") }
        .flatMap(s => scala.util.Try(s.toInt).toOption)
    }

  def metadata: TableMetadata = metadataAt(currentVersion)

  def metadataAt(version: Int): TableMetadata =
    TableMetadata.fromJson(readFile(new Path(metadataDir, s"v$version.json")))

  def metadataLocation: String = new Path(metadataDir, s"v$currentVersion.json").toString

  /** CAS commit of `md` as version `next`; false = lost the race. The
    * hint update runs only after winning and is best-effort (readers walk
    * forward from it, so a stale hint is harmless). */
  private def commitCasAt(next: Int, md: TableMetadata): Boolean =
    if (!writeFileIfAbsent(new Path(metadataDir, s"v$next.json"), md.toJson)) false
    else { writeFileAtomic(hintFile, next.toString); true }

  /** Single-attempt commit for metadata-only operations (rollback, refs,
    * expire…): these compute their update from the current version, so a
    * lost race means the computation is stale — fail LOUDLY rather than
    * clobber the winner (pre-CAS behavior) or silently re-apply. Appends
    * rebase-and-retry instead (see appendInternal). */
  private def commit(md: TableMetadata): Int = {
    val next = currentVersion + 1
    if (!commitCasAt(next, md))
      throw new java.util.ConcurrentModificationException(
        s"concurrent commit to ${location}: v$next.json already exists; " +
          "re-read the table and retry the operation")
    next
  }

  // ------------------------------------------------------------------ writes

  /** Append `df` as a new snapshot (reference `table.append`). */
  def append(df: DataFrame): IceTable = appendInternal(df, replace = false)

  /** Idempotent append: a no-op if a snapshot already carries `token`.
    * The streaming-sink commit protocol — `foreachBatch` retries and
    * replayed batches (at-least-once sources) pass their batch id as the
    * token, and the table absorbs them exactly once. Same trick Iceberg's
    * Spark streaming writer plays with batch-id properties. */
  def appendOnce(df: DataFrame, token: String): IceTable =
    if (metadata.knownTokens.contains(token)) this
    else appendInternal(df, replace = false, token = Some(token))

  /** Replace table contents with `df` (drop-and-recreate semantics). */
  def replace(df: DataFrame): IceTable = appendInternal(df, replace = true)

  /** Write `df` as new data files and commit a snapshot.
    * `replace=false` carries the current snapshot's manifests forward by
    * pointer; `replace=true` starts from `carryManifests` only (empty =
    * full replace) — which is how manifest-granular rewrites keep
    * untouched data by reference instead of copying it. The commit payload
    * is O(delta): one new manifest for the just-written files plus one
    * snapshot entry of manifest pointers — never the table's file list. */
  private def appendInternal(
      df: DataFrame,
      replace: Boolean,
      operation: String = "",
      carry: Seq[(String, Map[String, ColRange])] = Nil, // (manifest, summary)
      ref: Option[String] = None,
      token: Option[String] = None,
      // declared when the caller WROTE df under a sort order (sorted/
      // z-order compaction): the order registers in table metadata, the
      // files' manifest entries claim its id, and it becomes the default
      sortOrder: Option[List[SortFieldInfo]] = None): IceTable = {
    val md0 = metadata
    // the data + manifest write happens ONCE, off any commit race: the
    // files are immutable and addressed by a UUID-suffixed dir, so a
    // rebased commit attempt re-points at the same delta unchanged
    val snapId0 = md0.snapshots.map(_.snapshot_id).foldLeft(0L)(math.max) + 1
    val dataRel = s"data/snap-$snapId0-${java.util.UUID.randomUUID().toString.take(8)}"
    val dataDir = new Path(location, dataRel)
    val parts   = md0.partitionCols
    // stamp parquet field ids (TableMetadata.stampedSchema is the single
    // id rule) so every data file is resolvable by id after a rename/drop
    // evolution; purely additive for name-based readers. The df's own
    // column ORDER is preserved — only metadata is attached.
    val stampedOf = md0.stampedSchema.fields.map(f => f.name -> f.metadata).toMap
    val stamped = df.select(df.schema.fields.map { f =>
      stampedOf.get(f.name)
        .map(m => org.apache.spark.sql.functions.col(f.name).as(f.name, m))
        .getOrElse(org.apache.spark.sql.functions.col(f.name))
    }.toIndexedSeq: _*)
    if (parts.isEmpty) stamped.write.parquet(dataDir.toString)
    else stamped.write.partitionBy(parts: _*).parquet(dataDir.toString)
    val (files, fileSizes) = {
      val it  = fs.listFiles(dataDir, true) // recursive: partition subdirs
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          buf += ((relativize(st.getPath.toString, dataRel), st.getLen))
      }
      val sorted = buf.sortBy(_._1).toIndexedSeq
      (sorted.map(_._1), sorted.toMap)
    }
    // sort-order id resolved against the pre-write metadata; the CAS loop
    // re-resolves on rebase and rewrites the (O(delta), driver-cached)
    // manifest in the rare case a racing commit claimed the id first
    var stampId = sortOrder.map(f => resolveSortOrder(md0, f)._1)
    var newManifest =
      writeManifest(md0.schema, dataDir, dataRel, files, snapId0, fileSizes, parts.toSet,
        sortOrderId = stampId)
    // the new manifest's summary folds its per-file stats (the delta was
    // just written, so this driver read is O(delta) and warms the cache)
    val newSummary = summarize(md0.schema, readManifest(newManifest))

    // CAS commit with rebase-and-retry: two concurrent appends BOTH land —
    // the loser re-reads the winner's metadata, recomputes its snapshot on
    // top (new snapshot id, winner's manifests carried), and retries the
    // rename-as-CAS at the next version (Iceberg's optimistic-concurrency
    // protocol; the REST path does the same server-side at
    // RestCatalog.scala:327).
    var attempt = 0
    while (attempt < 10) {
      val v  = currentVersion
      val md = metadataAt(v)
      // base snapshot: the target ref's head (main = current pointer)
      val baseSnap = ref match {
        case Some(r) =>
          val info = md.refMap.getOrElse(r, throw new NoSuchElementException(s"no ref $r"))
          require(info.ref_type == "branch", s"ref $r is a tag — tags are immutable")
          md.snapshot(info.snapshot_id)
        case None => md.currentSnapshot
      }
      // idempotency re-check on the rebased state: the racing winner may
      // have been a retry of this very token
      if (token.exists(md.knownTokens.contains)) return this
      val snapId = md.snapshots.map(_.snapshot_id).foldLeft(0L)(math.max) + 1
      // carried (manifest, summary) pairs: an append carries the parent's
      // wholesale; a replace starts from the caller's (possibly empty) set
      val base: Seq[(String, Map[String, ColRange])] =
        if (replace) carry
        else baseSnap.toSeq.flatMap(sn =>
          sn.manifests.zipWithIndex.map { case (m, i) =>
            m -> sn.summaryAt(i).getOrElse(Map.empty)
          })
      // register the sort order on the REBASED metadata; if a racing
      // commit allocated our stamped id to a DIFFERENT order, rewrite the
      // delta manifest (O(delta) JSON, immutable new dir) with the true id
      val (mdOrdered, orderId) = sortOrder match {
        case Some(f) =>
          val (oid, m) = resolveSortOrder(md, f)
          (m, Some(oid))
        case None => (md, None)
      }
      if (orderId != stampId && orderId.isDefined) {
        val fixed = readManifest(newManifest).map(_.copy(sortOrderId = orderId))
        val rel   = s"metadata/manifests/m-$snapId-${java.util.UUID.randomUUID().toString.take(8)}"
        fs.mkdirs(new Path(location, rel))
        writeFileAtomic(new Path(location, s"$rel/part-0.json"),
          fixed.map(_.toJson).mkString("\n"))
        newManifest = rel
        stampId = orderId
      }
      val snap = Snapshot(
        snapshot_id = snapId,
        timestamp_ms = System.currentTimeMillis(),
        operation = if (operation.nonEmpty) operation else if (replace) "replace" else "append",
        manifests = (base.map(_._1) :+ newManifest).toList,
        manifest_summaries = Some((base.map(_._2) :+ newSummary).toList),
        parent_snapshot_id = baseSnap.map(_.snapshot_id),
        commit_token = token,
        delete_manifests = carriedDeletes(baseSnap, base.nonEmpty)
      )
      val withSnap = mdOrdered.copy(snapshots = mdOrdered.snapshots :+ snap)
      val newMd = ref match {
        case Some(r) => withSnap.copy(refs = Some(md.refMap + (r -> RefInfo(snapId, "branch"))))
        case None    => withSnap.copy(current_snapshot_id = snapId)
      }
      if (commitCasAt(v + 1, newMd)) return this
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"append to $location lost the commit race 10 times — giving up")
  }

  /** Commit already-staged data files (the DataSource V2 write path:
    * executors wrote the parquet + collected stats themselves, so the
    * commit is pure metadata — one manifest write + the same CAS
    * rebase-and-retry loop appends use). `entries` carry paths RELATIVE
    * to the table location plus per-file stats/rows from the writers. */
  private[graft] def commitStagedEntries(
      entries: Seq[ManifestEntry],
      replace: Boolean,
      token: Option[String] = None,
      // write-audit-publish: commit onto a BRANCH head instead of main
      // (the `graft.wap.branch` SQL surface); plain appends only
      ref: Option[String] = None): IceTable = {
    require(ref.isEmpty || !replace, "branch (WAP) writes support appends only")
    val md0 = metadata
    // idempotency (streaming epochs): a replayed commit is a no-op
    if (token.exists(md0.knownTokens.contains)) return this
    val rel = s"metadata/manifests/m-w-${java.util.UUID.randomUUID().toString.take(8)}"
    val dir = new Path(location, rel)
    fs.mkdirs(dir)
    writeFileAtomic(new Path(dir, "part-0.json"), entries.map(_.toJson).mkString("\n"))
    val newSummary = summarize(md0.schema, entries)
    var attempt = 0
    while (attempt < 10) {
      val v  = currentVersion
      val md = metadataAt(v)
      if (token.exists(md.knownTokens.contains)) return this // raced replay
      // WAP: base on the branch head and advance the branch pointer —
      // main is untouched until fast_forward publishes
      val baseSnap = ref match {
        case Some(r) =>
          val info = md.refMap.getOrElse(r, throw new NoSuchElementException(
            s"no branch $r (graft.wap.branch must name an existing branch)"))
          require(info.ref_type == "branch", s"ref $r is a tag — tags are immutable")
          md.snapshot(info.snapshot_id)
        case None => md.currentSnapshot
      }
      val snapId = md.snapshots.map(_.snapshot_id).foldLeft(0L)(math.max) + 1
      val base: Seq[(String, Map[String, ColRange])] =
        if (replace) Nil
        else baseSnap.toSeq.flatMap(sn =>
          sn.manifests.zipWithIndex.map { case (m, i) =>
            m -> sn.summaryAt(i).getOrElse(Map.empty)
          })
      val snap = Snapshot(
        snapshot_id = snapId,
        timestamp_ms = System.currentTimeMillis(),
        operation = if (replace) "replace" else "append",
        manifests = (base.map(_._1) :+ rel).toList,
        manifest_summaries = Some((base.map(_._2) :+ newSummary).toList),
        parent_snapshot_id = baseSnap.map(_.snapshot_id),
        commit_token = token,
        delete_manifests = carriedDeletes(baseSnap, base.nonEmpty))
      val withSnap = md.copy(snapshots = md.snapshots :+ snap)
      val newMd = ref match {
        case Some(r) => withSnap.copy(refs = Some(md.refMap + (r -> RefInfo(snapId, "branch"))))
        case None    => withSnap.copy(current_snapshot_id = snapId)
      }
      if (commitCasAt(v + 1, newMd)) return this
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"staged commit to $location lost the commit race 10 times — giving up")
  }

  /** Commit for group-based (copy-on-write) ROW-LEVEL SQL operations
    * (`DELETE FROM` / `UPDATE` / `MERGE INTO` through the V2 connector):
    * the row-level scan read exactly `removed` (the affected file set —
    * files that MAY contain matching rows, after manifest min/max
    * pruning), executors staged the surviving+new rows as `entries`, and
    * this commit atomically swaps the two. Manifest-granular carry, as in
    * [[deleteRange]]: a manifest touching no removed file carries by
    * POINTER (zero IO); a partially-affected one is rewritten minus the
    * removed entries — so commit cost tracks the operation's blast
    * radius, never table size. Rebase-and-retry like every other commit:
    * a racing APPEND's new manifests carry straight through (they cannot
    * reference `removed`, which existed before the scan). */
  /** METADATA-ONLY DELETE planning: classify every current data file
    * against a pushed filter conjunction as all-match (droppable), no-match
    * (carried untouched) or mixed. Returns the droppable set, or None if
    * ANY file is mixed / any filter unsupported — the caller (the V2
    * table's `SupportsDelete.canDeleteWhere`) then refuses, and Spark
    * falls back to the row-level copy-on-write rewrite. Soundness rules:
    *  - no-match claims use min/max alone (a NULL never satisfies a
    *    comparison, so an out-of-range file truly has no matching row);
    *  - all-match claims additionally need a NO-NULLS guarantee for the
    *    column, because min/max ignore nulls: the field is declared
    *    required, or it is a hive partition column with recorded stats
    *    (one uniform non-null value per file by construction).
    * At 100 TB this is Iceberg's partition-aligned DELETE: dropping a
    * day's files is an O(manifests) metadata commit, zero data IO.
    *
    * Known trade: string bounds are truncate(16)-truncated (spec
    * semantics), so a NON-partition string column uniform per file with
    * values longer than 16 code points no longer presents lo == hi — its
    * files classify MIXED and `DELETE WHERE c = v` falls back to
    * copy-on-write. Partition columns are exempt from truncation exactly
    * to keep this path (their stats are one uniform value by
    * construction); the common metadata-DELETE keys — partitions,
    * numerics, short ids — are unaffected. Accepted: the alternative is
    * document-sized bound strings in every manifest entry. */
  private[graft] def metadataDeletePlan(
      filters: Seq[org.apache.spark.sql.sources.Filter]): Option[Set[String]] = {
    import org.apache.spark.sql.sources._
    val md   = metadata
    val snap = md.currentSnapshot.getOrElse(return Some(Set.empty))
    val fieldOf  = md.schema.fields.map(f => f.name -> f).toMap
    val ALL = 1; val NONE = 0; val MIXED = -1

    // partition-column evidence (one uniform non-null value per file "by
    // construction") holds only for files WRITTEN under a layout where c
    // was a partition column — after evolvePartitioning older files
    // predate the layout and their stats are ordinary (possibly
    // null-skipping) bounds. A file's own hive path is the era witness:
    // partition-era files live under a c=value directory.
    var partSet = Set.empty[String]

    // stats under a RETIRED name (dropped/renamed-away column) must never
    // serve as evidence for a same-named successor column — unless the
    // file postdates the retirement watermark (era-scoped trust, same
    // rule as planFilesBounds)
    val retiredW = md.retiredWatermarks
    var entrySnap: Option[Long] = None // set per file in the walk below
    def trusted(c: String): Boolean =
      retiredW.get(c).forall(w => entrySnap.exists(_ > w))

    def noNulls(c: String, stats: Map[String, ColRange]): Boolean =
      fieldOf.get(c).exists(!_.nullable) || (partSet(c) && stats.contains(c))

    def statsRecordable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.FloatType |
          org.apache.spark.sql.types.DoubleType => true
      case _ => false
    }

    /** A hive NULL-partition file: the partition value is uniformly NULL
      * (stats absent for a col whose type WOULD have been recorded), so
      * every comparison predicate on it is false for every row. */
    def isNullPartFile(c: String, stats: Map[String, ColRange]): Boolean =
      partSet(c) && !stats.contains(c) &&
        fieldOf.get(c).exists(f => statsRecordable(f.dataType))

    def range(c: String, stats: Map[String, ColRange]): Option[(String, String, (String, String) => Int)] =
      for {
        f  <- fieldOf.get(c)
        if trusted(c)
        r  <- stats.get(c)
        lo <- r.min
        hi <- r.max
      } yield (lo, hi, cmpFor(f.dataType))

    def eval(f: Filter, stats: Map[String, ColRange]): Int = f match {
      case And(l, r) =>
        (eval(l, stats), eval(r, stats)) match {
          case (NONE, _) | (_, NONE) => NONE
          case (ALL, ALL)            => ALL
          case _                     => MIXED
        }
      case Or(l, r) =>
        (eval(l, stats), eval(r, stats)) match {
          case (ALL, _) | (_, ALL) => ALL
          case (NONE, NONE)        => NONE
          case _                   => MIXED
        }
      // null-safe equality (what static PARTITION (c = v) overwrites
      // produce): for a non-null literal it matches exactly like EqualTo
      // (NULL <=> v is false); a null literal matches exactly the
      // null-partition file and provably misses no-nulls files
      case EqualNullSafe(c, v) if v != null => eval(EqualTo(c, v), stats)
      case EqualNullSafe(c, _) =>
        if (isNullPartFile(c, stats)) ALL
        else if (noNulls(c, stats)) NONE
        else MIXED
      // a NULL literal in a comparison is never true in SQL (unknown), so
      // it provably matches NO row of any file — and must not reach the
      // String.valueOf below, where it would become the string "null"
      // (NumberFormatException inside cmpFor on numeric columns, and a
      // false match on a string column whose value is literally "null")
      case EqualTo(_, null) => NONE
      case GreaterThan(_, null) | GreaterThanOrEqual(_, null) => NONE
      case LessThan(_, null) | LessThanOrEqual(_, null) => NONE
      case In(c, vs) if vs != null && vs.contains(null) =>
        val nonNull = vs.filter(_ != null)
        if (nonNull.isEmpty) NONE else eval(In(c, nonNull), stats)
      case EqualTo(c, v) if isNullPartFile(c, stats) => NONE
      case EqualTo(c, v) => range(c, stats) match {
        case Some((lo, hi, cmp)) =>
          val s = String.valueOf(v)
          if (cmp(s, lo) < 0 || cmp(s, hi) > 0) NONE
          else if (cmp(lo, hi) == 0 && cmp(s, lo) == 0 && noNulls(c, stats)) ALL
          else MIXED
        case None => MIXED
      }
      case In(c, vs) if isNullPartFile(c, stats) => NONE
      case In(c, vs) => range(c, stats) match {
        case Some((lo, hi, cmp)) =>
          val ss = vs.map(String.valueOf)
          if (ss.forall(s => cmp(s, lo) < 0 || cmp(s, hi) > 0)) NONE
          else if (cmp(lo, hi) == 0 && ss.exists(cmp(_, lo) == 0) && noNulls(c, stats)) ALL
          else MIXED
        case None => MIXED
      }
      case GreaterThan(c, v) if isNullPartFile(c, stats) => NONE
      case GreaterThan(c, v) => range(c, stats) match {
        case Some((lo, hi, cmp)) =>
          val s = String.valueOf(v)
          if (cmp(hi, s) <= 0) NONE
          else if (cmp(lo, s) > 0 && noNulls(c, stats)) ALL
          else MIXED
        case None => MIXED
      }
      case GreaterThanOrEqual(c, v) if isNullPartFile(c, stats) => NONE
      case GreaterThanOrEqual(c, v) => range(c, stats) match {
        case Some((lo, hi, cmp)) =>
          val s = String.valueOf(v)
          if (cmp(hi, s) < 0) NONE
          else if (cmp(lo, s) >= 0 && noNulls(c, stats)) ALL
          else MIXED
        case None => MIXED
      }
      case LessThan(c, v) if isNullPartFile(c, stats) => NONE
      case LessThan(c, v) => range(c, stats) match {
        case Some((lo, hi, cmp)) =>
          val s = String.valueOf(v)
          if (cmp(lo, s) >= 0) NONE
          else if (cmp(hi, s) < 0 && noNulls(c, stats)) ALL
          else MIXED
        case None => MIXED
      }
      case LessThanOrEqual(c, v) if isNullPartFile(c, stats) => NONE
      case LessThanOrEqual(c, v) => range(c, stats) match {
        case Some((lo, hi, cmp)) =>
          val s = String.valueOf(v)
          if (cmp(lo, s) > 0) NONE
          else if (cmp(hi, s) <= 0 && noNulls(c, stats)) ALL
          else MIXED
        case None => MIXED
      }
      case IsNotNull(c) =>
        if (isNullPartFile(c, stats)) NONE
        else if (noNulls(c, Map.empty) || (partSet(c) && stats.contains(c))) ALL
        else MIXED
      case AlwaysTrue() => ALL
      case _ => MIXED
    }

    val declaredParts = md.partitionCols.toSet
    val removable = Set.newBuilder[String]
    for (m <- snap.manifests; e <- readManifest(m)) {
      if (!e.rows.contains(0L)) { // a zero-row file has nothing to classify
        val stats = e.stats.getOrElse(Map.empty)
        // era witness: only columns materialized as k=v dirs in THIS
        // file's path carry partition-uniformity evidence
        partSet = declaredParts.filter(c => e.file.contains(s"/$c="))
        entrySnap = IceTable.fileSnapId(e.file)
        // the conjunction of all pushed filters, evaluated per file
        val verdicts = filters.map(eval(_, stats))
        if (verdicts.contains(MIXED)) return None
        if (!verdicts.contains(NONE)) removable += e.file
      }
    }
    Some(removable.result())
  }

  private[graft] def commitReplaceScanned(
      removed: Set[String],
      entries: Seq[ManifestEntry],
      operation: String): IceTable = {
    val md0 = metadata
    val newManifest =
      if (entries.isEmpty) None
      else {
        val rel = s"metadata/manifests/m-rl-${java.util.UUID.randomUUID().toString.take(8)}"
        val dir = new Path(location, rel)
        fs.mkdirs(dir)
        writeFileAtomic(new Path(dir, "part-0.json"), entries.map(_.toJson).mkString("\n"))
        Some(rel -> summarize(md0.schema, entries))
      }
    var attempt = 0
    while (attempt < 10) {
      val v        = currentVersion
      val md       = metadataAt(v)
      val baseSnap = md.currentSnapshot
      val carried = baseSnap.toSeq.flatMap(sn => sn.manifests.zipWithIndex.flatMap {
        case (m, i) =>
          val summary = sn.summaryAt(i).getOrElse(Map.empty[String, ColRange])
          val es      = readManifest(m)
          if (!es.exists(e => removed(e.file))) Some(m -> summary)
          else {
            val remaining = es.filterNot(e => removed(e.file))
            if (remaining.isEmpty) None
            else Some(writeFilteredManifest(remaining) -> summarize(md.schema, remaining))
          }
      })
      val all    = carried ++ newManifest.toSeq
      val snapId = md.snapshots.map(_.snapshot_id).foldLeft(0L)(math.max) + 1
      val snap = Snapshot(
        snapshot_id = snapId,
        timestamp_ms = System.currentTimeMillis(),
        operation = operation,
        manifests = all.map(_._1).toList,
        manifest_summaries = Some(all.map(_._2).toList),
        parent_snapshot_id = baseSnap.map(_.snapshot_id),
        commit_token = None,
        delete_manifests = carriedDeletes(baseSnap, carried.nonEmpty))
      val newMd = md.copy(snapshots = md.snapshots :+ snap, current_snapshot_id = snapId)
      if (commitCasAt(v + 1, newMd)) return this
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"row-level commit to $location lost the commit race 10 times — giving up")
  }

  /** `data/snap-N-x` prefix of a snapshot-relative file path. */
  private def snapDirOf(relPath: String): String = relPath.split('/').take(2).mkString("/")

  /** Columns whose min/max ranges the planner can use for file skipping. */
  private def rangeable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
        org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType |
        org.apache.spark.sql.types.StringType => true
    case _                                    => false
  }

  /** Path string -> path relative to the table location, anchored at the
    * snapshot data dir (`dataRel`), robust to scheme prefixes and hive
    * partition subdirectories. */
  private def relativize(full: String, dataRel: String): String = {
    val i = full.indexOf(dataRel)
    require(i >= 0, s"path $full not under $dataRel")
    full.substring(i)
  }

  /** Write the commit's manifest: one distributed pass over the
    * just-written files computes per-file min/max of every rangeable
    * column (the stats Iceberg keeps per data file) and lands them as
    * JSON-lines entries — aggregation AND manifest write both happen
    * executor-side, so no per-file data ever rides through the driver;
    * at 10⁶ delta files the commit is still one map-side agg + one tiny
    * write. For partitioned tables the partition column values come from
    * the directory layout (partition discovery on the snapshot dir).
    * Returns the manifest dir path relative to the table location. */
  private def writeManifest(
      schema: org.apache.spark.sql.types.StructType,
      dataDir: Path,
      dataRel: String,
      files: Seq[String],
      snapId: Long,
      fileSizes: Map[String, Long] = Map.empty,
      // string columns whose bounds stay FULL: partition columns (their
      // min=max IS the partition value — exactness feeds metadata deletes)
      // and a position-delete manifest's file_path (delete-applies-to-file
      // pruning is useless on truncated paths; Iceberg keeps full metrics
      // there too)
      exactCols: Set[String] = Set.empty,
      // registered sort-order id the files were written under (None =
      // unsorted); rides each manifest entry as `sortOrderId`
      sortOrderId: Option[Int] = None): String = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rel  = s"metadata/manifests/m-$snapId-${java.util.UUID.randomUUID().toString.take(8)}"
    val dir  = new Path(location, rel)
    val cols = schema.fields.filter(f => rangeable(f.dataType)).map(_.name)
    // the file inventory comes from the O(delta) listing (a zero-row file
    // has no groupBy row but must still be tracked), stats from the scan;
    // file lengths ride the listing for free (split gating needs them)
    val filesDF = spark.createDataset(
      files.toIndexedSeq.map(f => (f, fileSizes.get(f).filter(_ > 0))))
      .toDF("file", "sizeBytes")
    val statsType = "map<string,struct<min:string,max:string>>"
    val entries =
      if (files.isEmpty)
        filesDF.withColumn("stats", lit(null).cast(statsType))
          .withColumn("rows", lit(null).cast("long"))
      else {
        // row count always rides the stats pass (Iceberg's required
        // record_count) — COUNT(*)/snapshot sizes answer from metadata
        // string bounds land TRUNCATED (Iceberg truncate(16): prefix
        // lower, incremented-prefix upper — a NULL upper reads as
        // unbounded): long-text columns must not put document-sized
        // strings in every manifest entry
        val strCols = schema.fields.collect {
          case f if f.dataType == org.apache.spark.sql.types.StringType => f.name
        }.toSet
        val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
          if (strCols(c) && !exactCols(c))
            Seq(graft.functions.boundfns.truncLower(min(col(c)).cast("string")).as(s"min_$c"),
              graft.functions.boundfns.truncUpper(max(col(c)).cast("string")).as(s"max_$c"))
          else
            Seq(min(col(c)).cast("string").as(s"min_$c"),
              max(col(c)).cast("string").as(s"max_$c"))
        }
        val statsMap =
          if (cols.isEmpty) lit(null).cast(statsType)
          else map(cols.flatMap(c =>
            Seq(lit(c), struct(col(s"min_$c").as("min"), col(s"max_$c").as("max")))).toIndexedSeq: _*)
        // input_file_name() is URI-ENCODED ("4-NOT SPECIFIED" partition
        // dirs arrive as "4-NOT%20SPECIFIED") while the listing side is
        // raw, so the join key must URI-decode — guarding literal '+'
        // first, because url_decode is form-style ('+' -> space) but URI
        // encoding leaves '+' bare. Without this, every file under an
        // escaped partition value silently lost its stats AND its row
        // count (metadata COUNT(*) undercounted — caught by the V2
        // count-pushdown spec on the hive layout).
        val statsDF = spark.read.schema(schema).parquet(dataDir.toString)
          .groupBy(input_file_name().as("__file"))
          .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
          .select(
            expr(s"url_decode(replace(substring(__file, instr(__file, '$dataRel')), '+', '%2B'))")
              .as("file"),
            statsMap.as("stats"),
            col("__rows").as("rows"))
        // a zero-row file has no scan group: its entry keeps rows = 0,
        // not null (we know it is empty — the listing produced it)
        filesDF.join(statsDF, Seq("file"), "left")
          .withColumn("rows", coalesce(col("rows"), lit(0L)))
      }
    val stamped = sortOrderId match {
      case Some(id) => entries.withColumn("sortOrderId", lit(id))
      case None     => entries
    }
    stamped.coalesce(1).write.json(dir.toString)
    rel
  }

  /** Parse one immutable manifest dir (cached per-JVM: a manifest never
    * changes after commit, so planning re-reads cost nothing). */
  private def readManifest(rel: String): IndexedSeq[ManifestEntry] = {
    val dir = new Path(location, rel)
    IceTable.manifestCache(dir.toString) {
      fs.listStatus(dir).toIndexedSeq
        .filter(s => !s.isDirectory && s.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
        .flatMap { st =>
          readFile(st.getPath).split('\n').toIndexedSeq
            .map(_.trim).filter(_.nonEmpty).map(ManifestEntry.fromJson)
        }
        // deterministic scan order within a commit (listings already sort
        // across commits because manifests are read in snapshot order)
        .sortBy(_.file)
    }
  }

  /** The data files of `snap`, in commit order (manifest order, each
    * manifest internally sorted). */
  def filesOf(snap: Snapshot): Seq[String] =
    snap.manifests.flatMap(readManifest(_).map(_.file))

  /** Full data-file manifest entries of `snap` (stats, row counts, sizes,
    * split offsets) — what ranged-split planning consumes. */
  def entriesOf(snap: Snapshot): Seq[ManifestEntry] =
    snap.manifests.flatMap(readManifest)

  // ------------------------------------------ merge-on-read position deletes

  /** Position-delete file entries of `snap` (merge-on-read): each entry's
    * `file` is a parquet of `(file_path STRING, pos BIGINT)` rows marking
    * deleted positions, its `stats("file_path")` range bounds WHICH data
    * files it touches (the reader prunes on it), and `rows` counts the
    * delete records. Empty for copy-on-write-only tables. */
  def deleteEntriesOf(snap: Snapshot): Seq[ManifestEntry] =
    snap.deleteManifests.flatMap(readManifest)

  /** Whether `snap` has live position deletes — the gate that turns OFF
    * every metadata-only row-count shortcut (manifest counts bound the
    * PHYSICAL rows; MoR deletes make live rows a strict subset, and racing
    * delta commits may even record the same position twice, so subtraction
    * is unsound — reads must apply the deletes). */
  def hasDeletes(snap: Snapshot): Boolean = snap.deleteManifests.nonEmpty

  /** Delete-manifest carry rule shared by every snapshot-building commit:
    * a commit that RETAINS any of the parent's data manifests must retain
    * the parent's delete manifests too (untouched files keep their deleted
    * positions invisible); a full replacement (compact / truncate /
    * rewrite-everything) starts clean — its rows were produced by a scan
    * that already applied the deletes. Entries referencing files absent
    * from the new snapshot are ignored at read time, so over-carrying is
    * sound; dropping on full replacement is exact. */
  private def carriedDeletes(baseSnap: Option[Snapshot], retainsParentData: Boolean)
      : Option[List[String]] =
    baseSnap.map(_.deleteManifests).filter(_.nonEmpty && retainsParentData)

  /** Commit a merge-on-read row delta (the V2 `SupportsDelta` write path —
    * SQL `DELETE`/`UPDATE`/`MERGE` without rewriting any data file):
    * `deletes` are staged position-delete files, `dataEntries` staged
    * inserts (MERGE's NOT MATCHED rows / UPDATE's rewritten rows). The new
    * snapshot carries ALL parent data manifests by pointer, appends the
    * delta manifests, and lands through the same CAS rebase-and-retry
    * protocol as appends — a racing append's files commute (its positions
    * can't be targeted by a delete planned before they existed), and a
    * racing delta targeting the same positions is harmless because the
    * read path applies deletes as a SET. At 100 TB this is the Iceberg v2
    * MoR shape: commit cost is O(delta files) metadata, zero data IO. */
  private[graft] def commitRowDeltas(
      deletes: Seq[ManifestEntry],
      dataEntries: Seq[ManifestEntry],
      operation: String): IceTable = {
    if (deletes.isEmpty && dataEntries.isEmpty) return this // no-op delta
    val md0 = metadata
    def stage(prefix: String, es: Seq[ManifestEntry]): Option[String] =
      if (es.isEmpty) None
      else {
        val rel = s"metadata/manifests/$prefix-${java.util.UUID.randomUUID().toString.take(8)}"
        val dir = new Path(location, rel)
        fs.mkdirs(dir)
        writeFileAtomic(new Path(dir, "part-0.json"), es.map(_.toJson).mkString("\n"))
        Some(rel)
      }
    val delManifest  = stage("m-del", deletes)
    val dataManifest = stage("m-w", dataEntries)
    // an aborted commit (concurrent-rewrite validation, lost race) must
    // not leave the just-staged manifest dirs as metadata orphans — the
    // V2 abort path only sweeps the data/deletes staging dirs
    def unstage(): Unit =
      (delManifest.toSeq ++ dataManifest.toSeq).foreach(rel =>
        fs.delete(new Path(location, rel), true))
    val dataSummary  = summarize(md0.schema, dataEntries)
    // Exact target set of the planned position deletes (distinct file_path
    // over the staged delete parquets — O(affected files) driver rows, one
    // small job). Validated against EVERY rebase below: a concurrent
    // compact/CoW rewrite between delta planning and commit replaces the
    // targeted data files, and deletes referencing absent files are
    // IGNORED at read time — committing them would silently resurrect the
    // rows. Iceberg's RowDelta makes the same validation and aborts.
    val plannedTargets: Set[String] =
      if (deletes.isEmpty) Set.empty
      else spark.read.schema(IceTable.PositionDeleteSchema)
        .parquet(deletes.map(e => new Path(location, e.file).toString): _*)
        .select("file_path").distinct().collect().map(_.getString(0)).toSet
    var attempt = 0
    while (attempt < 10) {
      val v        = currentVersion
      val md       = metadataAt(v)
      val baseSnap = md.currentSnapshot
      if (plannedTargets.nonEmpty) {
        val present = baseSnap.toSeq.flatMap(filesOf).toSet
        val missing = plannedTargets -- present
        if (missing.nonEmpty) {
          unstage()
          throw new java.util.ConcurrentModificationException(
            s"row-delta commit to $location aborted: position deletes target " +
              s"${missing.size} data file(s) no longer in the current snapshot " +
              s"(concurrent rewrite?): ${missing.take(3).mkString(", ")}")
        }
      }
      val base: Seq[(String, Map[String, ColRange])] =
        baseSnap.toSeq.flatMap(sn => sn.manifests.zipWithIndex.map { case (m, i) =>
          m -> sn.summaryAt(i).getOrElse(Map.empty[String, ColRange])
        })
      val all = base ++ dataManifest.map(_ -> dataSummary).toSeq
      val allDeletes = baseSnap.toSeq.flatMap(_.deleteManifests) ++ delManifest.toSeq
      val snapId = md.snapshots.map(_.snapshot_id).foldLeft(0L)(math.max) + 1
      val snap = Snapshot(
        snapshot_id = snapId,
        timestamp_ms = System.currentTimeMillis(),
        operation = operation,
        manifests = all.map(_._1).toList,
        manifest_summaries = Some(all.map(_._2).toList),
        parent_snapshot_id = baseSnap.map(_.snapshot_id),
        commit_token = None,
        delete_manifests = if (allDeletes.isEmpty) None else Some(allDeletes.toList))
      val newMd = md.copy(snapshots = md.snapshots :+ snap, current_snapshot_id = snapId)
      if (commitCasAt(v + 1, newMd)) return this
      attempt += 1
    }
    unstage()
    throw new java.util.ConcurrentModificationException(
      s"row-delta commit to $location lost the commit race 10 times — giving up")
  }

  /** COUNT(*) of `snap` answered from manifest metadata alone — no data
    * file is opened (planning-sized work: O(#manifests) JSON reads, all
    * cached). None if any entry predates the `rows` field, so a stale
    * manifest can never silently undercount — and None whenever the
    * snapshot carries merge-on-read deletes (manifest counts are physical
    * rows; live rows are a subset only a delete-applying scan can count). */
  def statsRowCount(snap: Snapshot): Option[Long] = {
    if (hasDeletes(snap)) return None
    val rs = snap.manifests.flatMap(readManifest(_).map(_.rows))
    if (rs.exists(_.isEmpty)) None else Some(rs.flatten.sum)
  }

  /** Row count of a SUBSET of `snap`'s files from manifest metadata (None
    * if any matching entry predates the `rows` field, or if MoR deletes
    * make physical counts over-counts) — feeds the V2 scan's planner
    * statistics after pruning. */
  def statsRowCountForFiles(snap: Snapshot, files: Set[String]): Option[Long] = {
    if (hasDeletes(snap)) return None
    val es = snap.manifests.flatMap(readManifest).filter(e => files.contains(e.file))
    if (es.exists(_.rows.isEmpty)) None else Some(es.flatMap(_.rows).sum)
  }

  /** Per-file column stats of `snap` (files without stats are absent). */
  def statsOf(snap: Snapshot): Map[String, Map[String, ColRange]] =
    snap.manifests.flatMap(m =>
      readManifest(m).flatMap(e => e.stats.map(e.file -> _))).toMap

  /** Type-aware value compare for stringified stats (numeric columns
    * compare numerically — "9" > "10" lexically would corrupt pruning). */
  private def cmpFor(dt: org.apache.spark.sql.types.DataType): (String, String) => Int =
    dt match {
      case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
          org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
        (a, b) => BigDecimal(a).compare(BigDecimal(b))
      case _ => (a, b) => a.compareTo(b)
    }

  /** Fold a manifest's per-file stats into one per-column range — the
    * manifest-list summary. A column appears only when EVERY file in the
    * manifest recorded both ends for it (a gap would make skipping on the
    * summary unsound). */
  private def summarize(
      schema: org.apache.spark.sql.types.StructType,
      entries: Seq[ManifestEntry]): Map[String, ColRange] = {
    if (entries.isEmpty) return Map.empty
    schema.fields.filter(f => rangeable(f.dataType)).flatMap { f =>
      val cmp = cmpFor(f.dataType)
      val ranges = entries.map(_.stats.flatMap(_.get(f.name)))
      if (ranges.exists(r => r.isEmpty || r.get.min.isEmpty || r.get.max.isEmpty)) None
      else {
        val mins = ranges.map(_.get.min.get)
        val maxs = ranges.map(_.get.max.get)
        Some(f.name -> ColRange(
          Some(mins.reduce((a, b) => if (cmp(a, b) <= 0) a else b)),
          Some(maxs.reduce((a, b) => if (cmp(a, b) >= 0) a else b))))
      }
    }.toMap
  }

  /** Find `fields` among the registered sort orders or allocate the next
    * id (sequential from 1, never reused); either way the order becomes
    * the table default. Pure metadata transform — the caller commits. */
  private def resolveSortOrder(
      md: TableMetadata, fields: List[SortFieldInfo]): (Int, TableMetadata) =
    md.sortOrderList.find(_.fields == fields) match {
      case Some(o) => (o.order_id, md.copy(default_sort_order_id = Some(o.order_id)))
      case None =>
        val id = md.sortOrderList.map(_.order_id).foldLeft(0)(math.max) + 1
        (id, md.copy(
          sort_orders = Some(md.sortOrderList :+ SortOrderInfo(id, fields)),
          default_sort_order_id = Some(id)))
    }

  /** Identity/asc/nulls-first sort fields for `cols` (Spark's
    * `sortWithinPartitions` default collation) by registered field id. */
  private def identityOrderFields(
      md: TableMetadata, cols: Seq[String], transform: String = "identity")
      : List[SortFieldInfo] = {
    val idOf = md.fields.map(fi => fi.name -> fi.id).toMap
    cols.map(c => SortFieldInfo(
      idOf.getOrElse(c, throw new NoSuchElementException(s"no column $c to sort by")),
      transform, "asc", "nulls-first")).toList
  }

  /** Bin-pack the current snapshot into `numFiles` files as a new
    * "compact" snapshot (Iceberg rewrite-data-files maintenance). Readers
    * of older snapshots are unaffected; time travel still works. */
  def compact(numFiles: Int): IceTable =
    appendInternal(scan().repartition(numFiles), replace = true, operation = "compact")

  /** Sort-clustered compaction: range-partition + sort the table by
    * `clusterCols` while bin-packing (Iceberg's rewrite with sort order).
    * Files end up with disjoint key ranges, so the per-file min/max stats
    * become maximally selective — `scanRange`/`planFiles` then prune to
    * ~one file per point lookup. The data-layout half of file skipping. */
  def compactSorted(numFiles: Int, clusterCols: Seq[String]): IceTable = {
    import org.apache.spark.sql.functions.col
    require(clusterCols.nonEmpty, "need at least one clustering column")
    val cols = clusterCols.map(col)
    appendInternal(
      scan().repartitionByRange(numFiles, cols: _*).sortWithinPartitions(cols: _*),
      replace = true, operation = "compact",
      // publish the clustering: the identity order registers in metadata,
      // becomes the default, and every rewritten file claims its id — so
      // the layout this rewrite paid for is discoverable (and exportable
      // to the Iceberg spec JSON), not silently declared "unsorted"
      sortOrder = Some(identityOrderFields(metadata, clusterCols)))
  }

  /** Z-order clustered compaction: bin-pack into `numFiles` files laid out
    * along a Morton (bit-interleaved) curve over `cols`, so per-file
    * min/max stats become selective on EVERY clustering column at once —
    * the multi-column generalization of [[compactSorted]] (which is
    * maximally selective on one column but useless on the others).
    *
    * Bucketing is linear between the column's global min/max (one tiny agg
    * scan — negligible next to the rewrite itself); `bits` bits per column,
    * up to 3 columns. The z-value is a plain codegen'd integer expression,
    * and the rewrite is `repartitionByRange` + in-partition sort on it, so
    * the whole operation is a standard shuffle+write at any scale. Skewed
    * value distributions get uneven buckets (Delta's OPTIMIZE ZORDER has
    * the same caveat); range-rank bucketing would be the refinement. */
  def compactZOrder(numFiles: Int, cols: Seq[String], bits: Int = 8): IceTable = {
    import org.apache.spark.sql.functions._
    require(cols.size >= 2 && cols.size <= 3, "z-order needs 2-3 columns")
    val md = metadata
    cols.foreach { c =>
      val dt = md.schema(c).dataType
      require(dt match {
        case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
            org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType => true
        case _ => false
      }, s"z-order column $c must be numeric, got $dt")
    }
    val df = scan()
    val mm = df.agg(
      cols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))).head,
      cols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))).tail: _*).head()
    // empty table (or no non-null values on any clustering column):
    // nothing to order by — plain bin-pack instead of NPE-ing on the stats
    if ((0 until 2 * cols.size).forall(mm.isNullAt)) return compact(numFiles)
    val nBuckets = 1L << bits
    val zcol = cols.zipWithIndex.map { case (c, i) =>
      // an all-null column has no range: it contributes bucket 0 for all rows
      if (mm.isNullAt(2 * i)) lit(0L)
      else {
        val (mn, mx) = (mm.getDouble(2 * i), mm.getDouble(2 * i + 1))
        val span     = math.max(mx - mn, Double.MinPositiveValue)
        // null values land in the min bucket (nulls-first), keeping the top
        // bucket's stats range tight instead of silently absorbing them
        val bucket = least(lit(nBuckets - 1),
          floor((coalesce(col(c).cast("double"), lit(mn)) - mn) / span * nBuckets).cast("long"))
        // spread bucket i's bits to positions i, i+k, i+2k... (k = #cols)
        (0 until bits).map { b =>
          shiftleft(shiftright(bucket, b).bitwiseAND(lit(1L)), b * cols.size + i)
        }.reduce(_ bitwiseOR _)
      }
    }.reduce(_ bitwiseOR _)
    appendInternal(
      df.withColumn("__z", zcol)
        .repartitionByRange(numFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z"),
      replace = true, operation = "compact",
      // record the Morton layout under the engine's own `zorder[bits]`
      // transform — honest in THIS format's metadata; exportIceberg maps
      // it to a table property because the spec's sort orders can't
      // express multi-column interleaving (claiming identity would assert
      // a lexicographic order the files don't have)
      sortOrder = Some(identityOrderFields(md, cols, transform = s"zorder[$bits]")))
  }

  /** Append with schema evolution: new columns get fresh field ids, missing
    * columns are null-filled; old data files stay valid (the scan reads
    * them with the merged schema, absent columns as null). */
  def evolveAppend(df: DataFrame): IceTable = {
    import org.apache.spark.sql.functions._
    val md     = metadata
    val old    = md.schema
    val newFs  = df.schema.fields.filterNot(f => old.fieldNames.contains(f.name))
    val merged = org.apache.spark.sql.types.StructType(old.fields ++ newFs)
    val aligned = df.select(merged.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    if (newFs.nonEmpty) {
      val nextId = md.lastColumnId + 1 // never re-issues a dropped field's id
      val addedFields = newFs.zipWithIndex.map { case (f, i) =>
        FieldInfo(nextId + i, f.name, f.dataType.catalogString, required = !f.nullable)
      }
      commit(md.copy(schemaJson = merged.json, fields = md.fields ++ addedFields))
    }
    appendInternal(aligned, replace = false)
  }

  // ------------------------------------------------------------------- reads

  /** Lazy DataFrame over the current snapshot. */
  /** Metadata-only additive schema evolution (the ALTER TABLE ADD COLUMN
    * path): append nullable columns with fresh field ids and commit a new
    * metadata version — zero data IO; existing files surface NULL for the
    * new columns at read time (same contract as evolveAppend, without a
    * data write). CAS-committed like every other metadata operation. */
  def addColumns(newFields: Seq[org.apache.spark.sql.types.StructField]): IceTable = {
    val md = metadata
    newFields.foreach { f =>
      require(!md.schema.fieldNames.contains(f.name), s"column ${f.name} already exists")
      require(f.nullable, s"evolved column ${f.name} must be nullable (old files lack it)")
    }
    val newSchema = org.apache.spark.sql.types.StructType(md.schema.fields ++ newFields)
    val maxId     = md.lastColumnId // never re-issues a dropped field's id
    val added = newFields.zipWithIndex.map { case (f, i) =>
      FieldInfo(maxId + i + 1, f.name, f.dataType.catalogString, required = false)
    }
    commit(md.copy(schemaJson = newSchema.json, fields = md.fields ++ added.toList))
    this
  }

  /** RENAME COLUMN: metadata-only — the field keeps its id, only the
    * display name changes; zero data IO. The table flips to read-by-id
    * (`read_by_id` in the metadata) so readers bind old files' columns
    * through the parquet field ids [[appendInternal]] always stamps —
    * by-name resolution would null the column out of every pre-rename
    * file. Partition columns are refused: the hive layout encodes their
    * NAMES in directory paths. */
  def renameColumns(renames: Seq[(String, String)]): IceTable = {
    val md = metadata
    renames.foreach { case (o, n) =>
      require(md.schema.fieldNames.contains(o), s"no column $o to rename")
      require(!md.schema.fieldNames.contains(n), s"column $n already exists")
      require(!md.partitionCols.contains(o),
        s"cannot rename hive partition column $o (directory paths encode the name)")
    }
    requireFieldIdStamps(md, "rename column")
    val rm = renames.toMap
    val newSchema = org.apache.spark.sql.types.StructType(
      md.schema.fields.map(f => rm.get(f.name).map(n => f.copy(name = n)).getOrElse(f)))
    val newInfos = md.fields.map(fi =>
      rm.get(fi.name).map(n => fi.copy(name = n)).getOrElse(fi))
    commit(md.copy(schemaJson = newSchema.json, fields = newInfos,
      read_by_id = Some(true),
      // old names retire AT THIS SNAPSHOT: a later column reusing one must
      // not consult its name-keyed stats in files from at-or-before here
      retired_columns = Some(md.retiredWatermarks ++
        renames.map(_._1 -> md.current_snapshot_id))))
    this
  }

  /** DROP COLUMN: metadata-only — the field leaves the schema, its id is
    * RETIRED (addColumns allocates past the max ever used, so a re-add of
    * the same name gets a FRESH id and old files' values do NOT
    * resurrect — the guarantee read-by-id exists for). Data files keep
    * the physical column untouched; zero data IO. */
  def dropColumns(names: Seq[String]): IceTable = {
    val md = metadata
    names.foreach { c =>
      require(md.schema.fieldNames.contains(c), s"no column $c to drop")
      require(!md.partitionCols.contains(c), s"cannot drop hive partition column $c")
    }
    require(md.schema.fields.length > names.length, "cannot drop every column")
    requireFieldIdStamps(md, "drop column")
    val drop = names.toSet
    commit(md.copy(
      schemaJson = org.apache.spark.sql.types.StructType(
        md.schema.fields.filterNot(f => drop(f.name))).json,
      fields = md.fields.filterNot(fi => drop(fi.name)),
      read_by_id = Some(true),
      // pin the retired ids out of circulation forever, and retire the
      // names at this snapshot so a re-added column never consults the
      // old files' stats (later files' stats describe the successor)
      last_column_id = Some(md.lastColumnId),
      retired_columns = Some(md.retiredWatermarks ++
        names.map(_ -> md.current_snapshot_id))))
    this
  }

  /** Type promotion (the other half of schema evolution without
    * rewriting data): widen a column int→bigint or float→double in a
    * metadata-only CAS commit, PRESERVING its field id. Old data files
    * stay byte-identical — Spark's parquet readers (vectorized and
    * row-based) natively widen int32/float chunks into a long/double
    * read schema — and recorded per-file stats parse fine under the
    * wider type. These two pairs are exactly the primitive promotions
    * the Iceberg spec allows on a written table. */
  def promoteColumnTypes(
      promotions: Seq[(String, org.apache.spark.sql.types.DataType)]): IceTable = {
    import org.apache.spark.sql.types._
    val md  = metadata
    val pm  = promotions.toMap
    promotions.foreach { case (c, _) =>
      require(md.schema.fieldNames.contains(c), s"no column $c to promote") }
    val newFields = md.schema.fields.map { f =>
      pm.get(f.name) match {
        case Some(nt) =>
          require((f.dataType, nt) match {
            case (IntegerType, LongType) | (FloatType, DoubleType) => true
            case _                                                 => false
          }, s"unsupported type promotion ${f.dataType.catalogString} -> " +
            s"${nt.catalogString} for ${f.name} (int->bigint, float->double only)")
          f.copy(dataType = nt)
        case None => f
      }
    }
    // field ids are PRESERVED — only the declared type string changes
    val newInfos = md.fields.map { fi =>
      pm.get(fi.name) match {
        case Some(nt) => fi.copy(`type` = nt.catalogString)
        case None     => fi
      }
    }
    commit(md.copy(
      schemaJson = org.apache.spark.sql.types.StructType(newFields).json,
      fields = newInfos))
    this
  }

  /** Partition-layout evolution (the standard-format twin of the Iceberg
    * writer's `evolveSpec`): a metadata-only CAS commit switching the
    * hive layout NEW snapshots are written with. Files already on disk
    * keep their directory layout — every snapshot dir is read with its
    * own `basePath`, so partition values resolve per-era (an
    * unpartitioned-era file carries every column in the parquet, a
    * partitioned-era file restores the k=v dir values) and scans span
    * both. This is the "table grew, add partitioning now" path — zero
    * data rewritten, exactly the evolution story the Iceberg spec sells. */
  def evolvePartitioning(newCols: Seq[String]): IceTable = {
    val md = metadata
    newCols.foreach(c =>
      require(md.schema.fieldNames.contains(c), s"partition column $c not in schema"))
    commit(md.copy(
      partition_columns = if (newCols.isEmpty) None else Some(newCols.toList)))
    this
  }

  def scan(): DataFrame = scanSnapshot(metadata.current_snapshot_id)

  /** Time travel: lazy DataFrame over snapshot `id`'s file list. */
  def scanSnapshot(id: Long): DataFrame = {
    val md = metadata
    if (md.snapshots.isEmpty && id == 0L)
      // freshly-created table, no commits yet: empty relation, not an error
      return emptyFrame(md)
    val snap = md
      .snapshot(id)
      .getOrElse(throw new NoSuchElementException(s"snapshot $id of table ${md.name}"))
    readFilesOf(md, snap, filesOf(snap))
  }

  /** Read `files` of `snap`, applying the snapshot's merge-on-read
    * position deletes when present (the library-path twin of the V2
    * reader's per-file bitmap skip). */
  private[icelite] def readFilesOf(md: TableMetadata, snap: Snapshot, files: Seq[String]): DataFrame =
    if (!hasDeletes(snap)) readFiles(md, files)
    else {
      val delPaths = deleteEntriesOf(snap).map(e => new Path(location, e.file).toString)
      readFiles(md, files, Some(delPaths))
    }

  /** Join one LEAF parquet read against position deletes:
    * `_metadata.file_path` (URI-encoded, like input_file_name) is decoded
    * and anchored at the `data/snap-` segment to recover the
    * manifest-relative path, `_metadata.row_index` is the in-file
    * position — exactly the `(file_path, pos)` key the delete files
    * store. Applied PER LEAF because `_metadata` resolves only on a file
    * scan, not through a union. Fully distributed: Spark broadcasts the
    * delete side when it is small (the common case), and a mass-delete
    * falls back to a shuffled join — never a driver loop.
    * `left_anti` = live rows (delete application); `left_semi` = exactly
    * the deleted rows (the changelog's -D side). */
  private def joinPositionDeletes(
      leaf: DataFrame, deleteDF: DataFrame, joinType: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val keep = leaf.columns
    leaf
      .withColumn("__graft_fp", expr(
        "url_decode(replace(substring(_metadata.file_path, " +
          "instr(_metadata.file_path, '/data/snap-') + 1), '+', '%2B'))"))
      .withColumn("__graft_pos", col("_metadata.row_index"))
      .join(deleteDF,
        col("__graft_fp") === deleteDF("file_path") && col("__graft_pos") === deleteDF("pos"),
        joinType)
      .select(keep.map(col).toIndexedSeq: _*)
  }

  /** Time travel by wall clock (`FOR TIMESTAMP AS OF`): scan the latest
    * snapshot committed at or before `tsMillis`. Resolution is a pure
    * metadata lookup over the snapshot log — no data IO until the scan
    * itself, like snapshot-id travel. */
  def scanAsOf(tsMillis: Long): DataFrame = {
    val md = metadata
    val snap = md.snapshots.filter(_.timestamp_ms <= tsMillis)
      .sortBy(s => (s.timestamp_ms, s.snapshot_id)).lastOption
      .getOrElse(throw new NoSuchElementException(
        s"no snapshot of table ${md.name} at or before $tsMillis"))
    scanSnapshot(snap.snapshot_id)
  }

  private def emptyFrame(md: TableMetadata): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], md.schema)

  /** Plan a read over `files` (relative paths) with `md`'s schema; for
    * partitioned tables the k=v directory values are restored via one
    * basePath per snapshot dir (intermediate snap-N segments aren't k=v,
    * ruling out a single table-root basePath) — commits union, and
    * compaction collapses them when the union grows long. */
  private[icelite] def readFiles(
      md: TableMetadata,
      files: Seq[String],
      deletePaths: Option[Seq[String]] = None,
      deleteJoin: String = "left_anti"): DataFrame = {
    val deleteDF = deletePaths.filter(_.nonEmpty).map { ps =>
      spark.read.schema(IceTable.PositionDeleteSchema).parquet(ps: _*)
    }
    def leafDone(leaf: DataFrame): DataFrame =
      deleteDF.map(joinPositionDeletes(leaf, _, deleteJoin)).getOrElse(leaf)
    // a rename/drop-evolved table binds file columns by the parquet field
    // ids appendInternal stamps: the read schema carries the ids
    // (TableMetadata.scanSchema), and the relations are built under the
    // idReadSession twin so the id-matching flag is live at execution
    // without leaking into the caller's session conf. Hive partition
    // columns keep resolving from directory paths — id matching only
    // applies to columns physically read.
    val readSchema = md.scanSchema
    val readSpark  = if (md.readById) IcebergFormat.idReadSession(spark) else spark
    if (files.isEmpty) emptyFrame(md)
    // the hive-restore branch also covers files written under a PRIOR
    // partition layout (evolvePartitioning): their k=v dir segments need
    // per-snapshot basePath discovery even if the table is unpartitioned
    // NOW, and an unpartitioned-era dir under it degrades to a plain read
    else if (md.partitionCols.nonEmpty || files.exists(_.contains("="))) {
      files
        .groupBy(snapDirOf)
        .toSeq.sortBy(_._1)
        .map { case (rel, fs) =>
          leafDone(readSpark.read
            .schema(readSchema)
            .option("basePath", new Path(location, rel).toString)
            .parquet(fs.map(f => new Path(location, f).toString): _*))
        }
        .reduce(_ unionByName _)
        // a user schema + hive dirs comes back with the partition columns
        // APPENDED (data-column order first), not in the declared order;
        // positional consumers (union/except/writers) need md.schema order
        .select(md.schema.fieldNames.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    } else leafDone(
      readSpark.read.schema(readSchema).parquet(files.map(f => new Path(location, f).toString): _*))
  }

  def snapshots(): Seq[Snapshot] = metadata.snapshots

  // ----------------------------------------------------- metadata tables

  /** `t.manifests`-style metadata table: one row per (snapshot, manifest)
    * with the manifest's position in the list and its data-file count —
    * the granularity `rewrite_manifests` planning reads (many small
    * manifests ⇒ compact them). O(commits × manifests) rows, data never
    * touched. */
  def manifestsTable(): DataFrame = {
    import spark.implicits._
    val md = metadata
    md.snapshots.flatMap { sn =>
      sn.manifests.zipWithIndex.map { case (m, i) =>
        (sn.snapshot_id, i.toLong, readManifest(m).size.toLong,
          sn.snapshot_id == md.current_snapshot_id)
      }
    }.toDF("snapshot_id", "manifest_pos", "n_files", "is_current")
  }

  /** `t.snapshots`-style metadata table: one row per snapshot with its
    * commit-DAG edge, operation, and manifest/file counts — queryable like
    * any DataFrame. Planning-sized (O(commits) rows), never touches data. */
  def snapshotsTable(): DataFrame = {
    import spark.implicits._
    val md = metadata
    md.snapshots.map { sn =>
      (sn.snapshot_id, sn.parent_snapshot_id.getOrElse(0L), sn.operation,
        sn.manifests.size, filesOf(sn).size.toLong,
        sn.snapshot_id == md.current_snapshot_id)
    }.toDF("snapshot_id", "parent_id", "operation", "n_manifests", "n_files", "is_current")
  }

  /** `t.files`-style metadata table: one row per data file of the current
    * snapshot with its manifest of origin and recorded per-column stats
    * (min/max as strings). The inventory a maintenance job queries before
    * deciding what to compact or expire. */
  def filesTable(): DataFrame = {
    import spark.implicits._
    metadata.currentSnapshot.toSeq.flatMap { sn =>
      sn.manifests.flatMap { m =>
        readManifest(m).map { e =>
          val stats = e.stats.getOrElse(Map.empty)
          (e.file, m, stats.size,
            stats.toSeq.sortBy(_._1).map { case (c, r) =>
              s"$c:[${r.min.getOrElse("")},${r.max.getOrElse("")}]"
            }.mkString(";"),
            // Iceberg data_file field 140: 0 = unsorted, else the
            // registered order the file was written under
            e.sortOrderId.getOrElse(0))
        }
      }
    }.toDF("file", "manifest", "n_stat_cols", "stats", "sort_order_id")
  }

  /** `t.delete_files`-style metadata table: one row per live delete FILE
    * of the current snapshot with its record count and the data-file path
    * range it can touch — the visibility surface for MoR maintenance
    * planning ("how much delete debt does compaction clear?"). Schema is
    * shared with the standard-format twin
    * ([[IcebergFormat.deletesTable]]) so `SELECT` text ports between the
    * two: icelite carries position deletes only, so `content` is always
    * 'position' and `equality_ids` empty. (Named after Iceberg's
    * `delete_files` table — `position_deletes` there returns deleted
    * POSITIONS, not files.) Planning-sized: O(delete files) manifest
    * reads, data never touched. */
  def deletesTable(): DataFrame = {
    import spark.implicits._
    metadata.currentSnapshot.toSeq.flatMap { sn =>
      deleteEntriesOf(sn).map { e =>
        val fp = e.stats.flatMap(_.get("file_path"))
        (e.file, "position", e.rows.getOrElse(-1L), "",
          fp.flatMap(_.min).getOrElse(""), fp.flatMap(_.max).getOrElse(""))
      }
    }.toDF("delete_file", "content", "n_records", "equality_ids",
      "min_data_file", "max_data_file")
  }

  /** Live position-delete file paths of the current snapshot (absolute) —
    * the file set behind `t.position_deletes`. Planning-sized. */
  def positionDeleteFilePaths(): Seq[String] =
    metadata.currentSnapshot.toSeq.flatMap(deleteEntriesOf)
      .map(e => new Path(location, e.file).toString).sorted

  /** `t.position_deletes`-style metadata table: the deleted POSITIONS —
    * one (file_path, pos) row per entry in the current snapshot's live
    * position-delete files. Schema shared with the standard-format twin
    * ([[IcebergFormat.positionDeletesTable]]); provenance via the parquet
    * source's `_metadata.file_path`. O(delete rows) IO, DISTRIBUTED (a
    * plain parquet scan — rows are data-proportional, so unlike the other
    * metadata tables this one never materializes on the driver). */
  def positionDeletesTable(): DataFrame =
    IcebergFormat.positionDeletesFrame(spark, positionDeleteFilePaths())

  /** `t.refs`-style metadata table: named branches/tags plus the implicit
    * main pointer. */
  def refsTable(): DataFrame = {
    import spark.implicits._
    val md = metadata
    (("main", "branch", md.current_snapshot_id) +:
      md.refMap.toSeq.sortBy(_._1).map { case (n, r) => (n, r.ref_type, r.snapshot_id) })
      .toDF("ref", "ref_type", "snapshot_id")
  }

  /** `t.history`-style metadata table: the full snapshot log with each
    * entry's ancestry flag — `is_current_ancestor` is false for snapshots
    * orphaned by a rollback (Iceberg's history semantics). Pure metadata
    * walk over the parent chain, O(commits), zero data IO. */
  def historyTable(): DataFrame = {
    import spark.implicits._
    val md   = metadata
    val byId = md.snapshots.map(s => s.snapshot_id -> s).toMap
    val ancestors = Iterator
      .iterate(byId.get(md.current_snapshot_id))(
        _.flatMap(_.parent_snapshot_id).flatMap(byId.get))
      .takeWhile(_.isDefined).flatten.map(_.snapshot_id).toSet
    md.snapshots.map(sn =>
      (sn.snapshot_id, sn.parent_snapshot_id.getOrElse(0L),
        ancestors.contains(sn.snapshot_id)))
      .toDF("snapshot_id", "parent_id", "is_current_ancestor")
  }

  /** `t.partitions`-style metadata table: one row per partition of the
    * current snapshot with its data-file count, derived from manifest file
    * paths alone (hive `k=v` segments) — planning-sized, no data IO. The
    * inventory a compaction scheduler reads to find fragmented partitions. */
  def partitionsTable(): DataFrame = {
    import spark.implicits._
    metadata.currentSnapshot.toSeq
      .flatMap(filesOf)
      .map { f =>
        val segs = f.split('/').filter(_.contains("="))
        if (segs.isEmpty) "<unpartitioned>" else segs.mkString("/")
      }
      .groupBy(identity).toSeq
      .map { case (p, fs) => (p, fs.size.toLong) }
      .toDF("partition", "n_files")
  }

  // ------------------------------------------------- min/max file skipping

  /** Files of the current snapshot whose [min,max] range for `colName` can
    * intersect [lower, upper] (both optional). Two pruning levels, as in
    * Iceberg: the snapshot's per-MANIFEST summaries skip whole manifests
    * without opening them (planning cost O(manifests touched)); per-FILE
    * stats then prune within the manifests that remain. Missing summaries
    * or stats are conservatively kept. */
  def planFiles(colName: String, lower: Option[String], upper: Option[String]): Seq[String] =
    metadata.currentSnapshot
      .map(snap => planFilesBounds(snap, Map(colName -> (lower, upper))))
      .getOrElse(Seq.empty)

  /** Multi-column generalization of [[planFiles]] — the planning entry the
    * DataSource V2 scan builder calls with every pushed-down range bound at
    * once (SupportsPushDownFilters). A file survives only if, for EVERY
    * bound column, its recorded min/max range can intersect [lower, upper];
    * manifest summaries are consulted first so a manifest whose summary
    * misses any bound is skipped without ever being opened. Missing stats
    * are conservative (file kept), identical to single-column planFiles. */
  def planFilesBounds(
      snap: Snapshot,
      bounds: Map[String, (Option[String], Option[String])]): Seq[String] = {
    val md = metadata
    if (bounds.isEmpty) return filesOf(snap)
    val cmps = bounds.keys.map { c =>
      c -> cmpFor(md.schema.fields.find(_.name == c).map(_.dataType)
        .getOrElse(org.apache.spark.sql.types.StringType))
    }.toMap
    // stats under a RETIRED name may belong to a dropped/renamed-away
    // column: a same-named successor must never prune by them — UNLESS
    // the file postdates the retirement watermark (then the stats
    // describe the successor). Manifest summaries mix eras, so they go
    // untrusted for retired names; per-file entries re-prune by era.
    val retired = md.retiredWatermarks
    def hit(stats: Option[Map[String, ColRange]], fileSnap: Option[Long]): Boolean =
      bounds.forall { case (c, (lo, hi)) =>
        val trusted = retired.get(c).forall(w => fileSnap.exists(_ > w))
        stats.flatMap(s => if (trusted) s.get(c) else None) match {
          case Some(ColRange(Some(mn), Some(mx))) =>
            val cmp = cmps(c)
            lo.forall(l => cmp(mx, l) >= 0) && hi.forall(h => cmp(mn, h) <= 0)
          case _ => true // no (trustworthy) recorded range: can't skip
        }
      }
    snap.manifests.zipWithIndex.flatMap { case (m, i) =>
      if (!hit(snap.summaryAt(i), None)) Nil // whole manifest skipped, never opened
      else readManifest(m).collect {
        case e if hit(e.stats, IceTable.fileSnapId(e.file)) => e.file }
    }
  }

  /** Range-pruned scan: reads only files that can contain rows with
    * `colName` in [lower, upper]. The caller still applies the row-level
    * predicate (pruning is file-granular, like Iceberg manifests +
    * parquet row-group stats below it). Partition columns are restored
    * exactly as in a full scan. */
  def scanRange(colName: String, lower: Option[String], upper: Option[String]): DataFrame = {
    val md = metadata
    md.currentSnapshot match {
      case None => emptyFrame(md)
      case Some(snap) =>
        // route through readFilesOf so a merge-on-read snapshot's position
        // deletes are applied — a pruned scan must never resurrect rows a
        // full scan hides
        readFilesOf(md, snap, planFilesBounds(snap, Map(colName -> (lower, upper))))
    }
  }

  /** Export the current snapshot as a STANDARD Apache Iceberg v2 table at
    * `destLocation` — metadata only, zero data copy: the Iceberg manifests
    * reference this table's parquet files in place by absolute path (the
    * spec allows fully-qualified URIs anywhere), exactly how Iceberg's own
    * `add_files`/migrate procedures adopt existing parquet. Cost is one
    * tiny per-file count pass + O(#files) metadata, at any table size.
    * Returns the metadata.json path an external Iceberg reader consumes.
    * Unpartitioned tables only (hive-layout partition values live in
    * directory names, which an Iceberg partition spec models differently). */
  def exportIceberg(destLocation: String): String = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    val md = metadata
    require(md.partitionCols.isEmpty, "exportIceberg supports unpartitioned tables only")
    val entries = md.currentSnapshot.map(entriesOf).getOrElse(Nil)
    val files   = entries.map(e => new Path(location, e.file))
    // adopt the source's REAL field ids (sparse after drops) and its
    // read-by-id mode: the export re-points at the ORIGINAL parquet
    // files, so a rename-evolved source's files still carry pre-rename
    // column names and must keep binding by id
    val w = new IcebergFormat.Writer(spark, destLocation, md.schema,
      topLevelFieldIds = md.fields.map(_.id))
    if (md.readById) w.setReadById()
    // publish the source's clustering record: identity orders are
    // spec-expressible and export as real sort-orders (files keep their
    // claims through the id map below); the engine's z-order transform is
    // not — claiming identity would assert a lexicographic order the
    // files don't have — so it exports as a `graft.clustering` property
    val nameOfId  = md.fields.map(fi => fi.id -> fi.name).toMap
    val defaultId = md.default_sort_order_id.getOrElse(0)
    val orderIdMap: Map[Int, Int] = md.sortOrderList
      .filter(_.fields.forall(_.transform == "identity"))
      .sortBy(_.order_id == defaultId) // declare the default LAST (declare sets it)
      .map(o => o.order_id ->
        w.declareSortOrder(o.fields.map(f => nameOfId(f.source_id)))).toMap
    if (!orderIdMap.contains(defaultId)) w.clearDefaultSortOrder()
    md.sortOrderList.find(o =>
        o.order_id == defaultId && o.fields.exists(_.transform != "identity"))
      .foreach { o =>
        w.setProperty("graft.clustering",
          s"${o.fields.head.transform}(${o.fields.map(f => nameOfId(f.source_id)).mkString(",")})")
      }
    val soIdOf: Seq[Option[Int]] = entries.map(_.sortOrderId.flatMap(orderIdMap.get))
    if (files.isEmpty) { w.commit(Nil); return w.currentMetadataPath }
    // record_count is a required manifest field, and per-file min/max feed
    // the manifests' lower/upper bounds (manifest-level pruning for any
    // spec-compliant planner): one map-side pass, collected at O(#files) —
    // the same planning-sized driver data Iceberg itself holds when
    // writing manifests
    val statCols = md.schema.fields.filter(f => rangeable(f.dataType)).map(_.name)
    val aggs = count(lit(1)).as("n") +: statCols.flatMap(c =>
      Seq(min(col(c)).cast("string").as(s"min_$c"), max(col(c)).cast("string").as(s"max_$c")))
    val statIdOf = md.fields.map(fi => fi.name -> fi.id).toMap
    val statsReadSchema = if (md.readById) md.stampedSchema else md.schema
    val statsSpark = if (md.readById) IcebergFormat.idReadSession(spark) else spark
    val byFile = statsSpark.read.schema(statsReadSchema).parquet(files.map(_.toString): _*)
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
      .collect()
      .map { r =>
        val bounds = statCols.flatMap { c =>
          val fieldId = statIdOf(c) // REAL id (sparse after drops), never positional
          val dt      = md.schema(c).dataType
          for {
            mn <- Option(r.getAs[String](s"min_$c"))
            mx <- Option(r.getAs[String](s"max_$c"))
            lo <- IcebergFormat.encodeBound(dt, mn)
            hi <- IcebergFormat.encodeBound(dt, mx)
          } yield fieldId -> (lo, hi)
        }.toMap
        // input_file_name() is already URL-encoded: decode via URI (a
        // Hadoop Path would re-quote '%' and never match the listing side)
        new java.net.URI(r.getString(0)).getPath -> (r.getAs[Long]("n"), bounds)
      }
      .toMap
    val infos = files.zip(soIdOf).map { case (p, soId) =>
      val (n, bounds) = byFile.getOrElse(p.toUri.getPath,
        (0L, Map.empty[Int, (Array[Byte], Array[Byte])]))
      IcebergFormat.DataFileInfo(p.toString, n, fs.getFileStatus(p).getLen, bounds,
        sortOrderId = soId)
    }
    w.commit(infos)
    w.currentMetadataPath
  }

  /** Delete all table data + metadata (reference drop_table). */
  def drop(): Unit = fs.delete(location, true)

  /** Row-level delete (copy-on-write): rewrite the table without rows
    * *matching* `predicate` (SQL DELETE semantics — NULL-evaluating rows
    * are kept), as a new "delete" snapshot. Older snapshots still
    * time-travel to the pre-delete state. This arbitrary-predicate form
    * rewrites every file; use [[deleteRange]] when the predicate is a
    * range on a stats-tracked column to rewrite only affected files. */
  def deleteWhere(predicate: org.apache.spark.sql.Column): IceTable = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    appendInternal(
      scan().filter(not(coalesce(predicate, lit(false)))),
      replace = true, operation = "delete")
  }

  /** File-granular delete of rows with `colName` in [lower, upper]: files
    * whose min/max range cannot contain matches carry over by reference
    * (zero IO); only affected files rewrite. Carry is MANIFEST-granular,
    * as in Iceberg: a manifest with no affected file carries by pointer
    * (zero metadata IO); one with survivors is rewritten minus the
    * affected entries — so the commit cost tracks the delete's blast
    * radius, never the table size. The 100 TB delete path. */
  def deleteRange(colName: String, lower: String, upper: String): IceTable = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    val md       = metadata
    val snap     = md.currentSnapshot
    val affected = planFiles(colName, Some(lower), Some(upper))
    val hitSet   = affected.toSet
    val carried = snap.toSeq.flatMap(sn => sn.manifests.zipWithIndex.flatMap { case (m, i) =>
      val summary = sn.summaryAt(i).getOrElse(Map.empty)
      val entries = readManifest(m)
      if (!entries.exists(e => hitSet(e.file)))
        Some(m -> summary) // untouched: carry pointer + summary as-is
      else {
        val remaining = entries.filterNot(e => hitSet(e.file))
        if (remaining.isEmpty) None
        else Some(writeFilteredManifest(remaining) -> summarize(md.schema, remaining))
      }
    })
    val colType  = md.schema(colName).dataType
    val hit      = col(colName) >= lit(lower).cast(colType) && col(colName) <= lit(upper).cast(colType)
    val survivors = snap.map(readFilesOf(md, _, affected)).getOrElse(readFiles(md, affected))
      .filter(not(coalesce(hit, lit(false))))
    appendInternal(survivors, replace = true, operation = "delete", carry = carried)
  }

  /** Driver-side rewrite of a partially-affected manifest (entry subset
    * with stats carried verbatim). O(one manifest), never O(table). */
  private def writeFilteredManifest(entries: Seq[ManifestEntry]): String = {
    val rel = s"metadata/manifests/m-rw-${java.util.UUID.randomUUID().toString.take(8)}"
    val dir = new Path(location, rel)
    fs.mkdirs(dir)
    writeFileAtomic(new Path(dir, "part-00000.json"), entries.map(_.toJson).mkString("\n"))
    rel
  }

  /** Upsert (merge-by-key, copy-on-write): rows of `updates` replace
    * current rows with equal `keyCols`; unmatched update rows insert.
    * Updates are cast onto the frozen table schema (a widened column would
    * otherwise commit files the schema'd scan can no longer read) and must
    * be unique per key — Iceberg MERGE likewise rejects multiple matches. */
  def upsert(updates: DataFrame, keyCols: Seq[String]): IceTable = {
    import org.apache.spark.sql.functions.col
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val md = metadata
    val aligned = updates.select(
      md.schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    val dupKeys = aligned.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .count().filter(col("count") > 1).limit(1).count()
    require(dupKeys == 0, s"upsert updates contain duplicate keys on $keyCols")
    val kept = scan().join(aligned, keyCols, "left_anti")
    appendInternal(kept.unionByName(aligned), replace = true, operation = "upsert")
  }

  /** Multi-clause MERGE INTO (copy-on-write, file-granular) — SQL
    * `MERGE INTO t USING s ON t.key = s.key
    *    WHEN MATCHED AND deleteCond THEN DELETE
    *    WHEN MATCHED [AND updateCond] THEN UPDATE SET ...
    *    WHEN NOT MATCHED THEN INSERT *`.
    * Clause order is fixed delete-then-update (SQL MERGE evaluates clauses
    * in declaration order; first hit wins). Conditions and SET expressions
    * are SQL over the aliases `t` (target) and `s` (source).
    *
    * Scale shape: source keys bound a range, and only target files whose
    * `keyCol` min/max intersects it rewrite — every other manifest carries
    * by pointer exactly as [[deleteRange]], so commit cost tracks the
    * merge's blast radius, not table size. The single equi-join against
    * the source is Catalyst-planned (broadcast when the source is small).
    * Matching against only the affected files is exact: a target key equal
    * to any source key lies inside the source range, so its file is always
    * in the affected set. */
  def merge(
      source: DataFrame,
      keyCol: String,
      deleteCondSql: Option[String] = None,
      updateSetSql: Map[String, String] = Map.empty,
      updateCondSql: Option[String] = None,
      insertUnmatched: Boolean = true): IceTable = {
    import org.apache.spark.sql.functions.{coalesce, col, count, expr, lit, max, min, not, when}
    val md   = metadata
    val snap = md.currentSnapshot
    val aligned = source.select(
      md.schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    val dupKeys = aligned.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).count()
    require(dupKeys == 0, s"merge source has duplicate keys on $keyCol")
    val bounds = aligned.agg(
      min(col(keyCol)).cast("string").as("lo"), max(col(keyCol)).cast("string").as("hi")).head()
    if (bounds.isNullAt(0)) return this // empty source: nothing matches, nothing inserts
    val affected = planFiles(keyCol, Some(bounds.getString(0)), Some(bounds.getString(1)))
    val hitSet   = affected.toSet
    val carried = snap.toSeq.flatMap(sn => sn.manifests.zipWithIndex.flatMap { case (m, i) =>
      val summary = sn.summaryAt(i).getOrElse(Map.empty)
      val entries = readManifest(m)
      if (!entries.exists(e => hitSet(e.file)))
        Some(m -> summary)
      else {
        val remaining = entries.filterNot(e => hitSet(e.file))
        if (remaining.isEmpty) None
        else Some(writeFilteredManifest(remaining) -> summarize(md.schema, remaining))
      }
    })
    val t      = snap.map(readFilesOf(md, _, affected)).getOrElse(readFiles(md, affected)).alias("t")
    val srcA   = aligned.alias("s")
    val tKey   = col(s"t.$keyCol")
    val sKey   = col(s"s.$keyCol")
    val joined = t.join(srcA, tKey === sKey, "full_outer")
    val matched = tKey.isNotNull && sKey.isNotNull
    val delHit  = matched && coalesce(deleteCondSql.map(expr).getOrElse(lit(false)), lit(false))
    val updHit  = matched && not(delHit) &&
      coalesce(updateCondSql.map(expr).getOrElse(lit(true)), lit(false))
    val insRow  = tKey.isNull
    val kept = joined.filter(
      not(delHit) && (if (insertUnmatched) lit(true) else not(insRow)))
    val out = kept.select(md.schema.fields.map { f =>
      when(insRow, col(s"s.${f.name}"))
        .when(updHit, updateSetSql.get(f.name).map(expr).getOrElse(col(s"t.${f.name}")))
        .otherwise(col(s"t.${f.name}"))
        .cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    appendInternal(out, replace = true, operation = "merge", carry = carried)
  }

  /** Roll the current pointer back to an earlier snapshot (Iceberg
    * rollback-to-snapshot). A new metadata version commits with the old
    * snapshot as current — history is preserved, so the rolled-back-from
    * snapshot remains time-travelable and a later rollback can restore it.
    * No data IO at any table size: the operation rewrites one pointer. */
  def rollback(snapshotId: Long): IceTable = {
    val md = metadata
    require(md.snapshot(snapshotId).isDefined, s"no snapshot $snapshotId to roll back to")
    commit(md.copy(current_snapshot_id = snapshotId))
    this
  }

  // ------------------------------------------------ branches & tags (refs)

  /** Create a branch ref at `at` (default: the current main head). The
    * Git-like catalog surface of the reference's Nessie deployment
    * (`bot_iceberg_loader.py:245-281`): a branch is a movable named pointer
    * into the shared snapshot log — creating one writes one metadata
    * version and zero data, at any table size. */
  def createBranch(name: String, at: Option[Long] = None): IceTable =
    createRef(name, at, "branch")

  /** Create an immutable tag ref (a release pin: scans through it never
    * move, even as main advances). */
  def createTag(name: String, at: Option[Long] = None): IceTable =
    createRef(name, at, "tag")

  private def createRef(name: String, at: Option[Long], refType: String): IceTable = {
    val md = metadata
    require(name.nonEmpty && name != "main", s"invalid ref name: $name")
    require(!md.refMap.contains(name), s"ref $name already exists")
    val snapId = at.getOrElse(md.current_snapshot_id)
    require(snapId == 0L || md.snapshot(snapId).isDefined, s"no snapshot $snapId for ref $name")
    commit(md.copy(refs = Some(md.refMap + (name -> RefInfo(snapId, refType)))))
    this
  }

  def refs(): Map[String, RefInfo] = metadata.refMap

  /** Scan through a ref: "main" is the current pointer, anything else
    * resolves through the refs map (branch head or tag pin). */
  def scanRef(name: String): DataFrame =
    if (name == "main") scan()
    else scanSnapshot(
      metadata.refMap.getOrElse(name, throw new NoSuchElementException(s"no ref $name")).snapshot_id)

  /** Append `df` as a commit on `branch`: the new snapshot's base is the
    * branch head, the branch pointer advances, and main is untouched — the
    * isolated-ingest workflow Nessie branches exist for (load + validate on
    * a branch, then fast-forward main). */
  def appendToBranch(branch: String, df: DataFrame): IceTable =
    appendInternal(df, replace = false, ref = Some(branch))

  /** True iff `ancestorId` is on the parent chain of `descendantId`
    * (0 = the empty-table root, ancestor of everything). */
  def isAncestor(ancestorId: Long, descendantId: Long): Boolean = {
    if (ancestorId == descendantId || ancestorId == 0L) return true
    val md  = metadata
    var cur = md.snapshot(descendantId)
    while (cur.isDefined) {
      val p = cur.get.parent_snapshot_id.getOrElse(0L)
      if (p == ancestorId) return true
      cur = if (p == 0L) None else md.snapshot(p)
    }
    false
  }

  /** Fast-forward merge: move main to `branch`'s head. Requires main to be
    * an ancestor of the branch head (nothing committed to main since the
    * branch point) — the only merge shape that needs no data rewrite; a
    * diverged merge must instead replay commits (append the branch delta),
    * exactly as in Nessie/Git. */
  def fastForward(branch: String): IceTable = {
    val md   = metadata
    val info = md.refMap.getOrElse(branch, throw new NoSuchElementException(s"no ref $branch"))
    require(info.ref_type == "branch", s"cannot fast-forward to tag $branch")
    require(isAncestor(md.current_snapshot_id, info.snapshot_id),
      s"main is not an ancestor of $branch — not a fast-forward")
    commit(md.copy(current_snapshot_id = info.snapshot_id))
    this
  }

  /** CHERRY-PICK (Iceberg `cherrypick_snapshot`): apply ONE snapshot's
    * changes onto the current main head when a plain fast-forward is
    * impossible because main has diverged since the branch point. Only
    * APPEND snapshots qualify (their delta is exactly the manifests they
    * added over their parent — a pure file-set union; replace/delete
    * snapshots rewrite history and cannot be replayed by reference). The
    * pick is metadata-only: main's head manifests ++ the source's delta
    * manifests become one new snapshot, zero data IO at any table size.
    * The source snapshot itself stays where it is (its branch is
    * untouched), exactly like a Git cherry-pick. */
  def cherryPick(snapshotId: Long): IceTable = {
    val md  = metadata
    val src = md.snapshot(snapshotId).getOrElse(
      throw new NoSuchElementException(s"no snapshot $snapshotId to cherry-pick"))
    require(src.operation == "append",
      s"cherry-pick supports append snapshots only, got '${src.operation}'")
    require(!isAncestor(snapshotId, md.current_snapshot_id),
      s"snapshot $snapshotId is already in main's history")
    // durable double-apply guard: every pick RECORDS its source id, and a
    // re-pick is refused if that id appears anywhere in main's ancestry.
    // The manifest-path check below is insufficient alone — a compact()
    // after the first pick rewrites main's manifests, the paths no longer
    // match, and a path-only guard would silently duplicate every row.
    require(!pickedSources(md).contains(snapshotId),
      s"snapshot $snapshotId was already cherry-picked onto main")
    val parentId = src.parent_snapshot_id.getOrElse(0L)
    val parentManifests: Set[String] =
      if (parentId == 0L) Set.empty
      else md.snapshot(parentId).getOrElse(throw new IllegalStateException(
        s"cherry-pick needs the source's parent snapshot $parentId in the log " +
          "(expired?)")).manifests.toSet
    val delta = src.manifests.zipWithIndex.filterNot { case (m, _) => parentManifests(m) }
    require(delta.nonEmpty, s"snapshot $snapshotId added no manifests — nothing to pick")
    val head = md.currentSnapshot
    val headManifests = head.toSeq.flatMap(_.manifests)
    require(delta.forall { case (m, _) => !headManifests.contains(m) },
      s"snapshot $snapshotId's delta is already applied to main")
    val baseSums = head.toSeq.flatMap(sn =>
      sn.manifests.indices.map(i => sn.summaryAt(i).getOrElse(Map.empty[String, ColRange])))
    val newId = md.snapshots.map(_.snapshot_id).foldLeft(0L)(math.max) + 1
    val snap = Snapshot(
      snapshot_id = newId,
      timestamp_ms = System.currentTimeMillis(),
      operation = "append", // the replayed change IS an append (incremental reads see it)
      manifests = headManifests.toList ++ delta.map(_._1),
      manifest_summaries = Some((baseSums ++ delta.map { case (_, i) =>
        src.summaryAt(i).getOrElse(Map.empty[String, ColRange]) }).toList),
      parent_snapshot_id = head.map(_.snapshot_id),
      commit_token = None,
      // an append snapshot introduces no deletes; main's live delete debt carries
      delete_manifests = head.flatMap(_.delete_manifests),
      source_snapshot_id = Some(snapshotId))
    commit(md.copy(snapshots = md.snapshots :+ snap, current_snapshot_id = newId))
    this
  }

  /** Guard for the read-by-id flip (rename/drop column): those operations
    * commit metadata that makes every subsequent scan bind file columns by
    * parquet field id — on a table whose data files carry NO id stamps
    * (written by a pre-stamping build, or foreign parquet adopted as-is) a
    * successful-looking ALTER would brick every scan. Probe ONE file per
    * manifest (a manifest is one commit, written by one build, so stamping
    * is homogeneous within it — O(commits) footer reads, each a few KB,
    * never O(files)) and refuse with a remediation message when unstamped. */
  private def requireFieldIdStamps(md: TableMetadata, op: String): Unit = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    md.currentSnapshot.toSeq.flatMap(_.manifests).foreach { m =>
      readManifest(m).headOption.foreach { e =>
        val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new Path(location, e.file), conf))
        val msg = try fr.getFooter.getFileMetaData.getSchema finally fr.close()
        val unstamped = msg.getFields.asScala.filter(_.getId == null).map(_.getName)
        require(unstamped.isEmpty,
          s"cannot $op: data file ${e.file} lacks parquet field ids on " +
            s"[${unstamped.mkString(", ")}] — flipping to read-by-id would make " +
            "every scan of this file fail; rewrite data files first (compact())")
      }
    }
  }

  /** Source-snapshot ids of every cherry-pick in main's ancestry (walked
    * over parent edges from the current head — O(commits), metadata only). */
  private def pickedSources(md: TableMetadata): Set[Long] = {
    val out = scala.collection.mutable.Set.empty[Long]
    var cur = md.currentSnapshot
    while (cur.isDefined) {
      cur.get.source_snapshot_id.foreach(out += _)
      val p = cur.get.parent_snapshot_id.getOrElse(0L)
      cur = if (p == 0L) None else md.snapshot(p)
    }
    out.toSet
  }

  /** Delete a branch or tag ref (snapshots stay; expiration reclaims them
    * once unreferenced). */
  def dropRef(name: String): IceTable = {
    val md = metadata
    require(md.refMap.contains(name), s"no ref $name")
    commit(md.copy(refs = Some(md.refMap - name)))
    this
  }

  /** Incremental read: rows appended strictly after `fromSnapshotId` up to
    * and including `toSnapshotId` (Iceberg incremental append scan — the
    * batch CDC feed). Because appends carry prior files forward by
    * reference, the delta is exactly the file-list difference, so the scan
    * reads only the new files — at 100 TB an incremental consumer pays for
    * the day's data, never the table. Snapshots produced by replace-style
    * operations (compact/delete/upsert) rewrite history rather than append
    * it; the file diff across them would misreport rewritten rows as new,
    * so they're rejected. */
  def scanIncremental(fromSnapshotId: Long, toSnapshotId: Long): DataFrame = {
    val md = metadata
    require(fromSnapshotId <= toSnapshotId, s"from $fromSnapshotId > to $toSnapshotId")
    val from = md.snapshot(fromSnapshotId)
      .getOrElse(throw new NoSuchElementException(s"snapshot $fromSnapshotId"))
    val to = md.snapshot(toSnapshotId)
      .getOrElse(throw new NoSuchElementException(s"snapshot $toSnapshotId"))
    val between = md.snapshots
      .filter(s => s.snapshot_id > fromSnapshotId && s.snapshot_id <= toSnapshotId)
    val nonAppend = between.filterNot(_.operation == "append")
    require(nonAppend.isEmpty,
      s"incremental scan crosses non-append snapshots: ${nonAppend.map(_.operation).distinct.mkString(",")}")
    // a rollback can fork history: ids between `from` and `to` may lie on a
    // discarded line, and the naive file diff would then misreport rows the
    // rollback removed. Only a true ancestor path is a valid CDC window.
    require(isAncestor(fromSnapshotId, toSnapshotId),
      s"snapshot $fromSnapshotId is not an ancestor of $toSnapshotId — not an incremental window")
    // append-only window ⇒ the delta is exactly the manifests `to` gained
    // over `from`: the reader opens only the delta's manifests, so an
    // incremental consumer's planning cost is O(new commits) too
    val fromManifests = from.manifests.toSet
    val delta         = to.manifests.filterNot(fromManifests)
    readFiles(md, delta.flatMap(readManifest(_).map(_.file)))
  }

  /** Row-level CHANGELOG of the snapshot window (from, to] — the CDC feed
    * Iceberg exposes as `create_changelog_view`: one row per changed row,
    * with `_change_type` ('insert' | 'delete') and `_commit_snapshot_id`.
    * Appends and MERGE/UPDATE insert files emit +I rows; merge-on-read
    * delta commits emit -D rows by SEMI-joining the parent's data files
    * against exactly the delete files that commit ADDED (earlier deletes
    * aren't re-emitted, and a delta scan only ever targets live rows, so
    * the feed is exact). UPDATE appears as delete+insert, the standard
    * MoR changelog shape.
    *
    * Scale: per commit, the -D side reads ONLY parent files inside the
    * new delete entries' recorded path ranges (manifest-stat pruning,
    * driver does O(files) string compares), and the +I side reads only
    * the added files — a day's CDC costs a day's changes. Rewrite-style
    * snapshots (compact / copy-on-write DML / overwrite) are rejected:
    * they rewrite history rather than change rows, and diffing them
    * row-wise would cost two full scans. */
  def scanChangelog(fromSnapshotId: Long, toSnapshotId: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val md = metadata
    require(fromSnapshotId <= toSnapshotId, s"from $fromSnapshotId > to $toSnapshotId")
    val byId = md.snapshots.map(s => s.snapshot_id -> s).toMap
    // walk the parent chain to -> from (rollbacks fork history: only a
    // true ancestor path is a valid CDC window), then restore commit order
    var cur = toSnapshotId
    var chain: List[Snapshot] = Nil
    while (cur != fromSnapshotId && cur != 0L) {
      val sn = byId.getOrElse(cur, throw new NoSuchElementException(s"snapshot $cur"))
      chain = sn :: chain
      cur = sn.parent_snapshot_id.getOrElse(0L)
    }
    require(cur == fromSnapshotId,
      s"snapshot $fromSnapshotId is not an ancestor of $toSnapshotId — not a changelog window")
    val parts = chain.flatMap { sn =>
      val parent          = sn.parent_snapshot_id.flatMap(byId.get)
      val parentManifests = parent.toSeq.flatMap(_.manifests).toSet
      val parentDeletes   = parent.toSeq.flatMap(_.deleteManifests).toSet
      require(parentManifests.subsetOf(sn.manifests.toSet),
        s"changelog window crosses a rewrite snapshot " +
          s"(${sn.operation} ${sn.snapshot_id}) — rewrites restate files, not rows")
      val newDataFiles =
        sn.manifests.filterNot(parentManifests).flatMap(readManifest(_).map(_.file))
      val inserted =
        if (newDataFiles.isEmpty) None
        else Some(readFiles(md, newDataFiles).withColumn("_change_type", lit("insert")))
      val newDelEntries = sn.deleteManifests.filterNot(parentDeletes).flatMap(readManifest)
      val deleted =
        if (newDelEntries.isEmpty) None
        else {
          val ranges = newDelEntries.map(_.stats.flatMap(_.get("file_path")))
          def covered(f: String): Boolean = ranges.exists {
            case Some(r) => r.min.forall(_.compareTo(f) <= 0) && r.max.forall(f.compareTo(_) <= 0)
            case None    => true // statless delete file: conservative keep
          }
          val cands    = parent.toSeq.flatMap(filesOf).filter(covered)
          val delPaths = newDelEntries.map(e => new Path(location, e.file).toString)
          Some(readFiles(md, cands, Some(delPaths), "left_semi")
            .withColumn("_change_type", lit("delete")))
        }
      (inserted.toSeq ++ deleted.toSeq)
        .map(_.withColumn("_commit_snapshot_id", lit(sn.snapshot_id)))
    }
    if (parts.isEmpty)
      emptyFrame(md)
        .withColumn("_change_type", lit(""))
        .withColumn("_commit_snapshot_id", lit(0L))
    else parts.reduce(_ unionByName _)
  }

  /** File paths ADDED in the append-only snapshot window (from, to] — the
    * planning primitive behind both scanIncremental and the V2 streaming
    * source's micro-batches. from = 0 means everything up to `to`. */
  private[graft] def incrementalFiles(fromSnapshotId: Long, toSnapshotId: Long): Seq[String] = {
    if (fromSnapshotId >= toSnapshotId) return Nil
    val md = metadata
    val to = md.snapshot(toSnapshotId)
      .getOrElse(throw new NoSuchElementException(s"snapshot $toSnapshotId"))
    if (fromSnapshotId == 0L) {
      // the everything-up-to-`to` initial window must fail as loudly as
      // the from>0 non-append guard does: emitting the file list of a
      // merge-on-read snapshot would resurrect its deleted rows (this
      // planning primitive returns bare files — no delete application)
      require(!hasDeletes(to),
        s"incremental window (0, $toSnapshotId] covers a snapshot with " +
          "merge-on-read position deletes; compact the table first or start " +
          "the stream from a delete-free snapshot")
      return filesOf(to)
    }
    val from = md.snapshot(fromSnapshotId)
      .getOrElse(throw new NoSuchElementException(s"snapshot $fromSnapshotId"))
    val between = md.snapshots
      .filter(s => s.snapshot_id > fromSnapshotId && s.snapshot_id <= toSnapshotId)
    val nonAppend = between.filterNot(_.operation == "append")
    require(nonAppend.isEmpty,
      s"incremental window crosses non-append snapshots: " +
        nonAppend.map(_.operation).distinct.mkString(","))
    val fromManifests = from.manifests.toSet
    to.manifests.filterNot(fromManifests).flatMap(readManifest(_).map(_.file))
  }

  /** Iceberg-style expire-snapshots maintenance: keep the most recent
    * `keepLast` snapshots, delete the metadata entries of older ones and
    * any data file no kept snapshot references. Time travel remains valid
    * for the kept window; storage for dropped history is reclaimed. */
  def expireSnapshots(keepLast: Int): IceTable = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val md = metadata
    // main (the current pointer) is itself a ref head — a rolled-back
    // current snapshot outside the keep-last window must survive too
    val refHeads = md.refMap.values.map(_.snapshot_id).toSet + md.current_snapshot_id
    val keep = (md.snapshots.sortBy(_.snapshot_id).takeRight(keepLast) ++
      md.snapshots.filter(s => refHeads.contains(s.snapshot_id)))
      .distinctBy(_.snapshot_id).sortBy(_.snapshot_id)
    if (keep.size == md.snapshots.size) return this
    // splice expired snapshots out of the commit DAG: a kept snapshot whose
    // parent is dropped re-parents to its nearest kept ancestor, so
    // ancestry checks (fastForward, scanIncremental) keep working across
    // the expired gap instead of dead-ending on a missing id.
    val keptIds = keep.map(_.snapshot_id).toSet
    val byId    = md.snapshots.map(s => s.snapshot_id -> s).toMap
    def nearestKept(id: Long): Long = {
      var cur = id
      while (cur != 0L && !keptIds.contains(cur))
        cur = byId.get(cur).flatMap(_.parent_snapshot_id).getOrElse(0L)
      cur
    }
    val spliced = keep.map { sn =>
      val p  = sn.parent_snapshot_id.getOrElse(0L)
      val np = nearestKept(p)
      if (np == p) sn
      else sn.copy(parent_snapshot_id = if (np == 0L) None else Some(np))
    }
    // idempotency tokens outlive their snapshots: a replayed streaming
    // batch must stay a no-op even after maintenance expired its commit
    val dropped       = md.snapshots.filterNot(s => keptIds.contains(s.snapshot_id))
    val retiredTokens = (md.retired_tokens.getOrElse(Nil) ++ dropped.flatMap(_.commit_token)).distinct
    // delete files (MoR) are live exactly like data files: a kept snapshot's
    // position deletes must survive or its reads resurrect deleted rows
    val referenced = (keep.flatMap(filesOf) ++ keep.flatMap(deleteEntriesOf).map(_.file)).toSet
    val orphaned = (md.snapshots.flatMap(filesOf) ++
      md.snapshots.flatMap(deleteEntriesOf).map(_.file)).toSet -- referenced
    commit(md.copy(snapshots = spliced,
      retired_tokens = if (retiredTokens.isEmpty) None else Some(retiredTokens)))
    // snapshot dirs with no referenced file left are removed recursively
    // (also sweeps non-data markers like _SUCCESS); partially-referenced
    // dirs only lose their orphaned parquet files
    val liveDirs = referenced.map(snapDirOf)
    val (deadDirFiles, looseFiles) = orphaned.partition(f => !liveDirs.contains(snapDirOf(f)))
    looseFiles.foreach(f => fs.delete(new Path(location, f), false))
    deadDirFiles.map(snapDirOf).foreach { rel =>
      val dir = new Path(location, rel)
      if (fs.exists(dir)) fs.delete(dir, true)
    }
    // manifests only expired snapshots referenced are reclaimed too
    // (delete manifests alike)
    val liveManifests = (keep.flatMap(_.manifests) ++ keep.flatMap(_.deleteManifests)).toSet
    ((md.snapshots.flatMap(_.manifests) ++ md.snapshots.flatMap(_.deleteManifests)).toSet --
      liveManifests).foreach { rel =>
      val dir = new Path(location, rel)
      if (fs.exists(dir)) fs.delete(dir, true)
    }
    this
  }

  /** Rewrite-position-deletes maintenance (Iceberg's
    * `rewrite_position_delete_files`): fold the current snapshot's delete
    * files into a few range-sorted ones, dropping (a) entries that
    * reference data files no longer in the snapshot (debris carried by
    * CoW rewrites — harmless but paid for on every read-plan) and (b)
    * positions recorded twice by racing delta commits. Data manifests are
    * untouched; the commit swaps ONLY the delete-manifest list. Sorting
    * by `file_path` gives each output file a tight path range, so
    * reader-side delete-file pruning stays selective as debt grows — the
    * knob that keeps MoR read amplification bounded between compactions.
    *
    * All row work is one distributed semi-join + distinct + range
    * repartition; the driver handles O(delete files) metadata. Racing
    * DELTA commits are detected, not absorbed: if the delete-manifest
    * list moved since planning, the commit aborts with
    * ConcurrentModificationException (rerun the maintenance) — silently
    * dropping a racer's delete files would resurrect its deleted rows. */
  def rewritePositionDeletes(): IceTable = {
    import org.apache.spark.sql.functions.col
    val md0   = metadata
    val snap0 = md0.currentSnapshot.getOrElse(return this)
    val planned = snap0.deleteManifests
    if (planned.isEmpty) return this
    val dels = deleteEntriesOf(snap0)
    val delDF = spark.read.schema(IceTable.PositionDeleteSchema)
      .parquet(dels.map(e => new Path(location, e.file).toString): _*)
    val liveDF = spark.createDataFrame(
      spark.sparkContext.parallelize(filesOf(snap0).map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file_path",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val cleaned = delDF.join(liveDF, Seq("file_path"), "left_semi").distinct()
    val kept = cleaned.count() // maintenance-sized extra pass; exact file sizing below
    val snapId0 = md0.snapshots.map(_.snapshot_id).foldLeft(0L)(math.max) + 1
    val newManifest: Option[String] =
      if (kept == 0L) None
      else {
        val nFiles = math.max(1, math.ceil(kept / 4000000.0).toInt)
        val rel = s"data/deletes-rw-${java.util.UUID.randomUUID().toString.take(8)}"
        val dir = new Path(location, rel)
        cleaned.repartitionByRange(nFiles, col("file_path"), col("pos"))
          .sortWithinPartitions("file_path", "pos")
          .write.parquet(dir.toString)
        val files = {
          val it  = fs.listFiles(dir, true)
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (it.hasNext) {
            val p = it.next().getPath
            if (p.getName.endsWith(".parquet")) buf += relativize(p.toString, rel)
          }
          buf.sorted.toIndexedSeq
        }
        val m = writeManifest(IceTable.PositionDeleteSchema, dir, rel, files, snapId0,
          exactCols = Set("file_path"))
        // drop zero-row part files from the manifest (a skewed range split
        // can leave empty partitions; a statless delete file would defeat
        // reader-side pruning forever)
        val nonEmpty = readManifest(m).filter(_.rows.exists(_ > 0L))
        if (nonEmpty.isEmpty) None
        else if (nonEmpty.size == readManifest(m).size) Some(m)
        else Some(writeFilteredManifest(nonEmpty))
      }
    var attempt = 0
    while (attempt < 10) {
      val v    = currentVersion
      val md   = metadataAt(v)
      val base = md.currentSnapshot.getOrElse(
        throw new IllegalStateException("table lost its current snapshot mid-maintenance"))
      if (base.deleteManifests != planned)
        throw new java.util.ConcurrentModificationException(
          s"delete manifests of $location moved during rewritePositionDeletes — rerun")
      val snapId = md.snapshots.map(_.snapshot_id).foldLeft(0L)(math.max) + 1
      val snap = base.copy(
        snapshot_id = snapId,
        timestamp_ms = System.currentTimeMillis(),
        operation = "rewrite-deletes",
        parent_snapshot_id = Some(base.snapshot_id),
        commit_token = None,
        delete_manifests = newManifest.map(List(_)))
      val newMd = md.copy(snapshots = md.snapshots :+ snap, current_snapshot_id = snapId)
      if (commitCasAt(v + 1, newMd)) return this
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"rewrite-deletes commit to $location lost the commit race 10 times — giving up")
  }

  /** Orphan-file cleanup (Iceberg's `remove_orphan_files`): delete parquet
    * files under the table's `data/` tree that NO snapshot references —
    * the debris an interrupted write leaves when its snapshot never
    * commits. Referenced = every file of every snapshot, current or not
    * (time travel must keep working), so a committed file can never be
    * swept. `olderThanMillis` is the in-flight-write guard: a V2 (or
    * library) write stages parquet under data/ BEFORE its metadata CAS
    * commit, so an unreferenced-but-recent file may be a commit about to
    * land, not debris — sweeping it would corrupt the table the moment
    * that commit's manifest references it. Iceberg's remove_orphan_files
    * defaults the same cutoff to 3 days; pass 0 only when no writer can
    * be live (tests, decommission). Returns the deleted table-relative
    * paths. The listing is the only O(table-files) step — at scale it's
    * the same recursive listing a compaction pays,
    * executor-parallelizable, and it touches zero committed data. */
  def removeOrphans(olderThanMillis: Long = IceTable.DefaultOrphanAgeMs): Seq[String] = {
    val md         = metadata
    val referenced = (md.snapshots.flatMap(filesOf) ++
      md.snapshots.flatMap(deleteEntriesOf).map(_.file)).toSet
    val dataDir    = new Path(location, "data")
    if (!fs.exists(dataDir)) return Nil
    val cutoff  = System.currentTimeMillis() - olderThanMillis
    val locPath = location.toUri.getPath.stripSuffix("/")
    val it      = fs.listFiles(dataDir, true)
    val orphans = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      val p  = st.getPath
      if (p.getName.endsWith(".parquet") && st.getModificationTime <= cutoff) {
        val rel = p.toUri.getPath.stripPrefix(locPath).stripPrefix("/")
        if (!referenced.contains(rel)) orphans += rel
      }
    }
    orphans.foreach(rel => fs.delete(new Path(location, rel), false))
    orphans.toSeq
  }
}

object IceTable {

  /** Default orphan-file age cutoff (3 days, matching Iceberg's
    * remove_orphan_files default): younger unreferenced files are treated
    * as possibly-in-flight staged writes, never swept. */
  val DefaultOrphanAgeMs: Long = 3L * 24 * 60 * 60 * 1000

  /** Schema of merge-on-read position-delete files (Iceberg v2's
    * position-delete spec shape): the manifest-relative DATA file path and
    * the 0-based row position within it. */
  val PositionDeleteSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file_path",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** Create a new table directory with a v1 metadata (no data yet). */
  def create(
      spark: SparkSession,
      location: String,
      name: String,
      namespace: String,
      schema: org.apache.spark.sql.types.StructType,
      partitionColumns: Seq[String] = Nil): IceTable = {
    require(partitionColumns.forall(schema.fieldNames.contains),
      s"partition columns $partitionColumns not all present in schema")
    // IceLite inherits the reference's flat 8-primitive type surface
    // (SURVEY.md §1.2; TypeNormalizer). Reject anything outside it HERE,
    // with a clear error, instead of failing obscurely downstream in
    // min/max stats collection or export. (The Iceberg v2 layer in
    // IcebergFormat has its own, wider type system.)
    locally {
      import org.apache.spark.sql.types._
      val unsupported = schema.fields.filterNot(f => f.dataType match {
        case StringType | DoubleType | FloatType | LongType | IntegerType |
             TimestampType | TimestampNTZType | DateType | BooleanType => true
        case _: DecimalType => true // flat, parquet-native; excluded from min/max skipping only
        case _ => false
      })
      require(unsupported.isEmpty,
        "IceLite tables support only the flat primitive surface " +
          "{string, double, float, long, int, decimal, timestamp, timestamp_ntz, date, boolean} " +
          "(SURVEY.md §1.2); unsupported column(s): " +
          unsupported.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ") +
          ". Run TypeNormalizer.normalize(df) first, or use the Iceberg v2 writer for nested types.")
    }
    val t  = new IceTable(spark, new Path(location))
    val fs = t.location.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(t.location)) throw new IllegalStateException(s"table location exists: $location")
    fs.mkdirs(new Path(t.location, "metadata"))
    t.writeFileAtomic(
      new Path(new Path(t.location, "metadata"), "v1.json"),
      TableMetadata.create(name, namespace, location, schema, partitionColumns).toJson)
    t.writeFileAtomic(new Path(new Path(t.location, "metadata"), "version-hint.text"), "1")
    t
  }

  /** Load an existing table from its location. */
  def load(spark: SparkSession, location: String): IceTable =
    new IceTable(spark, new Path(location))

  private val FileSnapPat = raw"(?:^|/)snap-(\d+)-".r.unanchored

  /** Snapshot id a data file was committed under, parsed from its
    * `data/snap-<id>-<uuid>` path segment (None for foreign layouts) —
    * the per-file era witness the retired-name stats rule keys off. */
  private[icelite] def fileSnapId(rel: String): Option[Long] = rel match {
    case FileSnapPat(id) => scala.util.Try(id.toLong).toOption
    case _               => None
  }

  /** Scan straight from a metadata file path (reference `iceberg_scan`
    * entry, SURVEY.md §2.1 S11). The scan is pinned to the *given* metadata
    * version — reading v2.json after later commits yields the v2 state,
    * matching iceberg_scan's as-of-this-metadata contract. */
  def scanMetadataFile(spark: SparkSession, metadataPath: String): org.apache.spark.sql.DataFrame = {
    val p = new Path(metadataPath)
    val version = p.getName.stripPrefix("v").stripSuffix(".json")
    require(p.getName.startsWith("v") && p.getName.endsWith(".json") && version.forall(_.isDigit),
      s"not a metadata file path: $metadataPath")
    val t  = new IceTable(spark, p.getParent.getParent)
    val md = t.metadataAt(version.toInt)
    md.currentSnapshot match {
      // readFilesOf, not readFiles: the pinned snapshot's merge-on-read
      // position deletes apply here exactly as in scan()/scanSnapshot
      case Some(snap) => t.readFilesOf(md, snap, t.filesOf(snap))
      case None       => t.emptyFrame(md)
    }
  }

  /** Per-JVM cache of parsed manifests, keyed by absolute dir path.
    * Sound because manifests are immutable once committed (UUID-suffixed,
    * never rewritten in place); bounded by total cached ENTRY count (file
    * count, the actual memory driver — a handful of 10⁶-entry manifests
    * would blow a dir-count bound) with a whole-cache reset at the limit. */
  private val manifestEntries =
    new java.util.concurrent.ConcurrentHashMap[String, IndexedSeq[ManifestEntry]]()
  private val cachedEntryCount = new java.util.concurrent.atomic.AtomicLong(0L)
  private val maxCachedEntries = 4_000_000L

  private[icelite] def manifestCache(key: String)(
      load: => IndexedSeq[ManifestEntry]): IndexedSeq[ManifestEntry] = {
    val hit = manifestEntries.get(key)
    if (hit != null) hit
    else {
      val v = load
      manifestParses.incrementAndGet()
      if (cachedEntryCount.addAndGet(v.size.toLong) > maxCachedEntries) {
        manifestEntries.clear()
        cachedEntryCount.set(v.size.toLong)
      }
      manifestEntries.put(key, v)
      v
    }
  }

  /** Count of actual manifest parses (cache misses) — observability for
    * specs asserting summary-level skipping never opens a pruned manifest. */
  private[graft] val manifestParses = new java.util.concurrent.atomic.AtomicLong(0L)

  /** URI schemes whose stores offer CONDITIONAL CREATE (`PUT
    * If-None-Match`, surfaced by Hadoop as `create(p, overwrite=false)`)
    * but NOT atomic rename — the object-store commit contract. The CAS
    * commit publishes metadata through conditional create on these;
    * everything else (data/manifest writes) only needs atomic-visibility
    * PUTs, which every object store gives per object. `objstore` is the
    * test shim (ObjectStoreCommitSpec). */
  private[graft] val conditionalPutSchemes: Set[String] =
    Set("objstore", "s3", "s3a", "gs", "abfs", "r2")

  /** Per-destination JVM lock backing writeFileIfAbsent's exists+rename
    * CAS on filesystems whose rename overwrites (local FS). Keyed by the
    * metadata file path; bounded by distinct commit destinations. */
  private val commitLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[icelite] def commitLock(key: String): Object =
    commitLocks.computeIfAbsent(key, _ => new Object)

  private[graft] def resetManifestCacheForTest(): Unit = {
    manifestEntries.clear()
    cachedEntryCount.set(0L)
    manifestParses.set(0L)
  }
}
