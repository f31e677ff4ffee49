package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Idempotent keyed-parquet MERGE sink for `foreachBatch` — the concrete
  * writer behind [[EventsStream.runForeachBatch]]'s documented contract:
  * after a crash Structured Streaming REPLAYS the last uncommitted
  * micro-batch with the SAME batchId, so exactly-once table maintenance
  * needs a sink that (a) skips batches it has already committed and (b) is
  * harmless if re-applied anyway. This sink provides both layers:
  *
  *   1. a `_committed_batch` marker under the table dir records the highest
  *      applied batchId — a replay with `batchId ≤ marker` is a no-op;
  *   2. the merge itself is key-replacement (current ⟕̸ batch ∪ batch — an
  *      anti-join of current state against the batch's keys, union the
  *      batch), which re-applied with identical rows reproduces the same
  *      table — so even a crash BETWEEN data swap and marker write (the
  *      unavoidable non-atomic window on a plain filesystem) converges.
  *
  * Swap protocol: the merged table is written to `.tmp-<batchId>`, the live
  * `data` dir is renamed aside, tmp renamed in, old state deleted, marker
  * written last (itself tmp-then-rename). Rename is the only mutation of the
  * live path — readers see the old or the new table, never a partial write.
  * A crash BETWEEN the two renames leaves `data` absent and `.old-<id>` as
  * the only copy; [[recoverHalfSwap]] restores it at the top of every batch
  * before anything reads or deletes, closing that loss window.
  *
  * 100 TB shape: per micro-batch this is one anti-join keyed on the upsert
  * key (sort-merge at table scale, broadcast when the batch is small — the
  * usual case) plus a rewrite of the table. A full rewrite per batch is the
  * plain-parquet cost of MERGE (LSM-style formats amortize it with deltas);
  * the operator semantics — keyed replacement, replay-safe — are what a
  * Delta/Iceberg MERGE INTO provides, expressed on the primitive store.
  * Partition the table dir by a key prefix and rewrite only touched
  * partitions to bound the per-batch cost; the marker/swap protocol is
  * unchanged per partition.
  */
object UpsertSink {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Highest batchId already merged into `tableDir`, or -1. A truncated /
    * unparseable marker (crash mid-write on a filesystem without atomic
    * create) also reads as -1: re-apply is idempotent, so degrading to
    * "nothing committed" is safe where throwing would wedge the sink.
    */
  def committedBatch(spark: SparkSession, tableDir: String): Long = {
    val f = fs(spark, tableDir)
    val marker = new Path(tableDir, "_committed_batch")
    if (!f.exists(marker)) -1L
    else {
      val in = f.open(marker)
      val txt =
        try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      scala.util.Try(txt.toLong).getOrElse(-1L)
    }
  }

  /** Repair a half-completed swap left by a crash between the two renames:
    * `data` was moved aside to `.old-<id>` but the merged table was never
    * published, so the `.old` dir is the ONLY surviving copy of the table.
    * Restore it before any read or merge — without this, a replay would
    * compute merged = batch-only and then delete the old dir, losing all
    * prior state. No-op whenever `data` exists.
    */
  private def recoverHalfSwap(f: FileSystem, tableDir: String): Unit = {
    val data = new Path(tableDir, "data")
    if (f.exists(data)) return
    // only dirs whose suffix parses as a batchId participate — a stray
    // foreign `.old-*` must not wedge recovery with a parse error
    val olds = Option(f.globStatus(new Path(tableDir, ".old-*")))
      .getOrElse(Array.empty)
      .filter(_.getPath.getName.stripPrefix(".old-").forall(_.isDigit))
    if (olds.isEmpty) return
    val latest = olds
      .maxBy(_.getPath.getName.stripPrefix(".old-").toLong).getPath
    require(f.rename(latest, data), s"could not restore $latest to $data")
    olds.map(_.getPath).filterNot(_ == latest).foreach(f.delete(_, true))
  }

  /** Current live table (empty-safe: before the first commit there is no
    * data dir and the caller gets None).
    */
  def currentTable(spark: SparkSession, tableDir: String): Option[DataFrame] = {
    val data = new Path(tableDir, "data")
    if (fs(spark, tableDir).exists(data)) Some(spark.read.parquet(data.toString))
    else None
  }

  /** Merge one micro-batch into the keyed table: rows in `batch` replace
    * current rows with the same `keyCol`; unseen keys insert. Skips
    * already-committed batchIds (the replay contract). The batch is
    * deduplicated per key by highest `seqCol` first, so one micro-batch
    * carrying several versions of a key applies only the latest.
    */
  def upsertBatch(batch: DataFrame, batchId: Long, tableDir: String,
      keyCol: String, seqCol: String): Unit = {
    import org.apache.spark.sql.functions.{col, max_by, struct}
    val spark = batch.sparkSession
    val f = fs(spark, tableDir)
    f.mkdirs(new Path(tableDir))
    recoverHalfSwap(f, tableDir) // crash between the two renames: restore
    if (batchId <= committedBatch(spark, tableDir)) return // replayed: done
    // in-batch latest-wins: one map-side-combining aggregation
    val cols = batch.columns
    val latest = batch
      .groupBy(col(keyCol))
      .agg(max_by(struct(cols.filter(_ != keyCol).map(col): _*), col(seqCol))
        .as("_payload"))
      .select(col(keyCol) +: cols.filter(_ != keyCol)
        .map(c => col(s"_payload.$c").as(c)): _*)
    val merged = currentTable(spark, tableDir) match {
      case Some(cur) => cur.join(latest, Seq(keyCol), "left_anti")
        .unionByName(latest)
      case None => latest
    }
    val tmp = new Path(tableDir, s".tmp-$batchId")
    val data = new Path(tableDir, "data")
    val old = new Path(tableDir, s".old-$batchId")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // `data` exists here (recoverHalfSwap ran), so every remaining
    // digit-suffixed `.old-<batchId>` is garbage from a crash after
    // publish — safe to clear before moving the live table aside. The
    // filter matches recoverHalfSwap's: a foreign `.old-*` this sink
    // didn't write is neither parsed there nor destroyed here.
    Option(f.globStatus(new Path(tableDir, ".old-*"))).getOrElse(Array.empty)
      .filter(_.getPath.getName.stripPrefix(".old-").forall(_.isDigit))
      .foreach(s => f.delete(s.getPath, true))
    // Hadoop rename reports failure as `false`, not an exception — an
    // unchecked failure here would fall through to the marker write and
    // record a commit whose data never swapped in
    if (f.exists(data))
      require(f.rename(data, old), s"could not move live table aside: $data")
    require(f.rename(tmp, data), s"could not publish merged table: $tmp")
    f.delete(old, true)
    // marker goes tmp-then-rename so a crash mid-write leaves either the
    // previous marker or none — never a truncated file
    val markerTmp = new Path(tableDir, "._committed_batch.tmp")
    val outStream = f.create(markerTmp, true)
    try outStream.write(batchId.toString.getBytes("UTF-8"))
    finally outStream.close()
    val marker = new Path(tableDir, "_committed_batch")
    f.delete(marker, false)
    require(f.rename(markerTmp, marker), s"could not publish marker: $marker")
  }

  /** The `(DataFrame, Long) => Unit` to hand `foreachBatch`. */
  def sink(tableDir: String, keyCol: String, seqCol: String)
      : (DataFrame, Long) => Unit =
    (batch, id) => upsertBatch(batch, id, tableDir, keyCol, seqCol)
}
