package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata (BASELINE.json north star — the reference has no
  * binary data; this is the training-data-pipeline extension).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[decodeStub]]); everything around it
  * — the binary column schema, metadata struct, frame slicing, partitioned
  * batch iteration through `mapPartitions`, feature-vector output shape —
  * is real Spark plumbing, oracle-checked where SQL-expressible.
  *
  * Scale notes: payloads never shuffle except where an aggregation needs
  * them; metadata-only queries prune the binary column at the scan
  * (ReadSchema excludes `payload`). Frame slicing is a map-side
  * posexplode — output rows ≈ payload_bytes / frame_size, linear.
  */
object Multimodal {

  /** Synthetic media table derived deterministically from `documents`:
    * payload = UTF-8 bytes of the text (stand-in for encoded media),
    * media_type cycles image/audio/video, metadata struct carries the typed
    * fields a real decoder would fill (dimensions, sample rate, frame size).
    *
    * ASCII corpus contract: oracles for byte-sliced payload operators
    * ([[mediaDedup]], [[mediaFrames]]) replay in DuckDB's CHARACTER
    * domain (it has no BLOB substring) — equal to the engine's byte
    * slicing only because the synthetic corpus is ASCII. A real binary
    * payload keeps the engine side unchanged; only the test oracle needs
    * a byte-capable replay.
    */
  def media(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("media_type"),
      struct(
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        lit(64).as("frame_bytes")).as("meta"))

  /** Metadata/shape query — binary length + typed metadata, no decode.
    * The plan must NOT read text beyond the payload encode; at scale with a
    * real binary column the scan prunes to (doc_id, payload-length) only.
    */
  val mediaMeta: Q = Q("media_meta",
    """SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  octet_length(encode(text)) AS n_bytes,
      |  CAST(doc_id % 640 + 1 AS INT) AS width,
      |  CAST(doc_id % 480 + 1 AS INT) AS height,
      |  CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    media(s, dir).select(
      col("doc_id"), col("media_type"),
      length(col("payload")).cast("long").as("n_bytes"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      ceil(length(col("payload")) / col("meta.frame_bytes").cast("double"))
        .cast("long").as("n_frames"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling: slice the payload into fixed-size frames and keep every
    * 4th (the video-keyframe pattern). Pure built-ins — substring on binary
    * is codegen'd; the explode is map-side, no shuffle until the final sort.
    */
  val mediaFrames: Q = Q("media_frames",
    """WITH f AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |    unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT), 4)) AS frame_no
      |  FROM documents)
      |SELECT doc_id, frame_no,
      |  least(CAST(64 AS BIGINT), n_bytes - frame_no * 64) AS frame_bytes
      |FROM f ORDER BY doc_id, frame_no""".stripMargin) { (s, dir) =>
    media(s, dir)
      .select(col("doc_id"), col("payload"), length(col("payload")).as("n_bytes"),
        ceil(length(col("payload")) / lit(64.0)).cast("long").as("n_frames"))
      .select(col("doc_id"), col("payload"), col("n_bytes"),
        // empty payload → 0 frames → empty array (explode drops the row,
        // matching the oracle's range(0, 0, 4)); a bare sequence(0, -1, 4)
        // would throw on illegal boundaries
        explode(when(col("n_frames") > 0,
          sequence(lit(0L), col("n_frames") - 1, lit(4L)))
          .otherwise(array().cast("array<bigint>"))).as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        least(lit(64L), col("n_bytes") - col("frame_no") * 64).as("frame_bytes"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** One decoded media item: id + raw payload in, id + feature vector out —
    * the batch shape a real extractor (JPEG decode → CNN features, audio →
    * mel spectrogram) would use.
    */
  case class MediaItem(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** ======== STUB ========
    * Deterministic fake "decode + feature-extract": 8 features, feature j =
    * mean of payload bytes at positions ≡ j (mod 8). A real deployment
    * swaps ONLY this function for a codec call (e.g. javax.imageio /
    * ffmpeg-over-pipe); the per-partition batching, schema, and partitioning
    * around it stay identical. Marked STUB per the build contract — the
    * container ships no media codecs.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val sums = new Array[Long](8)
    val counts = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      val j = i % 8
      sums(j) += payload(i) & 0xff
      counts(j) += 1
      i += 1
    }
    Array.tabulate(8)(j => if (counts(j) == 0) 0f else sums(j).toFloat / counts(j))
  }

  /** Distributed feature extraction: typed `mapPartitions` so a real decoder
    * can amortize per-partition init (model load, codec context) across the
    * rows of one partition — the Scala analog of a batched `mapInPandas`.
    */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { batch =>
      // real impl: open codec/model ONCE here, then stream the batch
      batch.map(m => MediaFeatures(m.doc_id, decodeStub(m.payload)))
    }
  }

  /** DuckDB replay of [[decodeStub]] + the summary projection: the payload
    * is UTF-8 text (ASCII in this corpus), so byte values are `unicode()`
    * of each char; per-position-class sums/counts divide in REAL (float32,
    * matching the stub's `Float` division bit-for-bit) and the mean folds
    * left-to-right in DOUBLE exactly like `aggregate(features, 0.0, +)`.
    */
  private val featureNames = (0 until 8).map(j => s"f$j")

  /** Shared CTE prefix replaying [[decodeStub]] per document — ends with
    * `fj` (doc_id, f0..f7 as REAL). Consumed by [[mediaFeaturesOracle]]
    * and [[mediaPhash]]'s oracle.
    */
  private val mediaFeatureCtesSql: String = {
    val perJ = (0 until 8).map { j =>
      s"""CASE WHEN count(v) FILTER (WHERE j = $j) = 0 THEN CAST(0 AS REAL)
         |       ELSE CAST(sum(v) FILTER (WHERE j = $j) AS REAL)
         |            / CAST(count(v) FILTER (WHERE j = $j) AS REAL) END AS f$j""".stripMargin
    }.mkString(",\n  ")
    s"""pos AS (SELECT doc_id, text, unnest(range(length(text))) AS i FROM documents),
       |b AS (SELECT doc_id, CAST(i % 8 AS INT) AS j,
       |    unicode(substr(text, CAST(i + 1 AS INT), 1)) AS v FROM pos),
       |fj0 AS (SELECT doc_id,
       |  $perJ
       |  FROM b GROUP BY doc_id),
       |fj AS (
       |  -- LEFT JOIN + zero fill: an empty text yields no byte positions
       |  -- (range(0)), but the Spark side still emits a zero-feature row
       |  -- for it (decodeStub of an empty payload) — the doc must not drop
       |  SELECT d.doc_id,
       |    ${featureNames.map(f => s"coalesce($f, CAST(0 AS REAL)) AS $f").mkString(", ")}
       |  FROM documents d LEFT JOIN fj0 USING (doc_id))""".stripMargin
  }

  private val mediaFeaturesOracle: String = {
    val fs = featureNames
    s"""WITH $mediaFeatureCtesSql
       |SELECT doc_id,
       |  (${fs.map(f => s"CAST($f AS DOUBLE)").mkString(" + ")}) / 8 AS f_mean,
       |  CAST(least(${fs.mkString(", ")}) AS DOUBLE) AS f_min,
       |  CAST(greatest(${fs.mkString(", ")}) AS DOUBLE) AS f_max
       |FROM fj ORDER BY doc_id""".stripMargin
  }

  /** End-to-end features query. The stub's float output is deterministic
    * and — because the fake decode is pure byte arithmetic — replayable in
    * SQL, so even this mapPartitions pipeline is hash-gated
    * ([[mediaFeaturesOracle]]); shape/determinism also in MultimodalSpec.
    * Emits per-doc feature mean/min/max so the result is inspectable.
    */
  val mediaFeaturesQ: Q = Q("media_features", mediaFeaturesOracle) { (s, dir) =>
    import s.implicits._
    val items = media(s, dir).select(col("doc_id"), col("payload")).as[MediaItem]
    extractFeatures(items)
      .select(col("doc_id"),
        aggregate(col("features"), lit(0.0), (a, x) => a + x)
          .divide(size(col("features"))).as("f_mean"),
        array_min(col("features")).cast("double").as("f_min"),
        array_max(col("features")).cast("double").as("f_max"))
      .orderBy(col("doc_id"))
  }

  /** ======== STUB ========
    * Deterministic fake "resize to half resolution": keep every 2nd payload
    * byte. A real deployment swaps ONLY this function for a codec resample
    * (bilinear/lanczos over decoded pixels); the typed batch shape and the
    * metadata arithmetic around it are the real plumbing.
    */
  def resizeStub(payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte]((payload.length + 1) / 2)
    var i = 0
    while (i < out.length) { out(i) = payload(i * 2); i += 1 }
    out
  }

  /** Half-resolution resize: payload downsampled per-partition (stub), typed
    * metadata halved with ceiling semantics. The oracle checks the byte
    * arithmetic the stub must satisfy — so the pipeline proves the payload
    * actually shrank correctly, not just the metadata.
    */
  val mediaResize: Q = Q("media_resize",
    """SELECT doc_id,
      |  CAST(ceil(octet_length(encode(text)) / 2.0) AS BIGINT) AS n_bytes,
      |  CAST(floor((doc_id % 640 + 2) / 2.0) AS INT) AS width,
      |  CAST(floor((doc_id % 480 + 2) / 2.0) AS INT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val m = media(s, dir)
    val resized = m.select(col("doc_id"), col("payload")).as[MediaItem]
      .mapPartitions { batch =>
        // real impl: open codec ONCE here, then resample each item
        batch.map(x => MediaItem(x.doc_id, resizeStub(x.payload)))
      }
    resized.toDF()
      .join(m.select(col("doc_id"), col("meta")), Seq("doc_id"))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        floor((col("meta.width") + 1) / 2.0).cast("int").as("width"),
        floor((col("meta.height") + 1) / 2.0).cast("int").as("height"))
      .orderBy(col("doc_id"))
  }

  /** Frame-level content dedup — the chunk-hash storage-dedup every media
    * lake runs (identical 64-byte segments shared across assets are stored
    * once; whole-asset hashing misses them — this corpus has zero
    * whole-payload duplicates but ~4% duplicated frames). Per modality:
    * total frames, distinct frame contents, and the exact bytes a
    * content-addressed store reclaims (every copy past the first, at that
    * frame's true length — trailing frames are short).
    *
    * Shape: one scan, map-side frame explode + md5 (the hash, not the
    * frame bytes, is what the first exchange carries — 16 bytes per frame
    * regardless of frame size, the [[graft.operators.Dedup]] digest
    * lever), a (modality, hash) dedup agg, then a 3-row modality rollup.
    * Output is model-sized; nothing corpus-sized is collected or
    * broadcast.
    */
  val mediaDedup: Q = Q("media_dedup",
    // NOTE the oracle slices by CHARACTERS (DuckDB has no BLOB substring)
    // while the engine slices payload BYTES — identical under the ASCII
    // corpus contract stated on [[media]]; the frame count below uses
    // char length too so the oracle is internally single-domain.
    """WITH f AS (SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS fno, text
      |  FROM documents),
      |h AS (SELECT media_type,
      |    md5(substr(text, CAST(fno * 64 + 1 AS BIGINT), 64)) AS fh,
      |    octet_length(encode(substr(text, CAST(fno * 64 + 1 AS BIGINT), 64))) AS fb
      |  FROM f),
      |d AS (SELECT media_type, fh, count(*) AS n_copies,
      |    CAST(min(fb) AS BIGINT) AS fb
      |  FROM h GROUP BY 1, 2)
      |SELECT media_type, CAST(sum(n_copies) AS BIGINT) AS n_frames,
      |  count(*) AS n_distinct,
      |  CAST(sum((n_copies - 1) * fb) AS BIGINT) AS reclaim_bytes
      |FROM d GROUP BY 1 ORDER BY media_type""".stripMargin) { (s, dir) =>
    media(s, dir)
      .select(col("media_type"), col("payload"),
        // empty payload → empty array (explode drops the row, matching
        // range(0, 0)); sequence(0, -1) would emit a DESCENDING pair
        explode(expr(
          """CASE WHEN length(payload) > 0
            |  THEN sequence(0L, cast(ceil(length(payload) / 64.0) as bigint) - 1)
            |  ELSE cast(array() as array<bigint>) END""".stripMargin))
          .as("fno"))
      .select(col("media_type"),
        expr("md5(substring(payload, cast(fno * 64 + 1 as int), 64))").as("fh"),
        expr("length(substring(payload, cast(fno * 64 + 1 as int), 64))")
          .cast("long").as("fb"))
      .groupBy(col("media_type"), col("fh"))
      .agg(count(lit(1)).as("n_copies"), min(col("fb")).as("fb"))
      .groupBy(col("media_type"))
      .agg(sum(col("n_copies")).as("n_frames"),
        count(lit(1)).as("n_distinct"),
        sum((col("n_copies") - 1) * col("fb")).as("reclaim_bytes"))
      .orderBy(col("media_type"))
  }

  private val mediaPhashOracle: String = {
    val fs = featureNames
    val bitSum = (0 until 8)
      .map(j => s"CASE WHEN CAST(f$j AS DOUBLE) > fm THEN ${1 << j} ELSE 0 END")
      .mkString(" + ")
    s"""WITH $mediaFeatureCtesSql,
       |ph AS (SELECT doc_id,
       |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |    (${fs.map(f => s"CAST($f AS DOUBLE)").mkString(" + ")}) / 8 AS fm,
       |    ${fs.mkString(", ")}
       |  FROM fj),
       |pb AS (SELECT doc_id, media_type, CAST($bitSum AS BIGINT) AS phash FROM ph),
       |bk AS (SELECT media_type, phash, count(*) AS n_items,
       |    min(doc_id) AS keep_doc FROM pb GROUP BY 1, 2),
       |fl AS (SELECT media_type, phash, xor(phash, CAST(m.v AS BIGINT)) AS nb
       |  FROM bk, (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128]) AS v) m),
       |h1 AS (SELECT f.media_type, f.phash, count(*) AS n_h1
       |  FROM fl f JOIN bk b ON b.media_type = f.media_type AND b.phash = f.nb
       |  GROUP BY 1, 2)
       |SELECT bk.media_type AS media_type, bk.phash AS phash,
       |  bk.n_items AS n_items, bk.keep_doc AS keep_doc,
       |  CAST(coalesce(h1.n_h1, 0) AS BIGINT) AS n_h1
       |FROM bk LEFT JOIN h1 ON h1.media_type = bk.media_type
       |  AND h1.phash = bk.phash
       |ORDER BY media_type, phash""".stripMargin
  }

  /** Perceptual-hash (aHash-convention) near-dup buckets per modality: bit
    * j of an item's 8-bit hash is `feature_j > mean(features)` over the
    * [[decodeStub]] features, so visually-similar payloads (under a real
    * decoder) land in the same or a 1-bit-adjacent bucket. The report
    * gives each nonempty (modality, phash) bucket's size, canonical item,
    * and its count of occupied Hamming-1 neighbor buckets — the candidate
    * sets a perceptual deduper would rescore, and the exact complement to
    * [[mediaDedup]]'s byte-identical frame dedup.
    *
    * Scale shape: hashing is the one decode pass (map-side after
    * [[extractFeatures]]); buckets collapse to ≤ |modalities|·256 rows,
    * and the Hamming-1 probe is the [[graft.operators.Similarity]]
    * multi-probe trick on that model-sized frame — explode 8 bit-flips,
    * self-join buckets, never items. Exactness: features are the proven
    * bit-identical stub floats; mean and comparisons run in double with
    * the same association both engines; the hash is then exact int.
    */
  val mediaPhash: Q = Q("media_phash", mediaPhashOracle) { (s, dir) =>
    import s.implicits._
    val items = media(s, dir).select(col("doc_id"), col("payload")).as[MediaItem]
    val hashed = extractFeatures(items)
      .withColumn("f_mean",
        aggregate(col("features"), lit(0.0), (a, x) => a + x)
          .divide(size(col("features"))))
      .withColumn("phash", expr(
        """aggregate(sequence(0, 7), cast(0 as bigint), (acc, j) ->
          |  acc + CASE WHEN cast(element_at(features, j + 1) as double) > f_mean
          |  THEN shiftleft(cast(1 as bigint), j) ELSE cast(0 as bigint) END)"""
          .stripMargin.replace("\n", " ")))
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1))
    val bk = graft.Scratch.track(hashed
      .groupBy(col("media_type"), col("phash"))
      .agg(count(lit(1)).as("n_items"), min(col("doc_id")).as("keep_doc")))
    val fl = bk.select(col("media_type"), col("phash"),
      explode(expr("transform(sequence(0, 7), k -> shiftleft(cast(1 as bigint), k))"))
        .as("m"))
      .select(col("media_type"), col("phash"),
        expr("phash ^ m").as("nb"))
    val h1 = fl.as("f")
      .join(bk.select(col("media_type"), col("phash").as("nb")).as("b"),
        Seq("media_type", "nb"))
      .groupBy(col("media_type"), col("phash")).agg(count(lit(1)).as("n_h1"))
    bk.join(h1, Seq("media_type", "phash"), "left")
      .select(col("media_type"), col("phash"), col("n_items"), col("keep_doc"),
        coalesce(col("n_h1"), lit(0L)).as("n_h1"))
      .orderBy(col("media_type"), col("phash"))
  }

  /** Content-based media similarity — the multimodal↔ANN composition a
    * media lake serves ("find assets like this one"): the extractor's
    * 8-dim feature vectors ([[extractFeatures]] — swap the stub for a CNN
    * / audio embedder, nothing downstream changes), quantized to exact
    * integers the [[graft.operators.Similarity]] way, scored by exact
    * cosine WITHIN the probe's modality (pre-filtering, the ann_filtered
    * lesson: a video's neighbors are videos), top-5 per probe. Zero-norm
    * vectors (empty payloads) are excluded in both engines before any
    * division. The oracle replays decode→features→quantize→cosine end to
    * end off [[mediaFeatureCtesSql]], so the full multimodal pipeline —
    * not just its arithmetic tail — sits under the hash gate.
    *
    * Shape: one feature pass (mapPartitions batch, the real-extractor
    * shape), 5 probe rows broadcast, per-probe top-5 over each probe's
    * modality stripe. At scale the modality predicate becomes partition
    * pruning under a type-partitioned layout and the brute scan swaps for
    * the [[graft.operators.Similarity.annIvfPq]] index path — plumbing,
    * not semantics.
    */
  val mediaSim: Q = {
    val fs = featureNames
    def q(col: String, alias: String) =
      s"CAST(round(CAST($col AS DOUBLE) * 10000) AS BIGINT) AS $alias"
    val nrm = fs.map(f => s"q$f * q$f").mkString(" + ")
    val dot = fs.map(f => s"a.q$f * b.q$f").mkString(" + ")
    Q("media_sim",
      s"""WITH $mediaFeatureCtesSql,
        |qz AS (SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    ${fs.map(f => q(f, s"q$f")).mkString(", ")}
        |  FROM fj),
        |nq AS (SELECT doc_id, media_type, ${fs.map(f => s"q$f").mkString(", ")},
        |    ($nrm) AS nrm FROM qz WHERE ($nrm) > 0),
        |p AS (SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id,
        |    CAST(($dot) AS DOUBLE)
        |      / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cos_sim
        |  FROM nq a JOIN nq b ON a.doc_id < 5 AND b.doc_id != a.doc_id
        |    AND b.media_type = a.media_type),
        |r AS (SELECT query_id, neighbor_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.Similarity.{cosine, dotQ}
      val items = media(s, dir).select(col("doc_id"), col("payload")).as[MediaItem]
      val feats = extractFeatures(items)
        .select(col("doc_id"),
          expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
            .as("media_type"),
          transform(col("features"),
            x => round(x.cast("double") * 10000).cast("long")).as("qv"))
        .withColumn("nrm", dotQ(col("qv"), col("qv")))
        .filter(col("nrm") > 0)
      val probes = feats.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), col("media_type").as("q_type"),
          col("qv").as("q_qv"), col("nrm").as("q_nrm"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      feats.join(broadcast(probes),
          col("doc_id") =!= col("query_id") && col("media_type") === col("q_type"))
        .select(col("query_id"), col("doc_id").as("neighbor_id"),
          cosine(col("q_qv"), col("q_nrm"), col("qv"), col("nrm")).as("cos_sim"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .orderBy(col("query_id"), col("rn"))
    }
  }

  val all: Seq[Q] =
    Seq(mediaMeta, mediaFrames, mediaFeaturesQ, mediaResize, mediaDedup,
      mediaPhash, mediaSim)
}
