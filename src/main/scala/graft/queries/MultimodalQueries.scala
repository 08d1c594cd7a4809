package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.load

/** Multimodal binary-column operators (builder mandate alongside
  * SURVEY.md §2.K): media payloads as opaque `binary` columns with
  * typed metadata, decode / feature-extract / frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (arithmetic over the payload
  * bytes). Everything around it — the binary column, the metadata
  * struct, the mapPartitions batch shape, the map-only no-shuffle
  * plan — is the real plumbing a 100 TB media pipeline runs on: a
  * decode pass must stay embarrassingly parallel (no shuffle, no
  * driver collect), which these plans are.
  */
object MultimodalQueries {

  /** Synthetic media table: document text bytes as payload, modality
    * assigned round-robin, metadata as a typed struct.
    */
  private def media(s: org.apache.spark.sql.SparkSession, d: String) =
    load(s, d, "documents").select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        col("source").as("origin"),
        col("lang").as("locale"),
        col("n_chars").as("declared_size")).as("meta"))

  val queries: Map[String, Q] = Map(
    // Binary + struct columns flowing through project/filter — the
    // schema-level half of the multimodal story (SQL-expressible).
    "multimodal_binary" -> ((s, d) =>
      media(s, d)
        .filter(col("meta.declared_size") > 100)
        .select(
          col("media_id"), col("kind"),
          length(col("payload")).cast("bigint").as("payload_len"),
          md5(col("payload")).as("payload_md5"),
          col("meta.origin").as("origin"))
        .orderBy("media_id")),

    // Decode stub via mapPartitions: iterator-in/iterator-out batch
    // shape (the Scala-side analogue of an Arrow-batched decode UDF).
    // STUB: "decoding" derives fake dimensions + mean byte value from
    // the payload — replace decodeStub with a real codec off-cluster.
    "multimodal_decode" -> ((s, d) => {
      import s.implicits._
      media(s, d)
        .select(col("media_id"), col("kind"), col("payload"))
        .as[(Long, String, Array[Byte])]
        .mapPartitions(_.map { case (id, kind, bytes) => decodeStub(id, kind, bytes) })
        .toDF()
        .orderBy("media_id")
    }),

    // Resize stage: stride-2 downsample of the payload through the
    // same iterator-batch mapPartitions shape as decode — STUB for a
    // real resampler; the fingerprint proves byte-exact plumbing.
    "multimodal_resize" -> ((s, d) => {
      import s.implicits._
      media(s, d).select(col("media_id"), col("kind"), col("payload"))
        .as[(Long, String, Array[Byte])]
        .mapPartitions(_.map { case (id, kind, bytes) =>
          (id, kind, resizeStub(bytes, 2))
        }).toDF("media_id", "kind", "resized")
        .select(col("media_id"), col("kind"),
          length(col("resized")).cast("bigint").as("out_len"),
          md5(col("resized")).as("out_md5"))
        .orderBy("media_id")
    }),

    // Feature-extraction stage: fixed-width per-media feature vector
    // (normalized nibble histogram — a DETERMINISTIC STUB standing in
    // for a model embedding) ready to feed the §2.K similarity
    // operators. Map-only, no shuffle, array<float> output.
    "multimodal_features" -> ((s, d) => {
      import s.implicits._
      media(s, d).select(col("media_id"), col("kind"), col("payload"))
        .as[(Long, String, Array[Byte])]
        .mapPartitions(_.map { case (id, kind, bytes) =>
          (id, kind, featureStub(bytes))
        }).toDF("media_id", "kind", "feat")
        // Exact float→double widening for the dump: Canon's to_json
        // then renders each value as its shortest-round-trip DOUBLE —
        // exactly how DuckDB prints a REAL inside to_json — so the
        // histogram is oracle-comparable (round-3 promotion). The
        // operator contract upstream stays Array[Float].
        .select(col("media_id"), col("kind"),
          col("feat").cast("array<double>").as("feat"))
        .orderBy("media_id")
    }),

    // Frame sampling: every 4th 16-byte "frame" of each video payload,
    // fingerprinted. Pure expressions (sequence + posexplode +
    // substring on binary) — no UDF, stays in codegen.
    "multimodal_frames" -> ((s, d) =>
      media(s, d)
        .filter(col("kind") === "video" && length(col("payload")) >= 16)
        .select(col("media_id"), col("payload"),
          posexplode(expr("sequence(1, length(payload) - 15, 64)")).as(Seq("frame_no", "pos")))
        .select(
          col("media_id"),
          col("frame_no").cast("bigint").as("frame_no"),
          col("pos").cast("bigint").as("pos"),
          md5(expr("substring(payload, pos, 16)")).as("frame_md5"))
        .orderBy("media_id", "frame_no")),
  )

  /** DETERMINISTIC DECODE STUB — not a real codec. Dimensions and the
    * mean byte value are derived from the payload so tests can verify
    * the distributed plumbing end-to-end.
    */
  private[graft] def decodeStub(id: Long, kind: String, bytes: Array[Byte]): MediaFeatures = {
    val w = 1 + (bytes.headOption.getOrElse(0: Byte) & 0x07)
    val h = 1 + (bytes.lift(1).getOrElse(0: Byte) & 0x07)
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    MediaFeatures(id, kind, w, h, bytes.length.toLong, mean)
  }

  /** DETERMINISTIC RESIZE STUB — every `stride`-th byte. */
  private[graft] def resizeStub(bytes: Array[Byte], stride: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
    out
  }

  /** DETERMINISTIC FEATURE STUB — normalized 16-bin nibble histogram
    * (stands in for a model embedding; same shape contract).
    */
  private[graft] def featureStub(bytes: Array[Byte]): Array[Float] = {
    val h = new Array[Float](16)
    bytes.foreach(b => h(b & 0x0f) += 1f)
    val n = math.max(bytes.length, 1).toFloat
    h.map(_ / n)
  }

  val oracle: Map[String, String] = Map(
    // Decode stub twin (round-3 promotion): the payload is the ASCII
    // text cast to binary, so every byte is ascii(char) and the fake
    // width/height/mean are plain integer arithmetic in DuckDB.
    "multimodal_decode" ->
      """SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(1 + (ascii(substring(text, 1, 1)) & 7) AS INTEGER) AS width,
        | CAST(1 + (CASE WHEN length(text) >= 2 THEN ascii(substring(text, 2, 1)) ELSE 0 END & 7) AS INTEGER) AS height,
        | CAST(length(text) AS BIGINT) AS n_bytes,
        | CAST(list_sum(list_transform(generate_series(1, length(text)),
        |     i -> ascii(substring(text, i, 1)))) AS DOUBLE)
        |   / greatest(length(text), 1) AS mean_byte
        | FROM documents ORDER BY media_id""".stripMargin,
    // Feature stub twin: 16-bin nibble histogram as REAL, divided as
    // float and json-rendered — DuckDB prints a REAL in to_json as its
    // shortest-round-trip double expansion, which is exactly what the
    // Spark side's array<double> widening + Canon to_json emits.
    "multimodal_features" ->
      """SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(to_json(list_transform(generate_series(0, 15), b ->
        |   CAST(CAST(len(list_filter(list_transform(generate_series(1, length(text)),
        |       i -> ascii(substring(text, i, 1)) & 15), x -> x = b)) AS REAL)
        |     / greatest(length(text), 1) AS REAL))) AS VARCHAR) AS feat
        | FROM documents ORDER BY media_id""".stripMargin,
    // ASCII payloads: byte stride-2 == char stride-2, so the resize
    // fingerprint is SQL-expressible.
    "multimodal_resize" ->
      """SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(length(array_to_string(list_transform(generate_series(1, length(text), 2),
        |     i -> substring(text, i, 1)), '')) AS BIGINT) AS out_len,
        | md5(array_to_string(list_transform(generate_series(1, length(text), 2),
        |     i -> substring(text, i, 1)), '')) AS out_md5
        | FROM documents ORDER BY media_id""".stripMargin,
    "multimodal_binary" ->
      """SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_len,
        | md5(text) AS payload_md5,
        | source AS origin
        | FROM documents WHERE n_chars > 100 ORDER BY media_id""".stripMargin,
    // text is pure ASCII, so string substring == byte slicing: the
    // frame fingerprints are SQL-expressible after all.
    "multimodal_frames" ->
      """SELECT doc_id AS media_id,
        | unnest(generate_series(0, (length(text) - 16) // 64)) AS frame_no,
        | unnest(generate_series(1, length(text) - 15, 64)) AS pos,
        | md5(unnest(list_transform(generate_series(1, length(text) - 15, 64),
        |     p -> substring(text, p, 16)))) AS frame_md5
        | FROM documents
        | WHERE doc_id % 3 = 2 AND length(text) >= 16
        | ORDER BY media_id, frame_no""".stripMargin,
  )
}

/** Output row of the decode stub (schema contract of the decode stage). */
case class MediaFeatures(media_id: Long, kind: String, width: Int, height: Int,
    n_bytes: Long, mean_byte: Double)
