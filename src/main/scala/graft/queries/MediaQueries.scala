package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables.table
import graft.multimodal.Multimodal

/** Multimodal surface: binary media columns built deterministically
  * from the documents table (magic prefix by doc_id % 4 + utf8 text
  * payload), then metadata extraction and the stub feature kernel.
  * The binary plumbing (construction, sniffing, length) is oracle-
  * verified; the decode boundary itself is the documented stub.
  */
object MediaQueries extends QueryPack {

  private def magicLit(bytes: Int*): Column = lit(bytes.map(_.toByte).toArray)

  /** doc_id%4: 0→jpeg, 1→png, 2→wav, 3→bare text (unknown). */
  private def mediaBin: Column = {
    val payload = col("text").cast("binary")
    when(col("doc_id") % 4 === 0,
      concat(magicLit(0xFF, 0xD8, 0xFF), payload))
      .when(col("doc_id") % 4 === 1,
        concat(magicLit(0x89, 0x50, 0x4E, 0x47), payload))
      .when(col("doc_id") % 4 === 2,
        concat(magicLit(0x52, 0x49, 0x46, 0x46), payload))
      .otherwise(payload)
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata pass: size + container sniff over the binary, digest
    // over the payload.
    "q71_media_metadata" -> ((s, dir) => {
      table(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          length(mediaBin).as("n_bytes"),
          Multimodal.mediaFormat(mediaBin).as("fmt"),
          sha2(col("text").cast("binary"), 256).as("digest"))
        .orderBy(col("doc_id"))
    }),

    // Stub decode: normalized 16-bin byte histogram over the text
    // payload (ASCII ⇒ byte histogram == char histogram, which is
    // how the oracle reproduces it). Exploded to (doc_id, bin, share)
    // scalar rows — the driver's comparator sorts on every column and
    // cannot hash a raw array value.
    "q72_media_features" -> ((s, dir) => {
      table(s, dir, "documents")
        // The empty-text guard mirrors the oracle's implicit exclusion:
        // a doc with no characters drops out of its `n` CTE, while the
        // histogram stub would emit 16 zero-share rows for it.
        .filter(col("doc_id") < 100 && length(col("text")) > 0)
        .select(col("doc_id"),
          posexplode(Multimodal.byteHistogramStub(bins = 16)(
            col("text").cast("binary"))))
        .select(col("doc_id"), col("pos").cast("int").as("bin"),
          col("col").as("share"))
        .orderBy(col("doc_id"), col("bin"))
    }),

    // REAL header parsing round-trip: on-spec PNG/WAV headers built
    // from doc_id formulas (the encode twins), parsed back by the
    // pure-byte-math parsers (pngDims / wavInfo — these read genuine
    // files; MultimodalSpec pins golden real-file bytes). The oracle
    // computes the formulas directly, so a builder OR parser bug
    // breaks the match. Shrinks the stub boundary to pixel/sample
    // decode only.
    "q143_media_headers" -> ((s, dir) => {
      val w = col("doc_id") % 512 + 16
      val h = col("doc_id") % 384 + 16
      val ch = col("doc_id") % 2 + 1
      val sr = lit(8000L) + (col("doc_id") % 5) * 1000L
      val db = (col("doc_id") % 1000 + 1) * 64L
      table(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          Multimodal.pngDims(Multimodal.pngHeaderUdf(w, h)).as("png"),
          Multimodal.wavInfo(Multimodal.wavHeaderUdf(ch, sr, db)).as("wav"))
        .select(col("doc_id"),
          col("png.width").as("width"), col("png.height").as("height"),
          col("wav.channels").as("channels"),
          col("wav.sample_rate").as("sample_rate"),
          col("wav.duration_ms").as("duration_ms"))
        .orderBy(col("doc_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q71_media_metadata" ->
      """SELECT doc_id,
        |  cast(octet_length(CASE doc_id % 4
        |    WHEN 0 THEN '\xFF\xD8\xFF'::BLOB || encode(text)
        |    WHEN 1 THEN '\x89\x50\x4E\x47'::BLOB || encode(text)
        |    WHEN 2 THEN '\x52\x49\x46\x46'::BLOB || encode(text)
        |    ELSE encode(text) END) as int) AS n_bytes,
        |  CASE doc_id % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |       WHEN 2 THEN 'wav' ELSE 'unknown' END AS fmt,
        |  sha256(text) AS digest
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "q72_media_features" ->
      """WITH ch AS (
        |  SELECT doc_id, ascii(unnest(string_split(text, ''))) % 16 AS bin
        |  FROM documents WHERE doc_id < 100),
        |n AS (SELECT doc_id, count(*) AS n FROM ch GROUP BY doc_id),
        |hist AS (
        |  SELECT doc_id, bin, count(*) AS c FROM ch GROUP BY doc_id, bin),
        |grid AS (
        |  SELECT n.doc_id, cast(r.range AS int) AS bin
        |  FROM n CROSS JOIN range(0, 16) r)
        |SELECT g.doc_id, g.bin,
        |  round(coalesce(h.c, 0) * 1.0 / n.n, 4) AS share
        |FROM grid g
        |JOIN n ON g.doc_id = n.doc_id
        |LEFT JOIN hist h ON h.doc_id = g.doc_id AND h.bin = g.bin
        |ORDER BY g.doc_id, g.bin""".stripMargin,
    "q143_media_headers" ->
      """SELECT doc_id,
        |  CAST(doc_id % 512 + 16 AS BIGINT) AS width,
        |  CAST(doc_id % 384 + 16 AS BIGINT) AS height,
        |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        |  CAST(8000 + (doc_id % 5) * 1000 AS BIGINT) AS sample_rate,
        |  CAST(floor(1000.0 * ((doc_id % 1000 + 1) * 64)
        |       / ((8000 + (doc_id % 5) * 1000) * (doc_id % 2 + 1) * 2))
        |    AS BIGINT) AS duration_ms
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin
  )
}
