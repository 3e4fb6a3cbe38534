package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** WARC (Web ARChive, ISO 28500) record parsing — the container format
  * crawl corpora actually arrive in (Common Crawl et al.). Completes
  * the crawl chain upstream of `HtmlText.extractText` →
  * `WebOps.canonicalizeUrl` → `WebOps.blockDomains`: warc bytes →
  * one row per record with (type, url, timestamp, mime, status,
  * payload).
  *
  * Framing (ISO 28500 §4): each record is a version line ("WARC/1.0"
  * or "WARC/1.1"), CRLF-delimited named header fields up to an empty
  * line, then exactly Content-Length payload BYTES, then two CRLFs
  * before the next record. `.warc.gz` files compress each record (or
  * the whole file) as gzip members; `java.util.zip.GZIPInputStream`
  * decodes concatenated members in one stream, so both layouts read
  * through the same arm.
  *
  * HTTP unwrapping: records whose Content-Type is `application/http`
  * carry a full HTTP message as payload; the parser splits status
  * line / headers / body, surfacing the response's own Content-Type
  * (lowercased, parameters stripped) as `mime` and the BODY as
  * `payload` — the bytes the text pipeline wants. Non-HTTP records
  * (warcinfo, metadata, resource) pass their block through untouched
  * with the WARC-level Content-Type.
  *
  * Malformed framing throws with the byte offset (the engine's loud-
  * guard rule: a corrupt container surfaces as a task error naming the
  * file, never as silently missing documents).
  */
object WarcParse {

  /** One parsed record. `http_status`/`url`/`fetch_ts` are None where
    * the record type doesn't carry them (warcinfo has no target URI);
    * `payload` is the HTTP BODY for http records, the raw block
    * otherwise.
    */
  final case class WarcRecord(
      warc_type: String,
      url: Option[String],
      fetch_ts: Option[String],
      record_id: Option[String],
      mime: Option[String],
      http_status: Option[Int],
      payload: Array[Byte])

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Decode ALL gzip members of a concatenated-member stream (the
    * standard .warc.gz layout: one member per record).
    */
  private def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream(b.length * 4)
    try in.transferTo(out) finally in.close()
    out.toByteArray
  }

  /** Read one CRLF-terminated ASCII/UTF-8 header line starting at
    * `off`; returns (line-without-CRLF, offset-after-CRLF).
    */
  private def readLine(bytes: Array[Byte], off: Int): (String, Int) = {
    var i = off
    while (i < bytes.length - 1 && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
    if (i >= bytes.length - 1)
      throw new IllegalArgumentException(
        s"WARC: unterminated header line at byte $off (no CRLF before EOF)")
    (new String(bytes, off, i - off, java.nio.charset.StandardCharsets.UTF_8), i + 2)
  }

  /** Parse every record of one WARC file's bytes (gzip-transparent). */
  def records(raw: Array[Byte]): Seq[WarcRecord] = {
    val bytes = if (isGzip(raw)) gunzipAll(raw) else raw
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var off = 0
    while (off < bytes.length) {
      // inter-record CRLFs (the two-CRLF trailer, plus tolerated padding)
      while (off < bytes.length && (bytes(off) == '\r' || bytes(off) == '\n')) off += 1
      if (off < bytes.length) {
        val recStart = off
        val (version, afterV) = readLine(bytes, off)
        if (!version.startsWith("WARC/"))
          throw new IllegalArgumentException(
            s"WARC: expected version line at byte $recStart, got '${version.take(40)}'")
        off = afterV
        val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var done = false
        while (!done) {
          val (line, next) = readLine(bytes, off)
          off = next
          if (line.isEmpty) done = true
          else {
            val c = line.indexOf(':')
            if (c < 0)
              throw new IllegalArgumentException(
                s"WARC: malformed header line (no colon) in record at byte $recStart: '${line.take(40)}'")
            headers.update(line.substring(0, c).trim.toLowerCase,
              line.substring(c + 1).trim)
          }
        }
        val clen = headers.get("content-length") match {
          case Some(v) => v.toLong
          case None => throw new IllegalArgumentException(
            s"WARC: record at byte $recStart has no Content-Length")
        }
        if (off + clen > bytes.length)
          throw new IllegalArgumentException(
            s"WARC: record at byte $recStart declares Content-Length $clen " +
              s"but only ${bytes.length - off} bytes remain")
        val block = java.util.Arrays.copyOfRange(bytes, off, off + clen.toInt)
        off += clen.toInt
        val wtype = headers.getOrElse("warc-type", "")
        val ctype = headers.getOrElse("content-type", "")
        val (mime, status, payload) =
          if (ctype.toLowerCase.startsWith("application/http"))
            parseHttp(block, recStart)
          else
            (headers.get("content-type").map(cleanMime), None, block)
        out += WarcRecord(
          warc_type = wtype,
          url = headers.get("warc-target-uri"),
          fetch_ts = headers.get("warc-date"),
          record_id = headers.get("warc-record-id"),
          mime = mime,
          http_status = status,
          payload = payload)
      }
    }
    out.toSeq
  }

  /** Content-Type → bare lowercased mime (parameters stripped). */
  private def cleanMime(ct: String): String = {
    val semi = ct.indexOf(';')
    (if (semi >= 0) ct.substring(0, semi) else ct).trim.toLowerCase
  }

  /** Split an application/http block into (mime, status, body). */
  private def parseHttp(
      block: Array[Byte],
      recStart: Int): (Option[String], Option[Int], Array[Byte]) = {
    // header/body boundary: first CRLFCRLF
    var i = 0
    while (i < block.length - 3 &&
      !(block(i) == '\r' && block(i + 1) == '\n' &&
        block(i + 2) == '\r' && block(i + 3) == '\n')) i += 1
    if (i >= block.length - 3)
      throw new IllegalArgumentException(
        s"WARC: http payload of record at byte $recStart has no header/body boundary")
    val head = new String(block, 0, i, java.nio.charset.StandardCharsets.UTF_8)
    val body = java.util.Arrays.copyOfRange(block, i + 4, block.length)
    val lines = head.split("\r\n")
    val startParts = lines.head.split(" ", 3)
    // responses start "HTTP/1.1 200 OK"; requests END with the version
    // ("GET /x HTTP/1.1") and carry no status
    val status =
      if (startParts.nonEmpty && startParts(0).startsWith("HTTP/")) {
        if (startParts.length < 2)
          throw new IllegalArgumentException(
            s"WARC: malformed http status line in record at byte $recStart: '${lines.head.take(40)}'")
        Some(startParts(1).toInt)
      } else if (startParts.length == 3 && startParts(2).startsWith("HTTP/")) {
        None // request message
      } else
        throw new IllegalArgumentException(
          s"WARC: malformed http start line in record at byte $recStart: '${lines.head.take(40)}'")
    val mime = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        cleanMime(l.substring("content-type:".length))
    }
    (mime, status, body)
  }

  /** Column-level parse: warc bytes → array of record structs — the
    * in-plan form the declared crawl scenario composes (explode →
    * extract → canonicalize → block). A Scala UDF is the honest shape
    * here (the multimodal-codec judgment call): record framing is an
    * imperative byte scan over container-sized blobs on the COLD
    * ingest path, evaluated once per file, never in a hot per-document
    * loop.
    */
  def recordsCol(bytes: Column): Column = {
    val u = udf { (b: Array[Byte]) =>
      if (b == null) Seq.empty[WarcRecord] else records(b)
    }
    u(bytes)
  }
}
