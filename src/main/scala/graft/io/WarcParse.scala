package graft.io

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, EOFException, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets.UTF_8

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
  * The parser is STREAMING ([[recordsStream]]): it reads one record at
  * a time off an InputStream and holds only the current record's
  * payload — constant memory in the FILE size, which is what lets a
  * task walk a ~1 GB crawl segment without materializing it (the
  * binaryFile source's whole-file byte array would hold gigabytes per
  * task). The byte-array form ([[records]]) delegates to it, so there
  * is exactly one framing implementation.
  *
  * HTTP unwrapping: records whose Content-Type is `application/http`
  * carry a full HTTP message as payload; the parser splits start line
  * / headers / body, surfacing the response's own Content-Type
  * (lowercased, parameters stripped) as `mime` and the BODY as
  * `payload` — the bytes the text pipeline wants. Requests (start
  * line ends with the version) unwrap with no status. Non-HTTP
  * records (warcinfo, metadata, resource) pass their block through
  * untouched with the WARC-level Content-Type.
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

  /** Headers can't plausibly exceed this; a longer "line" means the
    * stream isn't WARC (or the gzip layer was skipped) — fail loudly
    * with the offset instead of buffering garbage without bound.
    */
  private val MaxHeaderLine = 1 << 20

  /** Streaming parse: one record at a time off `in0` (gzip-transparent
    * via a 2-byte magic sniff; concatenated members decode as one
    * stream). The iterator owns the stream and closes it on
    * exhaustion; abandoning it mid-file leaves closing to the caller
    * (Spark task completion, for the Sources.warcStreamed path).
    */
  def recordsStream(in0: InputStream): Iterator[WarcRecord] = {
    val sniff = new PushbackInputStream(new BufferedInputStream(in0), 2)
    val b1 = sniff.read()
    val b2 = sniff.read()
    if (b2 >= 0) sniff.unread(b2)
    if (b1 >= 0) sniff.unread(b1)
    val decoded: InputStream =
      if (b1 == 0x1f && b2 == 0x8b)
        new java.util.zip.GZIPInputStream(sniff)
      else sniff
    // pushback over the decoded stream: the inter-record CRLF skipper
    // must return the first non-CRLF byte (the next record's 'W')
    val in = new PushbackInputStream(new BufferedInputStream(decoded), 1)

    new Iterator[WarcRecord] {
      private var consumed = 0L // decoded-byte offset, for error text
      private var nextRec: WarcRecord = _
      private var done = false

      private def readLine(): String = {
        val buf = new ByteArrayOutputStream(128)
        val start = consumed
        var b = in.read()
        while (b >= 0) {
          consumed += 1
          if (b == '\r') {
            val n = in.read()
            if (n == '\n') { consumed += 1; return new String(buf.toByteArray, UTF_8) }
            throw new IllegalArgumentException(
              s"WARC: bare CR inside header line at byte $start")
          }
          buf.write(b)
          if (buf.size > MaxHeaderLine)
            throw new IllegalArgumentException(
              s"WARC: header line at byte $start exceeds $MaxHeaderLine bytes — not a WARC stream?")
          b = in.read()
        }
        throw new IllegalArgumentException(
          s"WARC: unterminated header line at byte $start (no CRLF before EOF)")
      }

      private def readFullyOrThrow(n: Long, recStart: Long): Array[Byte] = {
        if (n > Int.MaxValue - 8)
          throw new IllegalArgumentException(
            s"WARC: record at byte $recStart declares Content-Length $n — beyond a single in-memory payload")
        val out = new Array[Byte](n.toInt)
        var off = 0
        while (off < n) {
          val r = in.read(out, off, n.toInt - off)
          if (r < 0)
            throw new IllegalArgumentException(
              s"WARC: record at byte $recStart declares Content-Length $n " +
                s"but only ${off} payload bytes remain")
          off += r
          consumed += r
        }
        out
      }

      private def advance(): Unit = {
        // inter-record CRLFs (the two-CRLF trailer, plus tolerated padding)
        var b = in.read()
        while (b == '\r' || b == '\n') { consumed += 1; b = in.read() }
        if (b < 0) { done = true; in.close(); return }
        in.unread(b)
        val recStart = consumed
        val version = readLine()
        if (!version.startsWith("WARC/"))
          throw new IllegalArgumentException(
            s"WARC: expected version line at byte $recStart, got '${version.take(40)}'")
        val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var blank = false
        while (!blank) {
          val line = readLine()
          if (line.isEmpty) blank = true
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
        val block = readFullyOrThrow(clen, recStart)
        val wtype = headers.getOrElse("warc-type", "")
        val ctype = headers.getOrElse("content-type", "")
        val (mime, status, payload) =
          if (ctype.toLowerCase.startsWith("application/http"))
            parseHttp(block, recStart)
          else
            (headers.get("content-type").map(cleanMime), None, block)
        nextRec = WarcRecord(
          warc_type = wtype,
          url = headers.get("warc-target-uri"),
          fetch_ts = headers.get("warc-date"),
          record_id = headers.get("warc-record-id"),
          mime = mime,
          http_status = status,
          payload = payload)
      }

      override def hasNext: Boolean = {
        if (!done && nextRec == null) advance()
        !done
      }

      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException("WARC stream exhausted")
        val r = nextRec
        nextRec = null
        r
      }
    }
  }

  /** Parse every record of one WARC file's bytes (gzip-transparent) —
    * [[recordsStream]] over the array; one framing implementation.
    */
  def records(raw: Array[Byte]): Seq[WarcRecord] =
    try recordsStream(new ByteArrayInputStream(raw)).toSeq
    catch { case e: EOFException =>
      throw new IllegalArgumentException(s"WARC: truncated gzip stream: ${e.getMessage}")
    }

  /** Content-Type → bare lowercased mime (parameters stripped). */
  private def cleanMime(ct: String): String = {
    val semi = ct.indexOf(';')
    (if (semi >= 0) ct.substring(0, semi) else ct).trim.toLowerCase
  }

  /** Split an application/http block into (mime, status, body). */
  private def parseHttp(
      block: Array[Byte],
      recStart: Long): (Option[String], Option[Int], Array[Byte]) = {
    // header/body boundary: first CRLFCRLF
    var i = 0
    while (i < block.length - 3 &&
      !(block(i) == '\r' && block(i + 1) == '\n' &&
        block(i + 2) == '\r' && block(i + 3) == '\n')) i += 1
    if (i >= block.length - 3)
      throw new IllegalArgumentException(
        s"WARC: http payload of record at byte $recStart has no header/body boundary")
    val head = new String(block, 0, i, UTF_8)
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
