package graft.source

import java.io.{BufferedReader, BufferedWriter, File, FileReader, FileWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** One message in the file-backed queue log: the graft stand-in for a broker
  * message (bornTs/key/tag/properties/body — the same fields the reference's
  * BytesMessage + metadata carry). */
final case class Message(
    bornTs: Long,
    key: String,
    tag: String,
    properties: Map[String, String],
    body: String)

/**
 * File-backed topic storage: `<root>/<topic>/queue-<N>.log`, one message per
 * line, offset = line number. Stands in for the broker so all offset/split
 * semantics stay real (see SURVEY.md §3).
 *
 * Line format (tab-separated): `bornTs \t key \t tag \t k=v;k=v \t body`,
 * with backslash/tab/newline/CR escaped inside every field, so arbitrary
 * bodies round-trip. Append-only; one writer per queue (MQ semantics).
 */
object TopicLog {

  val QueuePrefix = "queue-"
  val QueueSuffix = ".log"

  def queueFile(root: String, topic: String, queueId: Int): File =
    new File(new File(root, topic), s"$QueuePrefix$queueId$QueueSuffix")

  /** Queue ids present for a topic, ascending (a topic with no dir has none). */
  def listQueues(root: String, topic: String): Seq[Int] = {
    val dir = new File(root, topic)
    if (!dir.isDirectory) Seq.empty
    else dir.listFiles()
      .filter(f => f.getName.startsWith(QueuePrefix) && f.getName.endsWith(QueueSuffix))
      .map(f => f.getName.stripPrefix(QueuePrefix).stripSuffix(QueueSuffix).toInt)
      .sorted.toSeq
  }

  def listTopics(root: String): Seq[String] = {
    val dir = new File(root)
    if (!dir.isDirectory) Seq.empty
    else dir.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  // ---- field escaping ----

  private[source] def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '\t' => sb.append("\\t")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      // ';' and '=' structure the properties field; escaping them everywhere
      // keeps one uniform codec (unescape's catch-all restores them)
      case ';' => sb.append("\\;")
      case '=' => sb.append("\\=")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** First index of `sep` not preceded by an escape backslash. */
  private def indexOfUnescaped(s: String, sep: Char, from: Int): Int = {
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == sep) return i
      else i += 1
    }
    -1
  }

  /** Split on unescaped occurrences of `sep`. */
  private def splitUnescaped(s: String, sep: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = 0
    var idx = indexOfUnescaped(s, sep, 0)
    while (idx >= 0) {
      out += s.substring(start, idx)
      start = idx + 1
      idx = indexOfUnescaped(s, sep, start)
    }
    out += s.substring(start)
    out.result()
  }

  private[source] def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\')
          case 't' => sb.append('\t')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case other => sb.append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private[source] def formatLine(m: Message): String = {
    val props = m.properties.toSeq.sorted
      .map { case (k, v) => s"${escape(k)}=${escape(v)}" }.mkString(";")
    s"${m.bornTs}\t${escape(m.key)}\t${escape(m.tag)}\t$props\t${escape(m.body)}"
  }

  private[source] def parseLine(line: String): Message = {
    val parts = line.split("\t", 5)
    val props =
      if (parts.length < 4 || parts(3).isEmpty) Map.empty[String, String]
      else splitUnescaped(parts(3), ';').iterator.filter(_.nonEmpty).map { kv =>
        val eq = indexOfUnescaped(kv, '=', 0)
        require(eq >= 0, s"malformed property entry: $kv")
        unescape(kv.substring(0, eq)) -> unescape(kv.substring(eq + 1))
      }.toMap
    Message(
      bornTs = parts(0).toLong,
      key = unescape(parts(1)),
      tag = unescape(parts(2)),
      properties = props,
      body = if (parts.length < 5) "" else unescape(parts(4)))
  }

  // ---- IO ----

  /** One message as its on-disk line (no terminator). */
  def renderLine(m: Message): String = formatLine(m)

  /** Append pre-rendered lines from a spill file to a queue log in one
    * channel transfer (the DSv2 writer's commit path). */
  def appendRendered(root: String, topic: String, queueId: Int,
                     spill: java.nio.file.Path): Unit = {
    val file = queueFile(root, topic, queueId)
    file.getParentFile.mkdirs()
    val out = new java.io.FileOutputStream(file, true)
    val in = new java.io.FileInputStream(spill.toFile)
    try in.getChannel.transferTo(0, Long.MaxValue, out.getChannel)
    finally { in.close(); out.close() }
  }

  /** Append messages to a queue log (single writer per queue). */
  def append(root: String, topic: String, queueId: Int, messages: Iterator[Message]): Long = {
    val file = queueFile(root, topic, queueId)
    file.getParentFile.mkdirs()
    val out = new BufferedWriter(new FileWriter(file, StandardCharsets.UTF_8, true))
    var n = 0L
    try messages.foreach { m => out.write(formatLine(m)); out.newLine(); n += 1 }
    finally out.close()
    n
  }

  /** Earliest available offset (our logs never truncate). */
  def minOffset(root: String, topic: String, queueId: Int): Long = 0L

  /** (bytes counted up to the last seen newline, complete lines seen).
    * Keyed by absolute path; append-only logs only ever grow, so a cached
    * prefix stays valid and each maxOffset() call scans just the appended
    * suffix. Without this, every streaming latestOffset() tick re-read the
    * whole log — linear per tick, quadratic over a stream's lifetime. */
  private val lineCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private[graft] def invalidateCache(file: File): Unit = {
    lineCountCache.remove(file.getAbsolutePath); ()
  }

  /** One past the last offset. For a ledger-managed topic this is the
    * COMMITTED line count straight from [[EpochLedger]] — O(1), no scan,
    * and an uncommitted tail past the high-water mark is invisible (the
    * exactly-once reader boundary). Otherwise it is the count of COMPLETE
    * (newline-terminated) lines — a partial tail from a concurrent append
    * is not yet readable. */
  def maxOffset(root: String, topic: String, queueId: Int): Long = {
    EpochLedger.read(root, topic) match {
      case Some(state) => return state.committed(queueId)._1
      case None =>
    }
    val file = queueFile(root, topic, queueId)
    if (!file.exists()) return 0L
    val key = file.getAbsolutePath
    val fileLen = file.length()
    val (countedBytes, cachedLines) = lineCountCache.getOrDefault(key, (0L, 0L))
    // a shorter file means the log was deleted and recreated — rescan
    val (from, base) = if (fileLen < countedBytes) (0L, 0L) else (countedBytes, cachedLines)
    if (fileLen == from) return base
    val in = new java.io.FileInputStream(file)
    try {
      var skipped = 0L
      while (skipped < from) skipped += in.skip(from - skipped)
      val buf = new Array[Byte](64 * 1024)
      var lines = base
      var pos = from
      var lastNl = from
      var n = in.read(buf)
      while (n > 0) {
        var i = 0
        while (i < n) {
          if (buf(i) == '\n') { lines += 1; lastNl = pos + i + 1 }
          i += 1
        }
        pos += n
        n = in.read(buf)
      }
      lineCountCache.put(key, (lastNl, lines))
      lines
    } finally in.close()
  }

  /** (complete lines, bytes up to the last newline) of a queue log by full
    * scan — what the first ledger-managed write uses to ADOPT pre-existing
    * raw content as committed instead of shadowing it. */
  private[graft] def sizeInfo(root: String, topic: String, queueId: Int): (Long, Long) = {
    val file = queueFile(root, topic, queueId)
    if (!file.exists()) return (0L, 0L)
    val in = new java.io.FileInputStream(file)
    try {
      val buf = new Array[Byte](64 * 1024)
      var lines = 0L
      var pos = 0L
      var lastNl = 0L
      var n = in.read(buf)
      while (n > 0) {
        var i = 0
        while (i < n) {
          if (buf(i) == '\n') { lines += 1; lastNl = pos + i + 1 }
          i += 1
        }
        pos += n
        n = in.read(buf)
      }
      (lines, lastNl)
    } finally in.close()
  }

  /** First offset whose bornTs >= ts; maxOffset if none (logs are
    * time-ordered per queue, like broker commit logs). Capped at
    * maxOffset: the raw scan sees lines past a ledgered topic's committed
    * high-water mark (and a torn tail line), and an endTimeMs-bounded read
    * using this as its stop offset must not expose either. */
  def searchOffset(root: String, topic: String, queueId: Int, ts: Long): Long = {
    val file = queueFile(root, topic, queueId)
    if (!file.exists()) return 0L
    val in = new BufferedReader(new FileReader(file, StandardCharsets.UTF_8))
    val found = try {
      var offset = 0L
      var line = in.readLine()
      var res = -1L
      while (line != null && res < 0) {
        if (line.substring(0, line.indexOf('\t')).toLong >= ts) res = offset
        else { offset += 1; line = in.readLine() }
      }
      if (res < 0) offset else res
    } finally in.close()
    math.min(found, maxOffset(root, topic, queueId))
  }

  /** Iterator over a queue range that can be closed before exhaustion
    * (a LIMITed scan stops early; the reader must not leak the handle). */
  final class RangeIterator(file: File, startOffset: Long, stopOffset: Long)
      extends Iterator[(Long, Message)] with AutoCloseable {
    private val in =
      if (!file.exists() || startOffset >= stopOffset) null
      else new BufferedReader(new FileReader(file, StandardCharsets.UTF_8))
    private var offset = -1L
    private var nextLine: String = if (in == null) null else advance()

    private def advance(): String = {
      var line = in.readLine()
      offset += 1
      while (line != null && offset < startOffset) { line = in.readLine(); offset += 1 }
      if (line == null || offset >= stopOffset) { in.close(); null } else line
    }
    override def hasNext: Boolean = nextLine != null
    override def next(): (Long, Message) = {
      val out = (offset, parseLine(nextLine))
      nextLine = advance()
      out
    }
    override def close(): Unit = {
      if (in != null && nextLine != null) { in.close(); nextLine = null }
    }
  }

  /** Read messages with offsets in [startOffset, stopOffset). */
  def readRange(root: String, topic: String, queueId: Int,
                startOffset: Long, stopOffset: Long): RangeIterator =
    new RangeIterator(queueFile(root, topic, queueId), startOffset, stopOffset)

  /** Recursively delete a topic dir (test/bench helper). */
  def deleteTopic(root: String, topic: String): Unit = {
    val dir = Paths.get(root, topic)
    graft.util.Fs.deleteRecursively(dir)
    // drop cached line counts for the deleted logs — a recreated log of
    // exactly the cached byte length would otherwise reuse a stale count
    val prefix = dir.toAbsolutePath.toString + File.separator
    lineCountCache.keySet().removeIf(k => k.startsWith(prefix))
  }
}
