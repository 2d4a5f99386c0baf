package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Plain-Scala twin of the `file info -m` record parse (reference
  * main.go:182-207; Column versions: [[graft.functions.PathFns.kvFile]] /
  * `kvGet`). Executor-side code for the DSv2 reader — asserted equal to
  * the Column implementations in KvRecordSourceSpec.
  */
object KvParse {
  /** Length-prefixed `file=` value (survives embedded spaces): payload
    * starts after `"keylength.file=<n> file="` and runs `<n>` chars.
    */
  def file(raw: String): Option[String] = {
    if (!raw.startsWith("keylength.file=")) return None
    val digits = raw.drop(15).takeWhile(_.isDigit)
    // > 9 digits cannot be a valid in-line length (and would overflow the
    // Int arithmetic below into a passing bounds check) — corrupt line
    if (digits.isEmpty || digits.length > 9) return None
    val n = digits.toInt
    val start = 15 + digits.length + 6 // "keylength.file=" + digits + " file="
    // Long math: start + n can exceed Int.MaxValue for hostile lengths
    if (start.toLong + n > raw.length) None else Some(raw.substring(start, start + n))
  }

  /** Exact-key token lookup: `key=` at string start or after a space, so
    * `ino` never matches inside `pino=` (main.go:184-189).
    *
    * Reference-faithful caveat: like the reference's space-split
    * tokenizer, this scans the WHOLE line, so a `file=` payload embedding
    * ` key=value` text would shadow a later real token. The format is
    * inherently ambiguous there (the reference has the same property for
    * every key except `file` itself); [[KvDataWriter]] refuses to WRITE
    * such payloads, so dumps produced by this source always re-parse
    * faithfully.
    */
  def get(raw: String, key: String): Option[String] = {
    val token = key + "="
    val idx =
      if (raw.startsWith(token)) 0
      else {
        val i = raw.indexOf(" " + token)
        if (i < 0) -1 else i + 1
      }
    if (idx < 0) None
    else {
      val from = idx + token.length
      val end = raw.indexOf(' ', from)
      Some(if (end < 0) raw.substring(from) else raw.substring(from, end))
    }
  }

  def getLong(raw: String, key: String): Option[Long] =
    get(raw, key).flatMap(v => scala.util.Try(v.toLong).toOption)
}

/** DataSource V2 source for EOS `file info -m` KV record files — the S2
  * ingestion surface (reference main.go:120-137 shells out per row; here
  * the bulk record dump is a scannable table):
  *
  * {{{
  *   spark.read.format("graft-kv").load("/path/to/records.txt")
  * }}}
  *
  * One text line per record; schema `(ino long, file string, uid string,
  * gid string, size long, raw string)`. Implements
  * `SupportsPushDownRequiredColumns`: a query selecting only `ino` parses
  * only `ino` — column pruning reaches the parse, not just the scan.
  * Parallelism: one input partition per file (record dumps are produced
  * per-MGM/per-shard, so files are the natural split unit; a 100 TB dump
  * arrives as many files).
  */
class KvRecordSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvRecordSource.Schema
  // writes pass the incoming frame's schema (a column subset) through to
  // the table, so AppendData/Overwrite resolution validates against what
  // is actually being written rather than the full record schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KvRecordTable(paths(new CaseInsensitiveStringMap(properties)), schema)

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq.flatMap(parsePathsOption)
    (single ++ multi).distinct
  }

  /** Spark serializes a multi-path `load(p1, p2, ...)` as a JSON string
    * array under the `paths` option; accept that plus a plain
    * comma-separated form for hand-written options.
    */
  private def parsePathsOption(v: String): Seq[String] =
    if (v.trim.startsWith("[")) {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      om.readValue(v, classOf[Array[String]]).toSeq
    } else v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
}

object KvRecordSource {
  val Schema: StructType = StructType(Seq(
    StructField("ino", LongType),
    StructField("file", StringType),
    StructField("uid", StringType),
    StructField("gid", StringType),
    StructField("size", LongType),
    StructField("raw", StringType, nullable = false)))
}

final class KvRecordTable(paths: Seq[String],
    tableSchema: StructType = KvRecordSource.Schema) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-kv(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(paths, tableSchema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(paths.size == 1, s"graft-kv write needs exactly one path, got $paths")
    new KvWriteBuilder(paths.head, info)
  }
}

/** Predicate pushdown support for the KV source: the subset of Spark's
  * source filters the parse loop can evaluate EXACTLY on a record line
  * (so Spark does not re-apply them post-scan). At 100 TB of record
  * dumps this is the difference between a point-lookup by `ino` reading
  * every line into an InternalRow and skipping non-matching lines inside
  * the reader — no row object, no downstream filter work. Null field →
  * comparison false (SQL semantics); numeric filter values compare as
  * longs (Catalyst may hand Integer literals for a long column).
  */
private[sources] object KvFilters {
  import org.apache.spark.sql.sources._
  private val Cols = Set("ino", "file", "uid", "gid", "size")

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _) => Cols(a)
    case GreaterThan(a, _) => Cols(a)
    case GreaterThanOrEqual(a, _) => Cols(a)
    case LessThan(a, _) => Cols(a)
    case LessThanOrEqual(a, _) => Cols(a)
    case In(a, _) => Cols(a)
    case IsNotNull(a) => Cols(a)
    case IsNull(a) => Cols(a)
    case StringStartsWith(a, _) => Cols(a)
    case And(l, r) => supported(l) && supported(r)
    case _ => false
  }

  /** Three-way compare of a parsed field value against a filter value;
    * None when either side is null or the types are incomparable. String
    * order MUST be unsigned UTF-8 BYTE order — what Spark's UTF8String
    * comparisons use — not Java's UTF-16 code-unit compareTo: the two
    * disagree on supplementary characters (surrogates sort low in
    * UTF-16), and a pushed filter Spark trusts as fully handled has no
    * residual re-filter to correct a divergence.
    */
  private def cmp(x: Any, v: Any): Option[Int] = (x, v) match {
    case (null, _) | (_, null) => None
    case (a: Long, b: Number) => Some(java.lang.Long.compare(a, b.longValue))
    case (a: String, b: String) => Some(java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    case _ => None
  }

  def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v) => cmp(get(a), v).contains(0)
    case GreaterThan(a, v) => cmp(get(a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(get(a), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(get(a), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(get(a), v).exists(_ <= 0)
    case In(a, vs) => vs.exists(v => cmp(get(a), v).contains(0))
    case IsNotNull(a) => get(a) != null
    case IsNull(a) => get(a) == null
    case StringStartsWith(a, p) => get(a) match {
      case s: String => s.startsWith(p)
      case _ => false
    }
    case And(l, r) => eval(l, get) && eval(r, get)
    case other => throw new IllegalStateException(s"unsupported pushed filter $other")
  }
}

final class KvScanBuilder(paths: Seq[String],
    tableSchema: StructType = KvRecordSource.Schema)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = tableSchema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    val (sup, rest) = filters.partition(KvFilters.supported)
    pushed = sup
    rest // residual: Spark evaluates these post-scan; pushed ones it trusts us with
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  override def build(): Scan = new KvScan(paths, required, pushed)
}

final class KvScan(paths: Seq[String], required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surfaces the pushdown in .explain output (custom scans print their
  // description inside BatchScan), so specs pin it the same way they pin
  // parquet's PushedFilters
  override def description(): String =
    s"graft-kv ${paths.mkString(",")} " +
      s"PushedFilters: [${filters.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  /** One partition per data file; directory paths expand RECURSIVELY to
    * their data files (driver-side Hadoop listing, like the built-in file
    * index) so a dump DIRECTORY — including a nested per-shard layout, or
    * one produced by this source's own writer — scans in parallel and in
    * full. Hidden files/dirs (`_`/`.` prefixes) are skipped at every
    * level, matching the built-in sources' convention.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    paths.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      if (fs.getFileStatus(hp).isDirectory) {
        def visible(n: String): Boolean = !n.startsWith("_") && !n.startsWith(".")
        // iterative walk with a depth cap: a symlink cycle (or an absurdly
        // deep layout) fails loudly instead of recursing the driver to
        // death — 64 levels is far beyond any real dump layout
        val out = Seq.newBuilder[String]
        val stack = scala.collection.mutable.Stack((hp, 0))
        while (stack.nonEmpty) {
          val (dir, depth) = stack.pop()
          require(depth <= 64,
            s"graft-kv: directory nesting deeper than 64 under $p (symlink cycle?)")
          fs.listStatus(dir).foreach { st =>
            if (visible(st.getPath.getName)) {
              if (st.isDirectory) stack.push((st.getPath, depth + 1))
              else out += st.getPath.toString
            }
          }
        }
        out.result()
      } else Seq(p)
    }.map(p => KvInputPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // Capture the session's Hadoop conf at planning time (driver) and ship
    // it serialized — executors resolve each path's FileSystem from it, so
    // credentials/filesystem settings flow exactly like the built-in file
    // sources'.
    new KvReaderFactory(required.fieldNames, filters,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
}

final case class KvInputPartition(path: String) extends InputPartition

// ---- write side -------------------------------------------------------

/** Write support for the record format — the inverse of [[KvParse]]: each
  * row becomes one `key=value` line, the `file` value carried behind its
  * `keylength.file=<n>` prefix so embedded spaces survive re-parsing
  * (the same convention the reference's reader demands, main.go:191-198).
  * Null fields simply omit their token (the reader returns null for
  * missing keys — the agreed convention across the KV surfaces).
  *
  * Protocol: each task writes its own uniquely-named file under the
  * target directory and task abort deletes it; `overwrite` (TRUNCATE)
  * clears pre-existing data files on the driver before tasks launch.
  * That is dump-sink semantics (idempotent per task, not atomic across a
  * concurrent reader), which matches what the format IS — a record dump
  * directory — and keeps the writer free of committer machinery.
  */
final class KvWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new KvWrite(path, info.schema(), doTruncate)
}

final class KvWrite(path: String, schema: StructType, truncate: Boolean)
    extends Write with BatchWrite {
  private val Allowed = Set("ino", "file", "uid", "gid", "size")
  require(schema.fieldNames.forall(Allowed),
    s"graft-kv writes columns ${Allowed.mkString("/")}; got ${schema.fieldNames.mkString(",")}")
  // Types too, not just names: with supportsExternalMetadata the table
  // reports the incoming frame's schema verbatim and Spark inserts no
  // casts, so an IntegerType `ino` would read garbage through getLong and
  // a LongType `uid` would crash opaquely executor-side — fail at plan
  // time instead.
  schema.fields.foreach { f =>
    val expected = KvRecordSource.Schema(f.name).dataType
    require(f.dataType == expected,
      s"graft-kv: column ${f.name} must be $expected, got ${f.dataType}")
  }

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    if (truncate && fs.exists(dir))
      fs.listStatus(dir).filter(_.isFile).foreach(s => fs.delete(s.getPath, false))
    fs.mkdirs(dir)
    new KvWriterFactory(path, schema.fieldNames,
      new org.apache.spark.util.SerializableConfiguration(conf))
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class KvWriterFactory(dir: String, fields: Array[String],
                            conf: org.apache.spark.util.SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(s"$dir/part-$partitionId-$taskId.kv", fields, conf.value)
}

final case class KvCommitMessage(path: String) extends WriterCommitMessage

final class KvDataWriter(file: String, fields: Array[String],
                         hadoopConf: org.apache.hadoop.conf.Configuration)
    extends DataWriter[InternalRow] {
  /** ' token=' inside a value — the shape the whole-line key scan would
    * mistake for a real field (a '=' with no preceding space can never
    * start a token match: the payload itself follows 'file=', not a
    * space, so '=' without internal spaces is fine — '/a/b=c' writes).
    */
  private val SpoofToken = java.util.regex.Pattern.compile("\\s\\S*=")
  private val hPath = new org.apache.hadoop.fs.Path(file)
  private val fs = hPath.getFileSystem(hadoopConf)
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    fs.create(hPath, true), java.nio.charset.StandardCharsets.UTF_8))

  override def write(row: InternalRow): Unit = {
    val tokens = Seq.newBuilder[String]
    var i = 0
    while (i < fields.length) {
      if (!row.isNullAt(i)) fields(i) match {
        case "file" =>
          val v = row.getUTF8String(i).toString
          // records are one-per-line: a newline in any value would split
          // the record and silently corrupt the dump — fail loudly instead
          require(!v.contains('\n') && !v.contains('\r'),
            s"graft-kv: file value contains a line break: ${v.take(60)}")
          // a payload embedding ' key=' text would shadow later tokens
          // under the (reference-faithful) whole-line token scan — the
          // format cannot represent it unambiguously
          require(!SpoofToken.matcher(v).find(),
            s"graft-kv: file value embeds a 'key=' token the reader would misparse: ${v.take(60)}")
          // the keylength prefix counts what the SQL-side reader consumes
          // (code points); supplementary characters would make UTF-16 and
          // code-point counts disagree between the two blessed readers
          require(v.length == v.codePointCount(0, v.length),
            s"graft-kv: file value contains supplementary characters: ${v.take(60)}")
          // the reader rejects keylength prefixes over 9 digits as corrupt
          // — a longer value is unrepresentable and must fail at write,
          // not round-trip to null
          require(v.length <= 999999999,
            s"graft-kv: file value longer than 9-digit keylength (${v.length} chars)")
          // the keylength prefix must LEAD the record (the parser anchors
          // on it), so prepend both tokens; embedded SPACES are fine here
          // (that is what the length prefix exists for)
          tokens.+=(s"keylength.file=${v.length} file=$v")
        case "ino"  => tokens += s"ino=${row.getLong(i)}"
        case "size" => tokens += s"size=${row.getLong(i)}"
        case k      =>
          val v = row.getUTF8String(i).toString
          // only file= carries a length prefix; any whitespace in other
          // values would shift every later token under re-parsing
          require(!v.exists(c => c == ' ' || c == '\n' || c == '\r' || c == '\t'),
            s"graft-kv: $k value contains whitespace (only file= may): ${v.take(60)}")
          // '=' round-trips through THIS reader, but the reference Go
          // parser (strings.Split on '=', len==2 check, main.go:186-189)
          // drops such tokens — dumps must stay readable by the tool the
          // format mimics, so reject at write
          require(!v.contains('='),
            s"graft-kv: $k value contains '=' (unreadable by the reference parser): ${v.take(60)}")
          tokens += s"$k=$v"
      }
      i += 1
    }
    // file-token first (parser requirement), others keep field order
    val (lead, rest) = tokens.result().partition(_.startsWith("keylength.file="))
    val all = lead ++ rest
    // an all-null row would emit an empty line the reader silently skips —
    // rows must never vanish on a round trip
    require(all.nonEmpty, "graft-kv: row with every field null is not representable")
    out.write(all.mkString(" "))
    out.newLine()
  }

  override def commit(): WriterCommitMessage = { out.close(); KvCommitMessage(file) }
  override def abort(): Unit = { out.close(); fs.delete(hPath, false) }
  override def close(): Unit = ()
}

final class KvReaderFactory(fields: Array[String],
                            filters: Array[org.apache.spark.sql.sources.Filter],
                            conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KvPartitionReader(partition.asInstanceOf[KvInputPartition].path, fields,
      filters, conf.value)
}

/** Reads one record file through the Hadoop FileSystem API, so any
  * Spark-supported scheme works (local, hdfs://, s3a://, ...) — record
  * dumps on a 100 TB deployment live on distributed storage. Pushed
  * filters run on the raw line BEFORE an InternalRow exists: a rejected
  * line costs only the filter fields' token extraction.
  */
final class KvPartitionReader(path: String, fields: Array[String],
                              filters: Array[org.apache.spark.sql.sources.Filter],
                              hadoopConf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {
  private val reader = {
    val p = new org.apache.hadoop.fs.Path(path)
    new java.io.BufferedReader(new java.io.InputStreamReader(
      p.getFileSystem(hadoopConf).open(p), java.nio.charset.StandardCharsets.UTF_8))
  }
  private var row: InternalRow = _

  /** Scala-level field value for filter evaluation (Long / String / null). */
  private def fieldVal(raw: String, name: String): Any = name match {
    case "ino"  => KvParse.getLong(raw, "ino").map(Long.box).orNull
    case "file" => KvParse.file(raw).orNull
    case "uid"  => KvParse.get(raw, "uid").orNull
    case "gid"  => KvParse.get(raw, "gid").orNull
    case "size" => KvParse.getLong(raw, "size").map(Long.box).orNull
    case "raw"  => raw
    case other  => throw new IllegalArgumentException(s"unknown field: $other")
  }

  private def passes(raw: String): Boolean =
    filters.isEmpty || {
      // memoize per line: And-trees and multi-filter pushes share lookups
      val memo = scala.collection.mutable.Map.empty[String, Any]
      val get = (n: String) => memo.getOrElseUpdate(n, fieldVal(raw, n))
      filters.forall(f => KvFilters.eval(f, get))
    }

  override def next(): Boolean = {
    var raw = reader.readLine()
    while (raw != null) {
      if (raw.nonEmpty && passes(raw)) { row = parse(raw); return true }
      raw = reader.readLine()
    }
    false
  }
  override def get(): InternalRow = row
  override def close(): Unit = reader.close()

  /** Only the pruned-in fields are parsed. */
  private def parse(raw: String): InternalRow = {
    val values: Array[Any] = fields.map {
      case "ino"  => KvParse.getLong(raw, "ino").map(Long.box).orNull
      case "file" => KvParse.file(raw).map(UTF8String.fromString).orNull
      case "uid"  => KvParse.get(raw, "uid").map(UTF8String.fromString).orNull
      case "gid"  => KvParse.get(raw, "gid").map(UTF8String.fromString).orNull
      case "size" => KvParse.getLong(raw, "size").map(Long.box).orNull
      case "raw"  => UTF8String.fromString(raw)
      case other  => throw new IllegalArgumentException(s"unknown field: $other")
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
}
