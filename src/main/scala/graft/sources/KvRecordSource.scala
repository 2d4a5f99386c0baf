package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
    if (digits.isEmpty) return None
    val n = digits.toInt
    val start = 15 + digits.length + 6 // "keylength.file=" + digits + " file="
    if (start + n > raw.length) None else Some(raw.substring(start, start + n))
  }

  /** Exact-key token lookup: `key=` at string start or after a space, so
    * `ino` never matches inside `pino=` (main.go:184-189).
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
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KvRecordTable(paths(new CaseInsensitiveStringMap(properties)))

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

final class KvRecordTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft-kv(${paths.mkString(",")})"
  override def schema(): StructType = KvRecordSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(paths)
}

final class KvScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = KvRecordSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new KvScan(paths, required)
}

final class KvScan(paths: Seq[String], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => KvInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    // Capture the session's Hadoop conf at planning time (driver) and ship
    // it serialized — executors resolve each path's FileSystem from it, so
    // credentials/filesystem settings flow exactly like the built-in file
    // sources'.
    new KvReaderFactory(required.fieldNames,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
}

final case class KvInputPartition(path: String) extends InputPartition

final class KvReaderFactory(fields: Array[String],
                            conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KvPartitionReader(partition.asInstanceOf[KvInputPartition].path, fields,
      conf.value)
}

/** Reads one record file through the Hadoop FileSystem API, so any
  * Spark-supported scheme works (local, hdfs://, s3a://, ...) — record
  * dumps on a 100 TB deployment live on distributed storage.
  */
final class KvPartitionReader(path: String, fields: Array[String],
                              hadoopConf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {
  private val reader = {
    val p = new org.apache.hadoop.fs.Path(path)
    new java.io.BufferedReader(new java.io.InputStreamReader(
      p.getFileSystem(hadoopConf).open(p), java.nio.charset.StandardCharsets.UTF_8))
  }
  private var row: InternalRow = _

  override def next(): Boolean = {
    var raw = reader.readLine()
    while (raw != null) {
      if (raw.nonEmpty) { row = parse(raw); return true }
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
