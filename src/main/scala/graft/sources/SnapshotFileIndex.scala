package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, Not, Or}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graftshim.CatalystBridge
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructType}

/** Planning-time FILE SKIPPING for snapshot-log reads — the missing half
  * of the manifest range stamps (`# range=<file>:<lo>:<hi>` on the table
  * key, `# colrange=<col>:<file>:<lo>:<hi>` on Z-order dimensions,
  * stamped by every committing op in [[graft.operators.SnapshotLog]]).
  * The stamps already plan WRITES (CoW merge footprints, point lookups,
  * CDC B-parts); this class hands the same metadata to Spark's scan
  * planner so plain READS skip too: `SELECT ... FROM graft.t WHERE key <
  * 10` opens only the data files whose stamped key range intersects the
  * predicate, at manifest cost, before a single footer is fetched.
  *
  * This is the standard lakehouse data-skipping seam (Delta's
  * `TahoeFileIndex`, Iceberg's manifest evaluator): a custom
  * [[FileIndex]] whose `listFiles(partitionFilters, dataFilters)` —
  * called by `FileSourceStrategy` with the query's pushed data filters —
  * answers from per-file stats instead of a directory listing. Parquet
  * row-group pruning does the same work AFTER opening a file; at 100 TB
  * (10^5 files) the open-and-read-footer per file is itself the
  * bottleneck for selective queries, and this removes it: a key-range
  * query on a key-clustered table plans to ~1 file from ONE metadata
  * read. Non-selective scans are unchanged — `listFiles` with no usable
  * stats predicate returns every file, same plan as before.
  *
  * Pruning is tri-state interval logic over the stamped `[lo, hi]`
  * intervals (min/max of long-typed columns, nulls excluded by
  * parquet-stats construction): an expression evaluates to `Some(true)`
  * (every in-range value satisfies it), `Some(false)` (none does — the
  * file is skipped), or `None` (mixed/unsupported — kept). `And`/`Or`/
  * `Not` compose by Kleene logic, so an unsupported conjunct can only
  * make pruning more conservative, never wrong. Columns without a
  * stamped interval for a file — and whole files without stamps (raw
  * `commit()` manifests, pre-stamp history) — never contribute a
  * verdict. After `compactZ`, BOTH Morton dimensions carry stamps, so a
  * filter on either one skips — the actual payoff of Z-ordering, now at
  * the planning seam rather than the footer.
  *
  * The scan this index backs is the SAME physical parquet scan
  * `spark.read.parquet(files)` builds — `HadoopFsRelation` + vectorized
  * `ParquetFileFormat`, explicit data schema (so evolved tables read old
  * files through the wider stamped schema, absent columns null) — only
  * the file-listing seam differs. Column pruning, filter pushdown to
  * row groups and whole-stage codegen all apply unchanged;
  * SnapshotSkipSpec pins both the plan facts and end-to-end equality
  * with the unpruned read.
  */
final class SnapshotFileIndex(
    table: Path,
    files: Seq[FileStatus],
    ranges: Map[String, Map[String, (Long, Long)]],
    resolve: (String, String) => Boolean) extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(table)

  override def partitionSchema: StructType = StructType(Nil)

  override def inputFiles: Array[String] = files.map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override lazy val sizeInBytes: Long = files.map(_.getLen).sum

  /** Files surviving the data filters — the skipping decision. */
  def prunedFiles(dataFilters: Seq[Expression]): Seq[FileStatus] =
    files.filter { st =>
      ranges.get(st.getPath.getName) match {
        case Some(colRanges) if colRanges.nonEmpty =>
          !dataFilters.exists(f =>
            SnapshotFileIndex.evalOnRanges(f, colRanges, resolve).contains(false))
        case _ => true
      }
    }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, prunedFiles(dataFilters).toArray))
}

object SnapshotFileIndex {

  /** Tri-state evaluation of `e` against a file whose stamped columns
    * span the given `[lo, hi]` intervals: Some(true) = holds for EVERY
    * possible row of the file, Some(false) = holds for NONE, None =
    * mixed or unsupported. Only long-typed literals participate (the
    * snapshot log stamps long ranges); anything else is None = kept.
    */
  private[graft] def evalOnRanges(e: Expression,
      colRanges: Map[String, (Long, Long)],
      resolve: (String, String) => Boolean): Option[Boolean] = {

    def rangeOf(x: Expression): Option[(Long, Long)] = x match {
      case a: Attribute =>
        colRanges.collectFirst { case (c, r) if resolve(a.name, c) => r }
      case _ => None
    }
    def litLong(x: Expression): Option[Long] = x match {
      case Literal(v, LongType) if v != null    => Some(v.asInstanceOf[Long])
      case Literal(v, IntegerType) if v != null => Some(v.asInstanceOf[Int].toLong)
      case Literal(v, ShortType) if v != null   => Some(v.asInstanceOf[Short].toLong)
      case Literal(v, ByteType) if v != null    => Some(v.asInstanceOf[Byte].toLong)
      case _                                    => None
    }
    // interval verdicts for col <op> v over col's [lo, hi]
    def eq(lo: Long, hi: Long)(v: Long): Option[Boolean] =
      if (v < lo || v > hi) Some(false)
      else if (lo == hi) Some(true)
      else None
    def lt(lo: Long, hi: Long)(v: Long): Option[Boolean] =
      if (hi < v) Some(true) else if (lo >= v) Some(false) else None
    def le(lo: Long, hi: Long)(v: Long): Option[Boolean] =
      if (hi <= v) Some(true) else if (lo > v) Some(false) else None
    def gt(lo: Long, hi: Long)(v: Long): Option[Boolean] =
      if (lo > v) Some(true) else if (hi <= v) Some(false) else None
    def ge(lo: Long, hi: Long)(v: Long): Option[Boolean] =
      if (lo >= v) Some(true) else if (hi < v) Some(false) else None

    // a comparison atom: `a <op> b` where one side is a stamped column
    // and the other a long literal; `fwd` is the verdict when the column
    // is on the LEFT, `rev` when it is on the RIGHT (mirrored operator)
    def cmp(a: Expression, b: Expression,
        fwd: (Long, Long) => Long => Option[Boolean],
        rev: (Long, Long) => Long => Option[Boolean]): Option[Boolean] =
      (rangeOf(a), rangeOf(b)) match {
        case (Some((lo, hi)), _) => litLong(b).flatMap(fwd(lo, hi))
        case (_, Some((lo, hi))) => litLong(a).flatMap(rev(lo, hi))
        case _                   => None
      }

    def inVerdict(a: Expression, longs: Seq[Option[Long]]): Option[Boolean] =
      rangeOf(a).flatMap { case (lo, hi) =>
        if (longs.exists(_.isEmpty)) None // a non-literal / non-long member
        else {
          val inRange = longs.flatten.filter(v => v >= lo && v <= hi)
          if (inRange.isEmpty) Some(false)
          else if (lo == hi) Some(true) // single-value file, one member hits
          else None
        }
      }

    def ev(x: Expression): Option[Boolean] = x match {
      case Literal(b: Boolean, _) => Some(b)
      case And(l, r) => (ev(l), ev(r)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true))            => Some(true)
        case _                                   => None
      }
      case Or(l, r) => (ev(l), ev(r)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false))        => Some(false)
        case _                                 => None
      }
      case Not(c)              => ev(c).map(!_)
      case EqualTo(a, b)       => cmp(a, b, eq, eq)
      // NOT EqualTo here: `col <=> v` is FALSE (not NULL) on a null row,
      // so on a file stamped [v, v] that also holds nulls the eq verdict
      // Some(true) would be a lie — `NOT (col <=> v)` would flip it to
      // Some(false) and skip the file, silently dropping the null rows
      // that DO satisfy the negation (stamps are parquet min/max: nulls
      // are invisible to them). Some(false) (v outside the range) stays
      // sound — a null row fails `<=>` against a non-null literal — but
      // tri-state Not cannot tell which side the verdict came from, so
      // the only sound answer without a null count is None.
      case EqualNullSafe(_, _) => None
      case LessThan(a, b)      => cmp(a, b, lt, gt)
      case LessThanOrEqual(a, b)    => cmp(a, b, le, ge)
      case GreaterThan(a, b)        => cmp(a, b, gt, lt)
      case GreaterThanOrEqual(a, b) => cmp(a, b, ge, le)
      case In(a, vs) if vs.nonEmpty => inVerdict(a, vs.map(litLong))
      case InSet(a, vs) if vs.nonEmpty =>
        inVerdict(a, vs.toSeq.map {
          case v: java.lang.Long    => Some(v.longValue)
          case v: java.lang.Integer => Some(v.longValue)
          case _                    => None
        })
      case _ => None
    }
    ev(e)
  }

  /** The pruned-scan DataFrame over `files` of a snapshot version: the
    * physical plan `spark.read.schema(schema).parquet(files)` would
    * build, with this index at the file-listing seam. `ranges` maps data
    * FILE NAME -> stamped column intervals; files or columns absent from
    * it never skip.
    */
  /** Force every field nullable, recursively — what `DataFrameReader
    * .schema()` does before reading (`asNullable`): a file that predates
    * a stamped column must read it as null, and a non-nullable stamped
    * field would instead make the vectorized reader fabricate defaults.
    */
  private def nullable(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = nullable(f.dataType), nullable = true)))
      case a: org.apache.spark.sql.types.ArrayType =>
        a.copy(elementType = nullable(a.elementType), containsNull = true)
      case m: org.apache.spark.sql.types.MapType =>
        m.copy(valueType = nullable(m.valueType), valueContainsNull = true)
      case other => other
    }

  def scan(spark: SparkSession, table: Path, files: Seq[FileStatus],
      ranges: Map[String, Map[String, (Long, Long)]],
      schema: StructType): DataFrame = {
    val resolver: (String, String) => Boolean =
      spark.sessionState.conf.resolver
    val index = new SnapshotFileIndex(table, files, ranges, resolver)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil),
      dataSchema = nullable(schema).asInstanceOf[StructType],
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    CatalystBridge.ofRows(spark, LogicalRelation(relation, isStreaming = false))
  }
}
