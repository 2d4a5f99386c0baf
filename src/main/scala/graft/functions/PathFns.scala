package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Path / string derivation functions (reference main.go F1-F6 per SURVEY §2.6).
  *
  * All are pure `Column` expressions (no UDFs) so they stay inside
  * whole-stage codegen and Catalyst can constant-fold / push them.
  *
  * Semantics follow Go's `path` package on the inputs the reference
  * actually sees (clean absolute paths): `path.Dir` (main.go:143,290),
  * `path.Base` (main.go:144,228,280), `path.Join` + versions prefix
  * (main.go:145).
  */
object PathFns {

  /** Prefix marking EOS version folders (reference main.go:21). */
  val VersionsPrefix = ".sys.v#."

  /** Dirname: strip the last `/component` (Go `path.Dir` on clean abs paths).
    * `/a/b/c.txt` -> `/a/b`; `/a` -> `/` (root kept).
    */
  def pathDirname(c: Column): Column = {
    val stripped = regexp_replace(c, "/[^/]*$", "")
    when(stripped === "", lit("/")).otherwise(stripped)
  }

  /** Basename: last path component (Go `path.Base`). */
  def pathBasename(c: Column): Column = regexp_extract(c, "[^/]*$", 0)

  /** Versions-folder path for a file: `dir/.sys.v#.base` (main.go:143-145).
    * Matches Go `path.Join`: when dir is "/" the separator is not doubled.
    */
  def versionsPath(c: Column): Column = {
    val dir = pathDirname(c)
    concat(
      when(dir === "/", lit("/")).otherwise(concat(dir, lit("/"))),
      lit(VersionsPrefix), pathBasename(c))
  }

  /** F4 slash normalization, the `path.Clean` subset EOS paths can need:
    * collapse `//` runs and strip one trailing slash (root stays "/").
    * Dot segments are out of scope — EOS emits canonical absolute paths
    * (no "." / ".."), and the reference only Cleans before the parent-dir
    * split (main.go:278).
    */
  def pathCleanSlashes(c: Column): Column =
    regexp_replace(regexp_replace(c, "/{2,}", "/"), "(.)/$", "$1")

  /** Name of the parent directory (second-to-last component of the CLEANED
    * path — the reference splits `path.Clean(meta.Path)`, main.go:278-279,
    * so `/a//b/f` and `/a/b/f` route identically).
    */
  def parentDirName(c: Column): Column =
    pathBasename(pathDirname(pathCleanSlashes(c)))

  /** True when the file's basename marks it as a versions folder (main.go:280). */
  def isVersionsFolder(path: Column): Column =
    pathBasename(path).startsWith(VersionsPrefix)

  /** True when the path points INTO a versions folder, i.e. the share
    * references a version file (main.go:288).
    */
  def pointsToVersion(path: Column): Column =
    parentDirName(path).startsWith(VersionsPrefix)

  /** True when the path lives under the user home prefix (main.go:284). */
  def underPrefix(path: Column, prefix: String): Column =
    path.startsWith(prefix)

  // --------------------------------------------------------------------
  // EOS `file info -m` record parsing (F5/F6, main.go:182-207).
  // Record shape: "keylength.file=<n> file=<path maybe with spaces> k=v ..."
  // --------------------------------------------------------------------

  /** Naive space/equals KV tokenization (main.go:184-189). Values containing
    * spaces are truncated — exactly like the reference; use [[kvFile]] for
    * the `file` key. The token start is anchored (start-of-string or a
    * space) so `ino` cannot match inside `pino=`, nor `size` inside
    * `treesize=` — the reference splits on spaces and compares keys exactly.
    *
    * Missing key -> null (the convention every KV surface shares: this
    * Column form, the native `graft_kv_parse` struct, and the `graft-kv`
    * DSv2 reader); a present-but-empty value (`key= `) -> "" — regexp
    * alone can't tell the two apart, hence the anchored presence guard.
    */
  def kvGet(raw: Column, key: String): Column = {
    val pat = "(?:^| )" + java.util.regex.Pattern.quote(key) + "=([^ ]*)"
    when(raw.rlike(pat), regexp_extract(raw, pat, 1))
      .otherwise(lit(null).cast("string"))
  }

  /** Length-prefixed extraction of the `file=` value (main.go:191-198):
    * the payload starts right after `"keylength.file=<n> file="` and runs
    * for `<n>` characters, surviving embedded spaces.
    */
  def kvFile(raw: Column): Column = {
    val nStr = regexp_extract(raw, "^keylength\\.file=([0-9]+)", 1)
    // 1-based start = len("keylength.file=") + len(n) + len(" file=") + 1
    val start = lit(15) + length(nStr) + lit(7)
    // regexp_extract misses yield "" — route to null instead of letting
    // ANSI mode (Spark 4 default) throw on the cast
    raw.substr(start, when(nStr === "", lit(null).cast("int"))
      .otherwise(nStr.cast("int")))
  }

  /** F10 (main.go:277 `strconv.Quote`): double-quoted string with backslash,
    * quote, and common control-char escapes — the subset Go emits for the
    * clean file paths the audit line quotes. Literal `replace`, not regex,
    * so it stays codegen'd and oracle-parity is trivial (DuckDB `replace`).
    */
  def quoted(c: Column): Column =
    concat(lit("\""),
      replace(replace(replace(replace(
        c,
        lit("\\"), lit("\\\\")),
        lit("\""), lit("\\\"")),
        lit("\n"), lit("\\n")),
        lit("\t"), lit("\\t")),
      lit("\""))

  /** Typed projection of a raw EOS record into the Metadata fields
    * (main.go:200-205): ino/size parsed to long (missing key -> null,
    * ANSI-safe), uid/gid kept as strings.
    */
  private def kvLong(raw: Column, key: String): Column = {
    val v = kvGet(raw, key)
    when(v === "", lit(null).cast("long")).otherwise(v.cast("long"))
  }
  def kvIno(raw: Column): Column  = kvLong(raw, "ino")
  def kvSize(raw: Column): Column = kvLong(raw, "size")
  def kvUid(raw: Column): Column  = kvGet(raw, "uid")
  def kvGid(raw: Column): Column  = kvGet(raw, "gid")
}
