package graft

import org.apache.spark.sql.functions._
import graft.functions.PathFns._

/** Goldens for the path/KV functions — the riskiest pure logic per
  * SURVEY §7.3 (reference main.go:143-145, 182-207).
  */
class PathFnsSpec extends SparkTestBase {

  private def one(c: org.apache.spark.sql.Column): Any = sel(c).get(0)

  test("pathDirname matches Go path.Dir on clean absolute paths") {
    assert(one(pathDirname(lit("/a/b/c.txt"))) == "/a/b")
    assert(one(pathDirname(lit("/a"))) == "/")
    assert(one(pathDirname(lit("/a/b/"))) == "/a/b") // trailing slash: last comp empty
  }

  test("pathBasename matches Go path.Base on clean absolute paths") {
    assert(one(pathBasename(lit("/a/b/c.txt"))) == "c.txt")
    assert(one(pathBasename(lit("/a"))) == "a")
    assert(one(pathBasename(lit("file.txt"))) == "file.txt")
  }

  test("versionsPath inserts the .sys.v#. prefix (main.go:143-145)") {
    assert(one(versionsPath(lit("/eos/scratch/user/u1/f.dat")))
      == "/eos/scratch/user/u1/.sys.v#.f.dat")
    // root dir: no doubled slash (Go path.Join semantics)
    assert(one(versionsPath(lit("/f.dat"))) == "/.sys.v#.f.dat")
  }

  test("parentDirName extracts the second-to-last component (main.go:278-279)") {
    assert(one(parentDirName(lit("/a/.sys.v#.d/v1"))) == ".sys.v#.d")
  }

  test("pathCleanSlashes: collapse // runs, strip trailing slash, keep root (F4)") {
    assert(one(pathCleanSlashes(lit("/a//b/f.dat"))) == "/a/b/f.dat")
    assert(one(pathCleanSlashes(lit("/a/b/"))) == "/a/b")
    assert(one(pathCleanSlashes(lit("/a///b//"))) == "/a/b")
    assert(one(pathCleanSlashes(lit("/"))) == "/")
    assert(one(pathCleanSlashes(lit("//"))) == "/")
    assert(one(pathCleanSlashes(lit("/a/b/f.dat"))) == "/a/b/f.dat") // clean = identity
  }

  test("parentDirName routes non-clean paths like the reference's path.Clean split") {
    // Go: strings.Split(path.Clean(p), "/")[len-2]
    assert(one(parentDirName(lit("/a//b/f.dat"))) == "b")   // Clean -> /a/b/f.dat
    assert(one(parentDirName(lit("/a/b/"))) == "a")          // Clean -> /a/b
    assert(one(parentDirName(lit("/u//.sys.v#.d//v1"))) == ".sys.v#.d")
    // and the router guard built on it
    assert(one(pointsToVersion(lit("/u//.sys.v#.f.dat//v1"))) == true)
  }

  test("router guards: isVersionsFolder / pointsToVersion / underPrefix") {
    assert(one(isVersionsFolder(lit("/u/.sys.v#.f.dat"))) == true)
    assert(one(isVersionsFolder(lit("/u/f.dat"))) == false)
    assert(one(pointsToVersion(lit("/u/.sys.v#.f.dat/v1"))) == true)
    assert(one(pointsToVersion(lit("/u/d/f.dat"))) == false)
    assert(one(underPrefix(lit("/eos/scratch/user/u1/f"), "/eos/scratch/user/")) == true)
    assert(one(underPrefix(lit("/other/f"), "/eos/scratch/user/")) == false)
  }

  test("kvFile survives spaces in the path (length-prefixed, main.go:191-198)") {
    // keylength.file=<n> file=<path> ... — path contains spaces
    val raw = "keylength.file=16 file=/a/my file.d at ino=42 size=7"
    assert(one(kvFile(lit(raw))) == "/a/my file.d at ")
    val raw2 = "keylength.file=6 file=/a/b.c ino=9"
    assert(one(kvFile(lit(raw2))) == "/a/b.c")
  }

  test("kvGet anchors key tokens — ino does not match pino, size not treesize") {
    val raw = "keylength.file=6 file=/a/b.c pino=111 ino=42 treesize=999 size=7 uid=u gid=g"
    assert(one(kvIno(lit(raw))) == 42L)
    assert(one(kvSize(lit(raw))) == 7L)
    assert(one(kvUid(lit(raw))) == "u")
    assert(one(kvGid(lit(raw))) == "g")
    // key at start of string also matches
    assert(one(kvGet(lit("ino=5 x=1"), "ino")) == "5")
  }
}
