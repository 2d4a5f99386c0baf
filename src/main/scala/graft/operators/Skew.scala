package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware equi-join by key salting.
  *
  * A shuffled equi-join sends every row of a key to ONE reducer task; a
  * hot key (one user owning millions of shares, one language dominating a
  * corpus) turns that task into the job's critical path. AQE's skew-join
  * splits oversized partitions adaptively for sort-merge joins; explicit
  * salting is the deterministic tool when the dimension side is too big to
  * broadcast and a hot key is known or recurring:
  *
  *  - the FACT side gets a per-row salt in [0, salts) appended to the key,
  *    spreading each hot key over `salts` reducer tasks;
  *  - the DIMENSION side is replicated once per salt value (`salts` copies
  *    — cheap exactly because the dimension is the small side);
  *  - the join key becomes (key, salt); results are identical to the
  *    unsalted join, each fact row still matching exactly one replica.
  */
object Skew {

  /** Inner/left equi-join of `facts` to `dim` on `keys`, salted `salts`
    * ways. Result rows equal the unsalted join (asserted in SkewSpec).
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting supports inner/left joins, got $joinType")
    // per-row deterministic-enough spread; the RESULT does not depend on
    // which salt a row gets, only the reducer balance does
    val salted = facts.withColumn("__graft_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__graft_salt", joinType)
      .drop("__graft_salt")
  }
}
