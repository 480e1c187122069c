package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting — the manual answer to shuffle skew where AQE can't help:
  * AQE's skew-join split only rewrites sort-merge JOIN partitions; a
  * shuffle whose key is inherently low-cardinality (event_type, lang,
  * country) hot-spots AGGREGATIONS and hash joins too, and no runtime
  * re-plan can split ONE key's hash bucket. Salting re-keys the shuffle on
  * (key, salt) — `salt` deterministic per row — so a key that is 90% of
  * the corpus spreads over `salt` reducers instead of one.
  *
  * Everything here is deterministic (salt derives from row content, never
  * `rand()`), so results are reproducible and, because the salt never
  * reaches the output, oracle-checkable against the unsalted semantics.
  */
object Salted {

  /** Equi join on `keys` where the LEFT side is skewed on those keys and
    * the right side is too large (or the planner too conservative) to
    * broadcast: left rows get `__salt = hash(saltBy) mod salt`, right rows
    * are replicated once per salt value, and the join runs on
    * `keys :+ __salt` — the hot key's rows now land on `salt` reducers,
    * each joining against its own copy of the dim row.
    *
    * Cost model: replication multiplies the RIGHT side by `salt`, so this
    * wins exactly when |right| · salt ≪ (hot-key share of |left|) — the
    * dim-to-a-skewed-fact case. `saltBy` should be a column that varies
    * within the hot key (a row id), not the key itself. Inner and left
    * joins preserve semantics exactly (every left row keeps exactly the
    * matches it had; right-side duplicates can't arise because a left row
    * carries ONE salt value and each (key, salt) holds one copy). */
  def joinSkewed(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, saltBy: Column, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, "salt factor must be >= 1")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salted join preserves semantics for inner/left joins only, got $joinType")
    val l = left.withColumn("__salt", pmod(hash(saltBy), lit(salt)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Exact count-distinct per key under key skew: the value is hashed into
    * the salt, so stage 1 (`groupBy(key, salt) countDistinct(value)`)
    * spreads ONE hot key's distinct-set over `salt` reducers; distinct
    * values partition disjointly by their own hash, so stage 2's plain sum
    * of the partial counts is exact, not an estimate. (The unsalted
    * `groupBy(key).agg(countDistinct)` must materialize a hot key's whole
    * distinct set on one reducer — the aggregation analog of join skew.) */
  def countDistinctSkewed(df: DataFrame, keys: Seq[String], valueCol: String,
                          salt: Int, out: String = "n_distinct"): DataFrame = {
    require(salt >= 1, "salt factor must be >= 1")
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(salt)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(countDistinct(col(valueCol)).as("__c"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__c")).cast("long").as(out))
  }
}
