package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-stage aggregation for skewed group keys.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to ONE
  * reducer — the classic straggler at 100 TB (one user with 10⁹ events,
  * one ubiquitous token). Salting splits each key into `salts` subkeys
  * for the first, heavy shuffle (each reducer sees at most ~1/salts of a
  * hot key), then merges the per-salt partials in a second, tiny shuffle
  * whose input is |keys|×salts pre-aggregated rows.
  *
  * Only valid for ALGEBRAIC aggregates (count/sum/min/max and anything
  * composed of them, e.g. avg = sum/count) — which is also exactly the
  * set that merges correctly at scale. With exact accumulator types
  * (longs, decimals) the result is identical to the unsalted aggregate,
  * so the operator is oracle-able.
  *
  * The salt is `pmod(hash(all columns), salts)` — a pure function of row
  * content, no rand(): task retries and speculative re-execution see the
  * same salt. (A key whose rows are all byte-identical still lands on
  * one salt; only exact duplicates do, and the final result is unchanged
  * either way.)
  */
object SkewSalt {

  /** @param partials per-salt stage: (output name, aggregate over input columns)
    * @param finals   merge stage: (output name, aggregate/expr over partial names) */
  def aggregate(df: DataFrame, keys: Seq[String], salts: Int,
                partials: Seq[(String, Column)],
                finals: Seq[(String, Column)]): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(partials.nonEmpty && finals.nonEmpty, "need at least one aggregate")
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val stage1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(finals.head._2.as(finals.head._1),
        finals.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Salted equi-join for a skewed fact key: the dim side is replicated
    * `salts`× (explode over the salt range), the fact side gets a
    * content-derived deterministic salt, and the join key becomes
    * (key, salt) — a hot fact key's rows now spread over `salts`
    * reducers instead of one. Join output is IDENTICAL to the unsalted
    * equi-join (each fact row matches exactly one dim replica), so the
    * operator is oracle-able. Use when the dim is too big to broadcast
    * AND the fact key is skewed; cost is `salts`× the dim shuffle
    * volume (dims are the small side by definition).
    */
  def join(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
           salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "inputs must not already contain a __salt column")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // keys resolved AGAINST THEIR OWN SIDE: an unqualified col(factKey)
    // is ambiguous whenever the same name exists on both sides — the
    // common fact.join(dim, "id", "id") case
    saltedFact.join(replicatedDim,
        saltedFact("__salt") === replicatedDim("__salt") &&
          saltedFact(factKey) === replicatedDim(dimKey))
      .drop(saltedFact("__salt")).drop(replicatedDim("__salt"))
  }

  /** Common case: salted row count + exact decimal sum per key. */
  def countSum(df: DataFrame, keys: Seq[String], valueCol: String,
               salts: Int = 16): DataFrame =
    aggregate(df, keys, salts,
      partials = Seq(
        "__n" -> count(lit(1)),
        "__s" -> sum(col(valueCol).cast("decimal(28,4)"))),
      finals = Seq(
        "n" -> sum(col("__n")),
        "total" -> sum(col("__s")).cast("double")))
}
