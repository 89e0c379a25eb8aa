package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling (on by default in graft sessions) splits
  * oversized shuffle partitions at runtime and is the first line of
  * defense; salting is for the pathological case it can't fix — one join
  * key carrying a double-digit percentage of a 100 TB fact table.
  *
  * The skewed (large) side gets a deterministic salt in [0, salt); the
  * small side is replicated `salt` times; the join key becomes
  * (key, salt), spreading one hot key over `salt` shuffle partitions.
  * Deterministic salting (hash of the whole row, not rand()) keeps task
  * retries and replays consistent.
  */
object SkewJoin {

  private val supportedJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")

  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
                     salt: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    // The small side is replicated `salt` times, so any join type that can
    // emit unmatched SMALL-side rows (right/full outer) would emit each of
    // them `salt` times — restrict to types where small-side rows only
    // appear through a match.
    require(supportedJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedEquiJoin supports inner/left/left_semi/left_anti, not $joinType " +
        "(the replicated small side would duplicate unmatched right rows)")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(salt)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedLarge.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
