package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Composable pipeline runner — the reference's `run_pipeline`
  * (main.py:333-361) as a first-class library shape: named stages chained
  * into ONE lazy plan, with a per-stage row count observed on the single
  * execution pass.
  *
  * The stages still fuse: `observe` nodes are metric taps, not barriers,
  * so Catalyst optimizes across stage boundaries exactly as if the
  * pipeline were hand-written — declaring stages costs nothing at plan
  * level (verify with `.explain`). The counts answer the operational
  * question every multi-stage job gets asked — "where did my rows go?" —
  * without a count() action per stage (each of which would re-execute
  * the prefix of the pipeline; at 100 TB that is N full re-reads).
  */
object Pipeline {

  final case class Stage(name: String, f: DataFrame => DataFrame)

  final case class Result(df: DataFrame, observations: Seq[(String, Observation)]) {
    /** Rows LEAVING each stage. Only valid after an action ran on `df`. */
    def rowCounts: Map[String, Long] =
      observations.map { case (n, o) => n -> o.get("rows").asInstanceOf[Long] }.toMap
  }

  /** Chain `stages` over `input`; each stage's output gets an observed
    * row count. Returns the composed (still unexecuted) frame plus the
    * observation handles.
    */
  def apply(input: DataFrame, stages: Seq[Stage]): Result = {
    val (df, obs) = stages.foldLeft((input, List.empty[(String, Observation)])) {
      case ((acc, seen), Stage(name, f)) =>
        val o = Observation(s"stage_$name")
        (f(acc).observe(o, count(lit(1)).as("rows")), (name, o) :: seen)
    }
    Result(df, obs.reverse)
  }
}
