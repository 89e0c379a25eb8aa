package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StringType, StructType}

/** Column masking + row filtering — governance policies that live ON the
  * table and are enforced AT READ TIME, the Snowflake/Databricks masking-
  * policy shape re-expressed for this catalog:
  *
  *  - `mask.col.<column>` = `null` | `hash` | `last4` rewrites every read
  *    of the column to its masked form (typed NULL / md5 hex / last-4
  *    suffix), SAME output type, so schemas stay stable;
  *  - `row.filter` = SQL boolean keeps only matching rows — it sits
  *    UNDER the mask projection, so the policy filters on RAW values,
  *    and Catalyst pushes it into the scan (stats file-pruning applies);
  *  - user predicates on masked columns compare MASKED values (the
  *    analyzer rule puts the projection between user plan and relation),
  *    so predicate probing cannot recover raw values;
  *  - time travel and branch reads inherit the policies (a `VERSION AS
  *    OF` must not be the mask bypass).
  *
  * Enforcement boundary, stated honestly:
  *
  *  - the rewrite is [[org.apache.spark.sql.graftbridge.GraftGovernanceRule]],
  *    active in sessions configured with
  *    `spark.sql.extensions=graft.GraftExtensions` (the same boundary as
  *    every Spark-side governance layer: a reader with raw filesystem
  *    credentials was never in the threat model — storage ACLs are);
  *  - `spark.graft.governance.unmasked=true` is the ADMIN bypass for
  *    service sessions (pipelines, maintenance, compliance exports);
  *  - row-level writes (UPDATE/DELETE/MERGE) on a policied table are
  *    REFUSED outside the bypass — a copy-on-write rewrite reads raw
  *    bytes and persists what it read, so running one under a masked
  *    session would either corrupt the table with masked values or leak
  *    raw ones; the refusal lives in `newRowLevelOperationBuilder`,
  *    immune to analyzer-rule ordering. Plain INSERT stays open (writers
  *    add data; they do not read it back);
  *  - the CHANGE FEED is refused on policied tables outside the bypass
  *    (the Databricks CDF × row-filter rule): a changelog replays raw
  *    pre/post images by design;
  *  - metadata planes (stats log min/max, `graft_files`) are admin
  *    surfaces; partition columns cannot be masked at all because their
  *    values are directory names (the refusal keeps the policy honest).
  */
object GraftGovernance {

  val MaskPrefix = "mask.col."
  val RowFilterProp = "row.filter"
  val BypassConf = "spark.graft.governance.unmasked"

  val Policies: Set[String] = Set("null", "hash", "last4")

  def masksOf(props: Map[String, String]): Map[String, String] =
    props.collect { case (k, v) if k.startsWith(MaskPrefix) =>
      k.stripPrefix(MaskPrefix) -> v.trim }

  def rowFilterOf(props: Map[String, String]): Option[String] =
    props.get(RowFilterProp).map(_.trim).filter(_.nonEmpty)

  def bypass(spark: SparkSession): Boolean =
    spark.conf.getOption(BypassConf).contains("true")

  def policied(t: GraftTable): Boolean =
    t.maskCols.nonEmpty || t.rowFilter.nonEmpty

  /** The masked form of a column under `policy`, built RESOLVED (the
    * governed projection needs concrete output attributes the moment it
    * is created). Exact semantics, replayable in any engine:
    *
    *   null  -> CAST(NULL AS <column type>)
    *   hash  -> md5(CAST(col AS STRING))                       (hex)
    *   last4 -> '****' || (length(col) <= 4 ? col : suffix of length 4)
    *
    * (`last4` keeps the whole value when length <= 4 — the deterministic
    * cross-engine form; negative-index substr semantics differ between
    * engines.) Same output type as the column, by validation.
    */
  def maskExpr(policy: String,
               a: org.apache.spark.sql.catalyst.expressions.Attribute)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.BinaryType
    policy match {
      case "null" => Literal(null, a.dataType)
      case "hash" => Md5(Cast(Cast(a, StringType), BinaryType))
      case "last4" =>
        val len = Length(a)
        Concat(Seq(Literal("****"), CaseWhen(
          Seq((LessThanOrEqual(len, Literal(4)), a: Expression)),
          Some(Substring(a, Subtract(len, Literal(3)), Literal(Int.MaxValue))))))
      case other => throw new IllegalArgumentException(
        s"unknown mask policy '$other' (have: ${Policies.mkString(", ")})")
    }
  }

  /** DDL-time validation — LOUD at CREATE / ALTER SET, never at read. */
  def validate(props: Map[String, String], schema: StructType,
               partitionCols: Seq[String]): Unit = {
    val masks = masksOf(props)
    masks.foreach { case (c, policy) =>
      require(Policies.contains(policy),
        s"$MaskPrefix$c: unknown policy '$policy' " +
          s"(have: ${Policies.mkString(", ")})")
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"$MaskPrefix$c: no such column"))
      require(!partitionCols.contains(c),
        s"$MaskPrefix$c: partition column values are directory names — " +
          "masking the SQL surface would not hide them; restructure the " +
          "layout instead")
      if (policy == "hash" || policy == "last4")
        require(f.dataType == StringType,
          s"$MaskPrefix$c: policy '$policy' is for STRING columns; " +
            s"'$c' is ${f.dataType.simpleString} (use 'null')")
    }
    rowFilterOf(props).foreach { text =>
      // resolves the boolean against the schema, loudly (the CHECK
      // constraint machinery — same expression surface)
      GraftConstraints.validate(SparkSession.active, schema,
        Seq((RowFilterProp, text)))
    }
  }

  /** Refusal shared by the row-level-operation builder and the change
    * feed: outside the admin bypass these paths read (and for COW,
    * re-persist) RAW bytes.
    */
  def refuseRawPath(t: GraftTable, what: String): Unit = {
    val s = SparkSession.active
    if (policied(t) && !bypass(s))
      throw new UnsupportedOperationException(
        s"${t.name()}: $what reads raw column values, but the table " +
          s"declares masking/row-filter policies — run in an admin " +
          s"session ($BypassConf=true) or drop the policies")
  }
}
