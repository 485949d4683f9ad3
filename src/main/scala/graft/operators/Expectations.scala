package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-test / Deequ-style
  * contract check an ingest runs before promoting a batch: not-null,
  * uniqueness, accepted values, numeric range, and arbitrary predicate
  * rules, all evaluated in ONE pass and returned as a small verdict
  * frame (rule, n_violations, sample offender) a pipeline can gate on.
  *
  * Scale shape: row-local rules (notNull / acceptedIn / inRange /
  * satisfies) compile to ONE aggregate over the scan — conditional
  * count + conditional min, no extra pass per rule. Uniqueness is the
  * one genuinely non-row-local rule: it adds ONE groupBy(col) counting
  * keys seen more than once — the same shuffle class as the exact-dedup
  * winner aggregate, shuffling only (key, count). The verdict frame is
  * |rules| rows regardless of data volume.
  *
  * The violation SAMPLE is the minimum offending id — deterministic, so
  * the whole verdict (q102) sits under the driver hash, and an on-call
  * engineer gets a concrete row to look at rather than a bare count. */
object Expectations {

  sealed trait Rule { def name: String }
  /** `col` must never be null. */
  case class NotNull(col: String) extends Rule {
    def name = s"not_null:$col"
  }
  /** `col` values must come from `allowed` (nulls are violations too —
    * compose with NotNull semantics deliberately: an unexpected null is
    * not an accepted value). */
  case class AcceptedIn(col: String, allowed: Seq[String]) extends Rule {
    def name = s"accepted_in:$col"
  }
  /** `col` must sit in [lo, hi]; nulls violate. */
  case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range:$col"
  }
  /** Arbitrary row predicate (true = pass); nulls violate. */
  case class Satisfies(label: String, predicate: Column) extends Rule {
    def name = s"satisfies:$label"
  }
  /** `col` must be unique across the frame. */
  case class Unique(col: String) extends Rule {
    def name = s"unique:$col"
  }
  /** Referential integrity: every non-null `col` value must exist in
    * `dim`'s `dimCol` — the declarative form of the K1/J3 left-anti FK
    * check, so a contract suite can gate on orphaned keys alongside its
    * row rules. Nulls do NOT violate (compose with [[NotNull]] when a
    * mandatory FK is meant — the SQL FK convention). The dim side
    * broadcasts when small; either way the check is one anti join
    * keyed on the FK, never a row-local scan of the dim per row. */
  case class ForeignKeyIn(col: String, dim: DataFrame, dimCol: String)
      extends Rule {
    def name = s"foreign_key:$col"
  }

  /** One row per rule: (rule, n_violations, sample_id) where sample_id
    * is the smallest `idCol` value among violators (null when clean). */
  def check(df: DataFrame, idCol: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_.name)}")

    def rowRule(r: Rule): Option[Column] = r match {
      case NotNull(c) => Some(col(c).isNull)
      case AcceptedIn(c, allowed) =>
        Some(!coalesce(col(c).isin(allowed: _*), lit(false)))
      case InRange(c, lo, hi) =>
        Some(!coalesce(col(c) >= lo && col(c) <= hi, lit(false)))
      case Satisfies(_, p) => Some(!coalesce(p, lit(false)))
      case Unique(_) => None
      case ForeignKeyIn(_, _, _) => None
    }

    val rowRules = rules.flatMap(r => rowRule(r).map(r.name -> _))
    val rowVerdicts: Option[DataFrame] = if (rowRules.isEmpty) None else {
      val aggs = rowRules.flatMap { case (name, bad) =>
        Seq(
          sum(when(bad, 1L).otherwise(0L)).as(s"__n_$name"),
          min(when(bad, col(idCol))).as(s"__s_$name"))
      }
      val wide = df.agg(aggs.head, aggs.tail: _*)
      val entries = rowRules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(s"__n_$name").as("n_violations"),
          col(s"__s_$name").cast("string").as("sample_id"))
      }
      Some(wide.select(explode(array(entries: _*)).as("v")).select(col("v.*")))
    }

    val uniqueVerdicts = rules.collect { case Unique(c) =>
      df.groupBy(col(c)).agg(count(lit(1)).as("__n"), min(col(idCol)).as("__id"))
        .filter(col("__n") > 1)
        .agg(
          coalesce(sum(col("__n")), lit(0L)).as("n_violations"),
          min(col("__id")).cast("string").as("sample_id"))
        .select(lit(s"unique:$c").as("rule"), col("n_violations"),
          col("sample_id"))
    }

    val fkVerdicts = rules.collect { case ForeignKeyIn(c, dim, dc) =>
      df.filter(col(c).isNotNull)
        .select(col(c).as("__fk"), col(idCol).as("__id"))
        .join(dim.select(col(dc).as("__fk")).distinct(), Seq("__fk"), "left_anti")
        .agg(count(lit(1)).as("n_violations"),
          min(col("__id")).cast("string").as("sample_id"))
        .select(lit(s"foreign_key:$c").as("rule"), col("n_violations"),
          col("sample_id"))
    }

    (rowVerdicts.toSeq ++ uniqueVerdicts ++ fkVerdicts).reduce(_.unionByName(_))
  }
}
