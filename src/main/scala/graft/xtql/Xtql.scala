package graft.xtql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** XTQL pipeline surface (reference: api/src/main/clojure/xtdb/xtql.clj —
  * parse-query multimethods `from` 383, `where` 396, `with` 403, `without`
  * 413, `return` 421, `join`/`left-join` 435/457, `aggregate` 472,
  * `order-by` 513, `limit`/`offset` 519/527, `rel` 572, `unnest` 585,
  * `union-all` 596, `unify` 306).
  *
  * Each pipeline tail is a 1:1 DataFrame combinator; `unify` implements the
  * datalog-style var unification as a multi-way equi-join on shared logic
  * vars. The pipeline stays declarative end-to-end, so Catalyst sees one
  * logical plan — same optimization surface as handwritten DataFrame code.
  */
final case class Xtql(df: DataFrame) {

  def where(cond: Column): Xtql = Xtql(df.filter(cond))

  /** `with` — append computed columns (reference xtql.clj:403). */
  def withCols(cols: (String, Column)*): Xtql =
    Xtql(cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) })

  /** `without` — drop columns (xtql.clj:413). */
  def without(names: String*): Xtql = Xtql(df.drop(names: _*))

  /** `return` — keep exactly these columns (xtql.clj:421). */
  def returning(cols: Column*): Xtql = Xtql(df.select(cols: _*))

  /** `join` / `left-join` (xtql.clj:435/457). */
  def join(other: Xtql, cond: Column): Xtql = Xtql(df.join(other.df, cond))
  def leftJoin(other: Xtql, cond: Column): Xtql =
    Xtql(df.join(other.df, cond, "left"))

  /** `aggregate` (xtql.clj:472). */
  def aggregate(groupCols: Seq[Column], aggs: Seq[Column]): Xtql =
    Xtql(if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*))

  /** `order-by` / `limit` / `offset` (xtql.clj:513-527). */
  def orderBy(specs: Column*): Xtql = Xtql(df.orderBy(specs: _*))
  def limit(n: Int): Xtql = Xtql(df.limit(n))
  def offset(n: Int): Xtql = Xtql(df.offset(n))

  /** `unnest` — explode a list column into rows (xtql.clj:585). */
  def unnest(colName: String, as: String): Xtql =
    Xtql(df.withColumn(as, explode(col(colName))))

  /** `union-all` (xtql.clj:596). */
  def unionAll(other: Xtql): Xtql = Xtql(df.unionAll(other.df))

  def toDF: DataFrame = df
}

object Xtql {

  /** `from` — source table with a column selection (xtql.clj:383). */
  def from(df: DataFrame, cols: String*): Xtql =
    if (cols.isEmpty) Xtql(df) else Xtql(df.select(cols.map(col): _*))

  /** `rel` — literal relation (xtql.clj:572). */
  def rel(df: DataFrame): Xtql = Xtql(df)

  /** `unify` — datalog-style unification (xtql.clj:306): each input binds
    * table columns to logic vars; inputs are equi-joined on every shared
    * var (inner join), left to right. Disconnected inputs cross-join —
    * same as the reference's mega-join handling of disconnected subgraphs.
    */
  def unify(bindings: (DataFrame, Seq[(String, String)])*): Xtql = {
    val renamed = bindings.map { case (df, binds) =>
      df.select(binds.map { case (c, v) => col(c).as(v) }: _*)
    }
    Xtql(renamed.reduce { (a, b) =>
      val shared = a.columns.toSet.intersect(b.columns.toSet).toSeq
      if (shared.isEmpty) a.crossJoin(b)
      else a.join(b, shared)
    })
  }
}
