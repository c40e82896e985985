package graft.xtql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** XTQL as a *language*: parse the reference's edn text form and plan it
  * onto the `Xtql` combinators (reference xtql.clj:20-67 parse entry,
  * parse-query multimethods 306-596; the SQL grammar embeds the same forms
  * at Sql.g4:685).
  *
  * Supported subset (the shapes the reference's own docs/tests use):
  * `(from :tbl [a b {:col var}])`, threading `(-> src tails…)`,
  * `(where e…)`, `(with {:n e}…)`, `(without :c…)`, `(return c…)`,
  * `(aggregate g… {:n (sum e)}…)`, `(order-by c (desc c)…)`,
  * `(limit n)`, `(offset n)`, `(unnest as col)`,
  * `(join q [shared…])`, `(left-join q [shared…])`, `(unify src…)`,
  * `(union-all q…)`, `(rel [{:k v}…] [binding…])`. Expressions are s-exprs over a fixed operator table
  * with `call_function` fallback, so anything in the Spark registry is
  * reachable and stays codegen'd.
  */
object XtqlText {

  // ---- edn reader ---------------------------------------------------------

  sealed trait Edn
  final case class ESym(name: String) extends Edn
  final case class EKw(name: String) extends Edn
  final case class EStr(value: String) extends Edn
  final case class ENum(text: String) extends Edn
  final case class EList(items: Vector[Edn]) extends Edn
  final case class EVec(items: Vector[Edn]) extends Edn
  final case class EMap(entries: Vector[(Edn, Edn)]) extends Edn

  final case class XtqlParseException(msg: String)
    extends RuntimeException(msg)

  def readEdn(text: String): Edn = {
    val (v, rest) = read1(text, 0)
    val tail = skipWs(text, rest)
    if (tail < text.length)
      throw XtqlParseException(s"trailing input at $tail")
    v
  }

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length &&
      (s.charAt(i).isWhitespace || s.charAt(i) == ',' || s.charAt(i) == ';')) {
      if (s.charAt(i) == ';') while (i < s.length && s.charAt(i) != '\n') i += 1
      else i += 1
    }
    i
  }

  private def read1(s: String, i0: Int): (Edn, Int) = {
    val i = skipWs(s, i0)
    if (i >= s.length) throw XtqlParseException("unexpected end of input")
    s.charAt(i) match {
      case '(' =>
        val (v, n) = readSeq(s, i + 1, ')'); (EList(v), n)
      case '[' =>
        val (v, n) = readSeq(s, i + 1, ']'); (EVec(v), n)
      case '{' =>
        val (items, n) = readSeq(s, i + 1, '}')
        if (items.length % 2 != 0)
          throw XtqlParseException("map literal needs even item count")
        (EMap(items.grouped(2).map(p => (p(0), p(1))).toVector), n)
      case '"' =>
        val sb = new StringBuilder
        var j = i + 1
        while (j < s.length && s.charAt(j) != '"') {
          if (s.charAt(j) == '\\' && j + 1 < s.length) {
            sb.append(s.charAt(j + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case c => c
            })
            j += 2
          } else { sb.append(s.charAt(j)); j += 1 }
        }
        (EStr(sb.toString), j + 1)
      case ':' =>
        var j = i + 1
        while (j < s.length && !isDelim(s.charAt(j))) j += 1
        (EKw(s.substring(i + 1, j)), j)
      case c if c.isDigit || (c == '-' && i + 1 < s.length &&
          s.charAt(i + 1).isDigit) =>
        var j = i + 1
        while (j < s.length && !isDelim(s.charAt(j))) j += 1
        (ENum(s.substring(i, j)), j)
      case _ =>
        var j = i
        while (j < s.length && !isDelim(s.charAt(j))) j += 1
        (ESym(s.substring(i, j)), j)
    }
  }

  private def isDelim(c: Char): Boolean =
    c.isWhitespace || "()[]{},;\"".indexOf(c) >= 0

  private def readSeq(s: String, i0: Int, close: Char): (Vector[Edn], Int) = {
    val out = Vector.newBuilder[Edn]
    var i = skipWs(s, i0)
    while (i < s.length && s.charAt(i) != close) {
      val (v, n) = read1(s, i)
      out += v
      i = skipWs(s, n)
    }
    if (i >= s.length) throw XtqlParseException(s"missing $close")
    (out.result(), i + 1)
  }

  // ---- planner ------------------------------------------------------------

  /** Parse + plan an XTQL text against a table resolver. */
  def query(spark: SparkSession, text: String,
      resolve: String => DataFrame): DataFrame =
    plan(readEdn(text), resolve)(spark).toDF

  private def plan(e: Edn, resolve: String => DataFrame)(
      implicit spark: SparkSession): Xtql = e match {
    case EList(ESym("->") +: src +: tails) =>
      tails.foldLeft(plan(src, resolve))((q, t) => tail(q, t, resolve))
    case EList(Vector(ESym("from"), EKw(tbl), EVec(binds))) =>
      fromBinds(resolve(tbl), binds)
    // inline relation literal (reference xtql.clj `rel`): rows of maps,
    // then the usual binding spec
    case EList(Vector(ESym("rel"), EVec(rows), EVec(binds))) =>
      val rowDfs = rows.map {
        case EMap(entries) =>
          spark.range(1).select(entries.map {
            case (EKw(n), v) => exprOf(v).as(n)
            case other => throw XtqlParseException(s"bad rel field: $other")
          }: _*)
        case other => throw XtqlParseException(s"rel expects row maps: $other")
      }
      fromBinds(rowDfs.reduce(_.unionByName(_, allowMissingColumns = true)),
        binds)
    case EList(ESym("unify") +: srcs) =>
      val bound = srcs.map {
        case EList(Vector(ESym("from"), EKw(tbl), EVec(binds))) =>
          // literal binds ({:col "F"}) filter the source before
          // unification; symbol binds become logic vars
          val filters = binds.collect {
            case EMap(Vector((EKw(c), v))) if !v.isInstanceOf[ESym] =>
              col(c) === exprOf(v)
          }
          val df = filters.foldLeft(resolve(tbl))(_.filter(_))
          (df, binds.collect {
            case ESym(n) => (n, n)
            case EMap(Vector((EKw(c), ESym(v)))) => (c, v)
          }: Seq[(String, String)])
        case other => throw XtqlParseException(s"unify expects from: $other")
      }
      Xtql.unify(bound: _*)
    case EList(ESym("union-all") +: qs) =>
      qs.map(plan(_, resolve)).reduce(_ unionAll _)
    case other => throw XtqlParseException(s"unplannable source: $other")
  }

  private def fromBinds(df: DataFrame, binds: Vector[Edn]): Xtql = {
    val cols = binds.map {
      case ESym(n) => col(n)
      case EMap(Vector((EKw(c), ESym(v)))) => col(c).as(v)
      // literal bind: project the column; the equality filter follows
      case EMap(Vector((EKw(c), _))) => col(c)
      case other => throw XtqlParseException(s"bad from binding: $other")
    }
    val filters = binds.collect {
      case EMap(Vector((EKw(c), v))) if !v.isInstanceOf[ESym] =>
        col(c) === exprOf(v)
    }
    val selected = Xtql.from(df).returning(cols: _*)
    filters.foldLeft(selected)((q, f) => q.where(f))
  }

  private def tail(q: Xtql, t: Edn, resolve: String => DataFrame)(
      implicit spark: SparkSession): Xtql =
    t match {
      case EList(ESym("where") +: es) =>
        es.foldLeft(q)((acc, e) => acc.where(exprOf(e)))
      case EList(ESym("with") +: maps) =>
        q.withCols(maps.flatMap {
          case EMap(entries) => entries.map {
            case (EKw(n), e) => n -> exprOf(e)
            case other => throw XtqlParseException(s"bad with entry: $other")
          }
          case other => throw XtqlParseException(s"with expects maps: $other")
        }: _*)
      case EList(ESym("without") +: ks) =>
        q.without(ks.map {
          case EKw(n) => n
          case ESym(n) => n
          case other => throw XtqlParseException(s"bad without: $other")
        }: _*)
      case EList(ESym("return") +: cs) =>
        q.returning(cs.map {
          case ESym(n) => col(n)
          case EMap(Vector((EKw(n), e))) => exprOf(e).as(n)
          case other => throw XtqlParseException(s"bad return: $other")
        }: _*)
      case EList(ESym("aggregate") +: specs) =>
        val groups = specs.collect { case ESym(n) => col(n) }
        val aggs = specs.collect { case EMap(entries) => entries.map {
          case (EKw(n), e) => exprOf(e).as(n)
          case other => throw XtqlParseException(s"bad aggregate: $other")
        }}.flatten
        q.aggregate(groups, aggs)
      case EList(ESym("order-by") +: specs) =>
        q.orderBy(specs.map {
          case ESym(n) => col(n)
          case EList(Vector(ESym("desc"), e)) => exprOf(e).desc
          case EList(Vector(ESym("asc"), e)) => exprOf(e)
          case EMap(entries) =>
            val m = entries.collect { case (EKw(k), v) => k -> v }.toMap
            val c = exprOf(m("val"))
            m.get("dir") match {
              case Some(EKw("desc")) => c.desc
              case _ => c
            }
          case other => throw XtqlParseException(s"bad order-by: $other")
        }: _*)
      case EList(Vector(ESym("limit"), ENum(n))) => q.limit(n.toInt)
      case EList(Vector(ESym("offset"), ENum(n))) => q.offset(n.toInt)
      case EList(Vector(ESym("unnest"), ESym(as), ESym(c))) => q.unnest(c, as)
      case EList(Vector(ESym(j), sub, EVec(shared)))
          if j == "join" || j == "left-join" =>
        val other = plan(sub, resolve)
        val cond = shared.map {
          case ESym(n) => q.toDF(n) === other.toDF(n)
          case other2 => throw XtqlParseException(s"bad join key: $other2")
        }.reduce(_ && _)
        if (j == "join") q.join(other, cond) else q.leftJoin(other, cond)
      case other => throw XtqlParseException(s"unknown pipeline tail: $other")
    }

  /** s-expr → Column (reference expression grammar; fixed operator table
    * with a registry fallback so every Spark function is reachable). */
  def exprOf(e: Edn): Column = e match {
    case ESym(n) => col(n)
    case EKw(n) => lit(n)
    case EStr(s) => lit(s)
    case ENum(t) => if (t.contains('.')) lit(t.toDouble) else lit(t.toLong)
    case EList(ESym(op) +: args0) =>
      val args = args0.map(exprOf)
      op match {
        case "+" => args.reduce(_ + _)
        case "-" => if (args.length == 1) -args.head else args.reduce(_ - _)
        case "*" => args.reduce(_ * _)
        case "/" => args.reduce(_ / _)
        case ">" => args(0) > args(1)
        case "<" => args(0) < args(1)
        case ">=" => args(0) >= args(1)
        case "<=" => args(0) <= args(1)
        case "=" => args(0) === args(1)
        case "<>" | "!=" => args(0) =!= args(1)
        case "and" => args.reduce(_ && _)
        case "or" => args.reduce(_ || _)
        case "not" => !args.head
        case "like" => args0 match {
          case Vector(c, EStr(p)) => exprOf(c).like(p)
          case _ => throw XtqlParseException("like needs a string pattern")
        }
        case "nil?" => args.head.isNull
        case "if" => when(args(0), args(1)).otherwise(args(2))
        case "coalesce" => coalesce(args: _*)
        case "row-count" => count(lit(1))
        case "count" => count(args.head)
        case "count-distinct" => countDistinct(args.head)
        case "sum" => sum(args.head)
        case "avg" => avg(args.head)
        case "min" => min(args.head)
        case "max" => max(args.head)
        case other =>
          call_function(other.replace('-', '_'), args: _*)
      }
    case other => throw XtqlParseException(s"unplannable expression: $other")
  }
}
