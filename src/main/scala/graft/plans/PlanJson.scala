package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Compact plan-tree JSON in the shape the reference's UI consumes —
  * `{OpType, Condition, TabName, Oprands[]}` per node, mirroring
  * `GetJSONAlgTree` (reference `QueryService.asmx.cs:444-471`, node model
  * `RPC/RPC/RPC.cs:85-114`) — but derived from Catalyst logical plans, so
  * the "original vs optimized" pair shows real Catalyst rewrites
  * (predicate pushdown, column pruning, join selection) instead of the
  * reference's hand-rolled ones.
  *
  * Kept deliberately thin over the public TreeNode API: tests assert on
  * shape (op kinds and relative positions), never on string equality, so
  * Spark-version drift in node names doesn't break the surface
  * (SURVEY.md §7.3).
  */
object PlanJson {

  /** JSON string escape shared by every hand-rolled JSON emitter in the
    * project (plan trees, Verify's oracle dump, executed statistics) —
    * covers quote, backslash, and ALL control characters. */
  def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def esc(s: String): String = jsonEscape(s)

  /** Map a Catalyst node to the reference's 5-op vocabulary where one
    * applies (LEAF/SEL/PROJ/JOIN/UNION, `RPC/RPC/RPC.cs:20-28`); richer
    * nodes keep their Catalyst name (AGG, SORT, WINDOW, ...). */
  private def opType(p: LogicalPlan): String = p match {
    case _: LogicalRelation | _: DataSourceV2Relation => "LEAF"
    case _: Filter    => "SEL"
    case _: Project   => "PROJ"
    case _: Join      => "JOIN"
    case _: Union     => "UNION"
    case _: Aggregate => "AGG"
    case _: Sort      => "SORT"
    case _: Window    => "WINDOW"
    case _: GlobalLimit | _: LocalLimit => "LIMIT"
    case _: SubqueryAlias => "ALIAS"
    case other => other.nodeName.toUpperCase
  }

  private def condition(p: LogicalPlan): String = p match {
    case Filter(c, _)        => c.sql
    case Project(cols, _)    => cols.map(_.sql).mkString(", ")
    case j: Join             => j.condition.map(_.sql).getOrElse("")
    case a: Aggregate        =>
      a.groupingExpressions.map(_.sql).mkString(", ")
    case s: Sort             => s.order.map(_.sql).mkString(", ")
    case _                   => ""
  }

  private def tabName(p: LogicalPlan): String = p match {
    case l: LogicalRelation =>
      l.relation.toString.split('/').takeRight(1).headOption.getOrElse("")
    case r: DataSourceV2Relation => r.table.name()
    case a: SubqueryAlias => a.alias
    case _ => ""
  }

  def toJson(p: LogicalPlan): String = {
    val kids = p.children.map(toJson).mkString("[", ",", "]")
    s"""{"OpType":"${esc(opType(p))}","Condition":"${esc(condition(p))}",""" +
      s""""TabName":"${esc(tabName(p))}","Oprands":$kids}"""
  }

  /** The reference returns (original, optimized) — here analyzed vs
    * Catalyst-optimized (`QueryService.asmx.cs:56-59`). */
  def originalJson(df: DataFrame): String =
    toJson(df.queryExecution.analyzed)
  def optimizedJson(df: DataFrame): String =
    toJson(df.queryExecution.optimizedPlan)

  /** Flat list of op kinds in pre-order — handy for plan-shape asserts. */
  def opKinds(p: LogicalPlan): Seq[String] =
    opType(p) +: p.children.flatMap(opKinds)

  /** Graphviz DOT rendering of a plan tree — the engine-side analog of
    * the reference's JointJS plan visualization
    * (`DistributedQueryService/index.js:86-120`): one box per operator
    * labeled `OpType` + (truncated) condition/table, edges child →
    * parent in execution order. Pipe through `dot -Tsvg` for the
    * picture; the JSON surface remains the machine contract. */
  def toDot(p: LogicalPlan, title: String = "plan"): String = {
    // DOT-string escaping (quotes + backslashes); the \n line break is
    // appended AFTER escaping so it reaches DOT as a label newline
    def descape(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    val sb = new StringBuilder
    sb.append(s"""digraph "${descape(title)}" {\n""")
    sb.append("  rankdir=BT;\n  node [shape=box, fontname=monospace];\n")
    var n = 0
    def walk(q: LogicalPlan): Int = {
      val id = n; n += 1
      val cond = condition(q)
      val tab = tabName(q)
      val head = descape(
        opType(q) + (if (tab.nonEmpty) s" [$tab]" else ""))
      val body =
        if (cond.isEmpty) ""
        else "\\n" + descape(
          if (cond.length > 48) cond.take(45) + "..." else cond)
      sb.append(s"""  n$id [label="$head$body"];\n""")
      q.children.foreach { c =>
        val cid = walk(c)
        sb.append(s"  n$cid -> n$id;\n")
      }
      id
    }
    walk(p)
    sb.append("}\n")
    sb.toString
  }

  /** Original/optimized DOT pair, mirroring the JSON pair. */
  def originalDot(df: DataFrame): String =
    toDot(df.queryExecution.analyzed, "original")
  def optimizedDot(df: DataFrame): String =
    toDot(df.queryExecution.optimizedPlan, "optimized")
}
