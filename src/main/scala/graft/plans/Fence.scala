package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.DataType

/** Identity pass-through that the optimizer must not duplicate: it
  * reports itself non-deterministic, so `PushPredicateThroughNonJoin`
  * will not substitute the aliased child into a parent Filter's
  * condition and `CollapseProject` will not inline it into a consumer
  * projection — the classic filter-below-project duplication that made
  * q24's validity Filter re-run every parser tree (guide §4.4: the
  * UDF `asNondeterministic` fix, applied to a native expression).
  *
  * The VALUE is deterministic (pure function of the child) — the flag
  * is only a fence against expression duplication, exactly like
  * marking an expensive deterministic UDF non-deterministic. It costs
  * nothing at runtime: codegen passes the child's generated code
  * through untouched, and the interpreted path delegates to
  * `child.eval`.
  *
  * Place it on expensive projection expressions whose column is also
  * consumed by a Filter directly above (parse trees, custom
  * byte-pass expressions); do NOT place it where a filter pushdown
  * past the projection would actually help (e.g. above a parquet
  * scan), because it blocks ALL predicate pushdown through its
  * Project.
  */
case class Fence(child: Expression) extends UnaryExpression {

  // the whole point: never constant-folded, never duplicated by
  // pushdown/collapse rules (the value itself is pure — see scaladoc)
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Fence =
    copy(child = newChild)

  override def prettyName: String = "fence"
}

object Fence {
  /** Column API. */
  def fence(c: Column): Column = Bridge.column(Fence(Bridge.expression(c)))
}
