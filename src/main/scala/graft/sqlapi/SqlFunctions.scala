package graft.sqlapi

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans.{ChunkBySepExpr, DotProductExpr, HammingExpr, HashEmbedExpr, MatMulExpr, ShinglesExpr, SignPackExpr, WinnowExpr}

/** Pure-SQL surface for graft's native Catalyst expressions.
  *
  * The reference exposes its operators through Python bindings; the
  * Spark-native equivalent is the FunctionRegistry — once registered,
  * every graft kernel is callable from `spark.sql(...)`, JDBC/Thrift
  * clients, and views, with no Scala imports, and the expressions stay
  * the SAME plan nodes the Column API builds (one node per call, full
  * Catalyst optimization, the codegen'd dot kernel, etc. — nothing is
  * wrapped in a UDF).
  *
  * Two deployment shapes, same function table:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.sqlapi.GraftExtensions`
  *    injects at session build (the Delta/Iceberg pattern);
  *  - ad hoc: [[GraftSqlFunctions.register]](spark) on a live session.
  *
  * Functions (names prefixed `graft_` to keep the built-in namespace
  * clean):
  *
  * | SQL | expression |
  * |---|---|
  * | `graft_dot(a, b)` | [[graft.plans.DotProductExpr]] (codegen'd loop) |
  * | `graft_matmul(a, b)` | [[graft.plans.MatMulExpr]] |
  * | `graft_hash_embed(text, dim)` | [[graft.plans.HashEmbedExpr]] |
  * | `graft_shingles(text, n[, distinct])` | [[graft.plans.ShinglesExpr]] |
  * | `graft_winnow(text, k, w)` | [[graft.plans.WinnowExpr]] |
  * | `graft_chunks(text, sep, max_tokens)` | [[graft.plans.ChunkBySepExpr]] |
  * | `graft_sign_pack(v)` | [[graft.plans.SignPackExpr]] (1-bit codes) |
  * | `graft_hamming(a, b)` | [[graft.plans.HammingExpr]] (XOR popcount) |
  *
  * Geometry/config arguments (dim, n, k, w, sep, max_tokens) must be
  * foldable literals — they parameterize the plan node itself, exactly
  * like the Scala API's Int/String parameters; a non-literal argument
  * fails analysis loudly rather than silently re-planning per row.
  */
object GraftSqlFunctions {

  private def intArg(fn: String, arg: String)(e: Expression): Int = {
    require(e.foldable, s"$fn: $arg must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal integer, got $other")
    }
  }

  private def strArg(fn: String, arg: String)(e: Expression): String = {
    require(e.foldable, s"$fn: $arg must be a literal string")
    e.eval() match {
      case null => throw new IllegalArgumentException(
        s"$fn: $arg must be a non-null literal string")
      case s => s.toString
    }
  }

  private def boolArg(fn: String, arg: String)(e: Expression): Boolean = {
    require(e.foldable, s"$fn: $arg must be a literal boolean")
    e.eval() match {
      case b: Boolean => b
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal boolean, got $other")
    }
  }

  private def arity(fn: String, args: Seq[Expression], n: Int*): Unit =
    require(n.contains(args.length),
      s"$fn takes ${n.mkString(" or ")} arguments, got ${args.length}")

  /** (identifier, info, builder) rows — the registry's native shape. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "dot product over array<double> (codegen'd single-node loop)",
      (args: Seq[Expression]) => {
        arity("graft_dot", args, 2); DotProductExpr(args(0), args(1))
      }),
    ("graft_matmul", "matrix multiply over array<array<double>>",
      (args: Seq[Expression]) => {
        arity("graft_matmul", args, 2); MatMulExpr(args(0), args(1))
      }),
    ("graft_hash_embed", "deterministic md5 hashing-trick text embedding",
      (args: Seq[Expression]) => {
        arity("graft_hash_embed", args, 2)
        HashEmbedExpr(args(0), intArg("graft_hash_embed", "dim")(args(1)))
      }),
    ("graft_shingles", "space-joined word n-grams of a text column",
      (args: Seq[Expression]) => {
        arity("graft_shingles", args, 2, 3)
        ShinglesExpr(args(0), intArg("graft_shingles", "n")(args(1)),
          if (args.length > 2) boolArg("graft_shingles", "distinct")(args(2))
          else true)
      }),
    ("graft_winnow", "winnowing fingerprint selection (Schleimer et al.)",
      (args: Seq[Expression]) => {
        arity("graft_winnow", args, 3)
        WinnowExpr(args(0), intArg("graft_winnow", "k")(args(1)),
          intArg("graft_winnow", "w")(args(2)))
      }),
    ("graft_chunks", "separator-aware token-budget chunking",
      (args: Seq[Expression]) => {
        arity("graft_chunks", args, 3)
        ChunkBySepExpr(args(0), strArg("graft_chunks", "sep")(args(1)),
          intArg("graft_chunks", "max_tokens")(args(2)))
      }),
    ("graft_match_terms", "Aho-Corasick blocklist scan vs a literal term array",
      (args: Seq[Expression]) => {
        arity("graft_match_terms", args, 2)
        val t = args(1)
        require(t.foldable, "graft_match_terms: terms must be a literal array")
        val terms = t.eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toObjectArray(org.apache.spark.sql.types.StringType)
              .map(x => if (x == null) null else x.toString)
          case other => throw new IllegalArgumentException(
            s"graft_match_terms: terms must be a literal string array, got $other")
        }
        graft.plans.MultiMatchExpr(args(0), terms.toVector)
      }),
    ("graft_sign_pack", "1-bit sign quantization: dim doubles -> ceil(dim/64) longs",
      (args: Seq[Expression]) => {
        arity("graft_sign_pack", args, 1); SignPackExpr(args(0))
      }),
    ("graft_hamming", "Hamming distance over sign-packed codes (codegen'd XOR popcount)",
      (args: Seq[Expression]) => {
        arity("graft_hamming", args, 2); HammingExpr(args(0), args(1))
      })
  ).map { case (name, _, builder) =>
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.sqlapi.GraftSqlFunctions", name),
      builder)
  }

  /** Inject into a [[SparkSessionExtensions]] — the
    * `spark.sql.extensions` path (see [[GraftExtensions]]). */
  def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)

  /** Register on a LIVE session (idempotent — re-registering replaces).
    * Covers sessions built without the extensions conf. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions` entry point:
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.sqlapi.GraftExtensions ...
  * }}} */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSqlFunctions.inject(ext)
}
