package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, BitwiseXor, Cast, ElementAt, Expression, Least, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL registration for the engine's native expressions — a SQL-only
  * user gets the same codegen'd kernels the Column API exposes
  * (`SELECT unicode_nfc(text), array_dot(a, b) FROM ...`), completing
  * the "switch without leaving SQL" story next to the streaming DDL
  * surface ([[graft.streaming.GraftSqlExtensions]]) and the registered
  * `cdc_col_parser` / `logistic_regression` UDFs.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  /** (name, builder) for every native SQL function — one list feeds both
    * the temp-function registration and the session-extensions path.
    */
  def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "unicode_nfc" -> { exprs =>
      require(exprs.length == 1, "unicode_nfc(text)")
      UnicodeNfc(exprs.head)
    },
    "cdc_chunks" -> { exprs =>
      require(exprs.length == 2, "cdc_chunks(text, maskBits)")
      CdcChunks(exprs.head, intLit(exprs(1), "maskBits"))
    },
    "array_dot" -> { exprs =>
      require(exprs.length == 2, "array_dot(a, b)")
      VectorExpressions.ArrayDot(exprs.head, exprs(1))
    },
    "ws_tokens" -> { exprs =>
      require(exprs.length == 1, "ws_tokens(text)")
      WhitespaceTokens(exprs.head)
    },
    "splitmix64" -> { exprs =>
      require(exprs.length == 1, "splitmix64(x)")
      Sketches.SplitMix64Expr(exprs.head)
    },
    "string_hash64" -> { exprs =>
      require(exprs.length == 2, "string_hash64(s, seed)")
      Sketches.StringHash64Expr(exprs.head, longLit(exprs(1), "seed"))
    },
    "gram_coverage" -> { exprs =>
      require(exprs.length == 2, "gram_coverage(words, n)")
      GramCoverage(exprs.head, intLit(exprs(1), "n"))
    },
    // the mergeable-sketch aggregates, SQL-addressable (the analyzer
    // wraps a bare AggregateFunction in its AggregateExpression)
    "kmv_distinct" -> { exprs =>
      require(exprs.length == 2, "kmv_distinct(x, k)")
      KmvDistinct(exprs.head, intLit(exprs(1), "k"))
    },
    "kmv_minima" -> { exprs =>
      require(exprs.length == 2, "kmv_minima(x, k)")
      KmvMinima(exprs.head, intLit(exprs(1), "k"))
    },
    "kmv_intersect" -> { exprs =>
      require(exprs.length == 3, "kmv_intersect(minA, minB, k)")
      KmvIntersectExpr(exprs.head, exprs(1), intLit(exprs(2), "k"))
    },
    "kmv_merge" -> { exprs =>
      require(exprs.length == 2, "kmv_merge(mins, k)")
      KmvMergeMinima(exprs.head, intLit(exprs(1), "k"))
    },
    "kmv_estimate" -> { exprs =>
      require(exprs.length == 2, "kmv_estimate(mins, k)")
      KmvEstimateExpr(exprs.head, intLit(exprs(1), "k"))
    },
    "hll_distinct" -> { exprs =>
      require(exprs.length == 2, "hll_distinct(x, p)")
      HllDistinct(exprs.head, intLit(exprs(1), "p"))
    },
    "hll_registers" -> { exprs =>
      require(exprs.length == 2, "hll_registers(x, p)")
      HllRegisters(exprs.head, intLit(exprs(1), "p"))
    },
    "hll_merge" -> { exprs =>
      require(exprs.length == 2, "hll_merge(regs, p)")
      HllMerge(exprs.head, intLit(exprs(1), "p"))
    },
    "hll_union" -> { exprs =>
      require(exprs.length == 2, "hll_union(regsA, regsB)")
      HllUnionExpr(exprs.head, exprs(1))
    },
    "hll_estimate" -> { exprs =>
      require(exprs.length == 2, "hll_estimate(regs, p)")
      HllEstimateExpr(exprs.head, intLit(exprs(1), "p"))
    },
    "kll_sketch" -> { exprs =>
      require(exprs.length == 2, "kll_sketch(x, k)")
      KllSketch(exprs.head, intLit(exprs(1), "k"))
    },
    "kll_merge" -> { exprs =>
      require(exprs.length == 2, "kll_merge(blob, k)")
      KllMerge(exprs.head, intLit(exprs(1), "k"))
    },
    "kll_quantile" -> { exprs =>
      require(exprs.length == 2, "kll_quantile(blob, pct)")
      KllQuantileExpr(exprs.head, intLit(exprs(1), "pct"))
    },
    "kll_n" -> { exprs =>
      require(exprs.length == 1, "kll_n(blob)")
      KllNExpr(exprs.head)
    },
    "kll_rank_milli" -> { exprs =>
      require(exprs.length == 2, "kll_rank_milli(blob, probe)")
      KllRankExpr(exprs.head, exprs(1))
    },
    "cms_sketch" -> { exprs =>
      require(exprs.length == 3, "cms_sketch(x, depth, width)")
      CmsSketch(exprs.head, intLit(exprs(1), "depth"), intLit(exprs(2), "width"))
    },
    "cms_merge" -> { exprs =>
      require(exprs.length == 3, "cms_merge(sketch, depth, width)")
      CmsMerge(exprs.head, intLit(exprs(1), "depth"), intLit(exprs(2), "width"))
    },
    "cms_estimate" -> { exprs =>
      require(exprs.length == 4, "cms_estimate(sketch, itemHash, depth, width)")
      // CmsSketch.cmsEstimate built from raw catalyst nodes (the
      // Column bridge yields unresolved column nodes a SQL builder
      // can't emit) — arithmetic identical term for term
      val depth = intLit(exprs(2), "depth")
      val width = intLit(exprs(3), "width")
      // +2 skips the [depth, width] geometry header; Least needs >= 2
      // children, so depth-1 reads its single cell directly
      val cells = (0 until depth).map { r =>
        ElementAt(exprs.head, Cast(
          Add(Add(Literal((r * width + 2).toLong),
            BitwiseAnd(
              Sketches.SplitMix64Expr(
                BitwiseXor(exprs(1), Literal(CmsSketch.rowSeed(r)))),
              Literal((width - 1).toLong))),
            Literal(1L)),
          IntegerType))
      }
      if (depth == 1) cells.head else Least(cells)
    })

  /** Register all native SQL functions into an existing session. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
