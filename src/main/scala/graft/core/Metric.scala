package graft.core

import org.apache.spark.sql.Column
import graft.functions.VectorFunctions

/** Distance metric + its top-k ordering. IP/cosine are *similarities* (larger
  * = closer; reference: core/distance/inner_product.h:102 std::greater
  * comparator) — threading the ordering through here prevents silent recall
  * inversion (SURVEY §7 hard parts). */
sealed trait Metric {
  def name: String
  /** true = smaller is better. */
  def ascending: Boolean
  def column(a: Column, b: Column): Column
  /** DuckDB SQL fragment computing the same value from two column prefixes
    * expanded as `${p}0..${p}${dims-1}` — used by oracle generators. */
  def sqlExpr(p1: String, p2: String, dims: Int): String
}

object Metric {
  case object L2 extends Metric {
    val name = "l2"
    val ascending = true
    def column(a: Column, b: Column): Column = VectorFunctions.l2Distance(a, b)
    def sqlExpr(p1: String, p2: String, dims: Int): String =
      (0 until dims).map(i => s"($p1$i-$p2$i)*($p1$i-$p2$i)").mkString(" + ")
  }

  case object IP extends Metric {
    val name = "ip"
    val ascending = false
    def column(a: Column, b: Column): Column = VectorFunctions.innerProduct(a, b)
    def sqlExpr(p1: String, p2: String, dims: Int): String =
      (0 until dims).map(i => s"$p1$i*$p2$i").mkString(" + ")
  }

  case object Cosine extends Metric {
    val name = "cosine"
    val ascending = false
    def column(a: Column, b: Column): Column =
      VectorFunctions.cosineSimilarity(a, b)
    def sqlExpr(p1: String, p2: String, dims: Int): String = {
      val dot = (0 until dims).map(i => s"$p1$i*$p2$i").mkString(" + ")
      val n1 = (0 until dims).map(i => s"$p1$i*$p1$i").mkString(" + ")
      val n2 = (0 until dims).map(i => s"$p2$i*$p2$i").mkString(" + ")
      s"($dot) / (sqrt($n1) * sqrt($n2))"
    }
  }

  val all: Seq[Metric] = Seq(L2, IP, Cosine)
}
