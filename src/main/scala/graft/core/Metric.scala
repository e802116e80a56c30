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
  /** JVM kernel with the exact fold order of the Catalyst expression (so the
    * mapPartitions fast path is bit-identical to the declarative path). */
  def compute(a: Array[Double], b: Array[Double]): Double
}

object Metric {
  case object L2 extends Metric {
    val name = "l2"
    val ascending = true
    def column(a: Column, b: Column): Column = VectorFunctions.l2Distance(a, b)
    def sqlExpr(p1: String, p2: String, dims: Int): String =
      (0 until dims).map(i => s"($p1$i-$p2$i)*($p1$i-$p2$i)").mkString(" + ")
    def compute(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
  }

  case object IP extends Metric {
    val name = "ip"
    val ascending = false
    def column(a: Column, b: Column): Column = VectorFunctions.innerProduct(a, b)
    def sqlExpr(p1: String, p2: String, dims: Int): String =
      (0 until dims).map(i => s"$p1$i*$p2$i").mkString(" + ")
    def compute(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
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
    def compute(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i); val y = b(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  val all: Seq[Metric] = Seq(L2, IP, Cosine)
}
