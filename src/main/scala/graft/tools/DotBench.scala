package graft.tools

import org.apache.spark.sql.catalyst.util.ArrayData

/** Dev micro-benchmark: per-call cost of the exact-decimal vs float
  * vector dot primitives, outside Spark (pure JVM loop over the same
  * ArrayData the codegen calls hit).
  * Usage: runMain graft.tools.DotBench [dim] [n]
  */
object DotBench {
  def main(args: Array[String]): Unit = {
    val dim = if (args.length > 0) args(0).toInt else 64
    val n = if (args.length > 1) args(1).toInt else 200000
    val rnd = new java.util.Random(42)
    val a = ArrayData.toArrayData(Array.fill(dim)(rnd.nextFloat() * 20 - 10))
    val b = ArrayData.toArrayData(Array.fill(dim)(rnd.nextFloat() * 20 - 10))
    def time(label: String)(f: => Any): Unit = {
      var i = 0
      while (i < n / 10) { f; i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0
      var sink = 0.0
      while (i < n) {
        f match {
          case d: Double => sink += d
          case d: org.apache.spark.sql.types.Decimal => sink += d.toDouble
          case _ =>
        }
        i += 1
      }
      val per = (System.nanoTime() - t0).toDouble / n
      println(f"$label%-22s ${per / 1e3}%8.3f us/call  (sink=$sink%.1f)")
    }
    time("float_vec_dot")(graft.functions.FloatVecDot.dot(a, b))
    time("decimal_vec_dot")(graft.functions.DecimalVecDot.dot(a, b))
  }
}
