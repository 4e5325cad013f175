package graft.tools

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types.{BooleanType, DoubleType}

/** Dev tool: print Spark's replacement / evaluate expressions for the
  * aggregates round 8 adds to the incremental whitelist, so the cached
  * finalize replays the engine's exact formula (null edges included).
  * Run: sbt "runMain graft.tools.DumpAggs" */
object DumpAggs {
  def main(args: Array[String]): Unit = {
    val x = AttributeReference("x", DoubleType)()
    val y = AttributeReference("y", DoubleType)()
    val b = AttributeReference("b", BooleanType)()
    println("CountIf.replacement     = " + CountIf(b).replacement)
    println("RegrCount.replacement   = " + RegrCount(y, x).replacement)
    println("RegrAvgX.replacement    = " + RegrAvgX(y, x).replacement)
    println("RegrAvgY.replacement    = " + RegrAvgY(y, x).replacement)
    println("Median class            = " + classOf[Median].getInterfaces.map(_.getSimpleName).mkString(","))
    def dumpDecl(name: String, a: DeclarativeAggregate): Unit = {
      println(s"== $name ==")
      println("  eval  = " + a.evaluateExpression.sql)
    }
    dumpDecl("RegrSlope", RegrSlope(y, x))
    dumpDecl("RegrIntercept", RegrIntercept(y, x))
    dumpDecl("RegrR2", RegrR2(y, x))
    println("RegrSXX.replacement = " + RegrSXX(y, x).replacement)
    println("RegrSYY.replacement = " + RegrSYY(y, x).replacement)
    dumpDecl("RegrSXY", RegrSXY(y, x))
    dumpDecl("Skewness", Skewness(x))
    dumpDecl("Kurtosis", Kurtosis(x))
    println("Skewness momentOrder etc via update:")
    println(Skewness(x).updateExpressions.map(_.sql).mkString("\n"))
  }
}
