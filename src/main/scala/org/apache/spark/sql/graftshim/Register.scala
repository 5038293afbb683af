package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-access shim: FunctionRegistry is `private[sql]`, so the one
  * call that registers our Catalyst expressions lives inside the
  * org.apache.spark.sql package tree (the same seam
  * SparkSessionExtensions.injectFunction uses; kept direct so any session
  * handed to us — not only ones we build — can be equipped). */
object Register {
  def function(spark: SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }
}
