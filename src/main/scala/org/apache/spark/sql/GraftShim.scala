package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column↔Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils) so graft can expose
  * custom Catalyst expressions as ordinary `Column`s. Lives in the
  * org.apache.spark.sql package solely for access; no Spark internals
  * are modified.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Function registry of an existing session (`sessionState` is
    * private[sql]) — lets GraftExtensions install into a session that
    * was built without `spark.sql.extensions` (tests, REPLs).
    */
  def functionRegistry(spark: SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry

  /** Table-function registry of an existing session — the TVF twin of
    * [[functionRegistry]], for `SELECT * FROM graft_snapshot(...)`.
    */
  def tableFunctionRegistry(spark: SparkSession)
      : org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.tableFunctionRegistry

  /** A DataFrame's analyzed logical plan — what a table-function
    * builder must return.
    */
  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** A DataFrame over a logical plan (`Dataset.ofRows` is
    * private[sql]) — the inverse of [[analyzedPlan]], for testing
    * resolution rules in isolation.
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Parse SQL text to its unresolved logical plan (`sessionState` is
    * private[sql]) — what [[graft.plans.GraftDml.sql]] routes on.
    */
  def parsePlan(
      spark: SparkSession,
      sqlText: String): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser
      .parsePlan(sqlText)

  /** Re-tag a batch DataFrame's rows as a STREAMING DataFrame — what
    * a V1 streaming Source's getBatch must return
    * (MicroBatchExecution asserts isStreaming). The RDD stays lazy;
    * the batch plan executes when the microbatch runs. The same
    * `internalCreateDataFrame(…, isStreaming = true)` Spark's own
    * file and Kafka sources use.
    */
  def streamingDataFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** Re-materialize the DataFrame a V1 `Sink.addBatch` receives as a
    * plain BATCH frame over the microbatch's ALREADY-PLANNED rows
    * (`queryExecution.toRdd` of the incremental execution). Calling
    * transformations/write on `addBatch`'s argument directly would
    * re-analyze the plan as a fresh batch query against the source —
    * the Delta-sink pattern avoids that by wrapping the executed RDD.
    */
  def batchDataFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }

  /** Run the analyzer WITHOUT CheckAnalysis — lets a test drive an
    * injected resolution rule against the resolved-target shape of a
    * DML plan that stock Spark would reject in the check phase.
    */
  def analyzeNoCheck(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sessionState.analyzer.execute(plan)
}
