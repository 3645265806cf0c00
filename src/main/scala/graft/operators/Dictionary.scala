package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary encoding — ENCODE / DECODE / CREATE DICTIONARY / refresh
  * (reference: operator/DictionaryEncodeOperator.java:48,
  * DictionaryDecodeOperator.java:41, utils/CodeDictionary.java:37-41 —
  * codes are ints starting at 1; refresh jobs
  * analyzer/physical/ShuffleRewriter.java:128-245).
  *
  * A dictionary is a small DataFrame (colvalue STRING, code INT) per encoded
  * column — broadcast-joined against the data while it provably-by-estimate
  * fits ([[BroadcastDictMaxBytes]]), so encode/decode never shuffles the
  * fact table in the common case, and falls back to a plain shuffle join
  * for pathologically large dictionaries instead of OOMing. Codes are
  * assigned by sorted order for determinism (the reference assigned by
  * arrival order within its single-reducer dictionary job, which is not
  * reproducible in parallel).
  */
object Dictionary {

  /** Broadcast ceiling for the dictionary side of ENCODE/DECODE. The
    * reference assumed an in-memory dictionary unconditionally
    * (DictionaryEncodeOperator.java:48); at the 100 TB design point a
    * high-cardinality dictionary (URLs, user ids) under a forced
    * broadcast hint is a guaranteed driver/executor OOM, so — like
    * [[Matrix.BroadcastNodeThreshold]] — encode/decode broadcast only
    * while the dictionary provably fits, and fall back to a plain
    * shuffle join above. Two tiers keep the common case free:
    * the plan-stats estimate (`optimizedPlan.stats.sizeInBytes` —
    * plan-time, no job; EXACT for a LOADED dictionary, the production
    * shape per [[save]]/[[load]]) accepts under [[BroadcastDictMaxBytes]];
    * past that, one bounded count job decides — necessary because
    * without CBO a dictionary COMPUTED in-query inherits its distinct's
    * CHILD size (Catalyst's Aggregate/Window estimate never shrinks for
    * cardinality), so a 5-value dictionary built from a 100 GB table
    * estimates 100 GB and would otherwise silently shuffle the whole
    * fact table. Callers who know better force either side via
    * `broadcastDict` and skip both tiers.
    */
  val BroadcastDictMaxBytes: Long = 1L << 30

  /** Row ceiling for tier two: ~48 B per (colvalue, code) entry puts 10^7
    * rows at ~0.5 GB of broadcast hash relation.
    */
  val BroadcastDictMaxRows: Long = 10000000L

  /** The dictionary side of the encode/decode join: explicit override
    * wins; then the plan-stats estimate; then a bounded count.
    */
  private def dictSide(dict: DataFrame, forced: Option[Boolean]): DataFrame = {
    val doBroadcast = forced.getOrElse {
      dict.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(BroadcastDictMaxBytes) ||
        dict.limit((BroadcastDictMaxRows + 1).toInt).count() <= BroadcastDictMaxRows
    }
    if (doBroadcast) broadcast(dict) else dict
  }

  /** CREATE DICTIONARY — distinct values of `column`, codes 1..N assigned in
    * value-sorted order (codes start at 1 per CodeDictionary.java:41; code 0
    * is reserved for NULL).
    * The single row_number window over the distinct set is fine at any scale:
    * a dictionary that doesn't fit one partition shouldn't be a dictionary.
    */
  def create(df: DataFrame, column: String): DataFrame =
    df.select(col(column).cast("string").as("colvalue"))
      .filter(col("colvalue").isNotNull)
      .distinct()
      .withColumn("code", row_number().over(Window.orderBy(col("colvalue"))))

  /** Dictionary refresh — keep existing codes stable, append codes for new
    * values starting after the current max (reference semantics:
    * DictionaryRefreshMapSideOperator.java:34 / ReduceSideOperator.java:29).
    */
  def refresh(existing: DataFrame, df: DataFrame, column: String): DataFrame = {
    val maxCode = existing.agg(coalesce(max("code"), lit(0))).first().getInt(0)
    val newVals = df.select(col(column).cast("string").as("colvalue"))
      .filter(col("colvalue").isNotNull)
      .distinct()
      .join(existing.select("colvalue"), Seq("colvalue"), "left_anti")
      .withColumn("code", row_number().over(Window.orderBy(col("colvalue"))) + lit(maxCode))
    existing.unionByName(newVals)
  }

  /** Multi-column dictionary — the reference's global dictionary shape:
    * one (colname, colvalue, code) relation covering several columns
    * (reference: plan/physical/GenerateDictionary.java:50; codes are
    * per-column, each starting at 1).
    */
  def createMulti(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map(c => create(df, c).withColumn("colname", lit(c)))
      .reduce(_ unionByName _)

  /** Slice a dictionary down to one column's map: multi-column dictionaries
    * filter on colname, per-column dictionaries pass through.
    */
  private def forColumn(dict: DataFrame, column: String): DataFrame =
    if (dict.columns.contains("colname")) dict.filter(col("colname") === column)
    else dict

  /** ENCODE over several columns against a (possibly multi-column)
    * dictionary (reference grammar: ENCODE ID on columns — plural).
    */
  def encodeMulti(df: DataFrame, cols: Seq[String], dict: DataFrame,
                  nullsAs: Int = 0, unknownsAs: Option[Int] = None,
                  broadcastDict: Option[Boolean] = None): DataFrame =
    cols.foldLeft(df)((d, c) =>
      encode(d, c, forColumn(dict, c), nullsAs, unknownsAs, broadcastDict))

  /** DECODE over several columns against a (possibly multi-column) dictionary. */
  def decodeMulti(df: DataFrame, cols: Seq[String], dict: DataFrame,
                  unknownsAs: Option[String] = None,
                  broadcastDict: Option[Boolean] = None): DataFrame =
    cols.foldLeft(df)((d, c) => decode(d, c, forColumn(dict, c), unknownsAs, broadcastDict))

  /** ENCODE x ON col USING dict [NULLS AS v] [UNKNOWNS AS n] — replace the
    * string column by its int code via broadcast join
    * (reference: DictionaryEncodeOperator.java:48).
    */
  def encode(df: DataFrame, column: String, dict: DataFrame,
             nullsAs: Int = 0, unknownsAs: Option[Int] = None,
             broadcastDict: Option[Boolean] = None): DataFrame = {
    val d = dictSide(dict.select(col("colvalue"), col("code")), broadcastDict)
    val joined = df.join(d, df(column).cast("string") === d("colvalue"), "left_outer")
    // Without UNKNOWNS AS, a value missing from the dictionary fails loudly
    // — the reference's DictionaryEncodeOperator throws for unknown values
    // rather than emitting silent NULL codes.
    val code = when(df(column).isNull, lit(nullsAs))
      .otherwise(unknownsAs match {
        case Some(u) => coalesce(col("code"), lit(u))
        case None    => coalesce(col("code"),
          raise_error(concat(lit(s"ENCODE: value not in dictionary for $column: "),
            df(column).cast("string"))))
      })
    joined.withColumn(s"${column}__enc", code)
      .drop("colvalue", "code", column)
      .withColumnRenamed(s"${column}__enc", column)
  }

  /** DECODE x ON col USING dict [UNKNOWNS AS s] — inverse of encode
    * (reference: DictionaryDecodeOperator.java:41).
    */
  def decode(df: DataFrame, column: String, dict: DataFrame,
             unknownsAs: Option[String] = None,
             broadcastDict: Option[Boolean] = None): DataFrame = {
    val d = dictSide(dict.select(col("colvalue"), col("code")), broadcastDict)
    val joined = df.join(d, df(column) === d("code"), "left_outer")
    val value = unknownsAs match {
      case Some(u) => when(df(column) === 0, lit(null)).otherwise(coalesce(col("colvalue"), lit(u)))
      case None    => col("colvalue")
    }
    joined.withColumn(s"${column}__dec", value)
      .drop("colvalue", "code", column)
      .withColumnRenamed(s"${column}__dec", column)
  }

  /** ENCODE over several columns at once (reference ENCODE takes a column
    * list); each column gets its own dictionary.
    */
  def encodeAll(df: DataFrame, dicts: Map[String, DataFrame],
                nullsAs: Int = 0, unknownsAs: Option[Int] = None): DataFrame =
    dicts.foldLeft(df) { case (acc, (c, d)) => encode(acc, c, d, nullsAs, unknownsAs) }

  def decodeAll(df: DataFrame, dicts: Map[String, DataFrame],
                unknownsAs: Option[String] = None): DataFrame =
    dicts.foldLeft(df) { case (acc, (c, d)) => decode(acc, c, d, unknownsAs) }

  /** Persist / load a dictionary as a table (the reference stored
    * dictionaries as Avro files refreshed by a dedicated job).
    */
  def save(dict: DataFrame, path: String): Unit =
    dict.coalesce(1).write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
