package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level and block-movement operators from SURVEY.md §2.2/§2.5/§2.6,
  * re-expressed as declarative DataFrame transforms so Catalyst keeps
  * pushdown/pruning/codegen. Each maps one reference operator; the Hadoop
  * phase plumbing (map/shuffle/reduce wiring) is erased — Spark plans
  * shuffles itself via EnsureRequirements.
  */
object Relational {

  /** GENERATE — projection with expressions
    * (reference: operator/GenerateOperator.java:36, expression engine
    * functions/FunctionTree.java:52-139). `exprs` are (expression, alias).
    */
  def generate(df: DataFrame, exprs: (Column, String)*): DataFrame =
    df.select(exprs.map { case (c, n) => c.as(n) }: _*)

  /** FILTER x BY expr — reference: operator/FilterOperator.java:24. */
  def filter(df: DataFrame, cond: Column): DataFrame = df.filter(cond)

  /** LIMIT x N — reference: operator/LimitOperator.java:34. */
  def limit(df: DataFrame, n: Int): DataFrame = df.limit(n)

  /** DISTINCT x — reference: operator/DistinctOperator.java:27 (dedup over
    * sorted rows; as a shuffle macro = shuffle on all cols + reduce-side
    * DISTINCT, analyzer/physical/ShuffleRewriter.java:524-548). Spark's
    * hash-based distinct plans partial+final aggregation automatically.
    */
  def distinct(df: DataFrame): DataFrame = df.distinct()

  /** DUPLICATE x N TIMES [COUNTER AS c] — emit each row N times with an
    * optional 1..N counter (reference: operator/DuplicateOperator.java:35).
    * `explode(sequence(...))` stays codegen'd and never materializes N copies
    * on the driver.
    */
  def duplicate(df: DataFrame, n: Int, counterCol: Option[String] = None): DataFrame = {
    val counter = counterCol.getOrElse("__dup_counter")
    val out = df.withColumn(counter, explode(sequence(lit(1L), lit(n.toLong))))
    if (counterCol.isDefined) out else out.drop(counter)
  }

  /** FLATTEN ... TUPLE — un-nest a struct column into top-level columns
    * (reference: operator/FlattenBagOperator.java:38, FlattenType TUPLE).
    */
  def flattenTuple(df: DataFrame, structCol: String): DataFrame =
    df.select(df.columns.filter(_ != structCol).map(col) :+ col(s"$structCol.*"): _*)

  /** FLATTEN ... BAG — one output row per array element
    * (reference: operator/FlattenBagOperator.java:38, FlattenType BAG;
    * FlattenOperator2.java:37). `outer=true` keeps rows with empty/null bags
    * (explode_outer).
    */
  def flattenBag(df: DataFrame, bagCol: String, as: String, outer: Boolean = false): DataFrame = {
    val ex = if (outer) explode_outer(col(bagCol)) else explode(col(bagCol))
    df.withColumn(as, ex).drop(bagCol)
  }

  /** FLATTEN ... BAG_TUPLE — explode a bag of tuples then splat the struct
    * (reference: FlattenBagOperator FlattenType BAG_TUPLE).
    */
  def flattenBagTuple(df: DataFrame, bagCol: String): DataFrame = {
    val tmp = "__flat"
    df.withColumn(tmp, explode(col(bagCol))).drop(bagCol)
      .select(col("*"), col(s"$tmp.*")).drop(tmp)
  }

  /** GATHER a, b, … — bag-semantics union of same-schema relations
    * (reference: operator/GatherOperator.java:29-43; pure plan wiring there,
    * pure plan wiring here).
    */
  def gather(dfs: DataFrame*): DataFrame = dfs.reduce(_ unionByName _)

  /** COMBINE a, b SORTED ON cols — k-way merge of sorted inputs preserving
    * order (reference: operator/CombineOperator.java:35, priority queue at
    * :37-94). Spark: union then sort — the SortExec is the k-way merge, and
    * at scale it stays distributed (sortWithinPartitions) rather than global.
    */
  def combine(sortCols: Seq[Column], dfs: DataFrame*): DataFrame =
    dfs.reduce(_ unionByName _).sortWithinPartitions(sortCols: _*)

  /** SORT x ON cols — in-block sort (reference: operator/SortOperator.java:42).
    * Within-partition by design, like the reference; global total order is
    * `orderBy` (see `orderByGlobal`).
    */
  def sortBlock(df: DataFrame, cols: Column*): DataFrame =
    df.sortWithinPartitions(cols: _*)

  /** Global total-order sort (Spark range-partitions then sorts). */
  def orderByGlobal(df: DataFrame, cols: Column*): DataFrame = df.orderBy(cols: _*)

  /** SHUFFLE x PARTITIONED ON p SORTED ON s — explicit repartition + per-
    * partition sort (reference: grammar CubertPhysical.g4:53-55, partitioner
    * plan/physical/CubertPartitioner.java:39).
    */
  def shuffle(df: DataFrame, partitionCols: Seq[Column], sortCols: Seq[Column] = Nil): DataFrame = {
    val rep = df.repartition(partitionCols: _*)
    if (sortCols.isEmpty) rep else rep.sortWithinPartitions(sortCols: _*)
  }

  /** Split a relation on a predicate into (main, teed). Rows where `cond`
    * is NULL stay in the main flow — the reference's TeeOperator returns any
    * non-teed tuple to the main flow (TeeOperator.next(): passthrough ||
    * !isTeed), so a NULL predicate must not drop the row from both sinks.
    */
  def split(df: DataFrame, cond: Column): (DataFrame, DataFrame) =
    (df.filter(!coalesce(cond, lit(false))), df.filter(cond))

  /** TEE WITH SPLIT — side-output rows matching `cond` to `path`, removing
    * them from the main flow (reference: operator/TeeOperator.java:33).
    * NULL-predicate rows pass through to main (see `split`). The input is
    * evaluated once per sink; callers that fear recompute should
    * `.persist()` first (the MULTIPASS pattern).
    */
  def teeWithSplit(df: DataFrame, cond: Column, path: String): DataFrame = {
    val (main, teed) = split(df, cond)
    teed.write.mode("overwrite").parquet(path)
    main
  }

  /** TEE (no split) — side-output a projection of all rows, keep main flow
    * intact (reference: operator/TeeOperator.java:33, io/TeeWriter.java:33).
    */
  def tee(df: DataFrame, path: String, projection: Seq[Column] = Nil): DataFrame = {
    val side = if (projection.isEmpty) df else df.select(projection: _*)
    side.write.mode("overwrite").parquet(path)
    df
  }

  /** MULTIPASS { … } { … } — several single-pass chains over one
    * materialized input (reference: plan/physical/PhaseExecutor.java:114-154).
    * Spark: persist once, run each pass, union if same-schema.
    */
  def multipass(df: DataFrame)(passes: (DataFrame => DataFrame)*): Seq[DataFrame] = {
    val cached = df.persist()
    passes.map(p => p(cached))
  }

  /** VALIDATE / NO_OP ASSERT — runtime invariant check (reference:
    * operator/ValidateOperator.java:38, operator/NullOperator.java:31).
    * Catalyst tracks partitioning/ordering invariants for its own planning;
    * this is the explicit runtime assertion for debugging parity: any
    * partition whose `cols` prefix is not non-decreasing raises. Zero
    * shuffle — a streaming per-partition comparison; rows pass through.
    */
  def validateSorted(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.forall(df.columns.contains), s"missing sort columns: $cols")
    val idx = cols.map(df.schema.fieldIndex)
    idx.foreach { i =>
      val f = df.schema(i)
      import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
      val scalar = f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType => false
        case _ => true
      }
      require(scalar,
        s"VALIDATE sort column '${f.name}' has non-orderable-scalar type ${f.dataType.simpleString}")
    }
    df.mapPartitions { it =>
      var prev: Option[Seq[Any]] = None
      it.map { row =>
        val key = idx.map(row.get)
        prev.foreach { pk =>
          val cmp = pk.zip(key).iterator.map {
            case (null, null) => 0
            case (null, _)    => -1
            case (_, null)    => 1
            case (a, b) =>
              a.asInstanceOf[Comparable[Any]].compareTo(b)
          }.find(_ != 0).getOrElse(0)
          if (cmp > 0) throw new IllegalStateException(
            s"VALIDATE failed: rows not sorted on $cols ($pk > $key)")
        }
        prev = Some(key)
        row
      }
    }(org.apache.spark.sql.Encoders.row(df.schema))
  }

  /** INTERSECT / EXCEPT — absent from the reference grammar but free in
    * Spark (SURVEY.md §2.6); included so the engine surface is a superset.
    */
  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def except(a: DataFrame, b: DataFrame): DataFrame = a.except(b)

  /** SKYLINE (Pareto frontier): rows not dominated by any other row —
    * `maxCols` are better-when-bigger, `minCols` better-when-smaller; a
    * dominator must be ≥ in every dimension and strictly better in one.
    * Ties survive together; rows with a null dimension are dropped
    * (dominance is undefined on null).
    *
    * Scale shape: the textbook formulation is an O(n²) NOT EXISTS
    * self-join. Here an equi-depth grid prunes first: ONE approx-quantile
    * aggregation yields every dimension's `nBins` boundaries
    * (direction-normalized; the grid is an internal prune, so approximate
    * boundaries never affect the answer), the ≤ nBins^d DISTINCT occupied
    * cells form a metadata-sized table, and any cell with a nonempty cell
    * strictly better in EVERY dimension is dead — bin(q) > bin(v) forces
    * q > v, so every point in the better cell dominates every point in the
    * dead one. Dropping dead cells is a broadcast hash anti-join on the
    * cell vector (narrow per-row probe). The exact quadratic refine then
    * runs over the DISTINCT dimension vectors of the surviving band (a
    * broadcast nested-loop anti-join), and survivors' rows return through
    * an equi semi-join — so duplicate-heavy data (a hot tied point with
    * 10^5 copies) costs one representative, not |copies|², in the
    * quadratic. Anti-correlated dimensions degrade gracefully: the skyline
    * itself is the output, so refine cost is inherent to the answer size —
    * and when the surviving band exceeds `maxBroadcastPts` distinct points
    * (too big to broadcast at all), the refine switches to a
    * grid-partitioned form: surviving cells join their weakly-dominating
    * surviving cells (a metadata-sized pair table), each band point is
    * replicated once per dominating cell, and domination is probed with a
    * shuffle equi-join on the cell vector — no data-sized broadcast on any
    * path, so an adversarial band degrades to shuffle cost instead of a
    * driver/executor OOM.
    */
  def skyline(df: DataFrame, maxCols: Seq[String], minCols: Seq[String] = Nil,
              nBins: Int = 8, maxBroadcastPts: Long = 1L << 21): DataFrame = {
    val dims: Seq[(String, Boolean)] = maxCols.map((_, true)) ++ minCols.map((_, false))
    require(dims.nonEmpty, "skyline needs at least one dimension")
    val clean = df.na.drop("any", dims.map(_._1))
    // equi-depth grid boundaries for ALL dims in ONE aggregation. The grid
    // is an internal prune — the refine below is exact under ANY binning —
    // so approx_percentile (no determinism contract, but one cheap pass)
    // is the right tool here, unlike the oracle-replayed sketch operators.
    val qs = (1 until nBins).map(_.toDouble / nBins).toArray
    val withNorm = dims.zipWithIndex.foldLeft(clean) { case (d, ((c, isMax), i)) =>
      d.withColumn(s"__n$i", (if (isMax) col(c) else -col(c)).cast("double"))
    }
    val bounds = withNorm.agg(
      percentile_approx(col("__n0"), lit(qs), lit(10000)).as("__bs0"),
      dims.indices.tail.map(i =>
        percentile_approx(col(s"__n$i"), lit(qs), lit(10000)).as(s"__bs$i")): _*)
    val binned = dims.indices.foldLeft(withNorm.crossJoin(broadcast(bounds))) {
      (d, i) =>
        d.withColumn(s"__g$i", size(org.apache.spark.sql.functions
          .filter(col(s"__bs$i"), b => b <= col(s"__n$i"))))
    }.drop(dims.indices.flatMap(i => Seq(s"__n$i", s"__bs$i")): _*)
    val gs = dims.indices.map(i => s"__g$i")
    val cells = binned.select(gs.map(col): _*).distinct()
    val better = gs.map(g => col(s"b.$g") >= col(s"a.$g") + 1).reduce(_ && _)
    val dead = cells.as("a").join(broadcast(cells.as("b")), better, "left_semi")
    // the surviving band is answer-sized; checkpoint it so the refine and
    // the final semi-join don't each replay the grid/sketch lineage
    val cands = binned.join(broadcast(dead), gs, "left_anti")
      .localCheckpoint(true)
    // refine over DISTINCT dimension vectors, not rows: a hot tie (10^5
    // copies of one point) costs one representative in the quadratic, and
    // all copies come back through the equi semi-join below
    val dimCols = dims.map(_._1)
    // one dim vector maps to one cell vector, so this is distinct-by-dims
    // with the cell id carried along for the partitioned refine
    val bandPts = cands.select((dimCols ++ gs).map(col): _*).distinct()
      .localCheckpoint(true)
    val nPts = bandPts.count()
    if (nPts <= maxBroadcastPts) {
      val pts = bandPts.drop(gs: _*)
      val geq = dims.map { case (c, isMax) =>
        if (isMax) col(s"b.$c") >= col(s"a.$c") else col(s"b.$c") <= col(s"a.$c")
      }.reduce(_ && _)
      val strict = dims.map { case (c, isMax) =>
        if (isMax) col(s"b.$c") > col(s"a.$c") else col(s"b.$c") < col(s"a.$c")
      }.reduce(_ || _)
      val winners = pts.as("a").join(broadcast(pts.as("b")), geq && strict, "left_anti")
      cands.join(broadcast(winners), dimCols, "left_semi")
        .drop(gs: _*)
    } else {
      // FALLBACK for bands too large to broadcast (adversarially
      // anti-correlated dims): grid-partitioned refine. A dominator of a
      // point in cell A can only live in a cell that is >= A in every
      // binned dim (bins are monotone), so join surviving cells to their
      // weakly-dominating surviving cells (metadata-sized pair table),
      // replicate each point once per dominating cell, and probe with an
      // equi-join on the cell vector — every join is shuffle-keyed, no
      // data-sized broadcast anywhere.
      val bandA = bandPts.select(bandPts.columns.toSeq.map(c => col(c).as(s"a_$c")): _*)
      val bandB = bandPts.select(bandPts.columns.toSeq.map(c => col(c).as(s"b_$c")): _*)
      val survCells = bandPts.select(gs.map(col): _*).distinct()
      val weakDom = gs.map(g => col(s"cb.$g") >= col(s"ca.$g")).reduce(_ && _)
      val cellPairs = survCells.as("ca")
        .join(broadcast(survCells.as("cb")), weakDom)
        .select(gs.map(g => col(s"ca.$g").as(s"pa_$g")) ++
                gs.map(g => col(s"cb.$g").as(s"pb_$g")): _*)
      val aExp = bandA.join(broadcast(cellPairs),
        gs.map(g => col(s"a_$g") === col(s"pa_$g")).reduce(_ && _))
      val geqAB = dims.map { case (c, isMax) =>
        if (isMax) col(s"b_$c") >= col(s"a_$c") else col(s"b_$c") <= col(s"a_$c")
      }.reduce(_ && _)
      val strictAB = dims.map { case (c, isMax) =>
        if (isMax) col(s"b_$c") > col(s"a_$c") else col(s"b_$c") < col(s"a_$c")
      }.reduce(_ || _)
      val dominated = aExp.join(bandB,
          gs.map(g => col(s"b_$g") === col(s"pb_$g")).reduce(_ && _) && geqAB && strictAB,
          "left_semi")
        .select(dimCols.map(c => col(s"a_$c").as(c)): _*).distinct()
      val winners = bandPts.drop(gs: _*).join(dominated, dimCols, "left_anti")
      cands.join(winners, dimCols, "left_semi")
        .drop(gs: _*)
    }
  }

  /** COLLATE VECTOR BLOCK — assemble per-vector blocks from a (vectorId,
    * coordinate, value) relation, the reference's sparse-matrix/graph
    * support (reference: operator/CollateVectorBlockOperator.java:45).
    * Declaratively this is one groupBy building the sorted coordinate
    * array per vector — the join+aggregate form SURVEY §2.6 maps it to.
    */
  def collateVectors(df: DataFrame, vectorIdCol: String, coordCol: String,
                     valueCol: String): DataFrame =
    df.groupBy(col(vectorIdCol))
      .agg(array_sort(collect_list(struct(col(coordCol).as("coord"),
        col(valueCol).as("value")))).as("vector"))
}
