package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.MatrixOps
import graft.functions.ArrayMath

/** Driver-facing queries for the dense matrix layer (SURVEY.md §2.2, §2.5,
  * §2.6) with DuckDB oracles. Lane indices are 0-based on both sides
  * (generate_subscripts is 1-based, hence the -1 in the SQL).
  */
object MatrixQueries extends QueryGroup {

  /** Lane-explode an (id, vec) frame to scalar (id, pos, v) rows at the
    * declared precision — the driver's harness sorts rows in pandas and
    * cannot sort ARRAY cells, so every oracle-compared query emits scalars
    * (`+ 0.0` collapses IEEE −0.0, see ArrayMath.roundLanes). */
  private def lanes(df: DataFrame, prec: Int): DataFrame =
    df.select(col("id"), posexplode(col("vec")).as(Seq("pos", "v")))
      .select(col("id"), col("pos"), (round(col("v"), prec) + 0.0).as("v"))

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mat_row_norms" -> ((s, d) => MatrixOps.rowNorms(s, d)),
    "mat_argmax" -> ((s, d) => MatrixOps.argmaxArgmin(s, d)),
    "mat_rowfold" -> ((s, d) => MatrixOps.rowFoldStats(s, d)),
    "mat_colstats" -> ((s, d) => MatrixOps.colStats(s, d)),
    "mat_gemv" -> ((s, d) => MatrixOps.gemvFixedWeights(s, d)),
    "mat_gram_block" -> ((s, d) => MatrixOps.gramBlock(s, d)),
    "mat_gemm_ab" -> ((s, d) => {
      // C = 1.5·A·Bᵀ + 0.5·C₀: A = first 100 embedding rows (100×64),
      // Bᵀ = 8×64 deterministic-lane matrix, C₀ = dense 100×8 COO
      val a = graft.Tables.vectors(s, d).where(col("id") < 100)
      val bt = s.range(8).select(col("id"),
        transform(sequence(lit(0), lit(63)), k =>
          (pmod(col("id") * 37 + k * 11, lit(19)).cast("double") - 9.0) / 19.0)
          .as("vec"))
      val c0 = s.range(100).select(col("id").as("i"))
        .crossJoin(s.range(8).select(col("id").as("j")))
        .select(col("i"), col("j"),
          (pmod(col("i") * 3 + col("j"), lit(7)).cast("double") / 7.0).as("value"))
      MatrixOps.gemm(a, bt, 1.5, 0.5, c0)
        .select(col("i"), col("j"), (round(col("value"), 4) + 0.0).as("value"))
    }),
    "mat_mean_center" -> ((s, d) => lanes(MatrixOps.meanCenter(s, d), 4)),
    "mat_normalize_l2" -> ((s, d) => lanes(MatrixOps.normalizeL2(s, d), 4)),
    "mat_normalize_l1" -> ((s, d) => lanes(MatrixOps.normalizeL1(s, d), 6)),
    "mat_normalize_linf" -> ((s, d) => lanes(MatrixOps.normalizeLinf(s, d), 4)),
    "mat_gather_map" -> ((s, d) => {
      // gather with the key-transform lambda: row (13·i+5 mod 500) → slot i
      val v = graft.Tables.vectors(s, d)
      val idx = s.range(0, 1000).select(col("id").as("src"), col("id").as("dst"))
      lanes(MatrixOps.gatherTransform(v, idx, k => pmod(k * 13 + 5, lit(500))), 4)
    }),
    "mat_threshold_nnz" -> ((s, d) => MatrixOps.thresholdNnz(s, d, 0.5)),
    "mat_slice" -> ((s, d) =>
      lanes(MatrixOps.slice(graft.Tables.vectors(s, d), 100L, 200L, 8, 16), 4)),
    "mat_select_k" -> ((s, d) => {
      MatrixOps.selectKPerRow(graft.Tables.vectors(s, d).where(col("id") < 100), 4)
        .select(col("id"), col("pos"), round(col("v"), 4).as("v"), col("rnk"))
    }),
    "mat_sort_lanes" -> ((s, d) =>
      lanes(MatrixOps.sortLanes(graft.Tables.vectors(s, d).where(col("id") < 30)), 4)),
    // per-column rank transform over the WHOLE matrix: one TeraSort-shape
    // global row_number (RankUtils), rank-in-column = rn - pos*n
    "mat_col_ranks" -> ((s, d) => {
      val v = graft.Tables.vectors(s, d).select(col("id"), col("vec"))
      MatrixOps.colRanks(v, v.count())
    }),
    // quantile normalization: every column forced to the rank-mean
    // reference distribution (one colRanked pass + rank-keyed avg)
    "mat_quantile_norm" -> ((s, d) => {
      val v = graft.Tables.vectors(s, d).select(col("id"), col("vec"))
      MatrixOps.quantileNormalize(v, v.count())
        .select(col("id"), col("pos"), (round(col("qv"), 6) + 0.0).as("qv"))
    }),
    "mat_col_reverse" -> ((s, d) =>
      lanes(MatrixOps.colReverse(graft.Tables.vectors(s, d).where(col("id") < 30)), 4)),
    "mat_row_reverse" -> ((s, d) =>
      lanes(MatrixOps.rowReverse(
        graft.Tables.vectors(s, d).where(col("id") < 30)
          .select(col("id"), col("vec")), 30L), 4)),
    "mat_sample_rows" -> ((s, d) => {
      MatrixOps.sampleRows(graft.Tables.vectors(s, d), 100, 7L)
        .select(col("id"), col("label"))
    }),
    "mat_shift" -> ((s, d) => MatrixOps.shiftedRowSums(graft.Tables.vectors(s, d))),
    "mat_shift_lanes" -> ((s, d) =>
      lanes(MatrixOps.shiftLanes(
        graft.Tables.vectors(s, d).where(col("id") < 30), 3, 0.5), 4)),
    "mat_mean_add" -> ((s, d) => lanes(MatrixOps.meanAdd(s, d), 4)),
    "mat_eye" -> ((s, d) => MatrixOps.eye(s, 10L)),
    "mat_gather" -> ((s, d) => {
      val v = graft.Tables.vectors(s, d)
      val idx = v.sparkSession.range(0, 1000)
        .select((col("id") * 7).as("src"), col("id").as("dst"))
      lanes(MatrixOps.gather(v, idx), 4)
    }),
    "mat_gemv_native" -> ((s, d) => {
      // same weights as mat_gemv, through the codegen'd ArrayDot Expression;
      // the weight vector is a literal array (CreateArray is codegen-able,
      // unlike transform/sequence HOFs) so the whole projection fuses.
      val w = array((0 until 64).map(j => lit(((j * 37) % 97) / 97.0)): _*)
      graft.Tables.vectors(s, d).select(col("id"),
        round(graft.functions.ArrayDot.dot(col("vec"), w), 4).as("y"))
    }),
    "mat_gemv_topk" -> ((s, d) => {
      // the COLUMNAR-KERNEL bench row (VERDICT r10 item 2): same weights
      // as mat_gemv_native, but sunk through a top-k so the projection is
      // consumed even under the bench's .count() — an aggregate would be
      // collapsed into the projection (no ProjectExec, no kernel) and a
      // bare select is pruned away entirely; a sort can be neither, so
      // the executed plan stays Scan(columnar) → GraftDotKernelExec →
      // TakeOrdered. PlanSnapshotSpec pins the kernel node in this plan.
      val w = array((0 until 64).map(j => lit(((j * 37) % 97) / 97.0)): _*)
      graft.Tables.vectors(s, d)
        .select(col("id"), round(graft.functions.ArrayDot.dot(col("vec"), w), 4).as("y"))
        .orderBy(col("y").desc, col("id").asc)
        .limit(5)
    }),
    "mat_l2q_topk" -> ((s, d) => {
      // widened columnar kernel (VERDICT r11 item 5): squared-L2 to a
      // literal query point — the brute-force ANN inner loop as a batch
      // kernel. Same top-k sink rationale as mat_gemv_topk.
      val q = array((0 until 64).map(j => lit(((j * 53) % 89) / 89.0)): _*)
      graft.Tables.vectors(s, d)
        .select(col("id"),
          round(graft.functions.ArrayL2Sq.l2sq(col("vec"), q), 4).as("dist"))
        .orderBy(col("dist").asc, col("id").asc)
        .limit(5)
    }),
    "mat_normsq_topk" -> ((s, d) =>
      // widened columnar kernel: unary Σx² (the L2-norm inner loop) as a
      // batch kernel over the raw scan, top-k sink.
      graft.Tables.vectors(s, d)
        .select(col("id"),
          round(graft.functions.ArrayNormSq.normSq(col("vec")), 4).as("nsq"))
        .orderBy(col("nsq").desc, col("id").asc)
        .limit(5)),
    "mat_sort_keys" -> ((s, d) => {
      // exploded (id, pos, v, k): pos = sorted position, k = original lane
      MatrixOps.sortLanesWithKeys(graft.Tables.vectors(s, d).where(col("id") < 30))
        .select(col("id"), posexplode(arrays_zip(col("vals"), col("keys")))
          .as(Seq("pos", "vk")))
        .select(col("id"), col("pos"),
          (round(col("vk.vals"), 4) + 0.0).as("v"), col("vk.keys").as("k"))
    }),
    "mat_gather_if" -> ((s, d) => {
      val v = graft.Tables.vectors(s, d)
      val idx = v.sparkSession.range(0, 1000)
        .select((col("id") * 3).as("src"), col("id").as("dst"))
      lanes(MatrixOps.gatherIf(v, idx, col("src") % 2 === 0), 4)
    }),
    "mat_eltwise" -> ((s, d) => {
      val v = graft.Tables.vectors(s, d)
      val r = reverse(col("vec"))
      v.select(col("id"),
        round(ArrayMath.rowSum(ArrayMath.add(col("vec"), r)), 4).as("add_sum"),
        round(ArrayMath.rowSum(ArrayMath.sub(col("vec"), r)), 4).as("sub_sum"),
        round(ArrayMath.rowSum(ArrayMath.mul(col("vec"), r)), 4).as("mul_sum"),
        round(ArrayMath.rowSum(ArrayMath.axpy(lit(2.0), col("vec"), r)), 4).as("axpy_sum"))
    }),
    "mat_reduce_rows_by_key" -> ((s, d) => MatrixOps.reduceRowsByKey(s, d)),
    "mat_reduce_cols_by_key" -> ((s, d) => MatrixOps.reduceColsByKey(s, d)),
    "mat_ratio" -> ((s, d) => MatrixOps.rowRatio(s, d)),
    "mat_sign_flip" -> ((s, d) => lanes(MatrixOps.signFlip(s, d), 4)),
    "mat_reciprocal" -> ((s, d) => MatrixOps.reciprocalRowSums(s, d)),
    "mat_scatter" -> ((s, d) => MatrixOps.scatterRowSums(s, d, 500L)),
    "mat_row_weighted_mean" -> ((s, d) => MatrixOps.rowWeightedMean(s, d)),
    // fp16 STORAGE lanes (VERDICT r12 item 7): FLOAT → binary16 bit
    // pattern (RNE) → FLOAT, per lane. hbits is the unsigned SHORT bit
    // pattern (the value that round-trips parquet as a 2-byte column),
    // dec the exactly-decoded value; the oracle replays IEEE 754 RNE
    // arithmetic in SQL (floor(log2) + a ±1 exponent correction, exact
    // tie detection — power-of-two divides are exact in doubles).
    // Domain: finite in-half-range values (the embeddings table);
    // Inf/NaN handling is spec-pinned JVM-side in Fp16Spec instead.
    "mat_fp16_roundtrip" -> ((s, d) => {
      import graft.functions.Fp16
      graft.Tables.embeddings(s, d).where(col("vec_id") < 500)
        .select(col("vec_id").as("id"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("id"), col("pos"),
          Fp16.toHalf(col("x")).cast("long").bitwiseAND(lit(65535L)).as("hbits"),
          Fp16.fromHalf(Fp16.toHalf(col("x"))).cast("double").as("dec"))
    }),
  )

  private val castLanes = "list_transform(embedding, f -> CAST(f AS DOUBLE))"

  /** Strict left-fold dot product (same lane order as ArrayMath.dot). */
  private def foldDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip($a, $b), p -> p[1] * p[2])), (s, x) -> s + x)"

  val sql: Map[String, String] = Map(
    "mat_row_norms" ->
      s"""SELECT vec_id AS id,
         |  CAST(list_sum(list_transform($castLanes, x -> CASE WHEN x <> 0 THEN 1 ELSE 0 END)) AS BIGINT) AS l0,
         |  round(list_sum(list_transform($castLanes, x -> abs(x))), 4) AS l1,
         |  round(sqrt(list_sum(list_transform($castLanes, x -> x*x))), 4) AS l2,
         |  round(list_max(list_transform($castLanes, x -> abs(x))), 4) AS linf
         |FROM embeddings""".stripMargin,
    "mat_argmax" ->
      """SELECT vec_id AS id,
        |  list_position(embedding, list_max(embedding)) - 1 AS amax,
        |  list_position(embedding, list_min(embedding)) - 1 AS amin
        |FROM embeddings""".stripMargin,
    "mat_rowfold" ->
      s"""SELECT vec_id AS id,
         |  round(list_sum($castLanes), 4) AS rsum,
         |  round(list_sum($castLanes) / len(embedding), 6) AS rmean,
         |  round(list_min($castLanes), 4) AS rmin,
         |  round(list_max($castLanes), 4) AS rmax
         |FROM embeddings""".stripMargin,
    "mat_colstats" ->
      """SELECT pos, round(avg(x), 6) AS mean, round(var_samp(x), 6) AS var,
        |       round(min(x), 4) AS mn, round(max(x), 4) AS mx
        |FROM (SELECT unnest(list_transform(embedding, f -> CAST(f AS DOUBLE))) AS x,
        |             generate_subscripts(embedding, 1) - 1 AS pos
        |      FROM embeddings)
        |GROUP BY pos""".stripMargin,
    "mat_gemv" ->
      s"""SELECT vec_id AS id,
         |  round(list_sum(list_transform(list_zip($castLanes,
         |    [((j*37)%97)/97.0 FOR j IN range(64)]),
         |    p -> p[1] * p[2])), 4) AS y
         |FROM embeddings""".stripMargin,
    "mat_gram_block" ->
      """SELECT a.vec_id AS i, b.vec_id AS j,
        |  round(list_sum(list_transform(list_zip(
        |    list_transform(a.embedding, f -> CAST(f AS DOUBLE)),
        |    list_transform(b.embedding, f -> CAST(f AS DOUBLE))),
        |    p -> p[1] * p[2])), 4) AS dp
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < 20 AND b.vec_id < 20 AND a.vec_id <= b.vec_id""".stripMargin,
    "mat_gemm_ab" ->
      s"""SELECT a.vec_id AS i, j,
         |  round(1.5 * ${foldDot(castLanes, "[((j*37 + k*11) % 19 - 9) / 19.0 FOR k IN range(64)]")}
         |        + 0.5 * (((a.vec_id*3 + j) % 7) / 7.0), 4) + 0.0 AS value
         |FROM embeddings a, range(8) t(j)
         |WHERE a.vec_id < 100""".stripMargin,
    "mat_mean_center" ->
      """WITH m AS (
        |  SELECT pos, avg(x) AS mu FROM
        |    (SELECT unnest(list_transform(embedding, f -> CAST(f AS DOUBLE))) AS x,
        |            generate_subscripts(embedding, 1) - 1 AS pos FROM embeddings)
        |  GROUP BY pos),
        |lanes AS (
        |  SELECT vec_id, unnest(list_transform(embedding, f -> CAST(f AS DOUBLE))) AS x,
        |         generate_subscripts(embedding, 1) - 1 AS pos
        |  FROM embeddings WHERE vec_id < 30)
        |SELECT lanes.vec_id AS id, lanes.pos,
        |       round(lanes.x - m.mu, 4) + 0.0 AS v
        |FROM lanes JOIN m ON lanes.pos = m.pos""".stripMargin,
    "mat_normalize_l2" ->
      s"""WITH nr AS (
         |  SELECT vec_id AS id, $castLanes AS vec,
         |         sqrt(list_sum(list_transform($castLanes, x -> x*x))) AS nrm
         |  FROM embeddings WHERE vec_id < 30)
         |SELECT id, generate_subscripts(vec, 1) - 1 AS pos,
         |  round(CASE WHEN nrm <> 0 THEN unnest(vec) / nrm ELSE unnest(vec) END, 4) + 0.0 AS v
         |FROM nr""".stripMargin,
    "mat_normalize_l1" ->
      s"""WITH nr AS (
         |  SELECT vec_id AS id, $castLanes AS vec,
         |         list_sum(list_transform($castLanes, x -> abs(x))) AS nrm
         |  FROM embeddings WHERE vec_id < 30)
         |SELECT id, generate_subscripts(vec, 1) - 1 AS pos,
         |  round(CASE WHEN nrm <> 0 THEN unnest(vec) / nrm ELSE unnest(vec) END, 6) + 0.0 AS v
         |FROM nr""".stripMargin,
    "mat_normalize_linf" ->
      s"""WITH nr AS (
         |  SELECT vec_id AS id, $castLanes AS vec,
         |         list_max(list_transform($castLanes, x -> abs(x))) AS nrm
         |  FROM embeddings WHERE vec_id < 30)
         |SELECT id, generate_subscripts(vec, 1) - 1 AS pos,
         |  round(CASE WHEN nrm <> 0 THEN unnest(vec) / nrm ELSE unnest(vec) END, 4) + 0.0 AS v
         |FROM nr""".stripMargin,
    "mat_gather_map" ->
      """WITH idx AS (SELECT i AS dst, (i*13+5) % 500 AS src FROM range(1000) t(i))
        |SELECT idx.dst AS id, generate_subscripts(e.embedding, 1) - 1 AS pos,
        |  round(CAST(unnest(e.embedding) AS DOUBLE), 4) + 0.0 AS v
        |FROM idx JOIN embeddings e ON e.vec_id = idx.src""".stripMargin,
    "mat_threshold_nnz" ->
      s"""SELECT vec_id AS id,
         |  CAST(list_sum(list_transform($castLanes,
         |    x -> CASE WHEN abs(x) < 0.5 THEN 0 ELSE (CASE WHEN x <> 0 THEN 1 ELSE 0 END) END)) AS BIGINT) AS nnz
         |FROM embeddings""".stripMargin,
    "mat_slice" ->
      """SELECT vec_id AS id, generate_subscripts(embedding[9:16], 1) - 1 AS pos,
        |  round(CAST(unnest(embedding[9:16]) AS DOUBLE), 4) + 0.0 AS v
        |FROM embeddings WHERE vec_id >= 100 AND vec_id < 200""".stripMargin,
    "mat_select_k" ->
      """SELECT vec_id AS id, pos, round(x, 4) AS v, rnk FROM (
        |  SELECT vec_id, pos, x,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY x DESC, pos) AS rnk
        |  FROM (SELECT vec_id,
        |               unnest(list_transform(embedding, f -> CAST(f AS DOUBLE))) AS x,
        |               generate_subscripts(embedding, 1) - 1 AS pos
        |        FROM embeddings WHERE vec_id < 100))
        |WHERE rnk <= 4""".stripMargin,
    "mat_sort_lanes" ->
      s"""SELECT vec_id AS id,
         |  generate_subscripts(embedding, 1) - 1 AS pos,
         |  round(unnest(list_sort($castLanes)), 4) + 0.0 AS v
         |FROM embeddings WHERE vec_id < 30""".stripMargin,
    // independent per-column order statistics; (v, vec_id) is the same
    // total order the Spark TeraSort rank uses
    "mat_col_ranks" ->
      s"""SELECT id, pos, rnk FROM (
         |  SELECT vec_id AS id, pos,
         |         row_number() OVER (PARTITION BY pos ORDER BY v, vec_id) AS rnk
         |  FROM (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         |               unnest($castLanes) AS v
         |        FROM embeddings))""".stripMargin,
    // rank-mean reference distribution joined back on rank-in-column
    "mat_quantile_norm" ->
      s"""WITH l AS (
         |  SELECT vec_id AS id, pos, v,
         |         row_number() OVER (PARTITION BY pos ORDER BY v, vec_id) AS rnk
         |  FROM (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         |               unnest($castLanes) AS v
         |        FROM embeddings)),
         |ref AS (SELECT rnk, avg(v) AS qv FROM l GROUP BY 1)
         |SELECT l.id, l.pos, round(ref.qv, 6) + 0.0 AS qv
         |FROM l JOIN ref USING (rnk)""".stripMargin,
    "mat_col_reverse" ->
      s"""SELECT vec_id AS id,
         |  generate_subscripts(embedding, 1) - 1 AS pos,
         |  round(unnest(list_reverse($castLanes)), 4) + 0.0 AS v
         |FROM embeddings WHERE vec_id < 30""".stripMargin,
    "mat_row_reverse" ->
      """SELECT 29 - vec_id AS id, generate_subscripts(embedding, 1) - 1 AS pos,
        |  round(CAST(unnest(embedding) AS DOUBLE), 4) + 0.0 AS v
        |FROM embeddings WHERE vec_id < 30""".stripMargin,
    "mat_sample_rows" ->
      """SELECT vec_id AS id, label FROM embeddings
        |ORDER BY md5(concat_ws(':', vec_id, 7)), vec_id LIMIT 100""".stripMargin,
    "mat_shift" ->
      s"""SELECT vec_id AS id,
         |  round(coalesce(lag(list_sum($castLanes), 1) OVER (ORDER BY vec_id), 0.0), 4) AS prev_sum
         |FROM embeddings""".stripMargin,
    "mat_eye" ->
      "SELECT j AS row, j AS col, CAST(1.0 AS DOUBLE) AS value FROM range(10) t(j)",
    "mat_shift_lanes" ->
      """WITH sh AS (
        |  SELECT vec_id AS id,
        |    [0.5, 0.5, 0.5] || list_transform(embedding[1:61], f -> CAST(f AS DOUBLE)) AS vec
        |  FROM embeddings WHERE vec_id < 30)
        |SELECT id, generate_subscripts(vec, 1) - 1 AS pos,
        |  round(unnest(vec), 4) + 0.0 AS v
        |FROM sh""".stripMargin,
    "mat_mean_add" ->
      """SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS pos,
        |  round(CAST(unnest(embedding) AS DOUBLE), 4) + 0.0 AS v
        |FROM embeddings WHERE vec_id < 30""".stripMargin,
    "mat_gather" ->
      """SELECT vec_id // 7 AS id, generate_subscripts(embedding, 1) - 1 AS pos,
        |  round(CAST(unnest(embedding) AS DOUBLE), 4) + 0.0 AS v
        |FROM embeddings WHERE vec_id % 7 = 0 AND vec_id < 7000""".stripMargin,
    "mat_gemv_native" ->
      s"""SELECT vec_id AS id,
         |  round(list_sum(list_transform(list_zip($castLanes,
         |    [((j*37)%97)/97.0 FOR j IN range(64)]),
         |    p -> p[1] * p[2])), 4) AS y
         |FROM embeddings""".stripMargin,
    "mat_gemv_topk" ->
      s"""SELECT vec_id AS id,
         |  round(list_sum(list_transform(list_zip($castLanes,
         |    [((j*37)%97)/97.0 FOR j IN range(64)]),
         |    p -> p[1] * p[2])), 4) AS y
         |FROM embeddings
         |ORDER BY y DESC, id ASC LIMIT 5""".stripMargin,
    "mat_l2q_topk" ->
      s"""SELECT vec_id AS id,
         |  round(list_sum(list_transform(list_zip($castLanes,
         |    [((j*53)%89)/89.0 FOR j IN range(64)]),
         |    p -> (p[1] - p[2]) * (p[1] - p[2]))), 4) AS dist
         |FROM embeddings
         |ORDER BY dist ASC, id ASC LIMIT 5""".stripMargin,
    "mat_normsq_topk" ->
      s"""SELECT vec_id AS id,
         |  round(list_sum(list_transform($castLanes, x -> x * x)), 4) AS nsq
         |FROM embeddings
         |ORDER BY nsq DESC, id ASC LIMIT 5""".stripMargin,
    "mat_sort_keys" ->
      """WITH lanes AS (
        |  SELECT vec_id, unnest(list_transform(embedding, f -> CAST(f AS DOUBLE))) AS x,
        |         generate_subscripts(embedding, 1) - 1 AS pos
        |  FROM embeddings WHERE vec_id < 30)
        |SELECT vec_id AS id,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY x, pos) - 1 AS pos,
        |  round(x, 4) + 0.0 AS v, pos AS k
        |FROM lanes""".stripMargin,
    "mat_gather_if" ->
      """SELECT vec_id // 3 AS id, generate_subscripts(embedding, 1) - 1 AS pos,
        |  round(CAST(unnest(embedding) AS DOUBLE), 4) + 0.0 AS v
        |FROM embeddings
        |WHERE vec_id % 3 = 0 AND vec_id % 2 = 0 AND vec_id < 3000""".stripMargin,
    "mat_eltwise" ->
      s"""SELECT vec_id AS id,
         |  round(list_sum(list_transform(list_zip($castLanes, list_reverse($castLanes)),
         |    p -> p[1] + p[2])), 4) AS add_sum,
         |  round(list_sum(list_transform(list_zip($castLanes, list_reverse($castLanes)),
         |    p -> p[1] - p[2])), 4) AS sub_sum,
         |  round(list_sum(list_transform(list_zip($castLanes, list_reverse($castLanes)),
         |    p -> p[1] * p[2])), 4) AS mul_sum,
         |  round(list_sum(list_transform(list_zip($castLanes, list_reverse($castLanes)),
         |    p -> 2.0 * p[1] + p[2])), 4) AS axpy_sum
         |FROM embeddings""".stripMargin,
    "mat_reduce_rows_by_key" ->
      """SELECT label, pos, round(sum(x), 4) AS s
        |FROM (SELECT label,
        |             unnest(list_transform(embedding, f -> CAST(f AS DOUBLE))) AS x,
        |             generate_subscripts(embedding, 1) - 1 AS pos
        |      FROM embeddings)
        |GROUP BY label, pos""".stripMargin,
    "mat_reduce_cols_by_key" ->
      """SELECT vec_id AS id, pos % 4 AS k, round(sum(x), 4) AS s
        |FROM (SELECT vec_id,
        |             unnest(list_transform(embedding, f -> CAST(f AS DOUBLE))) AS x,
        |             generate_subscripts(embedding, 1) - 1 AS pos
        |      FROM embeddings)
        |GROUP BY vec_id, pos % 4""".stripMargin,
    "mat_sign_flip" ->
      """WITH lanes AS (
        |  SELECT vec_id, unnest(list_transform(embedding, f -> CAST(f AS DOUBLE))) AS x,
        |         generate_subscripts(embedding, 1) - 1 AS pos
        |  FROM embeddings),
        |signs AS (
        |  SELECT pos, CASE WHEN x >= 0 THEN 1.0 ELSE -1.0 END AS s FROM (
        |    SELECT pos, x, row_number() OVER (PARTITION BY pos
        |             ORDER BY abs(x) DESC, vec_id) AS rn
        |    FROM lanes) WHERE rn = 1)
        |SELECT vec_id AS id, lanes.pos, round(x * s, 4) + 0.0 AS v
        |FROM lanes JOIN signs ON lanes.pos = signs.pos
        |WHERE vec_id < 30""".stripMargin,
    "mat_reciprocal" ->
      s"""SELECT vec_id AS id,
         |  round(CASE WHEN list_sum($castLanes) <> 0.0
         |    THEN 1.0 / list_sum($castLanes) ELSE 0.0 END, 8) AS recip
         |FROM embeddings""".stripMargin,
    "mat_ratio" ->
      s"""WITH rs AS (SELECT vec_id AS id, list_sum($castLanes) AS rs FROM embeddings),
         |tot AS (SELECT sum(rs) AS tot FROM rs)
         |SELECT id, round(rs / tot, 8) AS ratio FROM rs, tot""".stripMargin,
    "mat_scatter" ->
      s"""SELECT (vec_id * 7) % 500 AS id, round(list_sum($castLanes), 4) AS rsum
         |FROM embeddings""".stripMargin,
    "mat_row_weighted_mean" -> {
      val wsum = (0 until 64).map(j => ((j * 11) % 23) + 1.0).sum
      s"""SELECT vec_id AS id,
         |  round(list_sum(list_transform(list_zip($castLanes,
         |    [CAST((j*11)%23 AS DOUBLE) + 1.0 FOR j IN range(64)]),
         |    p -> p[1] * p[2])) / $wsum, 6) AS wmean
         |FROM embeddings""".stripMargin
    },
    // binary16 RNE replayed in SQL: exponent guess = floor(log2|x|) with a
    // ±1 correction (libm boundary misrounds), mantissa = |x| scaled by an
    // EXACT power of two into [1024, 2048) (so the 0.5-tie test is exact —
    // a float widened to double divided by 2^k keeps ≤ 24 significant
    // bits), round-half-even, then carry/subnormal cases mirror
    // Fp16.floatToHalf branch for branch.
    "mat_fp16_roundtrip" ->
      """WITH lanes AS (
        |  SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings WHERE vec_id < 500),
        |sgn AS (
        |  SELECT id, pos, x, abs(x) AS a,
        |         CASE WHEN signbit(x) THEN 1 ELSE 0 END AS s
        |  FROM lanes),
        |guess AS (
        |  SELECT *, CASE WHEN a = 0 THEN -25
        |                 WHEN a >= power(2.0, -14) THEN CAST(floor(log2(a)) AS BIGINT)
        |                 ELSE -15 END AS eg
        |  FROM sgn),
        |fixed AS (
        |  SELECT *, CASE
        |      WHEN eg >= -14 AND a * power(2.0, 10 - eg) >= 2048 THEN eg + 1
        |      WHEN eg >= -14 AND a * power(2.0, 10 - eg) < 1024 AND eg > -14 THEN eg - 1
        |      WHEN eg >= -14 AND a * power(2.0, 10 - eg) < 1024 THEN -15
        |      ELSE eg END AS e
        |  FROM guess),
        |scaled AS (
        |  SELECT *, CASE WHEN e = -25 THEN 0.0
        |                 WHEN e >= -14 THEN a * power(2.0, 10 - e)
        |                 ELSE a * power(2.0, 24) END AS v
        |  FROM fixed),
        |rne AS (
        |  SELECT *, CAST(CASE
        |      WHEN v - floor(v) > 0.5 THEN floor(v) + 1
        |      WHEN v - floor(v) < 0.5 THEN floor(v)
        |      WHEN CAST(floor(v) AS BIGINT) % 2 = 0 THEN floor(v)
        |      ELSE floor(v) + 1 END AS BIGINT) AS k
        |  FROM scaled),
        |fin AS (
        |  -- explicit overflow leg (ADVICE r13): |x| at/above the RNE
        |  -- boundary 65520 (and ±Inf) maps to the Inf pattern 0x7C00,
        |  -- mirroring Fp16.floatToHalf — out-of-range lanes in a future
        |  -- fixture then compare correctly instead of mismatching
        |  -- confusingly (NaN lanes remain a loud mismatch by design)
        |  SELECT id, pos, s,
        |    CASE WHEN a >= 65520 OR isinf(a) THEN 31744
        |         WHEN e = -25 OR k = 0 THEN 0
        |         WHEN e < -14 AND k < 1024 THEN k
        |         WHEN e < -14 THEN 1024
        |         WHEN k >= 2048 THEN (e + 1 + 15) * 1024
        |         ELSE (e + 15) * 1024 + (k - 1024) END AS mag,
        |    CASE WHEN a >= 65520 OR isinf(a) THEN CAST('infinity' AS DOUBLE)
        |         WHEN e = -25 OR k = 0 THEN 0.0
        |         WHEN e < -14 AND k < 1024 THEN k * power(2.0, -24)
        |         WHEN e < -14 THEN power(2.0, -14)
        |         WHEN k >= 2048 THEN power(2.0, e + 1)
        |         ELSE k * power(2.0, e - 10) END AS mdec
        |  FROM rne)
        |SELECT id, pos, CAST(s * 32768 + mag AS BIGINT) AS hbits,
        |       CASE WHEN s = 1 THEN -mdec ELSE mdec END AS dec
        |FROM fin""".stripMargin,
  )
}
