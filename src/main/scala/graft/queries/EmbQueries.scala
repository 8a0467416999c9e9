package graft.queries

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{NamedQuery, Tables}
import graft.ops.Ops

/** Similarity-search operators over the `embeddings` corpus table
  * (`embedding: array<float>`, 64-dim; builder brief / SURVEY.md §7.2-6).
  *
  * All vector math uses higher-order functions (`zip_with` + `aggregate`)
  * — zero UDFs, fully codegen'd. Cross-engine determinism: both Spark's
  * `aggregate` and DuckDB's `list_sum` fold the list sequentially in index
  * order over doubles (each float is exactly representable as double), so
  * dot products and norms match bit-for-bit.
  *
  * Scale discipline: the only all-pairs-shaped work is bucket-local
  * (LSH bucket self-join); the brute-force query compares against ONE
  * query vector (a 1-row broadcast), never vector×vector.
  */
object EmbQueries {

  private def emb(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, d)
  }

  private def dotDuck(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** Spark side: the native codegen'd expression
    * ([[graft.functions.CosineSimilarity]]) — bit-identical to the
    * composed `aggregate(zip_with(...))` form and to [[cosDuck]], one
    * fused loop instead of interpreted per-element lambdas. */
  private def cosSpark(a: String, b: String): String =
    s"graft_cosine($a, $b)"

  private def cosDuck(a: String, b: String): String =
    s"${dotDuck(a, b)} / (sqrt(${dotDuck(a, a)}) * sqrt(${dotDuck(b, b)}))"

  /** The 16×64 LSH hyperplane signs — constants, resolved once
    * driver-side (the precompute-and-broadcast shape). The oracle
    * re-derives the same signs from md5 per row. Only the first
    * [[lshBits]] hyperplanes of a given corpus are evaluated. */
  private lazy val hyperplaneSigns: Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(16, 64) { (j, d0) =>
      val hex = md.digest(s"$j-${d0 + 1}".getBytes("UTF-8"))
      if (((hex(0) >> 4) & 0xf) >= 8) 1 else -1
    }
  }

  /** Corpus-adaptive LSH bucket width: 8 bits up to 8192 vectors (≤32
    * per bucket), one more bit per corpus doubling, capped at 16 — the
    * integer staircase [[semanticDedupCapped]] applies per cluster,
    * applied corpus-wide. A FIXED bucket width makes every in-bucket
    * operator quadratic in corpus growth (256 buckets at the 100×
    * corpus = 781 vectors/bucket → 78M candidate pairs; adaptive width
    * holds occupancy ≈ 32 → candidates ∝ n). Integer compares only, so
    * the Spark ladder ([[lshBits]]) and the oracle ladder
    * ([[lshBitsDuck]]) can never drift; below 8193 vectors — every
    * oracle-gated SF — the width is the original 8, unchanged. The
    * recall trade is the standard one: each added bit halves the
    * chance an angular near-pair shares a bucket (bounded per bit by
    * 1−θ/π); the recall lever is more bands, orthogonal to width. */
  private[graft] def lshBits(n: Long): Int = {
    var bits = 8
    var cap = 8192L
    while (n > cap && bits < 16) { bits += 1; cap *= 2 }
    bits
  }

  /** Oracle twin of [[lshBits]] over a count expression `n`. */
  private[graft] def lshBitsDuck(n: String): String =
    s"""CASE WHEN $n <= 8192 THEN 8 WHEN $n <= 16384 THEN 9
       |     WHEN $n <= 32768 THEN 10 WHEN $n <= 65536 THEN 11
       |     WHEN $n <= 131072 THEN 12 WHEN $n <= 262144 THEN 13
       |     WHEN $n <= 524288 THEN 14 WHEN $n <= 1048576 THEN 15
       |     ELSE 16 END""".stripMargin.replace("\n", " ")

  /** Sign projection of `v` onto hyperplane `j`: a sequential
    * `aggregate(zip_with(v, signs_j, (x, s) -> s * x))` fold over a
    * LITERAL ±1.0 sign array. Numerically identical to the oracle's
    * md5-derived fold ((-1.0)*x == -x exactly, same d=1..64 order). An
    * earlier formulation spelled each projection as a flat 64-term ±
    * chain — 512 Add nodes across the 8 hyperplanes, whose Janino
    * compilation dominated every LSH query's wall time (~6 s once per
    * plan); the higher-order fold is interpreted, which for a
    * sign-projection is far cheaper than compiling. */
  private def projExpr(v: String, j: Int): String = {
    val signs = hyperplaneSigns(j)
      .map(s => if (s > 0) "1.0D" else "-1.0D").mkString("array(", ", ", ")")
    s"aggregate(zip_with($v, $signs, (x, s) -> s * cast(x AS double)), " +
      "0.0D, (acc, t) -> acc + t)"
  }

  /** `bits`-wide LSH bucket key of `v` (bits known driver-side via
    * [[lshBits]], so exactly that many projections are generated). */
  private def bucketExprN(v: String, bits: Int): String =
    "concat(" + (0 until bits).map(j =>
      s"CASE WHEN ${projExpr(v, j)} > 0 THEN '1' ELSE '0' END")
      .mkString(", ") + ")"

  /** The fixed 8-bit key — [[semanticDedupCapped]]'s base signature
    * (its occupancy control is the per-cluster sub-bucket staircase). */
  private def bucketExpr(v: String): String = bucketExprN(v, 8)

  /** Oracle twin of [[bucketExprN]]'s per-hyperplane projection. */
  private def projDuckExpr(v: String, j: String): String =
    s"list_sum(list_transform(range(1, 65), d -> " +
      s"(CASE WHEN strpos('0123456789abcdef', substr(md5($j || '-' || d), 1, 1)) - 1 >= 8 " +
      s"THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END) * CAST($v[d] AS DOUBLE)))"

  /** Oracle twin of [[bucketExprN]]: `bits` is a SQL expression (the
    * [[lshBitsDuck]] staircase over a corpus count, cross-joined in as
    * a 1-row frame). */
  private def bucketDuckExprN(v: String, bits: String): String =
    s"""array_to_string(list_transform(range(0, $bits),
       |  j -> CASE WHEN ${projDuckExpr(v, "j")} > 0
       |       THEN '1' ELSE '0' END), '')""".stripMargin

  /** Oracle twin of [[bucketExpr]] (fixed 8 bits). */
  private def bucketDuckExpr(v: String): String = bucketDuckExprN(v, "8")

  /** The shared `bucketed` CTE head with corpus-adaptive width: one
    * 1-row cross join carries the staircase width into the per-row
    * signature. */
  private def bucketedCteDuck: String =
    s"""bucketed AS (
       |  SELECT vec_id, label, embedding,
       |         ${bucketDuckExprN("embedding", "w.bits")} AS bucket
       |  FROM embeddings
       |  CROSS JOIN (SELECT ${lshBitsDuck("count(*)")} AS bits
       |              FROM embeddings) w
       |)""".stripMargin

  /** Spark twin of [[bucketedCteDuck]]: counts once (columnar,
    * metadata-cheap), bakes the width into codegen as constants. */
  private def bucketedFrame(s: SparkSession, d: String): DataFrame = {
    val bits = lshBits(emb(s, d).count())
    emb(s, d).select(
      col("vec_id"), col("label"), col("embedding"),
      expr(bucketExprN("embedding", bits)).as("bucket"))
  }

  /** Brute-force cosine top-10 against a single query vector (vec_id 0).
    * The query vector joins as a 1-row broadcast; every other vector is
    * scored map-side and the top-k is `TakeOrderedAndProject` — linear
    * scan, no shuffle of the fact side, the correct baseline at any
    * scale. */
  val cosineTopK: NamedQuery = NamedQuery(
    "emb_cosine_topk",
    s"""SELECT b.vec_id, b.label,
       |       ${cosDuck("q.qv", "b.embedding")} AS sim
       |FROM embeddings b
       |CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
       |WHERE b.vec_id <> 0
       |ORDER BY sim DESC, b.vec_id
       |LIMIT 10""".stripMargin) { (s, d) =>
    val q = emb(s, d).where(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    emb(s, d).where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        expr(cosSpark("qv", "embedding")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** LSH-bucketed approximate near-neighbor pairs — the scale path for
    * embedding near-dup: [[lshBits]] deterministic sign-projection bits
    * (corpus-adaptive 8–16; hyperplane signs derived from md5,
    * identical in both engines) form a bucket key; candidates are
    * generated ONLY within buckets (self-join on the key), then ranked
    * by exact cosine. At 100 TB the bucket join is an ordinary hash
    * shuffle on the key and the adaptive width holds bucket occupancy
    * ≈ 32, so candidate work grows ∝ n — a FIXED width grew it ∝ n²
    * (measured at the 30× corpus: 2.35 s on 8 bits → 1.23 s on the
    * staircase's 11; the knn and near-dup consumers moved 3.81 → 2.92
    * and 2.20 → 1.96 the same way). (In a real deployment the
    * hyperplane signs would
    * be precomputed once and broadcast; here they fold into codegen as
    * constants-per-row.)
    *
    * Measured, kept as a self-join: the DocQueries collect-ids-per-bucket
    * pairing (which pays for itself when per-row lineage is md5-over-
    * shingles heavy) was tried here and LOST at both sf0.1 and a 10×
    * dup-heavy corpus (knn 3.4 s → 4.8 s at 10×) — the sign projection
    * the self-join duplicates is linear and cheap, while materializing id
    * pairs and re-joining both sides' embeddings adds two hash joins on
    * the O(pairs) stream, which dominates. */
  val lshPairs: NamedQuery = {
    NamedQuery(
      "emb_lsh_pairs",
      s"""WITH $bucketedCteDuck
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
         |       ${cosDuck("a.embedding", "b.embedding")} AS sim
         |FROM bucketed a
         |JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |ORDER BY sim DESC, vec_a, vec_b
         |LIMIT 20""".stripMargin) { (s, d) =>
      val bucketed = bucketedFrame(s, d)
      bucketed.as("a")
        .join(bucketed.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(
          col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          col("a.bucket").as("bucket"),
          expr(cosSpark("a.embedding", "b.embedding")).as("sim"))
        .orderBy(col("sim").desc, col("vec_a"), col("vec_b"))
        .limit(20)
    }
  }

  /** Embedding-cosine near-duplicate DEDUP (the brief's last dedup
    * family): candidate pairs come only from LSH buckets, a pair is a
    * near-dup when cosine exceeds the threshold, and the keep-first rule
    * (smaller vec_id survives) marks the rest as drops — per-label
    * n_vecs / n_dup / n_keep. This composes [[lshPairs]]' candidate
    * generation with an actual dedup decision, i.e. the operator a
    * training-data pipeline runs before training. τ = 0.35 is the demo
    * threshold (the synthetic corpus has no true duplicates — max
    * within-label cosine ≈ 0.47); the threshold compare agrees across
    * engines because the cosine values are bit-identical. Scale shape:
    * bucket-local pairs → DISTINCT on drop ids (hash shuffle on a
    * near-unique key) → broadcast-joinable drop set. */
  val nearDup: NamedQuery = NamedQuery(
    "emb_near_dup",
    s"""WITH $bucketedCteDuck,
       |drops AS (
       |  SELECT DISTINCT b.vec_id AS dup_id
       |  FROM bucketed a
       |  JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE ${cosDuck("a.embedding", "b.embedding")} > 0.35
       |)
       |SELECT label,
       |       count(*) AS n_vecs,
       |       CAST(sum(CASE WHEN dup_id IS NOT NULL THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_dup,
       |       CAST(sum(CASE WHEN dup_id IS NULL THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_keep
       |FROM embeddings e
       |LEFT JOIN drops d ON e.vec_id = d.dup_id
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, d) =>
    val bucketed = bucketedFrame(s, d)
    val drops = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .where(expr(cosSpark("a.embedding", "b.embedding")) > 0.35)
      .select(col("b.vec_id").as("dup_id"))
      .distinct()
    emb(s, d).as("e")
      .join(drops.as("d"), col("e.vec_id") === col("d.dup_id"), "left")
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("dup_id").isNotNull, 1).otherwise(0)).as("n_dup"),
        sum(when(col("dup_id").isNull, 1).otherwise(0)).as("n_keep"))
      .orderBy("label")
  }

  /** The exploded (label, dim, v) view of the embedding matrix plus its
    * DuckDB twin fragments — ONE definition of the 1-based dim
    * convention and the double cast, shared by the centroid aggregation
    * and the IVF coarse quantizer so the two cannot drift. */
  private val embDimsFromDuck = "FROM embeddings, unnest(range(1, 65)) AS u(i)"
  private val embDimValDuck = "CAST(embedding[i] AS DOUBLE)"

  private def embDims(s: SparkSession, d: String): DataFrame =
    emb(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
        col("v").cast("double").as("v"))

  /** Per-(label, dimension) centroid components — posexplode → two-key
    * hash aggregation with decimal-exact means. Partial aggregation
    * collapses to (10 labels × 64 dims) rows before the shuffle, so the
    * exchange is O(1) regardless of input size. */
  val labelCentroids: NamedQuery = NamedQuery(
    "emb_label_centroids",
    s"""SELECT label, i AS dim,
       |       ${Sql.avgFloat(embDimValDuck)} AS mean_val,
       |       count(*) AS n
       |$embDimsFromDuck
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    embDims(s, d)
      .groupBy("label", "dim")
      .agg(
        Ops.avgFloat(col("v")).as("mean_val"),
        count(lit(1)).as("n"))
      .orderBy("label", "dim")
  }

  /** kNN label classification within LSH buckets: each vector's 5
    * nearest in-bucket neighbors vote; majority (fixed-width tie-break
    * key) vs. the vector's own label → per-label accuracy. Bucket-local
    * candidate generation keeps this off the all-pairs path; neighbor
    * selection runs through the bounded [[graft.functions.TopKByScore]]
    * aggregate — the shuffle carries ≤5 (score, id) pairs per vector
    * however many candidates score, where the oracle's row_number
    * window (same semantics, same ties: score desc then id) would sort
    * every vector's full candidate set. */
  val knnAccuracy: NamedQuery = {
    NamedQuery(
      "emb_knn_accuracy",
      s"""WITH $bucketedCteDuck,
         |neigh AS (
         |  SELECT a.vec_id, a.label AS true_label, b.label AS cand_label,
         |         row_number() OVER (
         |           PARTITION BY a.vec_id
         |           ORDER BY ${cosDuck("a.embedding", "b.embedding")} DESC,
         |                    b.vec_id) AS rk
         |  FROM bucketed a
         |  JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
         |),
         |votes AS (
         |  SELECT vec_id, true_label, cand_label, count(*) AS c
         |  FROM neigh WHERE rk <= 5 GROUP BY 1, 2, 3
         |),
         |pred AS (
         |  SELECT vec_id, true_label,
         |         min_by(cand_label,
         |                printf('%05d-%05d', 99999 - c, cand_label)) AS p
         |  FROM votes GROUP BY 1, 2
         |)
         |SELECT true_label AS label,
         |       count(*) AS n_vecs,
         |       CAST(sum(CASE WHEN p = true_label THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_correct
         |FROM pred
         |GROUP BY 1
         |ORDER BY 1""".stripMargin) { (s, d) =>
      val bucketed = bucketedFrame(s, d)
      val top5 = bucketed.as("a")
        .join(bucketed.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"),
          col("a.label").as("true_label"),
          col("b.vec_id").as("cand_id"),
          expr(cosSpark("a.embedding", "b.embedding")).as("sim"))
        .groupBy("vec_id", "true_label")
        .agg(expr("graft_topk(sim, cand_id, 5)").as("topk"))
        .select(col("vec_id"), col("true_label"),
          explode(expr("transform(topk, p -> p.id)")).as("cand_id"))
      // neighbor ids → labels from the slim base table (no bucket
      // lineage re-execution); 5 rows per vector join one 2-column side
      val lab = emb(s, d)
        .select(col("vec_id").as("cand_id"), col("label").as("cand_label"))
      val votes = top5.join(lab, "cand_id")
        .groupBy("vec_id", "true_label", "cand_label")
        .agg(count(lit(1)).as("c"))
      val pred = votes.groupBy("vec_id", "true_label")
        .agg(min_by(col("cand_label"),
          format_string("%05d-%05d", lit(99999) - col("c"),
            col("cand_label"))).as("p"))
      pred.groupBy(col("true_label").as("label"))
        .agg(
          count(lit(1)).as("n_vecs"),
          sum(when(col("p") === col("true_label"), 1).otherwise(0))
            .as("n_correct"))
        .orderBy("label")
    }
  }

  /** IVF top-k parameterized by `nprobe`: per-label centroids act as the
    * coarse quantizer; the query probes its `nprobe` nearest centroids'
    * cells, then ranks those cells' vectors by exact cosine. The centroid
    * table is O(cells) — broadcastable at any corpus size; only the
    * probed cells' vectors are scored, so `nprobe` is THE recall↔cost
    * knob (cost grows linearly in probed rows, recall approaches
    * brute-force as nprobe → cells). (A production IVF would train cells
    * with k-means; the mechanics — coarse probe then cell-local exact
    * search — are identical.) */
  // double-typed cosine fragments (centroid arrays are already double)
  // — shared by the IVF builder and the recall harness so the coarse
  // quantizer's ranking cannot drift between them
  private val dotD = "aggregate(zip_with(%A, %B, (x, y) -> x * y), " +
    "cast(0.0 AS double), (acc, v) -> acc + v)"
  private def dotSparkD(a: String, b: String) =
    dotD.replace("%A", a).replace("%B", b)
  private def cosSparkD(a: String, b: String) =
    s"${dotSparkD(a, b)} / (sqrt(${dotSparkD(a, a)}) * sqrt(${dotSparkD(b, b)}))"
  private def dotDuckD(a: String, b: String) =
    s"list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))"
  private def cosDuckD(a: String, b: String) =
    s"${dotDuckD(a, b)} / (sqrt(${dotDuckD(a, a)}) * sqrt(${dotDuckD(b, b)}))"

  /** Shared IVF oracle: coarse-probe `nprobe` cells by centroid cosine,
    * exact-rank inside the probed cells. */
  private def ivfOracleSql(nprobe: Int): String =
    s"""WITH q AS (
       |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
       |  FROM embeddings WHERE vec_id = 0
       |),
       |comp AS (
       |  SELECT label, i AS dim,
       |         ${Sql.avgFloat(embDimValDuck)} AS m
       |  $embDimsFromDuck
       |  GROUP BY 1, 2
       |),
       |cents AS (
       |  SELECT label, list(m ORDER BY dim) AS centroid
       |  FROM comp GROUP BY 1
       |),
       |best AS (
       |  SELECT label AS cell
       |  FROM cents, q
       |  ORDER BY ${cosDuckD("centroid", "qv")} DESC, label
       |  LIMIT $nprobe
       |)
       |SELECT e.vec_id, e.label,
       |       ${cosDuck("q.qv2", "e.embedding")} AS sim
       |FROM embeddings e
       |JOIN best ON e.label = best.cell
       |CROSS JOIN (SELECT embedding AS qv2 FROM embeddings
       |            WHERE vec_id = 0) q
       |WHERE e.vec_id <> 0
       |ORDER BY sim DESC, e.vec_id
       |LIMIT 10""".stripMargin

  /** Nearest-centroid (L2², tie-break on centroid label) cell
    * assignment of a vector frame `(vec_id, label, embedding)` against
    * a quantizer frame `(clabel, centroid)` — THE Lloyd assignment
    * step, shared by [[kmeansRefine]] and the streaming index MV
    * ([[graft.streaming.AnnMV]]) so ingest-time and training-time
    * assignment can never drift. Argmin via partial-aggregated
    * min(struct): ordering is decided by (d2, clabel) — unique per
    * candidate — so the trailing payload fields (orig label, embedding)
    * ride along without affecting it. Shape at 100 TB: the codebook
    * broadcasts, d2 is per-row map-side work, and the argmin is a
    * vec_id-keyed aggregation whose partials collapse per task. */
  private[graft] def assignCells(e: DataFrame, cents: DataFrame): DataFrame = {
    val d2 = expr(
      """aggregate(zip_with(embedding, centroid, (x, y) ->
        |  (cast(x AS double) - y) * (cast(x AS double) - y)),
        |cast(0.0 AS double), (acc, v) -> acc + v)"""
        .stripMargin.replace("\n", " "))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("embedding"), col("clabel"),
        d2.as("d2"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("clabel"), col("label"),
        col("embedding"))).as("b"))
      .select(col("vec_id"), col("b.clabel").as("cell"),
        col("b.label").as("orig"), col("b.embedding").as("embedding"))
  }

  /** The (label, centroid) frame of the coarse quantizer — per-label
    * exact-decimal dimension means, shared by the inline IVF queries
    * and the persisted index builder. */
  private[graft] def centroidFrame(s: SparkSession, d: String): DataFrame =
    embDims(s, d)
      .groupBy("label", "dim")
      .agg(Ops.avgFloat(col("v")).as("m"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), p -> p.m)")
        .as("centroid"))

  /** One IVF probe over a given quantizer frame — the single body the
    * standalone probes AND the recall harness share, so the harness can
    * train the quantizer ONCE for both nprobe branches (r17 opt) while
    * the standalone queries keep their inline-training lineage. */
  private def ivfProbeFrame(
      s: SparkSession, d: String, cents: DataFrame, nprobe: Int)
      : DataFrame = {
    val e = emb(s, d)
    val q = e.where(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> cast(x AS double))").as("qv"))
    val best = cents.crossJoin(broadcast(q))
      .orderBy(expr(cosSparkD("centroid", "qv")).desc, col("label"))
      .limit(nprobe)
      .select(col("label").as("cell"))
    val q2 = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qv2"))
    e.where(col("vec_id") =!= 0)
      .join(broadcast(best), col("label") === col("cell"))
      .crossJoin(broadcast(q2))
      .select(col("vec_id"), col("label"),
        expr(cosSpark("qv2", "embedding")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  private def ivf(name: String, nprobe: Int): NamedQuery = {
    NamedQuery(name, ivfOracleSql(nprobe)) { (s, d) =>
      ivfProbeFrame(s, d, centroidFrame(s, d), nprobe)
    }
  }

  /** Single-probe IVF (nprobe = 1). */
  val ivfTopK: NamedQuery = ivf("emb_ivf_topk", 1)

  /** Persisted IVF index — the ANN analogue of the reference's
    * materialized-view discipline (sql/V2__create_trades_1m_view.sql:
    * 16-29): the centroid and assignment frames are computed ONCE per
    * corpus, written through the store's crash-safe directory swap
    * ([[graft.store.Store.swapDirectory]]), and read back by every
    * subsequent probe — instead of re-running the explode-64-dims +
    * exact-decimal-mean lineage per query. Staleness contract: a meta
    * marker pins the source file's (size, mtime) fingerprint; a
    * rewritten corpus mismatches and triggers a rebuild (the validation
    * the advisor asked of caches generally). Single-writer per process
    * (`synchronized`); cross-process builds follow the store's
    * single-maintenance-runner convention. */
  private object IvfIndex {
    import java.nio.file.{Files, Paths, Path}

    private def root(d: String): Path = Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", "target/ivf_index"),
      java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(d)))

    /** O(1) driver-side source-version probe — file size + mtime of the
      * embeddings table (a directory fingerprints as child-sum/max). At
      * 100 TB this is the listing etag, never a data scan. */
    private def fingerprint(d: String): String = {
      val p = Paths.get(d, "embeddings.parquet")
      if (Files.isDirectory(p)) {
        // close the listing stream (Verify.scala's orphan sweep names
        // this hazard: an unclosed Files.list leaks a directory fd per
        // probe, and this probe runs on EVERY persisted-index query)
        val s = Files.list(p)
        var size = 0L; var mt = 0L
        try {
          val kids = s.iterator()
          while (kids.hasNext) {
            val k = kids.next()
            size += Files.size(k)
            mt = math.max(mt, Files.getLastModifiedTime(k).toMillis)
          }
        } finally s.close()
        s"$size-$mt"
      } else
        s"${Files.size(p)}-${Files.getLastModifiedTime(p).toMillis}"
    }

    def centroids(s: SparkSession, d: String): DataFrame = {
      ensure(s, d)
      s.read.parquet(root(d).resolve("centroids").toString)
    }

    def assignments(s: SparkSession, d: String): DataFrame = {
      ensure(s, d)
      s.read.parquet(root(d).resolve("assignments").toString)
    }

    private def ensure(s: SparkSession, d: String): Unit = synchronized {
      val r = root(d)
      val meta = r.resolve("index_meta")
      val fp = fingerprint(d)
      val fresh = Files.exists(meta) &&
        Files.readString(meta).trim == fp &&
        Files.exists(r.resolve("centroids")) &&
        Files.exists(r.resolve("assignments"))
      if (!fresh) {
        Files.createDirectories(r)
        if (Files.exists(meta)) Files.delete(meta) // invalidate first
        graft.store.Store.swapDirectory(r.toString, "centroids") { tmp =>
          centroidFrame(s, d).write.mode("overwrite").parquet(tmp)
        }
        // cell = label in this coarse quantizer (centroids ARE label
        // means); persisted anyway as its own frame because a k-means
        // quantizer's assignment is NOT derivable from the row, and the
        // probe path below must exercise the real index-read shape
        graft.store.Store.swapDirectory(r.toString, "assignments") { tmp =>
          emb(s, d).select(col("vec_id"), col("label").as("cell"))
            .write.mode("overwrite").parquet(tmp)
        }
        Files.writeString(meta, fp + "\n")
        ()
      }
    }
  }

  /** IVF search through the PERSISTED index: probe the stored centroids,
    * resolve the probed cells' members from the stored assignment frame,
    * exact-rank only those. Same oracle as [[ivfTopK]] — the index is a
    * pure materialization, so results are bit-identical; what changes is
    * the cost profile (no per-query centroid training). The probed-cell
    * member list broadcasts here; in the 100 TB layout `cell` is the
    * partition key and the same probe becomes partition pruning. */
  val ivfPersisted: NamedQuery = NamedQuery(
    "emb_ivf_persisted", ivfOracleSql(1)) { (s, d) =>
    val e = emb(s, d)
    val q = e.where(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> cast(x AS double))").as("qv"))
    val best = IvfIndex.centroids(s, d).crossJoin(broadcast(q))
      .orderBy(expr(cosSparkD("centroid", "qv")).desc, col("label"))
      .limit(1)
      .select(col("label").as("probe_cell"))
    val probed = IvfIndex.assignments(s, d)
      .join(broadcast(best), col("cell") === col("probe_cell"))
      .select("vec_id")
    val q2 = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qv2"))
    // `probed` is a data-dependent member list (n/cells × nprobe rows)
    // — deliberately UN-hinted: AQE broadcasts it while it is small and
    // falls back to a shuffled semi-join when it is not, instead of a
    // forced broadcast OOMing at 100 TB. The layout answer (cell as the
    // physical partition key, probe ≡ partition pruning) is the
    // registered emb_ivf_streamed path.
    e.where(col("vec_id") =!= 0)
      .join(probed, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(q2))
      .select(col("vec_id"), col("label"),
        expr(cosSpark("qv2", "embedding")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** Multi-probe IVF (nprobe = 3): the standard recall fix for queries
    * landing near cell boundaries — 3× the scored rows of single-probe,
    * still a fraction of brute force (3 of 10 cells here). */
  val ivfMultiprobe: NamedQuery = ivf("emb_ivf_multiprobe", 3)

  /** Top-3 most-similar vectors to the query vector PER LABEL — driven
    * by the custom bounded-top-k aggregate
    * ([[graft.functions.TopKByScore]]): the per-group heap keeps 3
    * entries, so the shuffle carries ≤3 pairs per label no matter how
    * many candidates score (the window-formulation oracle sorts each
    * partition instead — same answer, different asymptotics). */
  val topKPerLabel: NamedQuery = NamedQuery(
    "emb_topk_per_label",
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |scored AS (
       |  SELECT label, vec_id,
       |         ${cosDuck("q.qv", "b.embedding")} AS sim
       |  FROM embeddings b, q
       |  WHERE vec_id <> 0
       |)
       |SELECT label, rk AS rank, vec_id, sim
       |FROM (
       |  SELECT label, vec_id, sim,
       |         row_number() OVER (PARTITION BY label
       |                            ORDER BY sim DESC, vec_id) AS rk
       |  FROM scored)
       |WHERE rk <= 3
       |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val q = emb(s, d).where(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    emb(s, d).where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("label"), col("vec_id"),
        expr(cosSpark("qv", "embedding")).as("sim"))
      .groupBy("label")
      .agg(expr("graft_topk(sim, vec_id, 3)").as("topk"))
      .select(col("label"), posexplode(col("topk")).as(Seq("rank0", "p")))
      .select(col("label"), (col("rank0") + 1).cast("long").as("rank"),
        col("p.id").as("vec_id"), col("p.score").as("sim"))
      .orderBy("label", "rank")
  }

  /** Symmetric int8 quantization + quantized-cosine top-k — the
    * shuffle-compression path for similarity search at 100 TB: an int8
    * vector is 4× smaller than float32 (16× smaller than the double
    * math), so candidate generation runs on quantized codes and only the
    * final ranking re-scores in full precision (both scores are emitted
    * here to show the recall story). Quantization is exact-deterministic
    * in both engines: per-vector scale `127 / max|x|`, code
    * `sign(x) · floor(|x|·scale + 0.5)` (half-away rounding spelled as
    * floor so neither engine's `round` tie rule is involved), and the
    * quantized dot/norms are pure ≤2^21 integer arithmetic. */
  val quantizedTopK: NamedQuery = {
    // quantized code array of vector column `v` given its max-abs `mx`
    def q8Duck(v: String, mx: String) =
      s"""list_transform($v, x -> CASE WHEN $mx = 0 THEN CAST(0 AS BIGINT)
         |  ELSE CAST((CASE WHEN CAST(x AS DOUBLE) < 0 THEN -1 ELSE 1 END)
         |       * floor(abs(CAST(x AS DOUBLE)) * (127.0 / $mx) + 0.5)
         |       AS BIGINT) END)""".stripMargin.replace("\n", " ")
    val mxDuck = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
    def idotDuck(a: String, b: String) =
      s"CAST(list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i])) AS DOUBLE)"
    NamedQuery(
      "emb_quantized_topk",
      s"""WITH b AS (
         |  SELECT vec_id, label, embedding, $mxDuck AS mx FROM embeddings
         |),
         |c AS (
         |  SELECT vec_id, label, embedding,
         |         ${q8Duck("embedding", "mx")} AS q
         |  FROM b
         |),
         |qv AS (
         |  SELECT q AS qq, embedding AS qemb FROM c WHERE vec_id = 0
         |)
         |SELECT c.vec_id, c.label,
         |       ${idotDuck("qq", "q")}
         |         / (sqrt(${idotDuck("qq", "qq")}) * sqrt(${idotDuck("q", "q")}))
         |         AS sim_q8,
         |       ${cosDuck("qemb", "c.embedding")} AS sim_exact
         |FROM c, qv
         |WHERE c.vec_id <> 0
         |ORDER BY sim_q8 DESC, c.vec_id
         |LIMIT 10""".stripMargin) { (s, d) =>
      val q8Spark =
        """transform(embedding, x -> CASE WHEN mx = 0 THEN cast(0 AS bigint)
          |  ELSE cast((CASE WHEN cast(x AS double) < 0 THEN -1 ELSE 1 END)
          |       * floor(abs(cast(x AS double)) * (127.0D / mx) + 0.5D)
          |       AS bigint) END)""".stripMargin.replace("\n", " ")
      def idot(a: String, b: String) =
        s"cast(aggregate(zip_with($a, $b, (x, y) -> x * y), " +
          s"cast(0 AS bigint), (acc, v) -> acc + v) AS double)"
      val coded = emb(s, d)
        .withColumn("mx", expr(
          "aggregate(embedding, cast(0.0 AS double), " +
            "(acc, x) -> greatest(acc, abs(cast(x AS double))))"))
        .select(col("vec_id"), col("label"), col("embedding"),
          expr(q8Spark).as("q"))
      val qv = coded.where(col("vec_id") === 0)
        .select(col("q").as("qq"), col("embedding").as("qemb"))
      coded.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), col("label"),
          (expr(idot("qq", "q")) /
            (sqrt(expr(idot("qq", "qq"))) * sqrt(expr(idot("q", "q")))))
            .as("sim_q8"),
          expr(cosSpark("qemb", "embedding")).as("sim_exact"))
        .orderBy(col("sim_q8").desc, col("vec_id"))
        .limit(10)
    }
  }

  /** ANN quality harness — recall@10 of the IVF probes against the
    * brute-force exact top-10: the measurement loop every approximate
    * index needs before it replaces the linear scan. Both the exact and
    * the probed rankings are recomputed inline from the SAME shared
    * fragments as their standalone queries (one definition, no drift),
    * intersected on vec_id, and reported as one row per nprobe. Cheap by
    * construction: top-10 lists are O(k) however large the corpus. */
  val ivfRecall: NamedQuery = {
    def probedDuck(nprobe: Int): String =
      s"""SELECT e.vec_id
         |FROM embeddings e
         |JOIN (SELECT label AS cell
         |      FROM cents, q
         |      ORDER BY ${cosDuckD("centroid", "qv")} DESC, label
         |      LIMIT $nprobe) b ON e.label = b.cell
         |CROSS JOIN (SELECT embedding AS qv2 FROM embeddings
         |            WHERE vec_id = 0) q2
         |WHERE e.vec_id <> 0
         |ORDER BY ${cosDuck("q2.qv2", "e.embedding")} DESC, e.vec_id
         |LIMIT 10""".stripMargin
    NamedQuery(
      "emb_ivf_recall",
      s"""WITH q AS (
         |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         |  FROM embeddings WHERE vec_id = 0
         |),
         |comp AS (
         |  SELECT label, i AS dim,
         |         ${Sql.avgFloat(embDimValDuck)} AS m
         |  $embDimsFromDuck
         |  GROUP BY 1, 2
         |),
         |cents AS (
         |  SELECT label, list(m ORDER BY dim) AS centroid
         |  FROM comp GROUP BY 1
         |),
         |exact AS (
         |  SELECT b.vec_id
         |  FROM embeddings b
         |  CROSS JOIN (SELECT embedding AS qv0 FROM embeddings
         |              WHERE vec_id = 0) q0
         |  WHERE b.vec_id <> 0
         |  ORDER BY ${cosDuck("q0.qv0", "b.embedding")} DESC, b.vec_id
         |  LIMIT 10
         |)
         |SELECT nprobe,
         |       CAST(hits AS BIGINT) AS hits,
         |       hits / 10.0 AS recall_at_10
         |FROM (
         |  SELECT 1 AS nprobe,
         |         (SELECT count(*) FROM (${probedDuck(1)}) p
         |          JOIN exact ON p.vec_id = exact.vec_id) AS hits
         |  UNION ALL
         |  SELECT 3,
         |         (SELECT count(*) FROM (${probedDuck(3)}) p
         |          JOIN exact ON p.vec_id = exact.vec_id)
         |)
         |ORDER BY nprobe""".stripMargin) { (s, d) =>
      // 10 rows, referenced by BOTH union branches — cached so the
      // brute-force scan behind it runs once, not per branch; memoized
      // per (session, dir) so repeated builder invocations (bench loops)
      // reuse ONE cache entry instead of stacking new ones
      val exact = exactTopMemo(s, d)
      // train the coarse quantizer ONCE for both nprobe branches (r17
      // opt): unshared, each branch re-ran the centroidFrame training
      // pass (the 64-dim explode + exact-decimal means over the whole
      // corpus — the plan carried 10 scans). ivfProbeFrame is the same
      // body the standalone probes execute, so nothing can drift.
      val cents = centroidFrame(s, d).pipe(graft.ops.Ckpt.pin)
      def probed(df: DataFrame, nprobe: Int): DataFrame =
        df.select("vec_id")
          .join(exact, "vec_id")
          .agg(count(lit(1)).as("hits"))
          .select(lit(nprobe).as("nprobe"), col("hits"),
            (col("hits") / lit(10.0)).as("recall_at_10"))
      probed(ivfProbeFrame(s, d, cents, 1), 1)
        .unionAll(probed(ivfProbeFrame(s, d, cents, 3), 3))
        .orderBy("nprobe")
    }
  }

  // Bounded FIFO memo keyed by (session, dir): the recall harness's
  // exact-top-10 anchor, cached once per corpus. NOT weak-keyed — a
  // cached Dataset strongly references its SparkSession, so a
  // WeakHashMap's keys could never be collected and the "dies with the
  // session" story would be a lie. This map states the real contract:
  // an entry pins its session until FIFO eviction, and eviction
  // unpersists, so a rewritten corpus dir cannot serve a stale cached
  // plan forever (≤ ExactCacheMax live entries ever).
  private val ExactCacheMax = 8
  private val exactCache =
    scala.collection.mutable.LinkedHashMap.empty[(SparkSession, String), DataFrame]

  private def exactTopMemo(s: SparkSession, d: String): DataFrame =
    exactCache.synchronized {
      exactCache.getOrElseUpdate((s, d), {
        while (exactCache.size >= ExactCacheMax) {
          val (k, df) = exactCache.head
          scala.util.Try(df.unpersist())
          exactCache.remove(k)
        }
        cosineTopK.run(s, d).select("vec_id").cache()
      })
    }

  /** Product-quantization ANN (the faiss-PQ shape, complementing the
    * scalar-int8 path of [[quantizedTopK]]): the 64-dim vector splits
    * into 8 subspaces of 8 dims; each subspace has a 10-codeword
    * codebook (the label centroids restricted to that slice — shared
    * with the IVF coarse quantizer, so one training pass feeds both
    * indexes); a vector encodes as 8 small codes (8 bytes vs 256 bytes
    * float32 — the 32× memory story that makes billion-vector search
    * fit in RAM); search is asymmetric-distance computation: the query
    * precomputes an 80-entry (subspace × codeword) dot/norm lookup
    * table, so scoring a vector is 8 table lookups instead of 64
    * multiplies. Ranked by the PQ approximation with the exact cosine
    * emitted beside it (the recall readout, as in [[quantizedTopK]]).
    *
    * Determinism: every fold (subspace distances, ADC entries, the
    * final sum over the 8 subspaces) runs in a FIXED index order in
    * both engines (Spark `aggregate` over `sequence`/`array_sort`ed
    * arrays == DuckDB `list_sum` over `range`/`list(... ORDER BY m)`),
    * and code assignment tie-breaks on (distance, label) via
    * `row_number`. Shape at 100 TB: the codebook is a broadcast 10×64
    * table, encoding is per-row work plus a (vec_id, m)-keyed window,
    * the ADC table is an 80-row broadcast, and the ranking is
    * TakeOrderedAndProject — no shuffle grows beyond 8 rows per vector
    * (and a production deployment persists the codes like
    * [[ivfPersisted]] persists its index). */
  /** The PQ top-10 oracle SQL, shared verbatim by [[pqTopK]], the
    * [[pqRecall]] gate, and (with a coarse-probe CTE prepended and the
    * fact side filtered to the probed cells) [[ivfPqTopK]] — one SQL
    * body, so neither the recall measurement nor the composite index
    * can drift from the ranking they claim to share.
    *
    * @param bestCte    extra CTE text spliced after `cents` ("" for
    *                   exhaustive PQ; the `best` coarse-probe head for
    *                   IVF-PQ)
    * @param factFilter extra predicate on the encoded fact side ("" or
    *                   the probed-cells membership test) */
  private def pqSql(bestCte: String, factFilter: String): String =
    s"""WITH q AS (
       |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
       |         embedding AS qemb
       |  FROM embeddings WHERE vec_id = 0
       |),
       |comp AS (
       |  SELECT label, i AS dim,
       |         ${Sql.avgFloat(embDimValDuck)} AS m
       |  $embDimsFromDuck
       |  GROUP BY 1, 2
       |),
       |cents AS (
       |  SELECT label, list(m ORDER BY dim) AS centroid
       |  FROM comp GROUP BY 1
       |),$bestCte
       |sub AS (
       |  SELECT e.vec_id, c.label AS clabel, s.m,
       |         list_sum(list_transform(range(1, 9), j ->
       |           (CAST(e.embedding[8*s.m+j] AS DOUBLE) - c.centroid[8*s.m+j])
       |           * (CAST(e.embedding[8*s.m+j] AS DOUBLE) - c.centroid[8*s.m+j])))
       |           AS d2
       |  FROM embeddings e, cents c, unnest(range(0, 8)) AS s(m)
       |  WHERE e.vec_id <> 0$factFilter
       |),
       |code AS (
       |  SELECT vec_id, m, clabel AS code
       |  FROM (SELECT vec_id, m, clabel,
       |               row_number() OVER (PARTITION BY vec_id, m
       |                                  ORDER BY d2, clabel) AS rk
       |        FROM sub)
       |  WHERE rk = 1
       |),
       |adc AS (
       |  SELECT s.m, c.label,
       |         list_sum(list_transform(range(1, 9),
       |           j -> q.qv[8*s.m+j] * c.centroid[8*s.m+j])) AS qd,
       |         list_sum(list_transform(range(1, 9),
       |           j -> c.centroid[8*s.m+j] * c.centroid[8*s.m+j])) AS cn2
       |  FROM cents c, q, unnest(range(0, 8)) AS s(m)
       |),
       |scored AS (
       |  SELECT code.vec_id,
       |         list_sum(list(qd ORDER BY code.m)) AS ad,
       |         list_sum(list(cn2 ORDER BY code.m)) AS an2
       |  FROM code JOIN adc ON code.m = adc.m AND code.code = adc.label
       |  GROUP BY 1
       |)
       |SELECT s.vec_id, e.label,
       |       ad / (sqrt(${dotDuckD("q.qv", "q.qv")}) * sqrt(an2)) AS sim_pq,
       |       ${cosDuck("q.qemb", "e.embedding")} AS sim_exact
       |FROM scored s
       |JOIN embeddings e ON s.vec_id = e.vec_id
       |CROSS JOIN q
       |ORDER BY sim_pq DESC, s.vec_id
       |LIMIT 10""".stripMargin

  private val pqTopKSql: String = pqSql("", "")

  /** The flattened broadcast codebook: label-sorted centroids
    * concatenated to one array<double>, so cell index order == label
    * order — the single-row frame both PQ kernels index into. Shared by
    * [[pqTopK]] and [[ivfPqTopK]]. */
  private def flatCodebook(s: SparkSession, d: String): DataFrame =
    flatCodebookOf(centroidFrame(s, d))

  /** Flatten any (label, centroid) frame — inline-trained or read back
    * from the persisted index — into the kernels' codebook row. */
  private def flatCodebookOf(cents: DataFrame): DataFrame =
    cents
      .agg(expr(
        """flatten(transform(array_sort(collect_list(struct(label, centroid))),
          |c -> c.centroid))""".stripMargin.replace("\n", " ")).as("cents"))

  val pqTopK: NamedQuery = NamedQuery("emb_pq_topk", pqTopKSql) { (s, d) =>
    // ONE map-side pass: the codebook collapses to a single broadcast
    // row (label-sorted centroids flattened to array<double>, so cell
    // index order == label order), and encode + ADC-score run per
    // vector inside the codegen'd [[graft.functions.PqScore]] /
    // [[graft.functions.PqNorm]] kernels — no shuffle touches the fact
    // side until the final TakeOrderedAndProject. (An earlier
    // formulation exploded a (vector × cell × subspace) frame through a
    // groupBy argmin and an ADC join — two exchanges of 80 rows per
    // vector; a second spelled the same math as higher-order lambdas —
    // ~800 interpreted virtual calls per row. The native kernels keep
    // the whole scoring pass fused in whole-stage codegen, the same
    // justification that produced CosineSimilarity.)
    val e = emb(s, d).where(col("vec_id") =!= 0)
    val flat = flatCodebook(s, d)
    val q = emb(s, d).where(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> cast(x AS double))").as("qv"),
        col("embedding").as("qemb"))
    e.crossJoin(broadcast(flat))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        (expr("graft_pq_score(embedding, cents, qv, 8)") /
          (sqrt(expr(dotSparkD("qv", "qv"))) *
            sqrt(expr("graft_pq_norm(embedding, cents, 8)"))))
          .as("sim_pq"),
        expr(cosSpark("qemb", "embedding")).as("sim_exact"))
      .orderBy(col("sim_pq").desc, col("vec_id"))
      .limit(10)
  }

  /** PQ recall gate — recall@10 of the ADC ranking against the exact
    * cosine top-10, completing the accuracy-readout suite ([[ivfRecall]]
    * covers the coarse quantizer; this covers the code quantization):
    * the PQ top-10 (the SAME lineage as [[pqTopK]], kernel scoring and
    * all) semi-joins the brute-force set, and `recall_ok` is the
    * self-validating accuracy flag the oracle hash-gates (the
    * EventQueries `approx_ok` discipline) — a codebook or ADC bug that
    * silently degraded ranking flips it. Both engines compute the
    * identical intersection, so hits/recall are exact integers and one
    * exact IEEE division.
    *
    * The bar is `hits >= 1`, calibrated to the deliberately tiny
    * 10-codeword shared codebook (measured hits: 2/2/1 at
    * sf0.001/0.01/0.1 — 8-byte codes against a 10-cell quantizer keep
    * little cosine resolution; production PQ uses 256 codewords per
    * subspace). The gate is still discriminating: a BROKEN kernel ranks
    * essentially at random, and a random 10-of-N intersection with the
    * exact top-10 is empty with ~99% probability at sf0.1 (N≈10⁴), so
    * the flag separates "quantization works better than chance" from
    * "scoring path broken" without overclaiming the demo codebook.
    * Scale shape: both sides are 10-row heads; the join is trivial —
    * the cost is the two ranking scans it gates, which stay map-side +
    * TakeOrdered. */
  val pqRecall: NamedQuery = NamedQuery(
    "emb_pq_recall",
    s"""SELECT CAST(count(*) AS BIGINT) AS hits,
       |       count(*) / 10.0 AS recall_at_10,
       |       count(*) >= 1 AS recall_ok
       |FROM ($pqTopKSql) p
       |JOIN (SELECT b.vec_id
       |      FROM embeddings b
       |      CROSS JOIN (SELECT embedding AS qv0 FROM embeddings
       |                  WHERE vec_id = 0) q0
       |      WHERE b.vec_id <> 0
       |      ORDER BY ${cosDuck("q0.qv0", "b.embedding")} DESC, b.vec_id
       |      LIMIT 10) x ON p.vec_id = x.vec_id""".stripMargin) { (s, d) =>
    pqTopK.run(s, d).select("vec_id")
      .join(exactTopMemo(s, d), "vec_id")
      .agg(count(lit(1)).as("hits"))
      .select(col("hits"),
        (col("hits") / lit(10.0)).as("recall_at_10"),
        (col("hits") >= 1).as("recall_ok"))
  }

  /** IVF-PQ composite index — the billion-vector production shape
    * (coarse quantizer prunes the search to `nprobe` cells, PQ ADC
    * scores only the survivors), composed from the two indexes already
    * proven separately: [[ivfTopK]]'s centroid probe picks the 3 best
    * cells, and [[pqTopK]]'s codegen'd kernel scoring runs ONLY on
    * vectors whose cell survived the probe. One training pass (the
    * label-mean [[centroidFrame]]) feeds both levels, exactly as a
    * faiss `IVFx,PQy` factory string shares its coarse quantizer.
    *
    * Scale shape — why this is THE 100 TB ANN plan: the probe is a
    * 10-row broadcast head; the cell membership test is a broadcast
    * hash semi-join the scan-side filter can apply BEFORE any vector
    * math (on a cell-partitioned layout it becomes partition pruning,
    * reading nprobe/cells of the bytes); the survivors score map-side
    * via 8 table lookups each (no shuffle); the answer is one
    * TakeOrderedAndProject. Memory: 8-byte codes + an 80-entry ADC
    * table per query — the fraction-of-RAM story that lets one
    * executor hold billions of candidates. Exact cosine is emitted
    * beside the ADC rank as the per-row recall readout, same as
    * [[pqTopK]]/[[quantizedTopK]].
    *
    * Unlike the inline-training [[pqTopK]] (which deliberately shows
    * the one-pass lineage), the composite probes the PERSISTED
    * centroids ([[IvfIndex]], fingerprint-validated) for BOTH levels —
    * train once, query many, the faiss deployment discipline
    * [[ivfPersisted]] established; the index read is bit-identical to
    * the inline training it materializes, so the oracle is unchanged. */
  /** The composite's oracle body, shared with [[ivfPqRecall]] (the
    * [[pqTopKSql]]/[[pqRecall]] single-body discipline). */
  private val ivfPqSqlBody: String = pqSql(
    s"""
       |best AS (
       |  SELECT label AS cell
       |  FROM cents, q
       |  ORDER BY ${cosDuckD("centroid", "qv")} DESC, label
       |  LIMIT 3
       |),""".stripMargin,
    " AND e.label IN (SELECT cell FROM best)")

  val ivfPqTopK: NamedQuery = NamedQuery(
    "emb_ivfpq_topk", ivfPqSqlBody) { (s, d) =>
    val qv = emb(s, d).where(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> cast(x AS double))").as("qv"))
    val cents = IvfIndex.centroids(s, d)
    val best = cents.crossJoin(broadcast(qv))
      .orderBy(expr(cosSparkD("centroid", "qv")).desc, col("label"))
      .limit(3)
      .select(col("label").as("cell"))
    val q = emb(s, d).where(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> cast(x AS double))").as("qv"),
        col("embedding").as("qemb"))
    // the probe side is O(nprobe)=3 rows but deliberately UN-hinted
    // (round-8 verdict): the planner broadcasts it from its own stats,
    // and nothing here FORCES a broadcast of a data-dependent frame
    emb(s, d).where(col("vec_id") =!= 0)
      .join(best, col("label") === col("cell"), "left_semi")
      .crossJoin(broadcast(flatCodebookOf(cents)))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        (expr("graft_pq_score(embedding, cents, qv, 8)") /
          (sqrt(expr(dotSparkD("qv", "qv"))) *
            sqrt(expr("graft_pq_norm(embedding, cents, 8)"))))
          .as("sim_pq"),
        expr(cosSpark("qemb", "embedding")).as("sim_exact"))
      .orderBy(col("sim_pq").desc, col("vec_id"))
      .limit(10)
  }

  /** One deterministic Lloyd (k-means) iteration over the IVF coarse
    * quantizer — the training step the inline IVF queries note a
    * production index would run: start from the label-mean centroids
    * (the same [[centroidFrame]] the probes use), assign every base
    * vector to its nearest centroid by L2² (tie-break on label),
    * recompute each cell's centroid as the exact-decimal mean of its
    * assignees, and report per cell: population, how many vectors
    * migrated off their seed label, and the L2 distance the centroid
    * moved. Determinism end-to-end: distances fold in index order,
    * assignment tie-breaks on (d2, label), means are the
    * string-hop-decimal [[Ops.avgFloat]] twins. Shape at 100 TB: the
    * 10×64 codebook broadcasts; assignment is per-row work + a
    * (vec_id)-keyed partial-aggregated argmin; the recompute is the
    * posexplode → (cell, dim) hash aggregation of [[labelCentroids]],
    * whose exchange is O(cells × dims) regardless of input size.
    * Iterating to convergence is this same query loop-driven (as
    * [[graft.queries.DocQueries]]'s dup-cluster label propagation
    * loops), one broadcast refresh per round. */
  val kmeansRefine: NamedQuery = NamedQuery(
    "emb_kmeans_refine",
    s"""WITH comp AS (
       |  SELECT label, i AS dim,
       |         ${Sql.avgFloat(embDimValDuck)} AS m
       |  $embDimsFromDuck
       |  GROUP BY 1, 2
       |),
       |cents AS (
       |  SELECT label, list(m ORDER BY dim) AS centroid
       |  FROM comp GROUP BY 1
       |),
       |dist AS (
       |  SELECT e.vec_id, e.label AS orig, e.embedding, c.label AS clabel,
       |         list_sum(list_transform(range(1, 65), i ->
       |           (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])
       |           * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]))) AS d2
       |  FROM embeddings e, cents c
       |  WHERE e.vec_id <> 0
       |),
       |assigned AS (
       |  SELECT vec_id, orig, embedding, clabel AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                     ORDER BY d2, clabel) AS rk
       |        FROM dist)
       |  WHERE rk = 1
       |),
       |stats AS (
       |  SELECT cell, count(*) AS n_assigned,
       |         CAST(count(*) FILTER (WHERE orig <> cell) AS BIGINT)
       |           AS n_moved
       |  FROM assigned GROUP BY 1
       |),
       |na AS (
       |  SELECT cell, i AS dim,
       |         ${Sql.avgFloat(embDimValDuck)} AS m
       |  FROM assigned, unnest(range(1, 65)) AS u(i)
       |  GROUP BY 1, 2
       |),
       |nc AS (SELECT cell, list(m ORDER BY dim) AS ncentroid FROM na GROUP BY 1)
       |SELECT s.cell, s.n_assigned, s.n_moved,
       |       sqrt(list_sum(list_transform(range(1, 65), i ->
       |         (nc.ncentroid[i] - c.centroid[i])
       |         * (nc.ncentroid[i] - c.centroid[i])))) AS shift
       |FROM stats s
       |JOIN nc ON s.cell = nc.cell
       |JOIN cents c ON s.cell = c.label
       |ORDER BY s.cell""".stripMargin) { (s, d) =>
    val e = emb(s, d).where(col("vec_id") =!= 0)
    // pin (r17 opt): the quantizer feeds the assignment broadcast AND
    // the final shift join — unpinned, the centroid training pass (the
    // 64-dim explode + exact-decimal means) ran twice; same for the
    // assignment below, whose stats and centroid-recompute consumers
    // re-ran the post-shuffle argmin (the kmeansTrain round fix).
    val cents = centroidFrame(s, d)
      .select(col("label").as("clabel"), col("centroid"))
      .pipe(graft.ops.Ckpt.pin)
    val assigned = assignCells(e, cents)
      .select(col("vec_id"), col("cell"),
        col("orig"), col("embedding"))
      .pipe(graft.ops.Ckpt.pin)
    val stats = assigned.groupBy("cell")
      .agg(count(lit(1)).as("n_assigned"),
        count(when(col("orig") =!= col("cell"), 1)).as("n_moved"))
    val ncent = assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("cell"), (col("pos") + 1).cast("long").as("dim"),
        col("v").cast("double").as("v"))
      .groupBy("cell", "dim")
      .agg(Ops.avgFloat(col("v")).as("m"))
      .groupBy("cell")
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), p -> p.m)")
        .as("ncentroid"))
    stats
      .join(ncent, "cell")
      .join(broadcast(cents), col("cell") === col("clabel"))
      .select(col("cell"), col("n_assigned"), col("n_moved"),
        sqrt(expr(
          """aggregate(zip_with(ncentroid, centroid, (x, y) ->
            |  (x - y) * (x - y)),
            |cast(0.0 AS double), (acc, v) -> acc + v)"""
            .stripMargin.replace("\n", " "))).as("shift"))
      .orderBy("cell")
  }

  /** IVF search through the STREAMED index ([[graft.streaming.AnnMV]]):
    * the base corpus is delivered in four blocks (the embedding-firehose
    * ingest shape), each block assigned at ingest against the frozen
    * label-mean quantizer by the REAL Lloyd assignment step
    * ([[assignCells]] — nearest centroid by L2², not a label
    * pass-through), persisting each batch as CELL-PARTITIONED inverted
    * lists (`block=<b>/cell=<c>/…` — the faiss `add()` shape, vectors
    * living inside the lists); committed history is compacted with the
    * layout preserved; the probe is a literal filter on the `cell`
    * partition key, so the ranking scan reads ONLY the probed cell's
    * files — partition pruning, no membership join. The oracle
    * recomputes the whole thing from scratch in DuckDB — quantizer,
    * per-vector argmin assignment, probe, ranking — so a drift anywhere
    * in the incremental path (a block lost, double-counted, or assigned
    * off-spelling) is a hash mismatch. This is the index-maintenance
    * cost model the persisted index lacks: `IvfIndex` rebuilds wholesale
    * on any corpus change, while here new vectors cost O(batch) to
    * become searchable and the searched structure provably equals the
    * from-scratch build. */
  /** One streamed-IVF store per (session, corpus dir): both
    * registrations ([[ivfStreamed]], [[ivfStreamedSql]]) probe the SAME
    * built store — this is the production shape (an index is built
    * once, read by every query), and it stops every bench pass from
    * paying the 4-block build + compaction twice (r11 verdict: the
    * duplicate build kept both lines at the top of every capture and
    * amplified noise). The store is static after compaction, so reuse
    * returns byte-identical data (oracle hashes unchanged). Existence
    * is re-checked on every hit: the scratch sweep
    * ([[graft.store.Store.scratchStore]]) or an `sbt clean` can remove
    * the directory out from under a long-lived session, in which case
    * the build re-runs rather than the probe failing on a missing
    * path. Values are tiny (a path + a cell id); keying on the session
    * object keeps frames from leaking across sessions in multi-session
    * test JVMs, and [[graft.store.SessionScopedCache]] adds
    * stopped-session eviction + corpus-fingerprint staleness (r12
    * ADVICE). A concurrent duplicate build (two suites racing the
    * same key) is harmless — both stores are equivalent, last put
    * wins, the loser is swept as scratch. */
  private val streamedIvfCache =
    new graft.store.SessionScopedCache[(String, Int)]()

  /** Shared build for [[ivfStreamed]] and its pure-SQL readback twin
    * [[ivfStreamedSql]]: deliver the base corpus in four blocks against
    * the frozen label-mean quantizer, compact committed history with
    * the cell layout preserved, and resolve the nprobe=1 coarse cell.
    * Returns the store path, the probed cell id, and the broadcastable
    * 1-row query-vector frame. Cached per (session, corpus dir) — see
    * [[streamedIvfCache]]. */
  private def buildStreamedIvf(s: SparkSession, d: String)
      : (String, Int, DataFrame) = {
    val (inv, probeCell) =
      streamedIvfCache.getOrBuild(s, d) { case (inv, _) =>
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(inv))
      }(doBuildStreamedIvf(s, d))
    val q2 = emb(s, d).where(col("vec_id") === 0)
      .select(col("embedding").as("qv2"))
    (inv, probeCell, q2)
  }

  /** The uncached build — the actual 4-block delivery + compaction +
    * coarse probe; only [[buildStreamedIvf]] calls this. */
  private def doBuildStreamedIvf(s: SparkSession, d: String)
      : (String, Int) = {
    import graft.streaming.AnnMV
    val inv = graft.store.Store.scratchStore("annmv")
    // the frozen quantizer is consumed by ~6 separate actions below (4
    // block writes, the compaction fold, the coarse probe); pin its 10
    // rows once instead of re-running the explode-64-dims + exact-
    // decimal-mean lineage per action (the emb_kmeans_train discipline)
    val cents = centroidFrame(s, d)
      .select(col("label").as("clabel"), col("centroid"))
      .localCheckpoint()
    val base = emb(s, d).where(col("vec_id") =!= 0)
    (0 until 4).foreach { b =>
      AnnMV.writeInvertedBlock(
        base.where(pmod(col("vec_id"), lit(4)) === b), cents, inv,
        blockId = b.toLong)
    }
    AnnMV.compactInverted(s, inv, throughBlockId = 2L)
    val q = emb(s, d).where(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> cast(x AS double))").as("qv"))
    // The coarse probe: nprobe=1 winning cell id, resolved on the
    // driver — O(nprobe) integers, the faiss probe step (planning-time
    // work of the same order as reading the query vector itself). It
    // becomes a LITERAL partition filter in both readbacks, so the
    // ranking scan prunes to the probed cell's files across all blocks
    // — replacing round 8's forced `broadcast(members)` semi-join,
    // whose build side was n/cells × nprobe rows and an executor OOM
    // at 100 TB.
    val probeCell: Int = cents.crossJoin(broadcast(q))
      .orderBy(expr(cosSparkD("centroid", "qv")).desc, col("clabel"))
      .limit(1)
      .select(col("clabel"))
      .head().getInt(0)
    (inv, probeCell)
  }

  /** The from-scratch oracle both streamed-IVF readbacks must hash-
    * match — quantizer, per-vector argmin assignment, probe, ranking,
    * all recomputed in DuckDB, so a drift anywhere in the incremental
    * path (a block lost, double-counted, or assigned off-spelling) is
    * a hash mismatch. */
  private val ivfStreamedSqlOracle: String =
    s"""WITH comp AS (
       |  SELECT label, i AS dim,
       |         ${Sql.avgFloat(embDimValDuck)} AS m
       |  $embDimsFromDuck
       |  GROUP BY 1, 2
       |),
       |cents AS (
       |  SELECT label, list(m ORDER BY dim) AS centroid
       |  FROM comp GROUP BY 1
       |),
       |dist AS (
       |  SELECT e.vec_id, e.label, e.embedding, c.label AS clabel,
       |         list_sum(list_transform(range(1, 65), i ->
       |           (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])
       |           * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]))) AS d2
       |  FROM embeddings e, cents c
       |  WHERE e.vec_id <> 0
       |),
       |assigned AS (
       |  SELECT vec_id, label, embedding, clabel AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                     ORDER BY d2, clabel) AS rk
       |        FROM dist)
       |  WHERE rk = 1
       |),
       |q AS (
       |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
       |  FROM embeddings WHERE vec_id = 0
       |),
       |best AS (
       |  SELECT label AS probe_cell
       |  FROM cents, q
       |  ORDER BY ${cosDuckD("centroid", "qv")} DESC, label
       |  LIMIT 1
       |)
       |SELECT a.vec_id, a.label,
       |       ${cosDuck("q2.qv2", "a.embedding")} AS sim
       |FROM assigned a
       |JOIN best ON a.cell = best.probe_cell
       |CROSS JOIN (SELECT embedding AS qv2 FROM embeddings
       |            WHERE vec_id = 0) q2
       |ORDER BY sim DESC, a.vec_id
       |LIMIT 10""".stripMargin

  val ivfStreamed: NamedQuery = NamedQuery(
    "emb_ivf_streamed", ivfStreamedSqlOracle) { (s, d) =>
    import graft.streaming.AnnMV
    val (inv, probeCell, q2) = buildStreamedIvf(s, d)
    AnnMV.inverted(s, inv)
      .where(col("cell") === lit(probeCell))
      .crossJoin(broadcast(q2))
      .select(col("vec_id"), col("label"),
        expr(cosSpark("qv2", "embedding")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** [[ivfStreamed]] with the ranking scan spelled in PURE SQL over the
    * `graft_mv_read('…', 'ann_inverted')` table function — the
    * `docs_posting_lists_mv` registration discipline applied to the ANN
    * store: the SQL spelling users actually cache and reuse is
    * oracle-checked against the same from-scratch DuckDB recomputation,
    * and PlanSpec pins that the `WHERE cell = <probe>` on the SQL path
    * partition-prunes the store files exactly like the Scala probe
    * (MvSqlSpec certifies the file count at unit scale; this makes the
    * prune a registered, hash-gated property). */
  val ivfStreamedSql: NamedQuery = NamedQuery(
    "emb_ivf_streamed_sql", ivfStreamedSqlOracle) { (s, d) =>
    val (inv, probeCell, q2) = buildStreamedIvf(s, d)
    graft.functions.GraftFunctions.register(s)
    s.sql(
      s"""SELECT vec_id, label, embedding
         |FROM graft_mv_read('$inv', 'ann_inverted')
         |WHERE cell = $probeCell""".stripMargin)
      .crossJoin(broadcast(q2))
      .select(col("vec_id"), col("label"),
        expr(cosSpark("qv2", "embedding")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** Recall gate for the COMPOSITE — the third of the accuracy-readout
    * trio ([[ivfRecall]] isolates coarse-probe loss, [[pqRecall]]
    * isolates code-quantization loss; this measures their PRODUCT, the
    * number a deployment actually ships). Two readouts: `hits_exact`
    * vs the global brute-force top-10 (the shipped number — measured
    * 2/1/0 at sf0.001/0.01/0.1: the demo codebook's compounded losses,
    * reported honestly, not gated vacuously), and `hits_probed` vs the
    * exact-cosine top-10 RESTRICTED to the probed cells — the readout
    * that isolates "the composite pipeline ranks sanely" from "the
    * 10-codeword demo codebook is weak". `recall_ok` gates on
    * `hits_probed >= 1`, which dominates `hits_exact` by construction
    * (the composite's candidates all live in probed cells, so any
    * global-top-10 hit is also a restricted-top-10 member), making the
    * gate well-defined at every SF while a broken probe or kernel —
    * ranking at chance within ~600 probed candidates at sf0.1 — still
    * fails it with ~98% probability. */
  val ivfPqRecall: NamedQuery = NamedQuery(
    "emb_ivfpq_recall",
    s"""SELECT CAST(count(x.vec_id) AS BIGINT) AS hits_exact,
       |       CAST(count(r.vec_id) AS BIGINT) AS hits_probed,
       |       count(x.vec_id) / 10.0 AS recall_exact,
       |       count(r.vec_id) / 10.0 AS recall_probed,
       |       count(r.vec_id) >= 1 AS recall_ok
       |FROM ($ivfPqSqlBody) p
       |LEFT JOIN (SELECT b.vec_id
       |      FROM embeddings b
       |      CROSS JOIN (SELECT embedding AS qv0 FROM embeddings
       |                  WHERE vec_id = 0) q0
       |      WHERE b.vec_id <> 0
       |      ORDER BY ${cosDuck("q0.qv0", "b.embedding")} DESC, b.vec_id
       |      LIMIT 10) x ON p.vec_id = x.vec_id
       |LEFT JOIN (
       |  WITH comp2 AS (
       |    SELECT label, i AS dim, ${Sql.avgFloat(embDimValDuck)} AS m
       |    $embDimsFromDuck
       |    GROUP BY 1, 2),
       |  cents2 AS (SELECT label, list(m ORDER BY dim) AS centroid
       |             FROM comp2 GROUP BY 1),
       |  q2 AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
       |                embedding AS qemb
       |         FROM embeddings WHERE vec_id = 0),
       |  best2 AS (SELECT label AS cell FROM cents2, q2
       |            ORDER BY ${cosDuckD("centroid", "qv")} DESC, label
       |            LIMIT 3)
       |  SELECT b.vec_id
       |  FROM embeddings b
       |  JOIN best2 ON b.label = best2.cell
       |  CROSS JOIN q2
       |  WHERE b.vec_id <> 0
       |  ORDER BY ${cosDuck("q2.qemb", "b.embedding")} DESC, b.vec_id
       |  LIMIT 10) r ON p.vec_id = r.vec_id""".stripMargin) { (s, d) =>
    val top = ivfPqTopK.run(s, d).select("vec_id")
    val cents = IvfIndex.centroids(s, d)
    val qv = emb(s, d).where(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> cast(x AS double))").as("qv"))
    val best = cents.crossJoin(broadcast(qv))
      .orderBy(expr(cosSparkD("centroid", "qv")).desc, col("label"))
      .limit(3)
      .select(col("label").as("cell"))
    val q2 = emb(s, d).where(col("vec_id") === 0)
      .select(col("embedding").as("qemb"))
    val restricted = emb(s, d).where(col("vec_id") =!= 0)
      .join(broadcast(best), col("label") === col("cell"), "left_semi")
      .crossJoin(broadcast(q2))
      .orderBy(expr(cosSpark("qemb", "embedding")).desc, col("vec_id"))
      .limit(10)
      .select("vec_id")
    top
      .join(exactTopMemo(s, d).withColumn("ex", lit(1)), Seq("vec_id"), "left")
      .join(restricted.withColumn("pr", lit(1)), Seq("vec_id"), "left")
      .agg(count(col("ex")).as("hits_exact"),
        count(col("pr")).as("hits_probed"))
      .select(col("hits_exact"), col("hits_probed"),
        (col("hits_exact") / lit(10.0)).as("recall_exact"),
        (col("hits_probed") / lit(10.0)).as("recall_probed"),
        (col("hits_probed") >= 1).as("recall_ok"))
  }

  /** How many Lloyd iterations [[kmeansTrain]] runs — small enough that
    * the unrolled oracle CTE chain stays readable, large enough to show
    * convergence behavior (assignments stabilize, shifts shrink). */
  private val KmeansIters = 3

  /** The unrolled oracle for [[kmeansTrain]]: one
    * dist→argmin→recompute CTE block per iteration, chained — the
    * [[graft.queries.DocQueries]] BPE-trainer discipline applied to the
    * quantizer loop (DuckDB has no iterative SQL; K is small and fixed,
    * so unrolling IS the faithful twin). Determinism carries across
    * iterations because every centroid component is the round-12
    * exact-decimal mean both engines compute bit-identically — so the
    * iteration-2 distances fold over IDENTICAL doubles in identical
    * index order, and so on inductively. */
  private def kmeansTrainSql: String = {
    val iterCtes = (1 to KmeansIters).map { k =>
      s"""dist$k AS (
         |  SELECT e.vec_id, e.label AS orig, e.embedding, c.cell,
         |         list_sum(list_transform(range(1, 65), i ->
         |           (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])
         |           * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]))) AS d2
         |  FROM embeddings e, cents${k - 1} c
         |  WHERE e.vec_id <> 0
         |),
         |asg$k AS (
         |  SELECT vec_id, orig, embedding, cell
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                     ORDER BY d2, cell) AS rk
         |        FROM dist$k)
         |  WHERE rk = 1
         |),
         |stat$k AS (
         |  SELECT cell, count(*) AS n_assigned,
         |         CAST(count(*) FILTER (WHERE orig <> cell) AS BIGINT)
         |           AS n_moved
         |  FROM asg$k GROUP BY 1
         |),
         |na$k AS (
         |  SELECT cell, i AS dim, ${Sql.avgFloat(embDimValDuck)} AS m
         |  FROM asg$k, unnest(range(1, 65)) AS u(i)
         |  GROUP BY 1, 2
         |),
         |cents$k AS (SELECT cell, list(m ORDER BY dim) AS centroid
         |            FROM na$k GROUP BY 1),
         |out$k AS (
         |  SELECT $k AS iter, s.cell, s.n_assigned, s.n_moved,
         |         sqrt(list_sum(list_transform(range(1, 65), i ->
         |           (n.centroid[i] - p.centroid[i])
         |           * (n.centroid[i] - p.centroid[i])))) AS shift
         |  FROM stat$k s
         |  JOIN cents$k n ON s.cell = n.cell
         |  JOIN cents${k - 1} p ON s.cell = p.cell
         |)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to KmeansIters)
      .map(k => s"SELECT * FROM out$k").mkString(" UNION ALL ")
    s"""WITH comp AS (
       |  SELECT label, i AS dim,
       |         ${Sql.avgFloat(embDimValDuck)} AS m
       |  $embDimsFromDuck
       |  GROUP BY 1, 2
       |),
       |cents0 AS (
       |  SELECT label AS cell, list(m ORDER BY dim) AS centroid
       |  FROM comp GROUP BY 1
       |),
       |$iterCtes
       |SELECT iter, cell, n_assigned, n_moved, shift
       |FROM ($unions) ORDER BY iter, cell""".stripMargin
  }

  /** The FULL quantizer training loop — [[kmeansRefine]]'s single Lloyd
    * step loop-driven to [[KmeansIters]] rounds, closing the training
    * loop the way [[graft.queries.DocQueries]] `docs_bpe_train` closed
    * the tokenizer's: per round, assign every base vector to its
    * nearest current centroid (broadcast codebook, partial-aggregated
    * argmin), recompute exact-decimal cell means, report (population,
    * migrations off the seed label, centroid shift), and feed the new
    * codebook to the next round. `localCheckpoint` truncates the state
    * lineage per round — the BPE trainer's lesson: without it the
    * assign/recompute branches double the DAG per round and round K
    * replays the corpus 2^K times. Scale shape per round is exactly the
    * single step's: per-row assignment work + one O(cells × dims)
    * exchange; the loop multiplies rounds, never the exchange width.
    * Convergence-to-fixpoint is this same loop with a driver-side test
    * on the O(cells)-row shift frame. */
  val kmeansTrain: NamedQuery = NamedQuery(
    "emb_kmeans_train", kmeansTrainSql) { (s, d) =>
    // one read of the base vectors feeds every round (at scale:
    // persist/cache; here the same lineage-truncation call the round
    // state uses)
    val e = emb(s, d).where(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint()
    val d2 = expr(
      """aggregate(zip_with(embedding, centroid, (x, y) ->
        |  (cast(x AS double) - y) * (cast(x AS double) - y)),
        |cast(0.0 AS double), (acc, v) -> acc + v)"""
        .stripMargin.replace("\n", " "))
    var cur = centroidFrame(s, d)
      .select(col("label").as("cell"), col("centroid"))
      .localCheckpoint()
    val outs = (1 to KmeansIters).map { k =>
      val assigned = e.crossJoin(broadcast(
          cur.select(col("cell").as("clabel"), col("centroid"))))
        .select(col("vec_id"), col("label"), col("embedding"),
          col("clabel"), d2.as("d2"))
        .groupBy("vec_id")
        .agg(min(struct(col("d2"), col("clabel"), col("label"),
          col("embedding"))).as("b"))
        .select(col("vec_id"), col("b.clabel").as("cell"),
          col("b.label").as("orig"), col("b.embedding").as("embedding"))
        // pin (r17 opt): stats and the centroid recompute below both
        // consume the assignment — unpinned, the broadcast-distance
        // argmin (the dominant per-round compute) planned twice per
        // round; exchange reuse deduplicated the shuffle but the
        // post-shuffle min-struct agg over full embedding rows still
        // ran twice. Assignment state is exactly the loop-state class
        // Ckpt exists for (e and the round codebook are already
        // pinned).
        .pipe(graft.ops.Ckpt.pin)
      val stats = assigned.groupBy("cell")
        .agg(count(lit(1)).as("n_assigned"),
          count(when(col("orig") =!= col("cell"), 1)).as("n_moved"))
      val ncent = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("cell"), (col("pos") + 1).cast("long").as("dim"),
          col("v").cast("double").as("v"))
        .groupBy("cell", "dim")
        .agg(Ops.avgFloat(col("v")).as("m"))
        .groupBy("cell")
        .agg(expr(
          "transform(array_sort(collect_list(struct(dim, m))), p -> p.m)")
          .as("centroid"))
        .localCheckpoint()
      val out = stats
        .join(ncent.select(col("cell"), col("centroid").as("ncentroid")),
          "cell")
        .join(broadcast(cur.select(col("cell").as("pcell"),
          col("centroid").as("pcentroid"))), col("cell") === col("pcell"))
        .select(lit(k).as("iter"), col("cell"),
          col("n_assigned"), col("n_moved"),
          sqrt(expr(
            """aggregate(zip_with(ncentroid, pcentroid, (x, y) ->
              |  (x - y) * (x - y)),
              |cast(0.0 AS double), (acc, v) -> acc + v)"""
              .stripMargin.replace("\n", " "))).as("shift"))
      cur = ncent
      out
    }
    outs.reduce(_ unionAll _).orderBy("iter", "cell")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): partition the corpus into clusters, then remove
    * within-cluster near-duplicates, keeping one representative per
    * dup-group. Clusters here are the coarse-quantizer cells the IVF
    * family already uses (cell = label; a production run would take
    * [[kmeansRefine]]'s converged assignment — the mechanics are
    * identical). Removal rule is the paper's upper-triangular rule: a
    * vector is removed when ANY lower-id vector in its cluster has
    * cosine > τ with it — including lower-id vectors that are
    * themselves removed (SemDeDup thresholds the per-column max of the
    * upper-triangular similarity matrix; it does NOT re-compare against
    * survivors only, so neither does this). τ = 0.35, calibrated to this synthetic corpus
    * (its vectors are near-orthogonal draws with no true semantic dups;
    * real text embeddings use τ ≈ 0.95+ — the knob, not the shape,
    * changes). Scale story — the entire point of SemDeDup: the
    * quadratic term is CLUSTER-LOCAL, so cost is Σ|cell|², not n²; the
    * self-join is one hash shuffle on the cluster key, cosines are the
    * codegen'd [[graft.functions.CosineSimilarity]] kernel, and the
    * output collapses to an O(cells) rollup. Giant clusters are the
    * known caveat (the paper caps cluster size); the k-means step is
    * the mitigation.
    *
    * DEMOTED from the registry (round 11): with the demo's FIXED
    * 10-cell quantizer, |cell| grows linearly with the corpus and the
    * in-cell pair term grows ~n² — 29× wall at the 30× scale point.
    * The registered spelling is [[semanticDedupCapped]], which holds
    * |subcell| ≈ 64 by adaptive LSH sub-bucketing (the paper's own
    * cap-the-cluster discipline) and whose removal set the uncapped
    * query provably contains (QualityOpsSpec pins the subset). This
    * val survives as the bench/test CONTRAST — the measured bad
    * example the COVERAGE trend table quotes. */
  val semanticDedup: NamedQuery = NamedQuery(
    "emb_semantic_dedup",
    s"""WITH rem AS (
       |  SELECT DISTINCT b.label AS label, b.vec_id AS rid
       |  FROM embeddings a
       |  JOIN embeddings b
       |    ON a.label = b.label AND a.vec_id < b.vec_id
       |  WHERE ${cosDuck("a.embedding", "b.embedding")} > 0.35
       |),
       |rm AS (SELECT label, count(*) AS n_removed FROM rem GROUP BY 1),
       |tot AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY 1)
       |SELECT tot.label, n_vecs,
       |       COALESCE(n_removed, 0) AS n_removed,
       |       n_vecs - COALESCE(n_removed, 0) AS n_kept
       |FROM tot LEFT JOIN rm ON tot.label = rm.label
       |ORDER BY tot.label""".stripMargin) { (s, d) =>
    val e = emb(s, d).select(col("vec_id"), col("label"), col("embedding"))
    val removed = e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id") &&
          expr(cosSpark("a.embedding", "b.embedding")) > 0.35)
      .select(col("b.label").as("label"), col("b.vec_id").as("rid"))
      .distinct()
    val rm = removed.groupBy("label").agg(count(lit(1)).as("n_removed"))
    e.groupBy("label").agg(count(lit(1)).as("n_vecs"))
      .join(rm, Seq("label"), "left")
      .select(col("label"), col("n_vecs"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        (col("n_vecs") - coalesce(col("n_removed"), lit(0L))).as("n_kept"))
      .orderBy("label")
  }

  /** [[semanticDedup]]'s 100 TB spelling — the paper's own giant-cluster
    * caveat closed with machinery the engine already ships: each
    * semantic cluster is REFINED by an ADAPTIVE number of LSH
    * sign-projection bits before the pair join, so the quadratic term
    * is Σ|subcell|² with |subcell| ≈ a fixed target (64) at ANY corpus
    * size — the demo's fixed 10-cell quantizer stops being a scale
    * liability (its 30× wall grew 15.5× because |cell| grew 30×; here
    * bits grow instead). The bit width per cluster is a pure integer
    * staircase of the cluster's row count (≤64→0 bits, ≤128→1, …,
    * else 8 — both engines compute it from the same count, no float
    * log), and the sub-key is a PREFIX of the same 8-bit md5-derived
    * hyperplane signature [[lshPairs]] uses, so the whole construction
    * reuses one audited projection. Honesty about recall: a single
    * band misses near-dup pairs whose signs differ inside the prefix —
    * the standard LSH trade, bounded per bit by 1−θ/π; the recall
    * lever is more hyperplanes → more bands (the minhash 4-band
    * discipline, `DocQueries.minhashBands`), orthogonal to the cap
    * mechanism certified here. The capped candidate set is a SUBSET of
    * the uncapped query's (same τ, pairs only ever removed), which
    * SketchQuantizeSpec pins literally. */
  val semanticDedupCapped: NamedQuery = {
    def bitsDuck(cnt: String): String =
      s"""CASE WHEN $cnt <= 64 THEN 0 WHEN $cnt <= 128 THEN 1
         |     WHEN $cnt <= 256 THEN 2 WHEN $cnt <= 512 THEN 3
         |     WHEN $cnt <= 1024 THEN 4 WHEN $cnt <= 2048 THEN 5
         |     WHEN $cnt <= 4096 THEN 6 WHEN $cnt <= 8192 THEN 7
         |     ELSE 8 END""".stripMargin
    NamedQuery(
      "emb_semantic_dedup_capped",
      s"""WITH bucketed AS (
         |  SELECT vec_id, label, embedding,
         |         ${bucketDuckExpr("embedding")} AS b8
         |  FROM embeddings
         |),
         |wb AS (
         |  SELECT label, ${bitsDuck("count(*)")} AS bits
         |  FROM embeddings GROUP BY 1
         |),
         |sub AS (
         |  SELECT b.vec_id, b.label, b.embedding,
         |         substr(b.b8, 1, wb.bits) AS sk
         |  FROM bucketed b JOIN wb USING (label)
         |),
         |rem AS (
         |  SELECT DISTINCT y.label, y.vec_id AS rid
         |  FROM sub x
         |  JOIN sub y ON x.label = y.label AND x.sk = y.sk
         |             AND x.vec_id < y.vec_id
         |  WHERE ${cosDuck("x.embedding", "y.embedding")} > 0.35
         |),
         |rm AS (SELECT label, count(*) AS n_removed FROM rem GROUP BY 1),
         |tot AS (
         |  SELECT label, count(*) AS n_vecs,
         |         count(DISTINCT sk) AS n_buckets
         |  FROM sub GROUP BY 1
         |)
         |SELECT tot.label, n_vecs, n_buckets,
         |       COALESCE(n_removed, 0) AS n_removed,
         |       n_vecs - COALESCE(n_removed, 0) AS n_kept
         |FROM tot LEFT JOIN rm ON tot.label = rm.label
         |ORDER BY tot.label""".stripMargin) { (s, d) =>
      val e = emb(s, d).select(col("vec_id"), col("label"), col("embedding"),
        expr(bucketExpr("embedding")).as("b8"))
      // integer staircase, not a float log: both engines derive the bit
      // width from the same exact count
      val bits = e.groupBy("label").agg(count(lit(1)).as("cnt"))
        .select(col("label"),
          when(col("cnt") <= 64, 0).when(col("cnt") <= 128, 1)
            .when(col("cnt") <= 256, 2).when(col("cnt") <= 512, 3)
            .when(col("cnt") <= 1024, 4).when(col("cnt") <= 2048, 5)
            .when(col("cnt") <= 4096, 6).when(col("cnt") <= 8192, 7)
            .otherwise(8).as("bits"))
      // O(labels) frame — broadcastable at any corpus size
      val sub = e.join(broadcast(bits), "label")
        .select(col("vec_id"), col("label"), col("embedding"),
          expr("substring(b8, 1, bits)").as("sk"))
      val removed = sub.as("a")
        .join(sub.as("b"),
          col("a.label") === col("b.label") && col("a.sk") === col("b.sk") &&
            col("a.vec_id") < col("b.vec_id") &&
            expr(cosSpark("a.embedding", "b.embedding")) > 0.35)
        .select(col("b.label").as("label"), col("b.vec_id").as("rid"))
        .distinct()
      val rm = removed.groupBy("label").agg(count(lit(1)).as("n_removed"))
      sub.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          countDistinct(col("sk")).as("n_buckets"))
        .join(rm, Seq("label"), "left")
        .select(col("label"), col("n_vecs"), col("n_buckets"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"),
          (col("n_vecs") - coalesce(col("n_removed"), lit(0L))).as("n_kept"))
        .orderBy("label")
    }
  }

  /** Matryoshka-style dimension-truncation recall: rank the corpus
    * against 5 query vectors by full 64-dim cosine AND by cosine over the
    * first 16 dims only (the MRL prefix-truncation trick — Kusupati et
    * al. 2022), then report top-10 overlap per query. This is the
    * evaluation a pipeline runs before committing to truncated embeddings
    * for cheap first-stage retrieval (4× less memory bandwidth per
    * comparison). Shape: 5-row broadcast of query vectors against one
    * corpus scan; both rankings share ONE hash exchange on `qid` (two
    * window sorts over the same partitioning — no second shuffle), and at
    * 100 TB the per-query partition sort is the standard top-k-per-group
    * shape. `graft_cosine` iterates min(len), so the 16-dim slice runs
    * the same fused codegen loop as the full ranking. */
  val matryoshkaRecall: NamedQuery = {
    def dot16(a: String, b: String) =
      s"list_sum(list_transform(range(1, 17), " +
        s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    def cos16(a: String, b: String) =
      s"${dot16(a, b)} / (sqrt(${dot16(a, a)}) * sqrt(${dot16(b, b)}))"
    NamedQuery(
      "emb_matryoshka_recall",
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id < 5
         |),
         |s AS (
         |  SELECT q.qid, b.vec_id,
         |         ${cosDuck("q.qv", "b.embedding")} AS sim_full,
         |         ${cos16("q.qv", "b.embedding")} AS sim_trunc
         |  FROM embeddings b CROSS JOIN q
         |  WHERE b.vec_id <> q.qid
         |),
         |r AS (
         |  SELECT qid,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY sim_full DESC, vec_id) AS rf,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY sim_trunc DESC, vec_id) AS rt
         |  FROM s
         |)
         |SELECT qid AS vec_id,
         |       count(*) FILTER (WHERE rf <= 10 AND rt <= 10) AS overlap,
         |       CAST(count(*) FILTER (WHERE rf <= 10 AND rt <= 10) AS DOUBLE)
         |         / 10.0 AS recall10
         |FROM r
         |GROUP BY 1
         |ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val base = emb(s, d)
      val q = base.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val scored = base.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          expr(cosSpark("qv", "embedding")).as("sim_full"),
          expr(cosSpark("slice(qv, 1, 16)", "slice(embedding, 1, 16)"))
            .as("sim_trunc"))
      val wF = Window.partitionBy("qid")
        .orderBy(col("sim_full").desc, col("vec_id"))
      val wT = Window.partitionBy("qid")
        .orderBy(col("sim_trunc").desc, col("vec_id"))
      scored
        .select(col("qid"), row_number().over(wF).as("rf"),
          row_number().over(wT).as("rt"))
        .groupBy("qid")
        .agg(
          count(when(col("rf") <= 10 && col("rt") <= 10, 1)).as("overlap"),
          (count(when(col("rf") <= 10 && col("rt") <= 10, 1)).cast("double")
            / lit(10.0)).as("recall10"))
        .select(col("qid").as("vec_id"), col("overlap"), col("recall10"))
        .orderBy("vec_id")
    }
  }

  /** Hybrid dense+sparse retrieval via reciprocal-rank fusion (RRF,
    * Cormack et al. 2009, the fusion every hybrid RAG stack ships):
    * sparse candidates are the BM25 top-20 over `documents`
    * ([[DocQueries.bm25Scores]], fixed term query), dense candidates the
    * cosine top-20 against query vector 0 over the row-aligned
    * `embeddings` table (`doc_id = vec_id`, the corpus linkage), and the
    * fused score is `Σ 1/(60 + rank)` over the lists a doc appears in.
    *
    * Determinism: both rank orders sort engine-identical doubles with a
    * doc-id tie-break; `1/(60+rank)` divides exact small integers
    * (correctly-rounded, bit-identical) and the fusion adds exactly two
    * doubles in a fixed expression order.
    *
    * Scale shape: each candidate list is TakeOrdered top-k — the global
    * `row_number` windows run AFTER `limit(20)`, so the unpartitioned
    * window sees 20 rows, never the corpus (rank-then-filter ==
    * limit-then-rank because the order is total). The fusion join moves
    * 2×20 rows. */
  val hybridRrf: NamedQuery = NamedQuery(
    "emb_hybrid_rrf",
    s"""WITH ${DocQueries.bm25Ctes},
       |rs AS (
       |  SELECT doc_id,
       |         row_number() OVER (ORDER BY score DESC, doc_id) AS rank_s
       |  FROM (SELECT doc_id, score FROM bm25
       |        ORDER BY score DESC, doc_id LIMIT 20)
       |),
       |rd AS (
       |  SELECT vec_id,
       |         row_number() OVER (ORDER BY sim DESC, vec_id) AS rank_d
       |  FROM (
       |    SELECT b.vec_id, ${cosDuck("q.qv", "b.embedding")} AS sim
       |    FROM embeddings b
       |    CROSS JOIN (SELECT embedding AS qv FROM embeddings
       |                WHERE vec_id = 0) q
       |    WHERE b.vec_id <> 0
       |    ORDER BY sim DESC, b.vec_id LIMIT 20)
       |)
       |SELECT coalesce(rs.doc_id, rd.vec_id) AS doc_id,
       |       rs.rank_s, rd.rank_d,
       |       coalesce(CAST(1 AS DOUBLE) / (60 + rs.rank_s),
       |                CAST(0 AS DOUBLE)) +
       |       coalesce(CAST(1 AS DOUBLE) / (60 + rd.rank_d),
       |                CAST(0 AS DOUBLE)) AS rrf
       |FROM rs FULL JOIN rd ON rs.doc_id = rd.vec_id
       |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    val rs = DocQueries.bm25Scores(s, d)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(20)
      .withColumn("rank_s", row_number().over(w).cast("long"))
      .select("doc_id", "rank_s")
    val q = emb(s, d).where(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val wd = Window.orderBy(col("sim").desc, col("vec_id"))
    val rd = emb(s, d).where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), expr(cosSpark("qv", "embedding")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(20)
      .withColumn("rank_d", row_number().over(wd).cast("long"))
      .select("vec_id", "rank_d")
    rs.join(rd, rs("doc_id") === rd("vec_id"), "full_outer")
      .select(
        coalesce(rs("doc_id"), rd("vec_id")).as("doc_id"),
        col("rank_s"), col("rank_d"),
        (coalesce(lit(1.0) / (lit(60) + col("rank_s")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rank_d")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
  }

  // semanticDedup (the fixed-cell SemDeDup demo) is deliberately NOT
  // registered: its in-cell pair term grows ~n² with a fixed quantizer
  // (29× wall at the 30× scale point), so the registry carries only the
  // scale-safe capped spelling; the uncapped val survives as the
  // bench/test contrast (QualityOpsSpec's subset pin, the COVERAGE
  // trend table's honest bad example).
  val all: Seq[NamedQuery] = Seq(
    cosineTopK, lshPairs, nearDup, labelCentroids, knnAccuracy, ivfTopK,
    ivfMultiprobe, topKPerLabel, quantizedTopK, ivfRecall, ivfPersisted,
    pqTopK, pqRecall, ivfPqTopK, ivfPqRecall, kmeansRefine, kmeansTrain,
    ivfStreamed, ivfStreamedSql, semanticDedupCapped, matryoshkaRecall,
    hybridRrf)
}
