package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** `--sample` subset: ~20 queries chosen to cover the SCALE-DEPENDENT
    * regimes the sf0.01 oracle gate never reaches — the percentile sketch
    * escape (>4096 distinct values/group), Misra-Gries shrinking, durable
    * chains + banded row views, bucketed-index promotion thresholds in
    * the incremental dedup family, IVF/PQ cell behavior at real
    * cardinality, the BM25 inverted index under its writer lease, salted
    * skew, and streaming resume. Run at sf0.1 per round (end-of-round
    * sweep) so these regimes are oracle-checked at the bench scale. */
  val SampleQueries: Set[String] = Set(
    "qc_incr_hourly", "qc_incr_durable", "qc_incr_session",
    "qc_incr_percentile_sketch", "qc_incr_heavyhitters",
    "qc_incr_factjoin", "qc_incr_dynbound_total", "qc_incr_lateband",
    "qc_incr_select_band", "qc_incr_select_agg_sub",
    "qc_incr_durable_chain", "qc_incr_lateband_chain",
    "qc_incr_select_proj",
    // the mutation story at bench scale: durable repair sidecars +
    // OR-range pushdown over a big view; index tombstones under a
    // 10× corpus; versioned doc liveness resolution at real tf size
    "qc_incr_repair_rows", "q_dedup_incr_nearrm", "q_text_bm25_upsert",
    // session-cut derivation + the (day × keys) twin at real cardinality
    "qc_incr_repair_session", "qc_incr_twin",
    "q_dedup_incr_near", "q_dedup_incr_spans", "q_dedup_minhash",
    "q_ann_ivf", "q_ann_pq", "q_knn_join", "q_embed_incr",
    "q_text_bm25_incr", "q_text_bpe_train", "q_freq_topk",
    "q_sketch_distinct", "q_agg_salted", "q_stream_resume",
    // index-served batched hybrid at 10x corpus and 50 query rows: the
    // inverted-index scoring joins + liveness resolution at real tf size
    "q_text_hybrid_batch_incr")

  def main(args: Array[String]): Unit = {
    val sample = args.contains("--sample")
    val Array(sfDir, outDir) = args.filterNot(_ == "--sample")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // NOTE: outputTimestampType deliberately stays at the INT96
      // default here — the driver's DuckDB compare reads the RESULT
      // parquet files this main writes, and annotated micros
      // (isAdjustedToUTC) reads back as TIMESTAMPTZ on the DuckDB side,
      // hash-mismatching every timestamp cell. Scan-pruning of scratch
      // tables is a perf concern the bench session covers; correctness
      // dumps keep the historical convention.
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only subset filter (comma-separated names); driver sets nothing
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
      .orElse(if (sample) Some(SampleQueries) else None)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
