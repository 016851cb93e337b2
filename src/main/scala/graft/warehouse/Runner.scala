package graft.warehouse

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline runner — the dbt-DAG equivalent (SURVEY.md §3.2): stages are
  * pure DataFrame functions over previously-registered outputs, executed
  * in dependency order inside ONE Spark session, so Catalyst sees the
  * whole lineage and optimizes across stage boundaries (unlike dbt, where
  * every model is an opaque materialization barrier).
  *
  * Materialization policy mirrors the reference (dbt_project.yml:35-42):
  * staging/intermediate stages stay lazy ("views"); marts/snapshots
  * persist. Quality gates run post-stage (dbt test as a pipeline step,
  * dags/dbt_transformation_dag.py:104-107) and fail the run on violation.
  */
object Runner {

  final case class Stage(
      name: String,
      deps: Seq[String],
      build: Map[String, DataFrame] => DataFrame,
      materializePath: Option[String] = None,
      gates: Seq[DataFrame => Option[String]] = Nil)

  final case class StageResult(name: String, rows: Option[Long],
      gateFailures: Seq[String])

  /** Execute stages topologically, then run the scheduled MAINTENANCE
    * gate over `maintenance` targets: each target whose data-file count
    * crossed its threshold is compacted
    * ([[Maintenance.maintainIfNeeded]]) — the dbt-post-hook-shaped slot
    * where a 100 TB warehouse schedules its compaction jobs, instead of
    * leaving the manual surface to be remembered. Actions are reported
    * as `maintenance:<path>` StageResults. Maintenance runs AFTER the
    * quality gates pass (never compact on top of a failed run) and only
    * for quiesced tables — a streaming sink racing a target fails
    * loudly via the compaction lock rather than losing rows.
    */
  def run(inputs: Map[String, DataFrame], stages: Seq[Stage],
      maintenance: Seq[Maintenance.MaintenanceTarget] = Nil): (Map[String, DataFrame], Seq[StageResult]) = {
    val built = mutable.LinkedHashMap[String, DataFrame]() ++ inputs
    val results = mutable.ArrayBuffer[StageResult]()
    val pending = mutable.Queue[Stage](stages: _*)
    var progress = true
    while (pending.nonEmpty && progress) {
      progress = false
      val ready = pending.dequeueAll(s => s.deps.forall(built.contains))
      ready.foreach { s =>
        progress = true
        var df = s.build(built.toMap)
        val rows = s.materializePath.map { path =>
          df.write.mode("overwrite").parquet(path)
          df = df.sparkSession.read.parquet(path)
          df.count()
        }
        built(s.name) = df
        val failures = s.gates.flatMap(g => g(df))
        results += StageResult(s.name, rows, failures)
      }
    }
    require(pending.isEmpty,
      s"unresolvable stage dependencies: ${pending.map(_.name).mkString(", ")}")
    val allFailures = results.flatMap(r => r.gateFailures.map(f => s"${r.name}: $f"))
    require(allFailures.isEmpty, s"quality gates failed — ${allFailures.mkString("; ")}")
    maintenance.foreach { t =>
      val spark = built.values.headOption.orElse(inputs.values.headOption)
        .map(_.sparkSession)
        .getOrElse(org.apache.spark.sql.SparkSession.active)
      Maintenance.maintainIfNeeded(spark, t).foreach { action =>
        results += StageResult(s"maintenance:${t.path}", None, Nil)
        System.err.println(s"[graft] maintenance: $action")
      }
    }
    (built.toMap, results.toSeq)
  }

  // ------------------------------------------------------- standard gates

  /** Gate: column must be non-null everywhere (dbt not_null). */
  def notNullGate(c: String): DataFrame => Option[String] = df => {
    val n = df.filter(col(c).isNull).count()
    if (n == 0) None else Some(s"not_null($c): $n violations")
  }

  /** Gate: key must be unique (dbt unique). */
  def uniqueGate(keys: String*): DataFrame => Option[String] = df => {
    val n = df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
    if (n == 0) None else Some(s"unique(${keys.mkString(",")}): $n duplicate keys")
  }

  /** Gate: values within [lo, hi] (dbt_utils.accepted_range). */
  def rangeGate(c: String, lo: Double, hi: Double): DataFrame => Option[String] = df => {
    val n = df.filter(col(c).isNotNull && (col(c) < lo || col(c) > hi)).count()
    if (n == 0) None else Some(s"accepted_range($c): $n violations")
  }

  // ------------------------------------------------- lineage docs (dbt docs)

  /** Machine-readable lineage manifest — the dbt `manifest.json` analog
    * (dbt docs generate, dags/dbt_transformation_dag.py:110-113): one node
    * per stage with dependencies, materialization, declared gates, and the
    * resolved output schema. Sources (inputs with no defining stage)
    * appear as `source` nodes.
    */
  def lineageManifest(stages: Seq[Stage],
      built: Map[String, DataFrame]): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val stageNames = stages.map(_.name).toSet
    val sources = stages.flatMap(_.deps).distinct.filterNot(stageNames)
    val nodes = sources.map { s =>
      val cols = built.get(s).map(_.schema.fields.toSeq).getOrElse(Nil)
        .map(f => s"${q(f.name)}: ${q(f.dataType.simpleString)}")
        .mkString("{", ",", "}")
      s"${q(s)}: {${q("resource_type")}: ${q("source")}, " +
        s"${q("depends_on")}: [], ${q("columns")}: $cols}"
    } ++ stages.map { st =>
      val cols = built.get(st.name).map(_.schema.fields.toSeq).getOrElse(Nil)
        .map(f => s"${q(f.name)}: ${q(f.dataType.simpleString)}")
        .mkString("{", ",", "}")
      val deps = st.deps.map(q).mkString("[", ",", "]")
      val mat = if (st.materializePath.isDefined) "table" else "view"
      s"${q(st.name)}: {${q("resource_type")}: ${q("model")}, " +
        s"${q("depends_on")}: $deps, ${q("materialized")}: ${q(mat)}, " +
        s"${q("n_gates")}: ${st.gates.length}, ${q("columns")}: $cols}"
    }
    nodes.mkString("{", ",", "}")
  }

  /** Human-readable lineage doc (markdown): a mermaid DAG of stage
    * dependencies plus a per-stage section with materialization, gates,
    * and the resolved column schema.
    */
  def lineageDoc(stages: Seq[Stage], built: Map[String, DataFrame]): String = {
    val sb = new StringBuilder("# Pipeline lineage\n\n```mermaid\ngraph TD\n")
    stages.foreach(st => st.deps.foreach(d => sb.append(s"  $d --> ${st.name}\n")))
    sb.append("```\n")
    stages.foreach { st =>
      sb.append(s"\n## ${st.name}\n\n")
      sb.append(s"- materialized: ${if (st.materializePath.isDefined) "table" else "view"}")
      st.materializePath.foreach(p => sb.append(s" (`$p`)"))
      sb.append(s"\n- depends on: ${st.deps.map(d => s"`$d`").mkString(", ")}\n")
      if (st.gates.nonEmpty) sb.append(s"- quality gates: ${st.gates.length}\n")
      built.get(st.name).foreach { df =>
        sb.append("\n| column | type |\n|---|---|\n")
        df.schema.fields.foreach(f =>
          sb.append(s"| ${f.name} | ${f.dataType.simpleString} |\n"))
      }
    }
    sb.toString
  }

  /** The reference's full transform pipeline as stages over raw inputs
    * `raw_trips`, `raw_weather`, `zones` (dbt run + test equivalent).
    */
  def referencePipeline(martDir: String): Seq[Stage] = Seq(
    Stage("stg_taxi_trips", Seq("raw_trips"),
      m => Staging.stgTaxiTrips(m("raw_trips"))),
    Stage("stg_weather", Seq("raw_weather"),
      m => Staging.stgWeather(m("raw_weather"))),
    Stage("int_trips_enriched", Seq("stg_taxi_trips"),
      m => Enrich.intTripsEnriched(m("stg_taxi_trips"))),
    Stage("int_weather_hourly", Seq("stg_weather"),
      m => Enrich.intWeatherHourly(m("stg_weather"))),
    Stage("mart_trips_weather", Seq("int_trips_enriched", "int_weather_hourly"),
      m => Marts.martTripsWeather(m("int_trips_enriched"), m("int_weather_hourly")),
      Some(s"$martDir/mart_trips_weather"),
      Seq(uniqueGate("hour_ts"), notNullGate("hour_ts"))),
    Stage("mart_daily_metrics", Seq("int_trips_enriched", "int_weather_hourly"),
      m => Marts.martDailyMetrics(m("int_trips_enriched"), m("int_weather_hourly")),
      Some(s"$martDir/mart_daily_metrics"),
      Seq(uniqueGate("trip_date"), notNullGate("trip_date"))),
    Stage("mart_zone_analysis", Seq("int_trips_enriched"),
      m => Marts.martZoneAnalysis(m("int_trips_enriched")),
      Some(s"$martDir/mart_zone_analysis"),
      Seq(uniqueGate("pickup_zone_id", "dropoff_zone_id"))),
    Stage("zone_demand", Seq("int_trips_enriched", "zones"),
      m => Marts.zoneDemand(m("int_trips_enriched"), m("zones")),
      Some(s"$martDir/zone_demand"), Nil))
}
