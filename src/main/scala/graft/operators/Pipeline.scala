package graft.operators

import org.apache.spark.sql.SparkSession
import graft.meds.{MedsData, MedsIO}
import graft.meds.MedsSchema._
import org.apache.spark.sql.functions._

/** Pipeline driver (reference: /root/reference/src/MEDS_transforms/runner.py:291-370
  * and configs/pipeline.py:381-438).
  *
  * The reference runs each stage as a subprocess over sharded files with
  * file-lock coordination, materializing every stage to disk (a known
  * limitation it documents itself, README.md:188-189). Here a pipeline is a
  * sequence of DataFrame→DataFrame stages on one SparkSession: Catalyst fuses
  * adjacent narrow stages into single whole-stage-codegen passes, and data
  * only hits disk at user-requested checkpoints. IO-chaining semantics are
  * preserved: data stages thread the data table, metadata stages thread the
  * codes table and see train-split data only (pipeline.py:415-421).
  */
object Pipeline {

  sealed trait Stage { def name: String }
  /** A data→data transformation (MAP stages). */
  final case class DataStage(name: String, f: MedsData => org.apache.spark.sql.DataFrame) extends Stage
  /** A (data, codes)→codes transformation (metadata/MAPREDUCE stages); sees
    * train-split data only, per the reference's forced `train_only=True`.
    */
  final case class MetadataStage(name: String, f: MedsData => org.apache.spark.sql.DataFrame) extends Stage

  final case class Checkpoint(path: String)

  def trainOnly(m: MedsData): MedsData = {
    val d =
      if (m.data.columns.contains(Split)) m.data.filter(col(Split) === TrainSplit)
      else m.data.join(
        broadcast(m.splits.filter(col(Split) === TrainSplit).select(SubjectId)),
        Seq(SubjectId), "left_semi")
    m.withData(d)
  }

  /** Run stages sequentially; `checkpoints` maps stage name → dir to persist
    * (and re-read — cutting lineage) after that stage, providing the
    * reference's resumability boundaries without its per-stage mandatory
    * disk round-trip.
    */
  def run(
      spark: SparkSession,
      input: MedsData,
      stages: Seq[Stage],
      checkpoints: Map[String, String] = Map.empty): MedsData = {
    stages.foldLeft(input) { (m, stage) =>
      val next = stage match {
        case DataStage(_, f) => m.withData(f(m))
        case MetadataStage(_, f) => m.withCodes(f(trainOnly(m)))
      }
      checkpoints.get(stage.name) match {
        case Some(dir) =>
          MedsIO.write(next, dir)
          MedsIO.read(spark, dir)
        case None => next
      }
    }
  }
}
