package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON line IS the driver contract (the driver json-parses
  * stdout), and its bookkeeping has burned two rounds — r2 recorded a
  * phantom encode_fsst regression from a single-shot time, r3 recorded a
  * 2.1× phantom pipeline regression, and the r3 ADVICE flagged that a
  * failed-all-reps query emitted as 0.000s reads as a fast pass. These
  * specs pin the extracted pure pieces so those behaviors cannot
  * silently regress.
  */
class BenchSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("failed-all-reps queries are omitted from the times, reported in errors") {
    val best = Seq("a" -> 1.5, "b" -> Double.MaxValue, "c" -> 0.2)
    // 'a' failed one rep but succeeded another (best present): not an error
    val (times, errs) = Bench.finalizeQueryTimes(best, Seq("a", "b"), 3.0)
    assert(times == Seq("a" -> 1.5, "c" -> 0.2))
    assert(errs == Seq("b"))
    // pipeline: attempted failure with a surviving best rep is absorbed...
    assert(Bench.finalizeQueryTimes(best, Seq("encode_pipeline"), 3.0)._2.isEmpty)
    // ...but all-reps-failed pipeline lands in errors
    val (_, e2) = Bench.finalizeQueryTimes(best, Seq("encode_pipeline"), Double.MaxValue)
    assert(e2 == Seq("encode_pipeline"))
  }

  test("bench JSON parses, carries the contract fields, and omits a dead pipeline") {
    import spark.implicits._
    val full = Bench.LevelSample(1000000L, 1455600L, 2.0, 4.0)
    val low = Bench.LevelSample(1000000L, 1455600L, 7.0, 15.0)
    val summary = pipeline.EncodePipeline.RunSummary(
      "run-00000-test", 10, 0, 10, 500, 1000000L, 4000000L, 1455600L, 1234L)
    val json = Bench.benchJson(
      queryTimes = Seq("q1" -> 0.5, "q2" -> 1.25), errors = Seq("q3"),
      full = full, low = low, sfDir = "/tmp/sf", nTok = 1000000L,
      encBytes = 1455600L, thrLow = 1e6 / 7.0, thrFull = 5e5,
      efficiency = 0.7, spinEff = 0.75, lowCpus = 8, cpus = 32,
      pipeSummary = summary, pipeSecs = 3.0, isolation = "taskset-child-jvm",
      queryReps = Seq("q1" -> Seq(0.6, 0.5, 2.0), "q2" -> Seq(1.25)),
      pipelineReps = Seq(3.5, 3.0, 9.75), passSpin = Seq(0.04, 0.05, 0.12))
    val row = spark.read.json(Seq(json).toDS).collect()(0)
    val d = row.getAs[org.apache.spark.sql.Row]("queries")
    assert(d.getAs[Double]("q1") == 0.5 && d.getAs[Double]("encode_pipeline") == 3.0)
    assert(row.getAs[scala.collection.Seq[String]]("errors").toSeq == Seq("q3"))
    assert(row.getAs[Long]("tokens") == 1000000L)
    assert(row.getAs[org.apache.spark.sql.Row]("scaling")
      .getAs[Double]("normalized_efficiency") == 0.933)
    // round-5 volatility fields: the per-rep trail behind each best-of and
    // the per-pass machine spin samples survive the JSON roundtrip
    assert(row.getAs[org.apache.spark.sql.Row]("query_reps")
      .getAs[scala.collection.Seq[Double]]("q1").toSeq == Seq(0.6, 0.5, 2.0))
    assert(row.getAs[scala.collection.Seq[Double]]("pipeline_reps").toSeq
      == Seq(3.5, 3.0, 9.75))
    assert(row.getAs[scala.collection.Seq[Double]]("pass_spin").toSeq
      == Seq(0.04, 0.05, 0.12))
    // every-pipeline-rep-failed: fields go 0, encode_pipeline leaves the map
    val dead = Bench.benchJson(
      queryTimes = Seq("q1" -> 0.5), errors = Seq("encode_pipeline"),
      full = full, low = low, sfDir = "/tmp/sf", nTok = 1000000L,
      encBytes = 1455600L, thrLow = 1e6 / 7.0, thrFull = 5e5,
      efficiency = 0.7, spinEff = 0.75, lowCpus = 8, cpus = 32,
      pipeSummary = null, pipeSecs = Double.MaxValue, isolation = "in-process")
    val row2 = spark.read.json(Seq(dead).toDS).collect()(0)
    assert(!row2.getAs[org.apache.spark.sql.Row]("queries").schema
      .fieldNames.contains("encode_pipeline"))
    assert(row2.getAs[Number]("pipeline_tokens_per_sec").doubleValue == 0.0)
    assert(row2.getAs[scala.collection.Seq[String]]("errors").toSeq == Seq("encode_pipeline"))
  }
}
