package graft

import graft.api.App
import graft.examples.WordCount

/** Smoke-runs the README quickstart so the front door can never rot:
  * the example asserts internally that its streaming table converges
  * to its batch table, so a green run IS the contract.
  */
class ExamplesSpec extends SparkTestBase {

  test("WordCount quickstart runs end-to-end on the test corpus") {
    val app = new App(spark, "word-counts-spec")
    WordCount.run(app, sf)
  }

  test("TrainDataPipeline walkthrough runs end-to-end on the test corpus") {
    graft.examples.TrainDataPipeline.run(spark, sf)
  }

  test("EventAnalytics walkthrough runs end-to-end on the test corpus") {
    graft.examples.EventAnalytics.run(spark, sf)
  }

  test("WarehouseTour walkthrough runs end-to-end on the test corpus") {
    graft.examples.WarehouseTour.run(spark, sf)
  }

  test("LakeIngest walkthrough runs end-to-end on the test corpus") {
    graft.examples.LakeIngest.run(spark, sf)
  }
}
