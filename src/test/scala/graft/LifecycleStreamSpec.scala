package graft

/** Multi-quantity carried state: the streaming lifecycle and
  * multi-threshold twins must reproduce their batch operators
  * bit-for-bit across time-sliced triggers.
  */
class LifecycleStreamSpec extends SparkSpec {

  test("streamed automation lifecycle equals the batch operator bit-for-bit") {
    val streamed = graft.streaming.LifecycleStream
      .streamAutomationLifecycle(spark, sfDir).collect()
    val batch = graft.operators.Sessions.automationLifecycle(spark, sfDir).collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(streamed.nonEmpty)
  }

  test("streamed multi-threshold watch equals the batch operator bit-for-bit") {
    val streamed = graft.streaming.LifecycleStream
      .streamMultiThreshold(spark, sfDir).collect()
    val batch = graft.operators.Sessions.multiThreshold(spark, sfDir).collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(streamed.nonEmpty)
  }
}
