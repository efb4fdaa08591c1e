package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Bounded-wait probe reads: a lost listener completion event must
  * time out WITHOUT parking a thread (the pre-r14 implementation
  * abandoned a Future whose thread stayed blocked in Observation.get
  * forever — one leaked global-EC thread per lost event). */
class CheckpointsSpec extends SparkSuite {

  test("metric reads an observed value when the event fired") {
    val obs = Observation()
    val df = spark.range(100).observe(obs, sum(col("id")).as("s"))
    df.localCheckpoint(eager = true) // action fires the observation
    assert(Checkpoints.metric(obs, "s").contains(100L * 99 / 2))
    assert(Checkpoints.metric(obs, "no_such_key").isEmpty)
  }

  test("dropped completion event: repeated timeouts keep thread count bounded") {
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
    // a never-registered Observation's promise never completes —
    // exactly the shape of a dropped listener event
    val before = mx.getThreadCount
    (1 to 25).foreach { _ =>
      val orphan = Observation()
      assert(Checkpoints.metric(orphan, "x", timeoutMs = 20L).isEmpty)
    }
    val after = mx.getThreadCount
    // the old Future-abandonment leaked >= 1 thread per probe (25 here);
    // the timed Await on the promise's future leaks zero. Allow slack
    // for unrelated JVM/Spark background threads starting meanwhile.
    assert(after - before <= 5,
      s"thread count grew by ${after - before} across 25 timed-out probes")
  }
}
