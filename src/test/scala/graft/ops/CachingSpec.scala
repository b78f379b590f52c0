package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

class CachingSpec extends SparkSpec {
  import spark.implicits._

  test("CheckpointWindow.release drops trailing cached rounds, keeps the kept frame") {
    val win = new Caching.CheckpointWindow(every = 10) // never checkpoints here
    var df = (0 until 20).toDF("x")
    val rounds = (1 to 3).map { _ =>
      df = win.advance(df.withColumn("x", col("x") + 1)); df
    }
    assert(rounds.forall(_.storageLevel != StorageLevel.NONE),
      "rounds inside the window are lazily cached")
    win.release(rounds.last)
    assert(rounds.init.forall(_.storageLevel == StorageLevel.NONE),
      "superseded rounds must be unpersisted by release()")
    assert(rounds.last.storageLevel != StorageLevel.NONE,
      "the kept frame's cache must survive")
    // the kept frame still evaluates correctly after ancestors released
    assert(rounds.last.agg(sum("x")).as[Long].head() == (0 until 20).map(_ + 3).sum)
    win.release(null) // nothing outlives: drop the kept frame too
    assert(rounds.last.storageLevel == StorageLevel.NONE)
  }

  test("release(null) after a checkpointed round leaves the checkpoint usable") {
    val win = new Caching.CheckpointWindow(every = 2)
    var df = (0 until 10).toDF("x")
    df = win.advance(df.withColumn("x", col("x") * 2)) // cached
    df = win.advance(df.withColumn("x", col("x") + 1)) // checkpointed (2nd)
    val kept = df
    win.release(kept) // no trailing cached rounds; must not touch the cp
    assert(kept.agg(sum("x")).as[Long].head() == (0 until 10).map(_ * 2 + 1).sum)
  }
}
