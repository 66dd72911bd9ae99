package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the stream state-partition sizing law (Tuning.streamStatePartitions):
  * derived from INPUT bytes, clamped to [1, cores], and the conf wrapper
  * restores the session value — the r20 fix for core-count-proportional
  * state-store overhead on tiny-state streams.
  */
class TuningSpec extends AnyFunSuite with SparkSpec {

  test("streamStatePartitions: input-derived, clamped to [1, cores]") {
    val dir = java.nio.file.Files.createTempDirectory("tuning_spec").toFile
    try {
      // empty / tiny input → 1 partition regardless of core count
      assert(Tuning.streamStatePartitions(spark, dir.getAbsolutePath) == 1)
      java.nio.file.Files.write(
        new java.io.File(dir, "a.bin").toPath, new Array[Byte](1024))
      assert(Tuning.streamStatePartitions(spark, dir.getAbsolutePath) == 1)
      // a missing path behaves as empty (first-run staging races)
      assert(Tuning.streamStatePartitions(spark,
        dir.getAbsolutePath + "/nope") == 1)
      // the count never exceeds the session's core count, however big
      // the input claims to be (sparse file keeps the test cheap)
      val big = new java.io.RandomAccessFile(new java.io.File(dir, "big.bin"), "rw")
      try big.setLength(Tuning.StreamPartitionBytes * 1000)
      finally big.close()
      val cores = spark.sparkContext.defaultParallelism.max(1)
      assert(Tuning.streamStatePartitions(spark, dir.getAbsolutePath) == cores)
    } finally graft.sources.Sinks.deleteRecursively(dir.getAbsolutePath)
  }

  test("withStreamShuffle sets and restores spark.sql.shuffle.partitions") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val dir = java.nio.file.Files.createTempDirectory("tuning_spec2").toFile
    try {
      val inside = Tuning.withStreamShuffle(spark, dir.getAbsolutePath) {
        spark.conf.get(key)
      }
      assert(inside == "1") // empty dir → 1
      assert(spark.conf.get(key) == before) // restored
      // restores even when the body throws
      intercept[RuntimeException] {
        Tuning.withStreamShuffle(spark, dir.getAbsolutePath) {
          throw new RuntimeException("boom")
        }
      }
      assert(spark.conf.get(key) == before)
    } finally graft.sources.Sinks.deleteRecursively(dir.getAbsolutePath)
  }
}
