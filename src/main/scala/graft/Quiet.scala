package graft

/** Shutdown-noise hygiene for the driver-contract mains (Bench /
  * Verify): two WARN categories flood the capture tail of every run
  * that exercised streaming state —
  *  - `TimerStateImpl` WARNs once per orphaned timer while state
  *    stores unload ("Failed to delete timer … since it does not
  *    exist" — expected on transformWithState teardown);
  *  - the local-mode heartbeater (`Executor`) WARNs a full
  *    `awaitResult` stack trace when the session stops under it.
  * Both have swamped the per-round bench capture before (the r15
  * artifact lost its summary tail to exactly this). Drop ONLY those
  * two logger categories to ERROR; everything else keeps WARN, so a
  * real warning still surfaces. Tests do not call this — specs keep
  * the full WARN stream.
  */
object Quiet {
  def shutdownNoise(): Unit =
    Seq("org.apache.spark.sql.execution.streaming.operators.stateful" +
          ".transformwithstate.timers.TimerStateImpl",
        "org.apache.spark.executor.Executor").foreach { name =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        name, org.apache.logging.log4j.Level.ERROR)
    }
}
