package graft

/** Marks tests too slow for the default `sbt test` loop (minutes of
  * driver-side training, not seconds of Spark). Excluded by default in
  * build.sbt; run them with `GRAFT_RUN_SLOW=1 sbt test`. */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")
