package graft

import java.nio.file.Files
import graft.ops.Events
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streaming tumbling agg equals the batch result") {
    // stage a µs-timestamp copy (the raw testdata is TIMESTAMP(NANOS),
    // which the file stream source can't bind to a TIMESTAMP schema)
    val staged = Files.createTempDirectory("graft_stream").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(staged)

    val stream = EventStream.readEventStream(spark, staged)
    val q = EventStream.runOnce(EventStream.tumblingCounts(stream), "t_out")
    try {
      val streamed = spark.table("t_out")
        .orderBy("hour_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      val batch = Events.tumbling(spark, sf)
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }
}
