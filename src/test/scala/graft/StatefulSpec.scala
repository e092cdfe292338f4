package graft

import graft.streaming.Stateful
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.{Files, Paths}

class StatefulSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.local(4)

  // session is shared across suites in one forked JVM (getOrCreate) —
  // do NOT stop it here or concurrently-running suites lose their session
  override def afterAll(): Unit = ()

  test("mapGroupsWithState totals accumulate across drains via checkpointed state") {
    val in = Files.createTempDirectory("st_in_").toString
    val chk = Files.createTempDirectory("st_chk_").toString
    val out = Files.createTempDirectory("st_out_").toString
    val schema = StructType(Seq(
      StructField("key", LongType), StructField("v", DoubleType)))
    def drain(): Unit = {
      val q = Stateful.runningTotals(
          spark.readStream.schema(schema).json(in), "key", "v")
        .toDF()
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("batch", lit(id))
            .write.mode("append").parquet(s"$out/data")
        }
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Files.writeString(Paths.get(in, "b1.json"),
      """{"key":1,"v":2.0}
        |{"key":1,"v":3.0}
        |{"key":2,"v":10.0}""".stripMargin)
    drain()
    Files.writeString(Paths.get(in, "b2.json"),
      """{"key":1,"v":5.0}""")
    drain() // state restored from checkpoint → totals continue
    val rows = spark.read.parquet(s"$out/data").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val lastBatch = rows.map(_._4).max
    val finalKey1 = rows.filter(r => r._1 == 1L && r._4 == lastBatch).head
    assert(finalKey1._2 === 3L && finalKey1._3 === 10.0) // 2+3 then +5
    // key 2 untouched in batch 2 → emitted only in batch 1 with its total
    assert(rows.filter(_._1 == 2L).map(r => (r._2, r._3)).toSet === Set((1L, 10.0)))
  }

  test("transformWithState totals match mapGroupsWithState across drains (RocksDB store)") {
    val in = Files.createTempDirectory("tws_in_").toString
    val chk = Files.createTempDirectory("tws_chk_").toString
    val out = Files.createTempDirectory("tws_out_").toString
    val schema = StructType(Seq(
      StructField("key", LongType), StructField("v", DoubleType)))
    // TWS requires the RocksDB state store — session clone keeps the
    // provider override off the shared session
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      GraftSession.RocksDbProvider)
    def drain(): Unit = {
      val q = Stateful.runningTotalsTws(
          ss.readStream.schema(schema).json(in), "key", "v")
        .toDF()
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("batch", lit(id))
            .write.mode("append").parquet(s"$out/data")
        }
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Files.writeString(Paths.get(in, "b1.json"),
      """{"key":1,"v":2.0}
        |{"key":1,"v":3.0}
        |{"key":2,"v":10.0}""".stripMargin)
    drain()
    Files.writeString(Paths.get(in, "b2.json"),
      """{"key":1,"v":5.0}""")
    drain() // RocksDB state restored from checkpoint → totals continue
    val rows = ss.read.parquet(s"$out/data").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val lastBatch = rows.map(_._4).max
    val finalKey1 = rows.filter(r => r._1 == 1L && r._4 == lastBatch).head
    assert(finalKey1._2 === 3L && finalKey1._3 === 10.0)
    assert(rows.filter(_._1 == 2L).map(r => (r._2, r._3)).toSet === Set((1L, 10.0)))
  }

  test("null-key/null-ts rows are dropped, observed, and never wedge the query") {
    // Pre-r10 there was no null filter: a null key hit the primitive
    // tuple encoder (runningTotals) / ts.getTime (sessionize) and KILLED
    // the query — and checkpoint replay re-killed it on every restart.
    // This drain FAILS on that code. The drop must also be visible:
    // observedMetrics carries a per-batch dropped_rows count (ADVICE r10).
    val schema = StructType(Seq(
      StructField("key", LongType), StructField("ts", TimestampType),
      StructField("v", DoubleType)))

    // runningTotals: null key among good rows
    val rtIn = Files.createTempDirectory("nullrt_in_").toString
    val rtChk = Files.createTempDirectory("nullrt_chk_").toString
    val rtOut = Files.createTempDirectory("nullrt_out_").toString
    Files.writeString(Paths.get(rtIn, "b1.json"),
      """{"key":1,"v":2.0}
        |{"key":null,"v":99.0}
        |{"key":1,"v":3.0}""".stripMargin)
    val rtQ = Stateful.runningTotals(
        spark.readStream.schema(StructType(schema.take(1) :+ schema(2))).json(rtIn),
        "key", "v")
      .toDF()
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(s"$rtOut/data")
      }
      .option("checkpointLocation", rtChk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    rtQ.awaitTermination()
    val rtRows = spark.read.parquet(s"$rtOut/data").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rtRows.toSet === Set((1L, 2L, 5.0))) // null-key row excluded
    val rtDropped = rtQ.recentProgress
      .flatMap(p => Option(p.observedMetrics.get("graft_totals_dropped")))
      .map(_.getAs[Long]("dropped_rows")).sum
    assert(rtDropped === 1L)

    // sessionize: null ts among good rows
    val ssIn = Files.createTempDirectory("nullss_in_").toString
    val ssChk = Files.createTempDirectory("nullss_chk_").toString
    val ssOut = Files.createTempDirectory("nullss_out_").toString
    Files.writeString(Paths.get(ssIn, "b1.json"),
      """{"key":4,"ts":"2025-01-01T10:00:00.000Z","v":1.0}
        |{"key":4,"ts":null,"v":50.0}
        |{"key":null,"ts":"2025-01-01T10:01:00.000Z","v":60.0}""".stripMargin)
    def ssDrain(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = Stateful.sessionize(
          spark.readStream.schema(schema).json(ssIn),
          "key", "ts", "v", gapMs = 10 * 60 * 1000)
        .toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(s"$ssOut/data")
        }
        .option("checkpointLocation", ssChk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
    val ssQ1 = ssDrain()
    val ssDropped = ssQ1.recentProgress
      .flatMap(p => Option(p.observedMetrics.get("graft_sessionize_dropped")))
      .map(_.getAs[Long]("dropped_rows")).sum
    assert(ssDropped === 2L) // one null ts + one null key
    // close the session via watermark advance, then assert only the good row
    Files.writeString(Paths.get(ssIn, "b2.json"),
      """{"key":99,"ts":"2025-01-01T13:00:00.000Z","v":0.1}""")
    ssDrain(); ssDrain()
    val sess = spark.read.parquet(s"$ssOut/data")
      .where(col("key") === 4).collect()
    assert(sess.length === 1)
    assert(sess.head.getAs[Long]("n") === 1 &&
      sess.head.getAs[Double]("total") === 1.0)
  }

  test("sessionizer: out-of-order merge extends session start backwards") {
    val in = Files.createTempDirectory("sessoo_in_").toString
    val chk = Files.createTempDirectory("sessoo_chk_").toString
    val out = Files.createTempDirectory("sessoo_out_").toString
    val schema = StructType(Seq(
      StructField("key", LongType), StructField("ts", TimestampType),
      StructField("v", DoubleType)))
    def drain(): Unit = {
      val q = Stateful.sessionize(
          spark.readStream.schema(schema).json(in),
          "key", "ts", "v", gapMs = 10 * 60 * 1000)
        .toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(s"$out/data")
        }
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1 opens the session at 10:05 (watermark after it: 10:04)
    Files.writeString(Paths.get(in, "b1.json"),
      """{"key":3,"ts":"2025-01-01T10:05:00.000Z","v":1.0}""")
    drain()
    // batch 2: cross-batch OUT-OF-ORDER event at 10:04:30 — above the
    // watermark, within the gap → merges and must pull start BACK
    Files.writeString(Paths.get(in, "b2.json"),
      """{"key":3,"ts":"2025-01-01T10:04:30.000Z","v":2.0}""")
    drain()
    // advance the watermark far past end+gap → timeout emits the session
    Files.writeString(Paths.get(in, "b3.json"),
      """{"key":99,"ts":"2025-01-01T13:00:00.000Z","v":0.1}""")
    drain()
    drain()
    val s3 = spark.read.parquet(s"$out/data")
      .where(col("key") === 3).collect()
    assert(s3.length === 1)
    val r = s3.head
    assert(r.getAs[Long]("n") === 2 && r.getAs[Double]("total") === 3.0)
    assert(r.getAs[java.sql.Timestamp]("start").toInstant.toString
      === "2025-01-01T10:04:30Z")
    assert(r.getAs[java.sql.Timestamp]("end").toInstant.toString
      === "2025-01-01T10:05:00Z")
  }

  test("sessionizer: cross-batch event beyond the gap splits; within-gap event bridges two sessions") {
    // The single-session state this replaced merged ANY above-watermark
    // out-of-order event into the open session (ts - end < gap, even
    // with ts far BEFORE start - gap), so session assignment depended
    // on which micro-batch delivered the event. The interval contract:
    // same event set + same watermark ⇒ same sessions, however batches
    // slice the arrivals.
    val in = Files.createTempDirectory("sesssp_in_").toString
    val chk = Files.createTempDirectory("sesssp_chk_").toString
    val out = Files.createTempDirectory("sesssp_out_").toString
    val schema = StructType(Seq(
      StructField("key", LongType), StructField("ts", TimestampType),
      StructField("v", DoubleType)))
    def drain(): Unit = {
      val q = Stateful.sessionize(
          spark.readStream.schema(schema).json(in),
          "key", "ts", "v", gapMs = 10 * 60 * 1000,
          watermarkDelay = "2 hours") // admit deep out-of-order arrivals
        .toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(s"$out/data")
        }
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // key 5: open session at 12:00. key 6: two standing sessions 18 min
    // apart (11:42, 12:00). Watermark after the batch: 10:00.
    Files.writeString(Paths.get(in, "b1.json"),
      """{"key":5,"ts":"2025-01-01T12:00:00.000Z","v":1.0}
        |{"key":6,"ts":"2025-01-01T11:42:00.000Z","v":1.0}
        |{"key":6,"ts":"2025-01-01T12:00:00.000Z","v":2.0}""".stripMargin)
    drain()
    // key 5's 10:30 is 90 min before the open session — above the
    // watermark but beyond the gap: a SEPARATE session, not a merge.
    // key 6's 11:51 is within the gap of both standing sessions — they
    // must merge transitively into one.
    Files.writeString(Paths.get(in, "b2.json"),
      """{"key":5,"ts":"2025-01-01T10:30:00.000Z","v":7.0}
        |{"key":6,"ts":"2025-01-01T11:51:00.000Z","v":4.0}""".stripMargin)
    drain()
    // push the watermark past every end + gap → all sessions emit
    Files.writeString(Paths.get(in, "b3.json"),
      """{"key":99,"ts":"2025-01-01T18:00:00.000Z","v":0.1}""")
    drain()
    drain()
    val got = spark.read.parquet(s"$out/data")
      .where(col("key").isin(5, 6)).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"),
        r.getAs[Double]("total"),
        r.getAs[java.sql.Timestamp]("start").toInstant.toString,
        r.getAs[java.sql.Timestamp]("end").toInstant.toString)).toSet
    assert(got === Set(
      (5L, 1L, 7.0, "2025-01-01T10:30:00Z", "2025-01-01T10:30:00Z"),
      (5L, 1L, 1.0, "2025-01-01T12:00:00Z", "2025-01-01T12:00:00Z"),
      (6L, 3L, 7.0, "2025-01-01T11:42:00Z", "2025-01-01T12:00:00Z")))
  }

  test("observe-name override lets two Stateful instances compose in one plan") {
    // Two instances of one helper in a single plan carry two
    // CollectMetrics nodes; checkAnalysis rejects duplicate metric
    // names over different children, so the fixed default names made
    // the helpers non-composable. metricName exists exactly for this.
    import spark.implicits._
    val a = Seq((1L, 2.0), (1L, 3.0)).toDF("key", "v")
    val b = Seq((2L, 10.0)).toDF("key", "v")
    // analysis is eager at union(): the duplicate name throws here
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Stateful.runningTotals(a, "key", "v").toDF
        .union(Stateful.runningTotals(b, "key", "v").toDF)
        .collect()
    }
    val ok = Stateful.runningTotals(a, "key", "v").toDF
      .union(Stateful.runningTotals(b, "key", "v",
        metricName = "graft_totals_dropped_b").toDF)
    assert(ok.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      === Set((1L, 2L, 5.0), (2L, 1L, 10.0)))
  }

  test("flatMapGroupsWithState sessionizer emits completed sessions on gap/timeout") {
    val in = Files.createTempDirectory("sess_in_").toString
    val chk = Files.createTempDirectory("sess_chk_").toString
    val out = Files.createTempDirectory("sess_out_").toString
    val schema = StructType(Seq(
      StructField("key", LongType), StructField("ts", TimestampType),
      StructField("v", DoubleType)))
    def drain(): Unit = {
      val src = spark.readStream.schema(schema).json(in)
      val q = graft.streaming.Stateful
        .sessionize(src, "key", "ts", "v", gapMs = 10 * 60 * 1000)
        .toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(s"$out/data")
        }
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // one key, two bursts separated by > gap INSIDE one batch → first
    // session completes immediately; second stays open in state
    Files.writeString(Paths.get(in, "b1.json"),
      """{"key":7,"ts":"2025-01-01T10:00:00.000Z","v":1.0}
        |{"key":7,"ts":"2025-01-01T10:05:00.000Z","v":2.0}
        |{"key":7,"ts":"2025-01-01T11:00:00.000Z","v":5.0}""".stripMargin)
    drain()
    val afterB1 = spark.read.parquet(s"$out/data").collect()
    assert(afterB1.length === 1)
    assert(afterB1.head.getAs[Long]("n") === 2 && afterB1.head.getAs[Double]("total") === 3.0)
    // advance the watermark far past 11:00+gap → event-time timeout
    // fires for the open session on the next drains
    Files.writeString(Paths.get(in, "b2.json"),
      """{"key":9,"ts":"2025-01-01T13:00:00.000Z","v":0.5}""")
    drain()
    drain() // timeout processed once the committed watermark advances
    val all = spark.read.parquet(s"$out/data").collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"), r.getAs[Double]("total")))
    assert(all.contains((7L, 1L, 5.0))) // the 11:00 session, closed by timeout
  }

  // The heaviest stateful operator (watermarked stream-stream LEFT
  // OUTER interval join, q58's shape) must produce IDENTICAL results on
  // the local heap state store and the cluster backend
  // (GraftSession.clusterBuilder: RocksDB + changelog checkpointing) —
  // the posture split changes where state lives, never what it holds.
  test("stream-stream left outer join: heap and RocksDB state stores agree") {
    val in = Files.createTempDirectory("ssj_in_").toString
    // main batch, then a far-future batch that advances both watermarks
    // past every left row so unmatched purchases drain their null row
    Files.writeString(Paths.get(in, "000_main.json"),
      """{"ts":"2025-01-01T10:00:00.000Z","user":1,"kind":"click","v":0.0}
        |{"ts":"2025-01-01T10:20:00.000Z","user":1,"kind":"purchase","v":5.0}
        |{"ts":"2025-01-01T10:30:00.000Z","user":2,"kind":"purchase","v":7.0}
        |{"ts":"2025-01-01T09:00:00.000Z","user":3,"kind":"click","v":0.0}
        |{"ts":"2025-01-01T12:00:00.000Z","user":3,"kind":"purchase","v":9.0}"""
        .stripMargin)
    Files.writeString(Paths.get(in, "001_sentinel.json"),
      """{"ts":"2025-01-02T00:00:00.000Z","user":-1,"kind":"click","v":0.0}
        |{"ts":"2025-01-02T00:00:00.000Z","user":-1,"kind":"purchase","v":0.0}"""
        .stripMargin)
    Paths.get(in, "001_sentinel.json").toFile
      .setLastModified(Paths.get(in, "000_main.json").toFile.lastModified + 60000)
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("user", LongType),
      StructField("kind", StringType), StructField("v", DoubleType)))
    def drain(rocks: Boolean): Set[(Long, Double, Boolean)] = {
      val chk = Files.createTempDirectory("ssj_chk_").toString
      val out = Files.createTempDirectory("ssj_out_").toString
      val ss = spark.newSession()
      if (rocks)
        GraftSession.RocksDbStateStoreConfigs
          .foreach { case (k, v) => ss.conf.set(k, v) }
      def src = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(in)
      val clicks = src.filter(col("kind") === "click")
        .select(col("user").as("c_user"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = src.filter(col("kind") === "purchase")
        .select(col("user").as("p_user"), col("ts").as("p_ts"),
          col("v").as("p_v"))
        .withWatermark("p_ts", "1 hour")
      val q = purchases.join(clicks,
          col("p_user") === col("c_user")
            && col("c_ts") <= col("p_ts")
            && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
          "leftOuter")
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(s"$out/data")
        }
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.read.parquet(s"$out/data").filter(col("p_user") >= 0).collect()
        .map(r => (r.getAs[Long]("p_user"), r.getAs[Double]("p_v"),
          r.isNullAt(r.fieldIndex("c_user")))).toSet
    }
    val heap = drain(rocks = false)
    val rocks = drain(rocks = true)
    // expected: user 1 matched (click 20 min before), users 2 and 3
    // unmatched (no click / click outside the 1 h interval) → null row
    assert(heap === Set((1L, 5.0, false), (2L, 7.0, true), (3L, 9.0, true)))
    assert(rocks === heap)
  }
}
