package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata schema-drift canary (VERDICT r10 item 2).
  *
  * Round 10 ended with two dead queries because the driver silently
  * regenerated `events.parquet` with a different physical timestamp
  * encoding (`timestamp[us]`-NTZ instead of TIMESTAMP(NANOS)), and the
  * engine's nanos-as-long guard no longer fired — `unix_micros(ts)` threw
  * DATATYPE_MISMATCH at analysis. This suite turns the NEXT silent
  * regeneration into a one-line diagnosis:
  *
  *  1. opens every table in the LIVE sf0.001 dir and asserts each column
  *     resolves to the engine's supported type set, naming the drifted
  *     column/encoding on failure;
  *  2. asserts `unix_micros(ts)` analyzes on the live events table;
  *  3. pins [[Tables]]' ts normalization for ALL THREE encodings the
  *     testdata has shipped with (nanos-as-long, timestamp[us] NTZ,
  *     timestamp[us] UTC) — same wall-clock in, same epoch micros out —
  *     so the normalization cannot regress for any one of them.
  */
class TestdataCanarySpec extends SparkSpec {

  private val liveDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
    "/root/testdata/sf0.001")

  /** Types every downstream operator knows how to consume. Timestamps are
    * only allowed POST-normalization (TimestampType); [[Tables]] is
    * responsible for getting each raw encoding there. */
  private val supported: DataType => Boolean = {
    case _: IntegerType | _: LongType | _: DoubleType | _: FloatType |
        _: StringType | _: BooleanType | _: DateType | _: TimestampType |
        _: BinaryType => true
    case _: DecimalType => true
    case ArrayType(e, _) => supported(e)
    case _ => false
  }

  test("canary: every live table column resolves to a supported type") {
    assume(Files.exists(Paths.get(liveDir)), s"no live testdata at $liveDir")
    val drifted = Tables.names.flatMap { t =>
      Tables(spark, liveDir, t).schema.fields.collect {
        case f if !supported(f.dataType) =>
          s"$t.${f.name} reads as ${f.dataType.sql} — unsupported encoding; " +
            "extend graft.Tables' normalization for this testdata drift"
      }
    }
    assert(drifted.isEmpty, drifted.mkString("\n"))
  }

  test("canary: unix_micros(ts) analyzes on the live events table") {
    assume(Files.exists(Paths.get(liveDir)), s"no live testdata at $liveDir")
    val e = Tables(spark, liveDir, "events")
    assert(e.schema("ts").dataType == TimestampType,
      s"events.ts normalized to ${e.schema("ts").dataType.sql}, " +
        "expected TIMESTAMP — Tables' encoding guard did not fire")
    // analysis (not execution) is what died in round 10 — force it
    val analyzed = e.select(unix_micros(col("ts")).as("us"))
    assert(analyzed.schema("us").dataType == LongType)
    assert(analyzed.limit(1).count() <= 1)
  }

  test("Tables normalizes all three shipped ts encodings to identical micros") {
    import spark.implicits._
    val wall = "2024-03-01 12:34:56.789"
    // expected epoch micros + fixture instant, both tz-proof (computed from
    // the UTC wall-clock, independent of the JVM default zone)
    val instant = java.time.LocalDateTime.parse(wall.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
    val micros = instant.toEpochMilli * 1000L

    def fixture(write: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
      val base = Seq(
        Ev(1L, java.sql.Timestamp.from(instant), 7L, "view", 1.0, "{}")).toDF
      fixtureDir("events" -> write(base))
    }

    // encoding 1: TIMESTAMP(NANOS) — reaches the engine as a raw Long via
    // the legacy nanos-as-long conf; emulate with an int64 nanos column
    // (same LongType code path in Tables).
    val nanosDir = fixture(df =>
      df.withColumn("ts", (unix_micros($"ts") * 1000L).cast(LongType)))
    // encoding 2: timestamp[us] without tz (pandas/arrow NTZ) → TIMESTAMP_NTZ
    val ntzDir = fixture(df =>
      df.withColumn("ts", $"ts".cast(TimestampNTZType)))
    // encoding 3: timestamp[us] UTC-adjusted → TIMESTAMP (normal form)
    val utcDir = fixture(identity)

    val got = Seq("nanos" -> nanosDir, "ntz" -> ntzDir, "utc" -> utcDir)
      .map { case (label, dir) =>
        val e = Tables(spark, dir, "events")
        assert(e.schema("ts").dataType == TimestampType,
          s"$label: normalized to ${e.schema("ts").dataType.sql}")
        label -> e.select(unix_micros($"ts")).as[Long].head()
      }.toMap
    assert(got.values.toSet.size == 1,
      s"encodings disagree on epoch micros: $got")
    assert(got("utc") == micros, s"expected $micros, got ${got("utc")}")
  }

  test("Tables rejects an unknown ts encoding with a named diagnosis") {
    import spark.implicits._
    val dir = fixtureDir("events" ->
      Seq(Ev(1L, ts("2024-03-01 00:00:00"), 7L, "view", 1.0, "{}")).toDF
        .withColumn("ts", date_format($"ts", "yyyy-MM-dd")))
    val ex = intercept[IllegalStateException](Tables(spark, dir, "events"))
    assert(ex.getMessage.contains("events.ts"))
  }
}
