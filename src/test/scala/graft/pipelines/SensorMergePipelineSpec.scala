package graft.pipelines

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SensorMergePipelineSpec extends SparkSpec {

  private def tmpDir(): Path = Files.createTempDirectory("sensors")

  private def write(dir: Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  // FIXTURES A1: BOM header, verbose timestamp column name, per-file
  // calibrated column variants
  private val bom = "﻿"

  test("readNormalized: BOM header, timestamp rename+parse, keep-last dedupe, double coercion") {
    val d = tmpDir()
    val p = write(d, "Kitchen (1)_export_202511210053.csv",
      s"""${bom}Timestamp for sample frequency every 1 min min,Temperature_Celsius,Relative_Humidity
         |2025-11-20 01:01:00,14.5,65.6
         |2025-11-20 01:02:00,14.6,65.0
         |2025-11-20 01:02:00,14.7,64.9
         |bad-timestamp,1.0,2.0
         |""".stripMargin)
    val df = SensorMergePipeline.readNormalized(spark, p).get
    assert(df.columns.toSeq == Seq("Timestamp", "Temperature_Celsius", "Relative_Humidity"))
    val rows = df.orderBy("Timestamp").collect()
    assert(rows.length == 2) // null ts dropped, dup keeps last
    assert(rows(1).getAs[Double]("Temperature_Celsius") == 14.7)
  }

  test("readNormalized: file without a timestamp-like column is skipped") {
    val d = tmpDir()
    val p = write(d, "x_export_202511210000.csv", "a,b\n1,2\n")
    assert(SensorMergePipeline.readNormalized(spark, p).isEmpty)
  }

  test("merge: overlap fill, conflict column '!A! col' (pandas spelling), new column appended") {
    val d = tmpDir()
    write(d, "S_export_202511210000.csv",
      s"""${bom}Timestamp,Temp
         |2025-11-20 01:00:00,10.0
         |2025-11-20 01:01:00,11.0
         |""".stripMargin)
    write(d, "S_export_202511220000.csv",
      s"""${bom}Timestamp,Temp,Hum
         |2025-11-20 01:01:00,99.0
         |2025-11-20 01:02:00,12.0,60.0
         |""".stripMargin)
    val merged = SensorMergePipeline.run(spark, d.toString)("S")
    assert(merged.columns.toSeq == Seq("Timestamp", "Temp", "Hum", "!A! Temp"))
    val rows = merged.collect()
    assert(rows.length == 3)
    val r1 = rows(1)
    assert(r1.getAs[Double]("Temp") == 11.0) // base wins
    assert(r1.getAs[Double]("!A! Temp") == 99.0) // conflicting incoming value materialized
    assert(rows(2).getAs[Double]("Hum") == 60.0) // new column
    assert(rows(0).isNullAt(rows(0).fieldIndex("!A! Temp")))
  }

  test("merge: within-tolerance differences are NOT conflicts; prefix letter advances only on conflict") {
    val d = tmpDir()
    write(d, "S_export_202511210000.csv",
      s"${bom}Timestamp,Temp\n2025-11-20 01:00:00,10.0\n")
    // within np.isclose tolerance: 10.0 vs 10.00009 (rtol 1e-5)
    write(d, "S_export_202511220000.csv",
      s"${bom}Timestamp,Temp\n2025-11-20 01:00:00,10.00009\n")
    // real conflict → should get prefix A (not B), since file 2 consumed none
    write(d, "S_export_202511230000.csv",
      s"${bom}Timestamp,Temp\n2025-11-20 01:00:00,20.0\n")
    val merged = SensorMergePipeline.run(spark, d.toString)("S")
    assert(merged.columns.count(_.startsWith("!")) == 1)
    assert(merged.columns.contains("!A! Temp"))
  }

  test("finalize: all-null columns dropped, conflict columns sorted last") {
    val d = tmpDir()
    write(d, "S_export_202511210000.csv",
      s"${bom}Timestamp,Temp,Ghost\n2025-11-20 01:00:00,10.0,\n2025-11-20 01:01:00,11.0,\n")
    val merged = SensorMergePipeline.run(spark, d.toString)("S")
    assert(!merged.columns.contains("Ghost"))
  }

  test("discover groups by sensor regex and orders by export timestamp") {
    val d = tmpDir()
    write(d, "A (1)_export_202511220000.csv", "x")
    write(d, "A (1)_export_202511210000.csv", "x")
    write(d, "B_export_202511210000.csv", "x")
    write(d, "not-matching.csv", "x")
    val g = SensorMergePipeline.discover(d.toString)
    assert(g.keySet == Set("A (1)", "B"))
    assert(g("A (1)").map(p => p.substring(p.length - 16)) ==
      Seq("202511210000.csv", "202511220000.csv"))
  }

  private def assertSameFrame(a: org.apache.spark.sql.DataFrame,
                              b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"row content differs: ${a.exceptAll(b).take(3).mkString(";")}")
    assert(a.count() == b.count())
  }

  test("property: mergeAllUnioned ≡ sequential fold (conflict-free inputs)") {
    val d = tmpDir()
    val ps = Seq(
      write(d, "S_export_202511210000.csv",
        s"${bom}Timestamp,Temp\n2025-11-20 01:00:00,10.0\n2025-11-20 01:01:00,11.0\n"),
      write(d, "S_export_202511220000.csv",
        s"${bom}Timestamp,Temp,Hum\n2025-11-20 01:02:00,12.0,60.0\n"),
      write(d, "S_export_202511230000.csv",
        s"${bom}Timestamp,Hum\n2025-11-20 01:03:00,61.0\n"))
    val frames = ps.flatMap(p => SensorMergePipeline.readNormalized(spark, p))
    val fold = SensorMergePipeline.finalize(SensorMergePipeline.mergeSensor(spark, ps).get)
    val union = SensorMergePipeline.finalize(SensorMergePipeline.mergeAllUnioned(frames))
    assertSameFrame(fold, union)
  }

  test("property: mergeAllUnioned ≡ sequential fold (conflicts, letters, fill)") {
    val d = tmpDir()
    val ps = Seq(
      write(d, "S_export_202511210000.csv",
        s"${bom}Timestamp,Temp\n2025-11-20 01:00:00,10.0\n2025-11-20 01:01:00,11.0\n"),
      // within tolerance → no conflict, no letter consumed
      write(d, "S_export_202511220000.csv",
        s"${bom}Timestamp,Temp\n2025-11-20 01:00:00,10.00009\n"),
      // real conflict on 01:01 → '!A! Temp'; fills 01:02
      write(d, "S_export_202511230000.csv",
        s"${bom}Timestamp,Temp,Hum\n2025-11-20 01:01:00,99.0,55.0\n2025-11-20 01:02:00,12.0,56.0\n"),
      // second conflicting file → '!B! Temp'
      write(d, "S_export_202511240000.csv",
        s"${bom}Timestamp,Temp\n2025-11-20 01:02:00,77.0\n"))
    val frames = ps.flatMap(p => SensorMergePipeline.readNormalized(spark, p))
    val fold = SensorMergePipeline.finalize(SensorMergePipeline.mergeSensor(spark, ps).get)
    val union = SensorMergePipeline.finalize(SensorMergePipeline.mergeAllUnioned(frames))
    assert(fold.columns.toSeq == Seq("Timestamp", "Temp", "Hum", "!A! Temp", "!B! Temp"))
    assertSameFrame(fold, union)
  }

  test("property: mergeAllUnioned ≡ fold on randomized file sets (overlaps, conflicts, ragged schemas)") {
    val rnd = new scala.util.Random(1234)
    val tsPool = (0 until 6).map(i => f"2025-11-20 01:0$i:00")
    val colPool = Seq("A", "B", "C")
    // values engineered to exercise every predicate branch: exact match,
    // within-tolerance (1e-6 rel), real conflict, missing
    val valPool = Seq("1.0", "1.000001", "2.0", "5.5", "")
    (1 to 8).foreach { trial =>
      val d = tmpDir()
      val nFiles = 3 + rnd.nextInt(3)
      val ps = (0 until nFiles).map { f =>
        val cols = colPool.filter(_ => rnd.nextBoolean()) match {
          case Nil => Seq("A")
          case cs => cs
        }
        val rows = tsPool.filter(_ => rnd.nextBoolean()).map { t =>
          (Seq(t) ++ cols.map(_ => valPool(rnd.nextInt(valPool.length)))).mkString(",")
        }
        write(d, f"S_export_20251121000$f.csv",
          s"$bom${(Seq("Timestamp") ++ cols).mkString(",")}\n${rows.mkString("\n")}\n")
      }
      val frames = ps.flatMap(p => SensorMergePipeline.readNormalized(spark, p))
      if (frames.nonEmpty) {
        val fold = SensorMergePipeline.finalize(SensorMergePipeline.mergeSensor(spark, ps).get)
        val union = SensorMergePipeline.finalize(SensorMergePipeline.mergeAllUnioned(frames))
        withClue(s"trial $trial (files=$nFiles): ") { assertSameFrame(fold, union) }
      }
    }
  }

  test("driver-side header parse is byte-identical to spark.read's on every sensor's headers") {
    // one file per sensor covers every header shape in the corpus (BOM,
    // NBSP names, leading-space name, CRLF); equality here is what makes
    // the explicit-schema fast path safe
    val firsts = SensorMergePipeline.discover("/root/reference/data").values.map(_.head)
    assert(firsts.nonEmpty)
    firsts.foreach { path =>
      val inferred = spark.read.option("header", "true").csv(path).columns.toSeq
      val manual = SensorMergePipeline.readNormalized(spark, path).get.columns.toSeq
      // readNormalized renames the ts-matching column in place; apply the
      // same rename to the inferred names and compare byte-for-byte
      val expected = inferred.map(c =>
        if (c.toLowerCase.contains("timestamp")) "Timestamp" else c)
      assert(manual == expected, s"header mismatch for $path")
    }
  }

  test("splitCsvHeader: quoted fields, escaped quotes, embedded separators") {
    assert(SensorMergePipeline.splitCsvHeader("a,b,c") == Seq("a", "b", "c"))
    assert(SensorMergePipeline.splitCsvHeader("\"a,x\",b") == Seq("a,x", "b"))
    assert(SensorMergePipeline.splitCsvHeader("\"a\"\"q\",b") == Seq("a\"q", "b"))
    assert(SensorMergePipeline.splitCsvHeader("a,,c") == Seq("a", "", "c"))
  }

  test("smoke: one real reference sensor merges green with plausible shape") {
    val groups = SensorMergePipeline.discover("/root/reference/data")
    assert(groups.nonEmpty)
    val (sensor, paths) = groups.minBy(_._1)
    val merged = SensorMergePipeline.finalize(
      SensorMergePipeline.mergeSensor(spark, paths).get)
    val n = merged.count()
    info(s"sensor=$sensor files=${paths.length} rows=$n cols=${merged.columns.length}")
    assert(n > 1000) // ~7 daily exports of 1-minute samples
    assert(merged.columns.head == "Timestamp")
    // timestamps unique after merge
    assert(merged.select("Timestamp").distinct().count() == n)
  }
}
