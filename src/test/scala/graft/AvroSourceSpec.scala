package graft

import org.apache.spark.sql.functions._

/** graft.sources.AvroSource semantics beyond the q_src_avro oracle:
  * null handling through the ["null", T] union, writer-schema
  * inference, connector column pruning, and sync-marker split reads
  * (one big container file must fan out into many input partitions and
  * still read every block exactly once). */
class AvroSourceSpec extends SparkSuite {

  private def readAvro(path: String, opts: Map[String, String] = Map.empty) = {
    val r = spark.read.format("graft.sources.AvroSource")
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load(path)
  }

  test("nullable columns round-trip through the avro union and infer back nullable") {
    import spark.implicits._
    val dir = graft.ops.Util.managedTempDir("graft_avro_null_")
    val df = spark.range(0, 100)
      .select($"id",
        when($"id" % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("s"), $"id")).as("s"),
        when($"id" % 7 === 0, lit(null).cast("double"))
          .otherwise($"id".cast("double") / 4).as("d"))
    graft.sources.AvroIO.write(df, dir)
    val back = readAvro(dir)
    // inference maps the union back to a nullable field
    assert(back.schema("s").nullable && back.schema("d").nullable)
    assert(!back.schema("id").nullable)
    val got = back.orderBy($"id").collect()
    val exp = df.orderBy($"id").collect()
    assert(got.toSeq == exp.toSeq, "null round-trip diverged")
    assert(got.count(_.isNullAt(1)) == 34 && got.count(_.isNullAt(2)) == 15)
  }

  test("column pruning reaches the connector scan (pruned readSchema in the plan)") {
    import spark.implicits._
    val dir = graft.ops.Util.managedTempDir("graft_avro_prune_")
    graft.sources.AvroIO.write(
      spark.range(0, 1000).select($"id", ($"id" * 2).as("a"),
        concat(lit("x"), $"id").as("b")), dir)
    val q = readAvro(dir).select($"id", $"a")
    val scans = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScanExec for the avro read")
    val cols = scans.head.scan.readSchema().fieldNames.toSet
    assert(cols == Set("id", "a"),
      s"connector still reads unpruned columns: $cols")
    assert(q.agg(sum($"a")).head.getLong(0) == (0L until 1000L).map(_ * 2).sum)
  }

  test("temporal + float/boolean columns round-trip via avro logical types") {
    import spark.implicits._
    val dir = graft.ops.Util.managedTempDir("graft_avro_temporal_")
    val df = spark.range(0, 50)
      .select($"id",
        timestamp_micros($"id" * 1000000L + 1700000000000000L).as("ts"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")), $"id".cast("int")).as("d"),
        ($"id" % 2 === 0).as("b"),
        ($"id" / 8).cast("float").as("f"))
    graft.sources.AvroIO.write(df, dir)
    val back = readAvro(dir)
    import org.apache.spark.sql.types.{BooleanType, DateType, FloatType, TimestampType}
    assert(back.schema("ts").dataType == TimestampType, back.schema("ts").toString)
    assert(back.schema("d").dataType == DateType)
    assert(back.schema("b").dataType == BooleanType)
    assert(back.schema("f").dataType == FloatType)
    assert(back.orderBy($"id").collect().toSeq == df.orderBy($"id").collect().toSeq)
  }

  test("DSv2 write protocol: commit renames temps, append accumulates, overwrite truncates, no temp residue") {
    import spark.implicits._
    val dir = graft.ops.Util.managedTempDir("graft_avro_write_")
    def files() = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).map(_.getName).sorted.toSeq
    def n() = readAvro(dir).count()
    spark.range(0, 100).select($"id").write
      .format("graft.sources.AvroSource").mode("overwrite").save(dir)
    assert(files().forall(f => f.matches("part-\\d{5}\\.avro")),
      s"temp residue or foreign files after commit: ${files()}")
    assert(n() == 100)
    spark.range(100, 150).select($"id").write
      .format("graft.sources.AvroSource").mode("append").save(dir)
    assert(n() == 150, "append did not accumulate")
    spark.range(0, 7).select($"id").write
      .format("graft.sources.AvroSource").mode("overwrite").save(dir)
    assert(n() == 7, "overwrite did not truncate the previous file set")
    assert(files().forall(f => f.matches("part-\\d{5}\\.avro")), files().toString)
  }

  test("per-file schema resolution: a reordered-writer file reads by NAME, not position") {
    import spark.implicits._
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = graft.ops.Util.managedTempDir("graft_avro_evolve_")
    // file 1: our writer's order (id, v)
    spark.range(0, 10).select($"id", ($"id" * 100).as("v")).write
      .format("graft.sources.AvroSource").mode("overwrite").save(dir)
    // file 2: same record name + fields, REVERSED order (v, id), written
    // with the raw avro API — a foreign producer's layout
    val fields = new java.util.ArrayList[Schema.Field]()
    fields.add(new Schema.Field("v", Schema.create(Schema.Type.LONG), null, null))
    fields.add(new Schema.Field("id", Schema.create(Schema.Type.LONG), null, null))
    val rev = Schema.createRecord("graft_row", null, "graft", false, fields)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](rev))
    w.create(rev, new java.io.File(dir, "part-99999.avro"))
    (10L until 20L).foreach { i =>
      val r = new GenericData.Record(rev)
      r.put("v", Long.box(i * 100)); r.put("id", Long.box(i))
      w.append(r)
    }
    w.close()
    val got = readAvro(dir).orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (0L until 20L).map(i => (i, i * 100)).toSeq,
      s"reordered file transposed columns: ${got.take(5).toSeq}")
  }

  test("complex types round-trip: array/map/struct with nulls at every level") {
    import spark.implicits._
    val dir = graft.ops.Util.managedTempDir("graft_avro_complex_")
    val df = spark.range(0, 20).select(
      $"id",
      // array with a null element every 4th row, empty every 5th
      when($"id" % 5 === 0, array().cast("array<long>"))
        .otherwise(array($"id", when($"id" % 4 === 0, lit(null)).otherwise($"id" * 2)))
        .as("arr"),
      // float list — the embeddings shape
      array(($"id" * 0.5f).cast("float"), lit(1.5f)).as("fvec"),
      // struct with a null field every 3rd row, whole-struct null every 7th
      when($"id" % 7 === 0, lit(null))
        .otherwise(struct($"id".cast("int").as("a"),
          when($"id" % 3 === 0, lit(null)).otherwise(concat(lit("s"), $"id")).as("b")))
        .as("st"),
      // map with a null value
      map(lit("k1"), $"id", lit("k2"), when($"id" % 2 === 0, lit(null)).otherwise($"id" + 1))
        .as("m"))
    df.write.format("graft.sources.AvroSource").mode("overwrite").save(dir)
    val back = readAvro(dir)
    assert(back.schema("arr").dataType.sql == "ARRAY<BIGINT>")
    assert(back.schema("fvec").dataType.sql == "ARRAY<FLOAT>")
    assert(back.schema("m").dataType.sql.startsWith("MAP<STRING,"))
    val exp = df.orderBy($"id").collect().map(_.toString).toSeq
    val got = back.orderBy($"id").collect().map(_.toString).toSeq
    assert(got == exp, s"complex round-trip diverged:\n${got.take(3)}\nvs\n${exp.take(3)}")
  }

  test("nested schema resolution: reordered nested fields read by name, missing nullable nested field null-fills") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.spark.sql.types._
    val dir = graft.ops.Util.managedTempDir("graft_avro_nested_evolve_")
    // foreign file: record {id long, st {b string, a long}} — nested
    // fields in the REVERSE of the declared order, and no nested field c
    val inner = {
      val fs = new java.util.ArrayList[Schema.Field]()
      fs.add(new Schema.Field("b", Schema.create(Schema.Type.STRING), null, null))
      fs.add(new Schema.Field("a", Schema.create(Schema.Type.LONG), null, null))
      Schema.createRecord("inner", null, "graft", false, fs)
    }
    val top = {
      val fs = new java.util.ArrayList[Schema.Field]()
      fs.add(new Schema.Field("id", Schema.create(Schema.Type.LONG), null, null))
      fs.add(new Schema.Field("st", inner, null, null))
      Schema.createRecord("graft_row", null, "graft", false, fs)
    }
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](top))
    w.create(top, new java.io.File(dir, "part-00000.avro"))
    (0L until 10L).foreach { i =>
      val s = new GenericData.Record(inner)
      s.put("b", s"b$i"); s.put("a", Long.box(i * 10))
      val r = new GenericData.Record(top)
      r.put("id", Long.box(i)); r.put("st", s)
      w.append(r)
    }
    w.close()
    // declared table schema: nested order (a, b, c) with c NOT in the file
    val declared = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("st", StructType(Seq(
        StructField("a", LongType, nullable = false),
        StructField("b", StringType, nullable = false),
        StructField("c", DoubleType, nullable = true))), nullable = false)))
    val got = spark.read.format("graft.sources.AvroSource").schema(declared)
      .load(dir).orderBy("id").collect()
    got.zipWithIndex.foreach { case (r, i) =>
      val st = r.getStruct(1)
      assert(r.getLong(0) == i.toLong)
      assert(st.getLong(0) == i * 10L, s"nested 'a' transposed: $st")
      assert(st.getString(1) == s"b$i", s"nested 'b' transposed: $st")
      assert(st.isNullAt(2), "missing nested nullable field must null-fill")
    }
    // a missing NON-nullable nested field refuses loudly
    val bad = declared.copy(fields = declared.fields.updated(1,
      StructField("st", StructType(Seq(
        StructField("a", LongType, nullable = false),
        StructField("zzz", LongType, nullable = false))), nullable = false)))
    val e = intercept[Exception] {
      spark.read.format("graft.sources.AvroSource").schema(bad)
        .load(dir).collect()
    }
    assert(e.getMessage.contains("zzz") ||
      (e.getCause != null && e.getCause.getMessage.contains("zzz")),
      s"expected a loud missing-field refusal, got: ${e.getMessage}")
    // the SAME evolution rule at the TOP level: a missing nullable
    // column null-fills, a missing non-nullable one refuses
    val widened = StructType(declared.fields :+
      StructField("extra", DoubleType, nullable = true))
    val withExtra = spark.read.format("graft.sources.AvroSource")
      .schema(widened).load(dir).orderBy("id").collect()
    assert(withExtra.length == 10 && withExtra.forall(_.isNullAt(2)),
      "missing nullable top-level column must null-fill")
    val badTop = StructType(declared.fields :+
      StructField("extra", DoubleType, nullable = false))
    val e2 = intercept[Exception] {
      spark.read.format("graft.sources.AvroSource").schema(badTop)
        .load(dir).collect()
    }
    assert(e2.getMessage.contains("extra") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("extra")),
      s"expected a loud top-level refusal, got: ${e2.getMessage}")
  }

  test("sync-marker split reads: a small splitSize fans one file into many partitions, every row exactly once") {
    import spark.implicits._
    val dir = graft.ops.Util.managedTempDir("graft_avro_split_")
    // ONE container file (single input partition at write) large enough
    // to span many 64 KB avro blocks
    graft.sources.AvroIO.write(
      spark.range(0, 200000).coalesce(1)
        .select($"id", concat(lit("payload_"), $"id").as("s")), dir)
    val whole = readAvro(dir)
    assert(whole.rdd.getNumPartitions >= 1)
    val split = readAvro(dir, Map("splitSize" -> (64 * 1024).toString))
    assert(split.rdd.getNumPartitions > 4,
      s"splitSize=64k produced only ${split.rdd.getNumPartitions} partitions")
    // exactly-once across splits: same count, same id-sum, no dupes
    val agg = split.agg(count(lit(1)), countDistinct($"id"), sum($"id")).head()
    assert(agg.getLong(0) == 200000L, s"row count ${agg.getLong(0)}")
    assert(agg.getLong(1) == 200000L, "duplicate ids across splits")
    assert(agg.getLong(2) == 199999L * 200000L / 2)
  }
}
