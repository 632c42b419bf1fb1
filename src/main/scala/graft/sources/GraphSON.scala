package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.graph.PropertyGraph
import graft.model.{EdgeSpec, GraphColumns => GC}

/** GraphSON interchange — the `Graph.io()` surface the reference
  * inherits from gremlin-core (`/root/reference/pom.xml:19-27`; TorcGraph
  * itself adds no io code, the format comes with the stack). The engine's
  * native persistence is partitioned Parquet ([[GraphLoader.persist]]);
  * this codec exists for the interchange role io() plays: hand a graph to
  * (or take one from) a non-Spark TinkerPop stack as text.
  *
  * Format: GraphSON 3.0's adjacency shape — one JSON object per VERTEX
  * per line carrying `id`, `label`, `properties` (single-cardinality
  * VertexProperty lists) and `outE` (adjacency grouped by edge label,
  * each entry `{id, inV, properties}`), with scalar values wrapped in
  * the spec's typed envelopes (`{"@type":"g:Int64","@value":n}`, g:Int32,
  * g:Double, g:Float; strings and booleans ride plain, as the spec has
  * them). Temporal values use the EXTENDED registry's ISO forms
  * (`gx:Instant` micros, `gx:LocalDate`) rather than `g:Date`'s
  * epoch-millis — millisecond truncation would break the engine's
  * lossless round-trip contract. Element ids are the engine's packed
  * 64-bit unified ids (`labelId << 48 | key` — the q18 sorted-label
  * rule, so a reader can re-derive them from the label set alone); edge
  * ids are md5-derived from (label, endpoints, properties), stable
  * across exports.
  *
  * Scale shape: the writer is one pass per edge label (groupBy `_src`
  * into sorted adjacency arrays — the shuffle keyed exactly like the
  * reference's per-vertex edge lists) plus one projection per vertex
  * label; output is plain text files, parallel like any Spark sink.
  * The reader is schema-inference + one filtered pass per label, with
  * one bounded driver probe per frame (a single row to resolve `@type`
  * envelopes — types, never data). Interchange is a per-graph event;
  * the hot path stays on Parquet.
  */
object GraphSON {

  private val LabelShift = 48

  /** Typed-envelope encoder for one scalar column. Strings/booleans are
    * plain per GraphSON 3; everything else wraps. Null values encode as
    * null (the enclosing field drops out of the JSON line). */
  private def encode(c: Column, dt: DataType): Column = dt match {
    case LongType => struct(lit("g:Int64").as("@type"), c.as("@value"))
    case IntegerType => struct(lit("g:Int32").as("@type"), c.as("@value"))
    case DoubleType => struct(lit("g:Double").as("@type"), c.as("@value"))
    case FloatType => struct(lit("g:Float").as("@type"),
      c.cast("double").as("@value"))
    // UTC-normalized: date_format renders in the SESSION timezone, so a
    // bare 'Z' literal would label local wall-clock digits as UTC for
    // any non-UTC session (advisor, round 10). to_utc_timestamp shifts
    // by -offset(sessionTZ) and date_format adds it back — net true-UTC
    // text regardless of spark.sql.session.timeZone.
    case TimestampType => struct(lit("gx:Instant").as("@type"),
      date_format(to_utc_timestamp(c, expr("current_timezone()")),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("@value"))
    case TimestampNTZType => struct(lit("gx:LocalDateTime").as("@type"),
      date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("@value"))
    case DateType => struct(lit("gx:LocalDate").as("@type"),
      date_format(c, "yyyy-MM-dd").as("@value"))
    case StringType | BooleanType => c
    case other =>
      throw new IllegalArgumentException(
        s"GraphSON codec does not carry $other columns")
  }

  /** Decoder: the inferred JSON type of a `value` field plus the
    * probed `@type` tag pick the restoring cast. Plain (non-envelope)
    * values pass through. */
  private def decode(c: Column, inferred: DataType, tag: Option[String]): Column =
    inferred match {
      case s: StructType if s.fieldNames.contains("@value") =>
        val v = c.getField("@value")
        tag match {
          case Some("g:Int64") => v.cast("long")
          case Some("g:Int32") => v.cast("int")
          case Some("g:Double") => v.cast("double")
          case Some("g:Float") => v.cast("float")
          case Some("gx:Instant") =>
            // inverse of the writer's UTC normalization: to_timestamp
            // parses in the session timezone, so shift back
            from_utc_timestamp(
              to_timestamp(v, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
              expr("current_timezone()"))
          case Some("gx:LocalDateTime") =>
            to_timestamp_ntz(v, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
          case Some("gx:LocalDate") => to_date(v, "yyyy-MM-dd")
          case other =>
            throw new IllegalArgumentException(s"unknown GraphSON @type $other")
        }
      case _ => c
    }

  private def packed(lid: Long, key: Column): Column =
    lit(lid * (1L << LabelShift)) + key

  /** Write `g` as GraphSON lines under `$path/graphson` (+ the
    * variables sidecar [[GraphLoader.persist]] writes). */
  def persistGraphSON(g: PropertyGraph, path: String): Unit = {
    val ids = g.labelIds
    // per edge label: (packed _src, adjacency struct) across every spec
    // sharing the label; prop schemas are unioned so e.g. REPLY_OF's
    // Post- and Comment-destination frames serialize alike
    val specsByELabel = g.edgeSpecs.groupBy(_.label).toSeq.sortBy(_._1)
    def adjacency(srcLabel: String): Seq[(String, DataFrame)] =
      specsByELabel.flatMap { case (elabel, specs) =>
        val mine = specs.filter(_.srcLabel == srcLabel)
        if (mine.isEmpty) None
        else {
          val propSchema: Seq[(String, DataType)] = {
            val all = mine.flatMap { s =>
              g.edgeFrames(s).schema.fields
                .filterNot(f => f.name == GC.Src || f.name == GC.Dst)
                .map(f => f.name -> f.dataType)
            }.distinct
            val dup = all.groupBy(_._1).filter(_._2.size > 1)
            require(dup.isEmpty,
              s"edge label $elabel carries conflicting property types: $dup")
            all.sortBy(_._1)
          }
          val unioned = mine.map { s =>
            val df = g.edgeFrames(s)
            val have = df.columns.toSet
            val props = propSchema.map { case (n, dt) =>
              (if (have(n)) col(n) else lit(null).cast(dt)).as(n)
            }
            val rawProps = struct(props.map(p => p): _*)
            val e = struct(
              encode(conv(substring(md5(concat_ws(":", lit(elabel),
                packed(ids(s.srcLabel), col(GC.Src)),
                packed(ids(s.dstLabel), col(GC.Dst)),
                to_json(rawProps))), 1, 15), 16, 10).cast("long"),
                LongType).as("id"),
              encode(packed(ids(s.dstLabel), col(GC.Dst)), LongType).as("inV"))
            val withProps =
              if (propSchema.isEmpty) e
              else struct(e.getField("id").as("id"), e.getField("inV").as("inV"),
                struct(propSchema.map { case (n, dt) =>
                  (if (have(n)) encode(col(n), dt) else lit(null)).as(n)
                }: _*).as("properties"))
            df.select(packed(ids(s.srcLabel), col(GC.Src)).as("_gid"),
              withProps.as("_e"))
          }.reduce(_.unionByName(_))
          Some(elabel -> unioned
            .groupBy("_gid")
            .agg(sort_array(collect_list(col("_e"))).as("_adj")))
        }
      }
    val lineFrames = g.vertexLabels.map { label =>
      val lid = ids(label)
      val df = g.vertexFrames(label)
      val propCols = df.schema.fields.filter(_.name != GC.Id).sortBy(_.name)
      val props = struct(propCols.map { f =>
        when(col(f.name).isNull, lit(null)).otherwise(
          array(struct(
            // deterministic VertexProperty id: the owning vertex's id
            encode(packed(lid, col(GC.Id)), LongType).as("id"),
            encode(col(f.name), f.dataType).as("value")))).as(f.name)
      }.toSeq: _*)
      val base = df.select(packed(lid, col(GC.Id)).as("_gid"),
        (if (propCols.isEmpty) lit(null) else props).as("_props"))
      val adj = adjacency(label)
      val joined = adj.foldLeft(base) { case (acc, (elabel, a)) =>
        acc.join(a.withColumnRenamed("_adj", s"_adj_$elabel"), Seq("_gid"), "left")
      }
      val outE =
        if (adj.isEmpty) lit(null)
        else struct(adj.map { case (el, _) => col(s"_adj_$el").as(el) }: _*)
      joined.select(to_json(struct(
        encode(col("_gid"), LongType).as("id"),
        lit(label).as("label"),
        col("_props").as("properties"),
        outE.as("outE"))).as("value"))
    }
    lineFrames.reduce(_.unionByName(_))
      .write.mode("overwrite").text(s"$path/graphson")
    GraphLoader.writeVariables(g, path)
    writeManifest(g, path)
  }

  /** Structure manifest rides next to the lines: the writer's
    * label -> id map, the FULL vertex-label / edge-spec sets, and every
    * property's exact Spark type. Without it the reader must infer all
    * of that from lines it happens to observe — and a vertex label with
    * ZERO rows emits no lines, shifting every higher-sorted label's
    * re-derived id (wrong decodes / NoSuchElementException), while empty
    * edge specs and all-null property columns silently vanish (advisor,
    * round 10 — the documented lossless contract). Foreign GraphSON has
    * no manifest; [[openGraphSON]] falls back to observation-based
    * inference for it. */
  private def writeManifest(g: PropertyGraph, path: String): Unit = {
    val ids = g.labelIds
    def esc(s: String) = s.flatMap {
      case '\t' => "\\t"; case '\n' => "\\n"; case '\\' => "\\\\"
      case c => c.toString
    }
    val rows = Seq.newBuilder[String]
    g.vertexLabels.foreach { l =>
      rows += s"VL\t${esc(l)}\t${ids(l)}"
      g.vertexFrames(l).schema.fields.filter(_.name != GC.Id).sortBy(_.name)
        .foreach(f => rows += s"VP\t${esc(l)}\t${esc(f.name)}\t${f.dataType.catalogString}")
    }
    g.edgeSpecs.foreach { s =>
      rows += s"ES\t${esc(s.label)}\t${esc(s.srcLabel)}\t${esc(s.dstLabel)}"
      g.edgeFrames(s).schema.fields
        .filterNot(f => f.name == GC.Src || f.name == GC.Dst).sortBy(_.name)
        .foreach(f => rows +=
          s"EP\t${esc(s.label)}\t${esc(s.srcLabel)}\t${esc(s.dstLabel)}\t${esc(f.name)}\t${f.dataType.catalogString}")
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), g.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(path, "_graphson_manifest.tsv"), true)
    out.write(rows.result().mkString("", "\n", "\n").getBytes("UTF-8"))
    out.close()
  }

  private case class Manifest(
      vertexIds: Seq[(String, Long)],
      vertexProps: Map[String, Seq[(String, DataType)]],
      edgeSpecs: Seq[EdgeSpec],
      edgeProps: Map[EdgeSpec, Seq[(String, DataType)]])

  private def readManifest(spark: SparkSession, path: String): Option[Manifest] = {
    def unesc(s: String) = {
      val b = new StringBuilder; var i = 0
      while (i < s.length) {
        if (s(i) == '\\' && i + 1 < s.length) {
          s(i + 1) match {
            case 't' => b += '\t'; case 'n' => b += '\n'; case c => b += c
          }; i += 2
        } else { b += s(i); i += 1 }
      }
      b.result()
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path, "_graphson_manifest.tsv")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val body = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    in.close()
    val vIds = Seq.newBuilder[(String, Long)]
    val vProps = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[(String, DataType)]].withDefaultValue(Nil)
    val eSpecs = Seq.newBuilder[EdgeSpec]
    val eProps = scala.collection.mutable.LinkedHashMap
      .empty[EdgeSpec, Seq[(String, DataType)]].withDefaultValue(Nil)
    body.linesIterator.filter(_.nonEmpty).foreach { line =>
      line.split('\t').toSeq.map(unesc) match {
        case Seq("VL", l, id) => vIds += l -> id.toLong
        case Seq("VP", l, n, t) =>
          vProps(l) = vProps(l) :+ (n -> DataType.fromDDL(t))
        case Seq("ES", el, sl, dl) => eSpecs += EdgeSpec(el, sl, dl)
        case Seq("EP", el, sl, dl, n, t) =>
          val k = EdgeSpec(el, sl, dl)
          eProps(k) = eProps(k) :+ (n -> DataType.fromDDL(t))
        case other =>
          throw new IllegalArgumentException(s"bad manifest row: $other")
      }
    }
    Some(Manifest(vIds.result(), vProps.toMap.withDefaultValue(Nil),
      eSpecs.result(), eProps.toMap.withDefaultValue(Nil)))
  }

  /** Type-driven decoder for the manifest path: the target Spark type
    * alone picks the restoring expression (no @type probe needed). `c`
    * is the raw inferred column (envelope struct or plain scalar). */
  private def decodeTyped(c: Column, target: DataType): Column = target match {
    case LongType => c.getField("@value").cast("long")
    case IntegerType => c.getField("@value").cast("int")
    case DoubleType => c.getField("@value").cast("double")
    case FloatType => c.getField("@value").cast("float")
    case TimestampType =>
      from_utc_timestamp(
        to_timestamp(c.getField("@value"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        expr("current_timezone()"))
    case TimestampNTZType =>
      to_timestamp_ntz(c.getField("@value"),
        lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    case DateType => to_date(c.getField("@value"), "yyyy-MM-dd")
    case StringType => c.cast("string")
    case BooleanType => c.cast("boolean")
    case other =>
      throw new IllegalArgumentException(
        s"GraphSON codec does not carry $other columns")
  }

  /** Re-open a graph written by [[persistGraphSON]] (manifest-guided,
    * lossless — empty labels, empty specs and all-null property columns
    * included), or a foreign manifest-less GraphSON file (structure
    * inferred from the observed lines). */
  def openGraphSON(spark: SparkSession, path: String): PropertyGraph =
    readManifest(spark, path) match {
      case Some(m) => openWithManifest(spark, path, m)
      case None => openByInference(spark, path)
    }

  private def openWithManifest(spark: SparkSession, path: String,
      m: Manifest): PropertyGraph = {
    import spark.implicits._
    val lines = spark.read.text(s"$path/graphson")
      .select(col("value"), get_json_object(col("value"), "$.label").as("_l"))
    val ids = m.vertexIds.toMap
    var edgeFrames = Map.empty[EdgeSpec, DataFrame]
    val vertexFrames = m.vertexIds.map { case (label, lid) =>
      val lid0 = lit(lid * (1L << LabelShift))
      val raw = spark.read.json(
        lines.where(col("_l") === label).select("value").as[String])
      val schema = raw.schema
      val hasRows = schema.fieldNames.contains("id")
      val vprops = m.vertexProps(label)
      def emptyFrame(fields: Seq[(String, DataType)]): DataFrame =
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(fields.map { case (n, dt) => StructField(n, dt) }))
      val inferredVProps: Set[String] = schema.find(_.name == "properties") match {
        case Some(StructField(_, ps: StructType, _, _)) => ps.fieldNames.toSet
        case _ => Set.empty
      }
      val vdf =
        if (!hasRows) emptyFrame((GC.Id -> LongType) +: vprops)
        else raw.select(
          (col("id.`@value`") - lid0).as(GC.Id) +:
            vprops.map { case (n, dt) =>
              // to_json drops null fields, so an all-null column is
              // absent from the inferred schema — restore it typed
              if (inferredVProps(n))
                decodeTyped(
                  element_at(col(s"properties.`$n`"), 1).getField("value"), dt)
                  .as(n)
              else lit(null).cast(dt).as(n)
            }: _*)

      // edge specs rooted at this label, grouped by edge label (the
      // writer unions same-(label, src) specs into one adjacency array)
      val inferredOutE: Set[String] = schema.find(_.name == "outE") match {
        case Some(StructField(_, oe: StructType, _, _)) => oe.fieldNames.toSet
        case _ => Set.empty
      }
      m.edgeSpecs.filter(_.srcLabel == label).groupBy(_.label).toSeq
        .sortBy(_._1).foreach { case (elabel, specs) =>
          val unionProps = specs.flatMap(m.edgeProps(_)).distinct.sortBy(_._1)
          if (!inferredOutE(elabel)) {
            // source label empty (or no edges written): every spec of
            // this group restores as an empty, correctly-typed frame
            specs.foreach { s =>
              edgeFrames += s -> emptyFrame(
                (GC.Src -> LongType) +: (GC.Dst -> LongType) +: m.edgeProps(s))
            }
          } else {
            val entry = schema(schema.fieldIndex("outE")).dataType
              .asInstanceOf[StructType](elabel).dataType
              .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
            val inferredEProps: Set[String] =
              entry.find(_.name == "properties") match {
                case Some(StructField(_, ps: StructType, _, _)) =>
                  ps.fieldNames.toSet
                case _ => Set.empty
              }
            val flat = raw
              .select(col("id.`@value`").as("_ps"),
                explode(col(s"outE.`$elabel`")).as("_e"))
              .select(
                (col("_ps") +:
                  col("_e").getField("inV").getField("@value").as("_pd") +:
                  unionProps.map { case (n, dt) =>
                    if (inferredEProps(n))
                      decodeTyped(
                        col("_e").getField("properties").getField(n), dt).as(n)
                    else lit(null).cast(dt).as(n)
                  }): _*)
              .withColumn("_dlid", expr(s"_pd div ${1L << LabelShift}"))
            specs.foreach { s =>
              val dlid = ids(s.dstLabel)
              edgeFrames += s -> flat.where(col("_dlid") === dlid)
                .select(
                  (col("_ps") - lid0).as(GC.Src) +:
                    (col("_pd") - lit(dlid * (1L << LabelShift))).as(GC.Dst) +:
                    m.edgeProps(s).map { case (n, _) => col(n) }: _*)
            }
          }
        }
      label -> vdf
    }.toMap

    val g = new PropertyGraph(spark, vertexFrames, edgeFrames)
    GraphLoader.readVariables(g, path)
    g
  }

  /** Observation-based reader for FOREIGN (manifest-less) GraphSON:
    * labels, ids, specs and property types are inferred from the lines
    * present. An empty vertex label is invisible here by construction —
    * the engine's own round trip always goes through the manifest. */
  private def openByInference(spark: SparkSession, path: String): PropertyGraph = {
    import spark.implicits._
    val lines = spark.read.text(s"$path/graphson")
      .select(col("value"), get_json_object(col("value"), "$.label").as("_l"))
    val labels = lines.select("_l").distinct().as[String].collect().sorted.toSeq
    val ids = labels.zipWithIndex.map { case (l, i) => l -> (i + 1).toLong }.toMap
    val byId = ids.map(_.swap)

    var edgeFrames = Map.empty[EdgeSpec, DataFrame]
    val vertexFrames = labels.map { label =>
      val lid = ids(label)
      val raw = spark.read.json(lines.where(col("_l") === label).select("value").as[String])
      val schema = raw.schema

      def probeTags(cols: Seq[(String, Column, DataType)]): Map[String, Option[String]] = {
        // one driver row resolving every envelope's @type at once
        val enveloped = cols.collect {
          case (n, c, s: StructType) if s.fieldNames.contains("@value") => (n, c)
        }
        if (enveloped.isEmpty) Map.empty
        else {
          val row = raw.agg(
            first(enveloped.head._2.getField("@type"), ignoreNulls = true)
              .as(enveloped.head._1),
            enveloped.tail.map { case (n, c) =>
              first(c.getField("@type"), ignoreNulls = true).as(n) }: _*).head()
          enveloped.zipWithIndex.map { case ((n, _), i) =>
            n -> Option(row.getString(i)) }.toMap
        }
      }

      // vertex properties
      val vprops: Seq[(String, Column, DataType)] = schema.find(_.name == "properties") match {
        case Some(StructField(_, ps: StructType, _, _)) =>
          ps.fields.toSeq.map { f =>
            val valueType = f.dataType.asInstanceOf[ArrayType]
              .elementType.asInstanceOf[StructType]("value").dataType
            (f.name, element_at(col(s"properties.`${f.name}`"), 1).getField("value"),
              valueType)
          }
        case _ => Nil
      }
      val vtags = probeTags(vprops)
      val vdf = raw.select(
        (col("id.`@value`") - lit(lid * (1L << LabelShift))).as(GC.Id) +:
          vprops.map { case (n, c, dt) => decode(c, dt, vtags.get(n).flatten).as(n) }: _*)

      // out-edges: one exploded pass per edge label present in the schema
      schema.find(_.name == "outE").foreach {
        case StructField(_, oe: StructType, _, _) =>
          oe.fields.foreach { ef =>
            val elabel = ef.name
            val entry = ef.dataType.asInstanceOf[ArrayType]
              .elementType.asInstanceOf[StructType]
            val eraw = raw
              .select(col("id.`@value`").as("_ps"),
                explode(col(s"outE.`$elabel`")).as("_e"))
            val eprops: Seq[(String, Column, DataType)] =
              entry.find(_.name == "properties") match {
                case Some(StructField(_, ps: StructType, _, _)) =>
                  ps.fields.toSeq.map { f =>
                    (f.name, col("_e").getField("properties").getField(f.name),
                      f.dataType)
                  }
                case _ => Nil
              }
            val etagRow =
              if (eprops.collect { case (_, _, s: StructType) if s.fieldNames.contains("@value") => 1 }.isEmpty)
                Map.empty[String, Option[String]]
              else {
                val env = eprops.collect {
                  case (n, c, s: StructType) if s.fieldNames.contains("@value") => (n, c)
                }
                val row = eraw.agg(
                  first(env.head._2.getField("@type"), ignoreNulls = true).as(env.head._1),
                  env.tail.map { case (n, c) =>
                    first(c.getField("@type"), ignoreNulls = true).as(n) }: _*).head()
                env.zipWithIndex.map { case ((n, _), i) =>
                  n -> Option(row.getString(i)) }.toMap
              }
            val flat = eraw.select(
              (col("_ps") +:
                col("_e").getField("inV").getField("@value").as("_pd") +:
                eprops.map { case (n, c, dt) =>
                  decode(c, dt, etagRow.get(n).flatten).as(n) }): _*)
              .withColumn("_dlid", expr(s"_pd div ${1L << LabelShift}"))
            val dstLids = flat.select("_dlid").distinct().as[Long].collect()
            dstLids.foreach { dlid =>
              val spec = EdgeSpec(elabel, label, byId(dlid))
              edgeFrames += spec -> flat.where(col("_dlid") === dlid)
                .select(
                  (col("_ps") - lit(lid * (1L << LabelShift))).as(GC.Src) +:
                    (col("_pd") - lit(dlid * (1L << LabelShift))).as(GC.Dst) +:
                    eprops.map { case (n, _, _) => col(n) }: _*)
            }
          }
        case _ => ()
      }
      label -> vdf
    }.toMap

    val g = new PropertyGraph(spark, vertexFrames, edgeFrames)
    GraphLoader.readVariables(g, path)
    g
  }
}
