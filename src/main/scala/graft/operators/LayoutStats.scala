package graft.operators

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graftbridge.PlanBridge

/** Metadata-only clustering proof: decide "every value of `keyCol` is
  * confined to one scan partition" from parquet FOOTER statistics,
  * without running a single Spark job.
  *
  * [[ClusteredAgg.isKeyClustered]]'s scan check is exact but costs one
  * full pass over the key column plus a distinct-key shuffle — at the
  * 60 M-row replica that is the bulk of a cold `groupByClustered`
  * query's latency, and at 100 TB it is a whole extra scan of the fact
  * table. The same property is usually provable from the row-group
  * min/max statistics every parquet writer already maintains:
  *
  *   - a ROW GROUP is atomic in Spark's scan planning: byte-range file
  *     splits hand each row group to exactly the partition containing
  *     its midpoint (`ParquetInputFormat` midpoint rule), so no row
  *     group ever feeds two partitions — whatever
  *     `maxPartitionBytes`/bin-packing does around it;
  *   - therefore, if the key's [min,max] intervals of all row groups
  *     (across all files) are PAIRWISE DISJOINT — sorted by min,
  *     `max(i) < min(i+1)` STRICTLY under the column's own stats
  *     comparator — then no key value can appear in two row groups,
  *     hence never in two partitions, under ANY assignment;
  *   - truncated binary stats stay sound: truncation only widens the
  *     interval (`min` rounds down, `max` pads up), and disjointness of
  *     widened intervals implies disjointness of the true ones.
  *
  * The proof is conservative three ways. It answers only "proven" or
  * "unknown" — bin-packed layouts whose interleaved ranges still land
  * in one partition are real clusterings this cannot see, so the caller
  * falls back to the exact scan check rather than concluding "not
  * clustered". It refuses FLOAT/DOUBLE keys: `-0.0` and `0.0` are
  * distinct stored values that compare unequal in stats order but are
  * ONE grouping key after Spark's float normalization, so interval
  * disjointness would not imply key disjointness. And it refuses any
  * row group with absent/unset statistics, any non-parquet relation,
  * any plan that is not narrow (Project/Filter only) over exactly one
  * file relation, any aliased key (exprId provenance must reach the
  * scan unchanged), and any key that is a hive PARTITION column (its
  * values span every file in a directory; the footers never see it).
  *
  * At 100 TB: one footer read per file, driver-side on a small thread
  * pool — the same metadata pass Spark itself performs for schema
  * inference, O(files) HEAD-range reads and zero data I/O. Layouts
  * with catalog-maintained range metadata (sorted writes, compaction
  * output) resolve in milliseconds; anything unprovable pays the scan
  * check it would have paid anyway.
  */
object LayoutStats {

  /** Footer-read parallelism: footers are ~KB HEAD reads; a handful of
    * threads hides object-store latency without driver strain.
    */
  private val FooterThreads = 8

  /** True iff the parquet footers PROVE every key value lives in a
    * single row group. False means "unknown", never "not clustered".
    */
  def footerProvenClustered(df: DataFrame, keyCol: String): Boolean = {
    try {
      val plan = PlanBridge.analyzed(df)
      val caseSensitive =
        df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
      def same(a: String, b: String) =
        if (caseSensitive) a == b else a.equalsIgnoreCase(b)

      val keyAttrs = plan.output.filter(a => same(a.name, keyCol))
      if (keyAttrs.size != 1) return false
      val key = keyAttrs.head

      // narrow plan over exactly one file relation: Project/Filter keep
      // both the scan's partitioning and the attribute's exprId intact
      var narrow = true
      val rels = scala.collection.mutable.ArrayBuffer.empty[LogicalRelation]
      plan.foreach {
        case _: Project | _: Filter | _: SubqueryAlias => ()
        case lr: LogicalRelation => rels += lr
        case _ => narrow = false
      }
      if (!narrow || rels.size != 1) return false
      val lr = rels.head
      // provenance: the key must BE a scan output column, not an alias
      // over one (an expression could merge distinct stored values)
      val scanAttr = lr.output.find(_.exprId == key.exprId)
      if (scanAttr.isEmpty) return false
      val fsRel = lr.relation match {
        case h: HadoopFsRelation => h
        case _ => return false
      }
      if (!fsRel.fileFormat.isInstanceOf[ParquetFileFormat]) return false
      // hive partition columns never appear in data-file footers
      if (fsRel.partitionSchema.fieldNames.exists(same(_, scanAttr.get.name)))
        return false

      val paths = fsRel.location.inputFiles
      if (paths.isEmpty) return false
      val conf = df.sparkSession.sessionState.newHadoopConf()
      val physName = scanAttr.get.name

      // one footer per file, small pool; any unreadable footer = unproven
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(FooterThreads, paths.length))
      val futures =
        try paths.toSeq.map { p =>
          pool.submit(new java.util.concurrent.Callable[Seq[Statistics[_]]] {
            def call(): Seq[Statistics[_]] = readKeyStats(p, physName, conf,
              caseSensitive)
          })
        } finally pool.shutdown()
      // null element = some row group unprovable -> whole proof void
      val stats = futures.flatMap(f => Option(f.get()).getOrElse(return false))
      if (stats.isEmpty) return false

      // strict pairwise disjointness under the column's own comparator
      val comp = stats.head.comparator()
        .asInstanceOf[java.util.Comparator[AnyRef]]
      def mn(s: Statistics[_]) = s.genericGetMin.asInstanceOf[AnyRef]
      def mx(s: Statistics[_]) = s.genericGetMax.asInstanceOf[AnyRef]
      val sorted = stats.sortWith((a, b) => comp.compare(mn(a), mn(b)) < 0)
      sorted.iterator.zip(sorted.iterator.drop(1)).forall {
        case (prev, next) => comp.compare(mx(prev), mn(next)) < 0
      }
    } catch { case NonFatal(_) => false }
  }

  /** Per-row-group stats of `name` in file `path`, or null when any row
    * group fails a proof precondition (missing column chunk, unset or
    * empty statistics, any NULLs, floating-point physical type).
    */
  private def readKeyStats(path: String, name: String,
      conf: org.apache.hadoop.conf.Configuration,
      caseSensitive: Boolean): Seq[Statistics[_]] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), conf))
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Statistics[_]]
      for (block <- reader.getFooter.getBlocks.asScala
           if block.getRowCount > 0) {
        val chunk = block.getColumns.asScala.find { c =>
          val n = c.getPath.toDotString
          if (caseSensitive) n == name else n.equalsIgnoreCase(name)
        }.getOrElse(return null)
        val tpe = chunk.getPrimitiveType.getPrimitiveTypeName
        if (tpe == PrimitiveTypeName.FLOAT || tpe == PrimitiveTypeName.DOUBLE)
          return null
        val st = chunk.getStatistics
        if (st == null || st.isEmpty || !st.isNumNullsSet ||
          st.getNumNulls > 0 || !st.hasNonNullValue) return null
        out += st
      }
      out.toSeq
    } finally reader.close()
  }
}
