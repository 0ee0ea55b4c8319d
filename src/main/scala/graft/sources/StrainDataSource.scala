package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 for SPECFEM strain snapshots (SURVEY §7 M3 upgrade path
  * from the `binaryFile`+flatMap reader): one input partition per snapshot
  * file — the dataset's natural parallelism axis (one file per MPI slice ×
  * force × step), so a 1000-executor cluster reads 1000 files concurrently
  * with zero coordination.
  *
  * Usage: `spark.read.format("graft.sources.StrainDataSource")
  *   .option("path", dir).load()` → rows
  * (force INT, step INT, param INT, spec INT, igll INT, value DOUBLE) with
  * the R14 tensor reconstruction applied inline during the scan.
  *
  * File-level pruning options — the reference's biggest data reducer is its
  * temporal stride (`DDBbase.py:55-84`, typically 1:50), and at scale that
  * MUST prune files at planning time, not rows after the scan:
  *   - `step0`/`step1` (inclusive/exclusive) + `dstep`: keep only snapshot
  *     files whose step is in the strided range;
  *   - `forces`: comma-separated subset of N,E,Z directories to read.
  * Pruned files never become input partitions, so a 1:50 stride plans 1/50th
  * of the tasks and reads 1/50th of the bytes. Row-level filters after the
  * scan stay Catalyst's job. Record-marker validation lives in
  * [[Fortran.readRecords]].
  */
class StrainDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StrainDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StrainTable(properties.get("path"))
}

object StrainDataSource {
  val schema: StructType = StructType(Seq(
    StructField("force", IntegerType, nullable = false),
    StructField("step", IntegerType, nullable = false),
    StructField("param", IntegerType, nullable = false),
    StructField("spec", IntegerType, nullable = false),
    StructField("igll", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private[sources] val pathPattern =
    ".*force_([NEZ])/.*_strain_field_Step_(\\d+)\\.bin$".r

  def listFiles(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir))
      .map(_.getPath)
      .filter(p => pathPattern.findFirstIn(p).isDefined)
  }

  /** Planning-time file pruning from read options (stride + force subset). */
  private[sources] case class Pruning(step0: Option[Int], step1: Option[Int],
      dstep: Int, forces: Option[Set[String]]) {
    def keeps(path: String): Boolean = path match {
      case pathPattern(force, stepStr) =>
        val step = stepStr.toInt
        forces.forall(_.contains(force)) &&
          step0.forall(step >= _) &&
          step1.forall(step < _) &&
          (step - step0.getOrElse(0)) % dstep == 0
      case _ => false
    }
  }

  private[sources] def pruningFrom(options: CaseInsensitiveStringMap): Pruning =
    Pruning(
      Option(options.get("step0")).map(_.toInt),
      Option(options.get("step1")).map(_.toInt),
      Option(options.get("dstep")).map(_.toInt).getOrElse(1),
      Option(options.get("forces")).map(_.split(",").map(_.trim).toSet))
}

class StrainTable(path: String) extends Table with SupportsRead {
  require(path != null, "option 'path' is required")
  override def name(): String = s"strain($path)"
  override def schema(): StructType = StrainDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val pruning = StrainDataSource.pruningFrom(options)
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = StrainDataSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        StrainDataSource.listFiles(path)
          .filter(pruning.keeps)
          .map(StrainFilePartition(_): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new StrainReaderFactory
    }
  }
}

case class StrainFilePartition(file: String) extends InputPartition

class StrainReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new StrainPartitionReader(partition.asInstanceOf[StrainFilePartition].file)
}

/** Streams one snapshot file as rows: 6 reconstructed tensor components per
  * local GLL point (xx, yy, zz, xy, xz, yz — `strainfield_reader.py:57-59`). */
class StrainPartitionReader(file: String) extends PartitionReader[InternalRow] {
  private val pat = StrainDataSource.pathPattern
  private val pat(forceName, stepStr) = file
  private val force = SeisFixture.Forces.indexOf(forceName)
  private val step = stepStr.toInt
  private val recs = Fortran.readRecords(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)))
    .map(Fortran.floatsLE)
  require(recs.length == 6, s"expected 6 strain records in $file, got ${recs.length}")
  private val Seq(tr, xxD, yyD, xy, xz, yz) = recs

  private var pt = -1
  private var param = 5
  private val comps = new Array[Double](6)

  override def next(): Boolean = {
    param += 1
    if (param == 6) {
      param = 0
      pt += 1
      if (pt >= tr.length) return false
      val xx = xxD(pt) + tr(pt) / 3f
      val yy = yyD(pt) + tr(pt) / 3f
      comps(0) = xx; comps(1) = yy; comps(2) = tr(pt) - xx - yy
      comps(3) = xy(pt); comps(4) = xz(pt); comps(5) = yz(pt)
    }
    true
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](force, step, param,
      pt / SeisFixture.NGLL_LOCAL, pt % SeisFixture.NGLL_LOCAL, comps(param)))

  override def close(): Unit = ()
}
