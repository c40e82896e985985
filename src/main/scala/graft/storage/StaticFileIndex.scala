package graft.storage

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** FileIndex over an ALREADY-KNOWN file set — zero filesystem calls at
  * plan time. The engine's manifest-driven relations (bucketed event
  * log, declared-layout snapshot) resolve their live files from one
  * manifest read; handing them to `InMemoryFileIndex` would re-stat
  * every leaf path at every query — N metadata RPCs per serve on an
  * object store (N = bucket-file count, up to 4096). This index serves
  * the statuses the manifest already vouches for, unpartitioned.
  *
  * Note: statuses reconstructed from manifest-recorded lengths carry
  * mtime 0 — file LENGTH is what split planning and the parquet footer
  * reader need; the engine does not expose `_metadata` virtual columns
  * over these relations. */
final class StaticFileIndex(files: Seq[FileStatus])
    extends FileIndex {

  override def rootPaths: Seq[Path] = files.map(_.getPath)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, files.toArray))

  override def inputFiles: Array[String] =
    files.map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_.getLen).sum

  override def partitionSchema: StructType = new StructType()
}
