package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-stream source over one table of a testdata/rehearsal dir,
  * robust to BOTH physical layouts a table arrives in:
  *
  *  - the driver's testdata writes each table as a SINGLE FILE
  *    `<dir>/<table>.parquet` — a file-stream source must then watch
  *    `<dir>` with a `pathGlobFilter` on the file name (a file path is
  *    not a watchable directory);
  *  - Spark-written corpora (ScaleUp rehearsals, any real pipeline)
  *    make `<table>.parquet` a DIRECTORY of part files — the glob
  *    filter on the table name then matches NOTHING (it tests file
  *    names, and the files are `part-*.parquet`), which silently
  *    streamed ZERO rows: every docs-based streaming twin produced an
  *    empty sink at the sf1 rehearsal while the batch side read the
  *    same tables fine (`Tables.load` handles both layouts).
  *
  * One existence probe through the Hadoop FS API (works on any
  * supported filesystem, not just local disk) picks the branch; the
  * probe is driver-side and once per stream construction. */
object StreamSource {

  def table(spark: SparkSession, sfDir: String, name: String,
      schema: StructType): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val isDir =
      try fs.getFileStatus(p).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    val rd = spark.readStream.schema(schema)
    if (isDir) rd.parquet(path)
    else rd.option("pathGlobFilter", s"$name.parquet").parquet(sfDir)
  }
}
