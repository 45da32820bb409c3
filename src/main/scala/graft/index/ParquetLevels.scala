package graft.index

/** Compaction level encoded in the filename `{uuid}.{level}.parquet`
  * (reference save_service_fs.go:96-113, merge_service_fs.go:49-56). */
object ParquetLevels {
  private val Re = """.*\.(\d+)\.parquet$""".r
  def levelOf(fileName: String): Int = fileName match {
    case Re(l) => l.toInt
    case _ => 1
  }
}
