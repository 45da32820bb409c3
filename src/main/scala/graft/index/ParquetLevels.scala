package graft.index

/** Compaction level encoded in the filename `{uuid}.{level}.parquet`
  * (reference save_service_fs.go:96-113, merge_service_fs.go:49-56). */
object ParquetLevels {
  private val Re = """.*\.(\d+)\.parquet$""".r
  def levelOf(fileName: String): Int = fileName match {
    // toIntOption: a foreign timestamp-shaped digit run (17+ digits)
    // matches the regex but overflows Int — that must read as the
    // default level like any other non-level name, not throw and fail
    // every compaction tick of the table forever
    case Re(l) => l.toIntOption.getOrElse(1)
    case _ => 1
  }
}
