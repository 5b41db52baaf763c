package graft.sources

import org.apache.hadoop.fs.GlobPattern

/** Admission control for announced files: the six-verdict dedup/validity
  * check that gives the source its exactly-once ingestion guarantee
  * (reference: S3ConnectorFileValidator.scala:32-55).
  *
  * Order of checks matters and is preserved: glob -> expiry -> cache ->
  * persisted log. The metadata-log check only holds within the age
  * window — a file older than the purge horizon that *was* logged is
  * treated as new again (documented reference semantics, SURVEY §2.2).
  */
final class FileValidator(
    cache: FileCache,
    metadataLog: FileMetadataLog,
    pathGlobFilter: Option[String]) {

  private val glob: Option[GlobPattern] = pathGlobFilter.map(new GlobPattern(_))

  def isValidNewFile(filePath: String, timestampMs: Long): FileValidResult = {
    if (glob.exists(g => !g.matches(filePath))) {
      FileValidResult.PatternNotMatch
    } else if (cache.isExpired(timestampMs)) {
      FileValidResult.FileExpired
    } else if (!cache.isNewFile(filePath)) {
      if (cache.get(filePath).exists(_.isProcessed)) FileValidResult.ExistInCacheProcessed
      else FileValidResult.ExistInCacheNotProcessed
    } else if (!metadataLog.isNewFile(filePath, cache.lastPurgeTimestamp)) {
      FileValidResult.PersistedInMetadataLog
    } else {
      FileValidResult.Ok
    }
  }

  /** Batch-read-time path filter (second glob enforcement point,
    * reference: S3ConnectorSource.scala:186-191). */
  def matchesGlob(filePath: String): Boolean = glob.forall(_.matches(filePath))
}
