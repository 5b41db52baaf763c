package graft.sources

/** Error taxonomy (reference: S3ConnectorException.scala:20-26). */
class GraftSourceException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

class GraftNoSchemaException
  extends GraftSourceException("graft file source doesn't support empty schema; set .schema(...)")

class GraftUnsupportedQueueTypeException(queueType: String)
  extends GraftSourceException(s"unsupported queue type: $queueType")

class GraftMetalogAddException(batchId: Long)
  extends GraftSourceException(s"metadata log already contains batch $batchId")

class GraftReprocessException(msg: String) extends GraftSourceException(msg)

class GraftReprocessDryRunException(fileCount: Int)
  extends GraftSourceException(
    s"reprocess dry-run listed $fileCount files; aborting (set reprocessDryRun=false to run)")

class GraftReprocessLockExistsException(lockPath: String)
  extends GraftSourceException(
    s"reprocess lock $lockPath exists; a previous reprocess ran against this checkpoint - delete the lock to proceed")

class GraftNoCredentialsException(reason: String)
  extends GraftSourceException(s"unable to resolve queue credentials - $reason")

/** A checkpoint artifact (compact file, batch file, version zip) is
  * unreadable — torn write on a non-atomic filesystem, or rot. Restore
  * paths catch THIS type to fall back to an older intact version; other
  * [[GraftSourceException]]s (e.g. future-format refusal) propagate. */
class GraftCheckpointCorruptException(msg: String, cause: Throwable = null)
  extends GraftSourceException(msg, cause)
