package graft.core

import java.net.URI

/** HDFS path validation (reference `ml_hadoop_experiment/common/paths.py:4-13`,
  * enforced before distributed writes at `tfrecords.py:232-233` and event
  * reads at `events.py:16-17`): only fully-qualified `hdfs://` /
  * `viewfs://` URLs with an authority pass.
  */
object Paths {
  def checkFullHdfsPath(path: String): Boolean =
    try {
      val uri = new URI(path)
      val authority = Option(uri.getAuthority).getOrElse("")
      authority.nonEmpty && Seq("hdfs", "viewfs").contains(uri.getScheme)
    } catch { case _: Exception => false }
}
