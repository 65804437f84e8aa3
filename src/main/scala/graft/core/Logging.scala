package graft.core

import org.slf4j.{Logger, LoggerFactory}

/** PID-tagged logging (reference `common/spark_inference.py:175-176` and
  * `tensorflow/logging.conf.py`): every message is prefixed with the
  * process id so interleaved executor logs stay attributable. Backed by
  * slf4j/log4j2, which Spark configures; per-task context belongs in the
  * log4j2 MDC.
  */
object Logging {
  def logger(name: String): Logger = LoggerFactory.getLogger(name)

  def log(logger: Logger, msg: String): Unit =
    logger.info(s"[${ProcessHandle.current.pid}] $msg")

  def formatted(msg: String): String = s"[${ProcessHandle.current.pid}] $msg"
}
