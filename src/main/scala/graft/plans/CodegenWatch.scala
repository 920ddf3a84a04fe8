package graft.plans

/** Counts logged Janino CompileExceptions — the signature of a
  * codegen'd stage silently falling back to interpreted execution.
  * Shared by Bench (which FAILS on any, for the queries it times) and
  * Verify (which reports the count across the WHOLE registry: round 9
  * found 7 per Verify run from the unrolled LSH hyperplane chains,
  * invisible to Bench's gate because no LSH query is headline).
  */
final class CodegenWatch
    extends org.apache.logging.log4j.core.appender.AbstractAppender(
      // unique per instance: log4j2's LoggerConfig.addAppender silently
      // ignores a duplicate name, so a second install() in the same JVM
      // (Bench then Verify, repeated test runs) would otherwise return
      // a counter that never receives events and reports 0 — the
      // codegen-strict gate passing falsely
      "graft-compile-exception-counter-" +
        CodegenWatch.seq.incrementAndGet(), null,
      org.apache.logging.log4j.core.layout.PatternLayout
        .createDefaultLayout(),
      false,
      org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
  val count = new java.util.concurrent.atomic.AtomicLong(0L)
  override def append(
      event: org.apache.logging.log4j.core.LogEvent): Unit = {
    // Message-substring match is scoped to Spark's codegen loggers: an
    // unrelated log line merely quoting the class name must not count.
    // The thrown-exception chain is checked on every logger — an
    // actual CompileException is the real signal.
    val logger = event.getLoggerName
    var hit = logger != null &&
      (logger.contains("CodeGenerator") || logger.contains("codegen")) &&
      event.getMessage.getFormattedMessage.contains("CompileException")
    var t = event.getThrown
    while (!hit && t != null) {
      hit = t.getClass.getName.contains("CompileException")
      t = t.getCause
    }
    if (hit) count.incrementAndGet()
  }
}

object CodegenWatch {
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Attach a fresh counter to the log4j2 root logger. */
  def install(): CodegenWatch = {
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val counter = new CodegenWatch
    counter.start()
    val config = ctx.getConfiguration
    config.getRootLogger.addAppender(
      counter, org.apache.logging.log4j.Level.ALL, null)
    ctx.updateLoggers()
    counter
  }
}
