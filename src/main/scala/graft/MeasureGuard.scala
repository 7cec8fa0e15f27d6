package graft

/** Measurement-discipline guard (the BASELINE.md round-7 lesson: an
  * orphaned local[32] JVM from a timed-out probe inflates every later
  * timing 2-10× while looking exactly like host degradation — single-core
  * throughput stays normal, only multi-thread Spark sags). Every timing
  * surface (Bench, Profile, ScaleProbe) calls [[checkQuietHost]] before
  * its first measurement: foreign JVMs are reported loudly, surfaced in
  * the output artifact, and abort the run under SPARK_GRAFT_STRICT=1.
  * The process's own ancestry (the sbt launcher chain) and descendants
  * are excluded — only JVMs this run does not own count. */
object MeasureGuard {

  /** PIDs of java processes that are neither this process, its ancestors,
    * nor its descendants. */
  def foreignJvms(): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val self = ProcessHandle.current()
    val lineage = scala.collection.mutable.Set[Long](self.pid())
    var p = self.parent()
    while (p.isPresent) { lineage += p.get.pid(); p = p.get.parent() }
    self.descendants().iterator().asScala.foreach(d => lineage += d.pid())
    ProcessHandle.allProcesses().iterator().asScala
      .filter { h =>
        val cmd = h.info().command()
        cmd.isPresent && cmd.get.endsWith("java") && !lineage.contains(h.pid())
      }
      .map(_.pid()).toSeq
  }

  /** One-minute load average from /proc/loadavg — the cheap per-query
    * contention sample Bench records beside each timing (the r11 caveat:
    * `contended_jvms` was sampled only at run START, so a mid-run load
    * spike was invisible and cost a full adjudication cycle — the r10
    * q74–q84 window). Returns -1 where /proc is unavailable. */
  def loadAvg1(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split(" ")(0).toDouble
      finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** Warn (always, stderr) and abort (SPARK_GRAFT_STRICT=1) when a
    * foreign JVM is alive at timing start. Returns the offending pids so
    * callers can flag their output artifact — a contended measurement
    * must say so itself, not rely on whoever ran it remembering to
    * `ps -C java` first. */
  def checkQuietHost(surface: String): Seq[Long] = {
    val pids = foreignJvms()
    if (pids.nonEmpty) {
      System.err.println(s"[$surface] WARNING: foreign JVM(s) alive during " +
        s"timing: ${pids.mkString(",")} — timings may be inflated 2-10x; " +
        "kill them and re-run (SPARK_GRAFT_STRICT=1 aborts instead)")
      if (sys.env.get("SPARK_GRAFT_STRICT").contains("1")) {
        System.err.println(s"[$surface] SPARK_GRAFT_STRICT=1 — refusing to time")
        sys.exit(3)
      }
    }
    pids
  }
}
