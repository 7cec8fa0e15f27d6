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

  /** Busy jiffies across all CPUs (user+nice+system+irq+softirq+steal,
    * NOT idle/iowait) from /proc/stat's aggregate cpu line. guest and
    * guest_nice (fields 9-10) are excluded too: Linux already folds
    * guest time into user/nice, so summing them double-counts VM work
    * on virtualization hosts and over-flags external load (the r15
    * ADVICE finding). -1 where /proc is unavailable. */
  private def totalBusyJiffies(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+") // "cpu u n s idle iow irq sirq steal guest gnice ..."
        // keep user,nice,system,irq,softirq,steal: skip idle (i=3),
        // iowait (i=4) and everything past steal (i=7)
        f.drop(1).take(8).zipWithIndex
          .filter { case (_, i) => i != 3 && i != 4 }
          .map(_._1.toLong).sum
      } finally src.close()
    } catch { case _: Throwable => -1L }

  /** This process's own consumed jiffies (utime+stime from
    * /proc/self/stat — GC and all JVM threads included). */
  private def ownJiffies(): Long =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/stat")), "UTF-8")
      // comm (field 2) may contain spaces — split after its closing paren
      val f = s.substring(s.lastIndexOf(')') + 2).split(" ")
      f(11).toLong + f(12).toLong // utime (field 14), stime (field 15)
    } catch { case _: Throwable => -1L }

  /** EXTERNAL busy-core meter — the r15 flag-quality fix: 1-min loadavg
    * counts this process's OWN 32-thread Spark work, so a busy bench on
    * a quiet host flags ITSELF (r15 closing run: 154/267 quiet_failed
    * with zero foreign JVMs and a quiet machine) — and the 1-minute
    * smoothing makes a post-run quiet wait pay a ~60 s decay tax on the
    * bench's own history. Sampling /proc/stat total busy jiffies MINUS
    * /proc/self jiffies over an explicit window measures what the flag
    * actually means: CPU cores someone ELSE is burning right now.
    * jiffy rate = USER_HZ = 100 on Linux (pinned; no JVM sysconf). */
  final class ExternalLoadMeter {
    private var lastBusy = totalBusyJiffies()
    private var lastOwn = ownJiffies()
    private var lastNs = System.nanoTime()
    /** External busy cores averaged since the previous sample (or
      * construction); advances the window. -1 where /proc is absent. */
    def sample(): Double = {
      val busy = totalBusyJiffies()
      val own = ownJiffies()
      val ns = System.nanoTime()
      if (busy < 0 || own < 0 || lastBusy < 0 || lastOwn < 0) { -1.0 }
      else {
        val wallSec = math.max(1e-3, (ns - lastNs) / 1e9)
        val ext = ((busy - lastBusy) - (own - lastOwn)) / 100.0 / wallSec
        lastBusy = busy; lastOwn = own; lastNs = ns
        math.max(0.0, ext)
      }
    }
  }

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
