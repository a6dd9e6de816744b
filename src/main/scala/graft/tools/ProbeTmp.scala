package graft.tools

import java.nio.file.{Files, Path}

/** Temp dirs for measurement probes, deleted on JVM exit. The large probes
  * synthesize multi-GB tables (RefScaleProbe: ~12 GB per run) and a few
  * consecutive runs of leftover `createTempDirectory` data can fill the
  * disk out from under the NEXT measurement — an exhausted /tmp fails
  * unrelated state-store commits and poisons gate artifacts. */
object ProbeTmp {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach(p => delete(p.toFile))
  }, "graft-probe-tmp-cleanup"))

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }

  /** A temp dir that is removed when the probe JVM exits. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toFile.getAbsolutePath
  }
}
