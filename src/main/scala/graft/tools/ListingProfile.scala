package graft.tools

import java.nio.file.Path

/** Micro-profile of the warm listCommits stages at high commit counts —
  * the measurement behind the r11 warm-plan caches (listing / manifest /
  * prefix / assembly; results in BASELINE.md). Reuses
  * [[CommitScaleProbe.synthesize]]'s metadata-only namespace.
  * Usage: runMain graft.tools.ListingProfile [n]. */
object ListingProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val root: Path = CommitScaleProbe.synthesize(n, withManifest = true)
    val ns = root.resolve("default")

    def t[A](label: String)(body: => A): Unit = {
      body // warm
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      println(f"[lp] $label%-22s med=${samples.sorted.apply(1)}%8.1f ms")
    }

    t("commitFiles")(graft.sources.WalrusLogSource.commitFiles(ns))
    val names = graft.sources.WalrusLogSource.commitFiles(ns)
    t("commitIdOf all")(names.map(graft.log.WalrusLog.commitIdOf))
    t("readNewestManifest")(graft.log.WalrusLog.readNewestManifest(ns))
    t("assembleCommits")(graft.sources.WalrusLogSource.assembleCommits(ns))
    t("listCommits")(graft.sources.WalrusLogSource.listCommits(ns))
    graft.log.WalrusLog.deleteRecursively(root)
  }
}
