package graft.tools

import java.nio.file.{Files, Path}

/** Scratch micro-profile of the warm listCommits stages at high commit
  * counts — drives the covered-prefix cache work (VERDICT r10 #7).
  * Usage: runMain graft.tools.ListingProfile [n]. */
object ListingProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    // reuse CommitScaleProbe's synthesizer via reflection-free copy: call
    // the probe's private synthesize is not accessible; inline a minimal
    // twin (manifest mode only)
    import org.json4s.{DefaultFormats, Formats}
    import org.json4s.jackson.Serialization
    import graft.log.{CommitRecord, LogManifest, ManifestEntry, TopicRange}
    implicit val formats: Formats = DefaultFormats
    val root = Files.createTempDirectory(s"graft-lp-$n-")
    val ns = root.resolve("default")
    val commitsDir = ns.resolve("commits")
    Files.createDirectories(commitsDir)
    val records = new scala.collection.mutable.ArrayBuffer[CommitRecord](n)
    var i = 0
    while (i < n) {
      val ts = 1704067200000L + i * 1000L
      val topics = (0 until 4).map { t =>
        s"t$t" -> TopicRange(i * 100L, (i + 1) * 100L, 5000L,
          Some(ts * 1000L), Some(ts * 1000L))
      }.toMap
      val rec = CommitRecord(i.toLong, ts, topics)
      records += rec
      Files.write(commitsDir.resolve(f"$i%012d.json"),
        Serialization.write(rec).getBytes("UTF-8"))
      i += 1
    }
    val manifestsDir = ns.resolve("manifests")
    Files.createDirectories(manifestsDir)
    val entries = records.map(r =>
      ManifestEntry(r.id, r.tsMillis, r.topics, r.tag, r.replaces)).toSeq
    Files.write(manifestsDir.resolve(f"manifest-${n - 1}%012d.json"),
      Serialization.write(LogManifest((n - 1).toLong, entries)).getBytes("UTF-8"))

    def t[A](label: String)(body: => A): A = {
      body // warm
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      println(f"[lp] $label%-22s med=${samples.sorted.apply(1)}%8.1f ms")
      val t0 = System.nanoTime(); val a = body
      val _ = t0; a
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
