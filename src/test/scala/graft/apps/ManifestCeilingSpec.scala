package graft.apps

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The enforced manifest ceiling (r13 verdict task #5): the round-13
  * probe measured the snapshot tier's last decade as SUPERLINEAR
  * (10⁶ lines: 13 s commits, sub-second resolves; 10⁷: 356 s / 8.1 s),
  * so [[Snapshots.commit]] now refuses a commit that GROWS a manifest
  * past the ceiling — loudly, pointing at the per-table `targetbytes`
  * knob that keeps real tables orders of magnitude below it. Pinned:
  *
  *  - a growth commit past the ceiling fails with the remedy named,
  *    and leaves the table exactly as it was;
  *  - non-growing commits on an already-over table are allowed — the
  *    remedy (compaction at a larger graduation size) must not be
  *    blocked by the very guard that demands it, and the table
  *    shrinks back under the ceiling through the normal grace window;
  *  - the `graft.snapshots.maxManifestLines` override lifts it (the
  *    manifest probe's documented escape hatch). */
class ManifestCeilingSpec extends SparkSpec {

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private val Prop = "graft.snapshots.maxManifestLines"

  private def mkFiles(root: Path, names: Seq[String]): Unit =
    names.foreach { n =>
      val out = fs.create(new Path(root, n), true)
      try out.write("x".getBytes("UTF-8")) finally out.close()
    }

  test("growth past the ceiling refuses loudly; shrinking and overridden commits land") {
    val prior = sys.props.get(Prop)
    val root = new Path(
      Files.createTempDirectory("snapceil").toString + "/t")
    try {
      fs.mkdirs(root)
      mkFiles(root, (0 until 10).map(i => f"part-$i%05d.parquet"))
      sys.props(Prop) = "8"
      val e = intercept[IllegalArgumentException] {
        Snapshots.commit(fs, root)
      }
      assert(e.getMessage.contains("targetbytes") &&
        e.getMessage.contains(Prop),
        s"the guard must name the remedy and the override: ${e.getMessage}")
      assert(Snapshots.currentFiles(fs, root).isEmpty,
        "a refused commit must leave the table unmanaged/unchanged")

      // the override lifts it — the probe's escape hatch
      sys.props(Prop) = "1000"
      assert(Snapshots.commit(fs, root) == 1)
      assert(Snapshots.currentFiles(fs, root).get.size == 10)

      // back under the tight ceiling the table is OVER (10 > 8): a
      // commit that grows it further still refuses…
      sys.props(Prop) = "8"
      mkFiles(root, Seq("part-extra.parquet"))
      val e2 = intercept[IllegalArgumentException] {
        Snapshots.commit(fs, root)
      }
      assert(e2.getMessage.contains("manifest lines"), e2.getMessage)
      fs.delete(new Path(root, "part-extra.parquet"), false)

      // …but the WAY DOWN stays open: a compaction-style commit
      // replacing 6 files (4 data + 6 retired = 10 lines, not more
      // than the head's 10) lands, and the two follow-up commits walk
      // the retirees through the grace window until the manifest is
      // back under the ceiling
      val replaced = (4 until 10).map(i => f"part-$i%05d.parquet")
      assert(Snapshots.commit(fs, root, replaced = replaced) == 2,
        "a non-growing commit on an over-ceiling table was refused")
      assert(Snapshots.commit(fs, root) == 3) // 4 data + 6 expiring
      assert(Snapshots.commit(fs, root) == 4) // 4 data — under ceiling
      assert(Snapshots.currentFiles(fs, root).get.size == 4)
      // and the expired files are physically gone
      assert(replaced.forall(r => !fs.exists(new Path(root, r))),
        "grace-window expiry did not delete the replaced files")
    } finally {
      prior match {
        case Some(v) => sys.props(Prop) = v
        case None => sys.props.remove(Prop)
      }
    }
  }
}
