package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session, lazy). */
object SparkSuite {
  lazy val spark: SparkSession = Engine.session(master = "local[4]",
    shufflePartitions = 4)
  val sf: String = "/root/testdata/sf0.001"
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.spark
  def sf: String = SparkSuite.sf

  /** Order-insensitive DataFrame equality on collected rows. */
  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val ca = a.collect().map(_.toString).sorted
    val cb = b.collect().map(_.toString).sorted
    assert(ca.length == cb.length,
      s"row counts differ: ${ca.length} vs ${cb.length}")
    ca.zip(cb).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"row $i differs:\n  a=$x\n  b=$y")
    }
  }

  /** Per-run temp dir, deleted on JVM exit along with any /tmp index
    * caches the engine derived from its path (q_bm25_indexed &co key
    * their persistent caches on the corpus dir — useful across rounds
    * for the REAL testdata dirs, pure debris for a test's throwaway
    * corpus; 100+ dead cache trees had accumulated over 12 rounds). */
  def tmpDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rmrf(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmrf)
        f.delete(); ()
      }
      rmrf(new java.io.File(dir))
      // derived caches embed the corpus path with non-alnums mangled
      val mangled = dir.replaceAll("[^A-Za-z0-9]", "_")
      Option(new java.io.File(
          System.getProperty("java.io.tmpdir")).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("graft_") &&
          f.getName.contains(mangled))
        .foreach(rmrf)
    }))
    dir
  }

  /** Run `f` with SQL confs set, restoring previous values after. */
  def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
