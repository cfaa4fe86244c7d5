package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; suites run
  * sequentially under sbt's default). */
object SharedSpark {
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("graft-test").getOrCreate()

  /** Per-JVM scratch root: concurrent test JVMs must not collide on
    * fixed /tmp paths (same failure class the per-JVM warehouse.dir in
    * GraftSession guards against). */
  lazy val tmpRoot: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-spec-").toString
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(d))
    }
    d
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  spark.sparkContext.setLogLevel("ERROR")

  /** Unique-per-JVM scratch path for test inputs/outputs. */
  def tmpPath(name: String): String = s"${SharedSpark.tmpRoot}/$name"

  /** Seeded generator for kernel-shaped inputs (N rows, G groups, null
    * probability p) mirroring the reference's differential-test recipes
    * (`/root/reference/README.md:38-140`). */
  def kernelData(n: Int, groups: Int, nullP: Double, seed: Long = 42L)
      : Seq[(Int, Long, Option[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val g = rnd.nextInt(groups)
      val v = if (rnd.nextDouble() < nullP) None else Some(rnd.nextInt(1000) / 10.0)
      (i, g.toLong, v)
    }
  }

  def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))
}
