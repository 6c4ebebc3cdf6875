package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test run. */
object SparkTestSession {
  lazy val spark: SparkSession = Session.local("graft-test", cores = 4,
    warehouseDir = Some(
      java.nio.file.Files.createTempDirectory("graft_wh").toString))
}
