package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sessions

/** Shared local SparkSession for all specs (getOrCreate ⇒ one JVM-wide
  * session; scalatest forks a single JVM per `Test / fork`). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4, "graft-test")
}
