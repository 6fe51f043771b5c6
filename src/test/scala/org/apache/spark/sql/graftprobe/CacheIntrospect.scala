package org.apache.spark.sql.graftprobe

import org.apache.spark.sql.SparkSession

/** Test-only visibility shim: `SparkSession.sharedState` is
  * private[sql], so this object lives under `org.apache.spark.sql`
  * to let the cache-lifetime spec assert the cache manager is EMPTY
  * (the public catalog API can clear the cache but not inspect it).
  * Test sources only — never shipped with the library.
  */
object CacheIntrospect {
  def cacheManagerEmpty(s: SparkSession): Boolean =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
