package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** Signature the driver calls: (session, sf-dir) => lazy DataFrame. */
  type Q = (SparkSession, String) => DataFrame
}
