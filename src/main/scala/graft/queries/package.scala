package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** Driver-contract query shape: (session, fixture dir) => result.
    * Every query obeys SURVEY.md §2B determinism rules D1–D6:
    * total ORDER BY over a unique key, rounded float aggregates,
    * column names identical to the oracle SQL's aliases.
    */
  type Q = (SparkSession, String) => DataFrame
}
