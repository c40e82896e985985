package graft.queries

import org.apache.spark.sql.DataFrame

/** Shared model-materialization root for the trained-variant gate
  * queries (q141/q145/q156/q167, the sketch estimates): a query
  * persists its trained model/estimates as parquet and the oracle SQL
  * reads the SAME files back, so both sides consume byte-identical
  * values.
  *
  * The root is a PER-JVM temp directory, not a fixed path: the oracle
  * SQL strings interpolate the path at dump time, so each Verify run's
  * oracle reads exactly the models that run trained. A fixed path let a
  * later run at a different scale factor overwrite the models out from
  * under an earlier run's still-pending oracle check (caught by the
  * round-12 25x audit: q145's 25x-trained codebooks were clobbered by a
  * subsequent sf0.01 gate run before DuckDB replayed them). */
object Models {
  // lazy: only JVMs that actually build the query catalog pay for (and
  // leave behind) the temp dir. NOT delete-on-exit — the DuckDB oracle
  // reads these files AFTER the Verify JVM exits; /tmp reclamation is
  // the host's.
  lazy val dir: String = java.nio.file.Files
    .createTempDirectory("graft_models").toString

  /** Persist a small model table and read it back, so the search pass
    * and the oracle consume byte-identical parquet values. */
  def materialize(df: DataFrame, name: String): DataFrame = {
    val path = s"$dir/$name"
    df.coalesce(1).write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
