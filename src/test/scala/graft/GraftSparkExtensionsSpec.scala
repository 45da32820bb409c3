package graft

import org.apache.spark.sql.SparkSession

/** The `spark.sql.extensions` plug-in path: a session built WITHOUT any
  * imperative graft init must still see the whole function surface. */
class GraftSparkExtensionsSpec extends SparkSpec {

  test("a config-built session gets the surface; child sessions inherit it") {
    val prior = spark // materialize the shared session first
    // clear the default/active slots so getOrCreate BUILDS a session
    // (over the same SparkContext) instead of returning the shared one
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is loaded from the SparkCONTEXT conf (where
    // spark-submit --conf lands), which predates this spec and is
    // immutable through public API — so drive the same injection through
    // withExtensions; the conf-string→class loading is Spark's own code
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-test")
        .withExtensions(new GraftSparkExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(ext ne prior, "getOrCreate must have built a fresh session")
      // scalar alias, codegen kernel, analytics aggregate, pipeline text op
      val r = ext.sql(
        """SELECT toInt64OrNull('42') a, dotf(array(1.0D, 2.0D), array(3.0D, 4.0D)) b,
          |       letter_counts('abc')[0] c, quality_score('one two three four') q""".stripMargin)
        .collect().head
      assert(r.getLong(0) == 42L && r.getDouble(1) == 11.0 && r.getLong(2) == 1L)
      val agg = ext.sql(
        "SELECT uniqExact(v), quantileExact(0.5d, v) FROM VALUES (1), (2), (3) t(v)")
        .collect().head
      assert(agg.getLong(0) == 3L && agg.getDouble(1) == 2.0)
      // base-registry injection => newSession() inherits (temp-function
      // registration, by contrast, is per-session state and would not)
      val child = ext.newSession()
      assert(child.sql("SELECT epoch_ns(timestamp'1970-01-01 00:00:01Z') v")
        .collect().head.getLong(0) == 1000000000L)
      // line-level cleaning on the SQL surface: the 5-word punctuated
      // line survives; the short and boilerplate lines drop
      val cleaned = child.sql(
        """SELECT clean_lines('one two three four five.\ntoo short.\n' ||
          |'please enable javascript to view this.') v""".stripMargin)
        .collect().head.getString(0)
      assert(cleaned == "one two three four five.", cleaned)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
