package graft.compare

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SuburbAndSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("F11 suburb cleaning pipeline") {
    val got = Seq("Epping (West) 2121", "12 Smith Road, Ryde", "  kellyville ",
      "###", "Main St Glebe")
      .toDF("s").select(PersonOps.cleanSuburb(col("s")).as("c"))
      .as[Option[String]].collect()
    assert(got(0).contains("EPPING"))
    assert(got(1).contains("SMITH")) // comma head, road keyword dropped
    assert(got(2).contains("KELLYVILLE"))
    assert(got(3).isEmpty)
    assert(got(4).contains("MAIN GLEBE"))
  }

  test("F12 address → suburb extraction") {
    val got = Seq("12 Baker Street Epping", "Unit 4 7 High Rd North Ryde NSW",
      "UNKNOWN").toDF("a")
      .select(PersonOps.extractSuburb(col("a")).as("s"))
      .as[Option[String]].collect()
    assert(got(0).contains("EPPING"))
    assert(got(1).contains("NORTH RYDE"))
    assert(got(2).isEmpty)
  }

  test("U1 parent unpivot via stack") {
    val child = Seq(
      (1L, "alice", "1980-01-01", "bob", "1979-02-02"),
      (2L, "carol", "1990-03-03", null, null))
      .toDF("child_id", "parent1_name", "parent1_dob", "parent2_name", "parent2_dob")
    val up = PersonOps.unpivotParents(child)
    assert(up.count() == 3)
    assert(up.filter(col("parent_role") === "parent2").count() == 1)
    val roles = up.filter(col("child_id") === 1L)
      .select("parent_role").as[String].collect().sorted
    assert(roles.sameElements(Array("parent1", "parent2")))
  }

  test("A2 sampled level proportions: bounded pairs, proportions sum to 1") {
    val docs = (1L to 200L).map(i => (i, if (i % 2 == 0) "M" else "F")).toDF("id", "sex")
    val props = PairSampling.levelProportions(spark, docs,
      Comparisons.exactMatch(col("sex_l"), col("sex_r")), maxPairs = 500L)
    val rows = props.select("gamma", "pairs", "proportion")
      .as[(Int, Long, Double)].collect()
    val totalPairs = rows.map(_._2).sum
    assert(totalPairs <= 1200, s"sampled too many pairs: $totalPairs") // ~maxPairs scale
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    assert(rows.map(_._1).toSet == Set(0, 1)) // exact-match gammas only
  }
}
