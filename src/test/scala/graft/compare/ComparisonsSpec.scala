package graft.compare

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reproduces the reference's gamma level tables (§2.11) on constructed
  * cases — operator parity vs `person_1/link_model_per.py:1153-1201`. */
class ComparisonsSpec extends SparkSpec {
  import spark.implicits._

  private def g1(df: org.apache.spark.sql.DataFrame): Int =
    df.select(col("g")).as[Int].head()

  test("NameComparison levels: exact=3, jw>=0.9=2, dmeta overlap=1, else=0, null=-1") {
    def nc(l: String, r: String): Int = {
      val df = Seq((Option(l), Option(r))).toDF("l", "r")
        .withColumn("dm_l", PersonOps.dmetaphone(col("l")))
        .withColumn("dm_r", PersonOps.dmetaphone(col("r")))
        .withColumn("g", Comparisons.nameComparison(col("l"), col("r"), col("dm_l"), col("dm_r")))
      g1(df)
    }
    assert(nc("smith", "smith") == 3)
    assert(nc("martha", "marhta") == 2)  // jw 0.9611
    assert(nc("geoff", "jeff") == 1)     // jw 0.78 < 0.9, dmetaphone 'JF' overlaps
    assert(nc("smith", "jones") == 0)
    assert(nc(null, "smith") == -1)
  }

  test("DateOfBirthComparison levels 5/4/3/2/1/0/-1") {
    def dob(l: String, r: String): Int = {
      val df = Seq((Option(l), Option(r))).toDF("ls", "rs")
        .withColumn("l", to_timestamp(col("ls")))
        .withColumn("r", to_timestamp(col("rs")))
        .withColumn("g", Comparisons.dateOfBirthComparison(col("l"), col("r")))
      g1(df)
    }
    assert(dob("1990-03-15", "1990-03-15") == 5)
    assert(dob("1990-03-15", "1990-03-14") == 4)  // DL=1 on string (day digit)
    assert(dob("1990-03-15", "1990-04-10") == 3)  // within 1 month, DL=2
    assert(dob("1990-03-15", "1990-11-20") == 2)  // within 1 yr, DL>1
    assert(dob("1990-03-15", "1997-06-02") == 1)  // within 10 yr, DL>1
    assert(dob("1990-03-15", "2005-07-01") == 0)
    assert(dob(null, "1990-01-01") == -1)
  }

  test("ExactMatch and DamerauLevenshteinAtThresholds levels") {
    def em(l: String, r: String): Int =
      g1(Seq((Option(l), Option(r))).toDF("l", "r")
        .withColumn("g", Comparisons.exactMatch(col("l"), col("r"))))
    assert(em("M", "M") == 1); assert(em("M", "F") == 0); assert(em(null, "M") == -1)

    def dl(l: String, r: String): Int =
      g1(Seq((Option(l), Option(r))).toDF("l", "r")
        .withColumn("g", Comparisons.damerauLevenshteinAtThresholds(col("l"), col("r"))))
    assert(dl("3121", "3121") == 2)
    assert(dl("3121", "3112") == 1) // transposition = 1 ≤ 2
    assert(dl("3121", "9999") == 0)
    assert(dl("3121", null) == -1)
  }

  test("ForenameSurnameComparison levels 5/4/3/2/1/0/-1") {
    def fs(fl: String, fr: String, sl: String, sr: String): Int =
      g1(Seq((Option(fl), Option(fr), Option(sl), Option(sr))).toDF("fl", "fr", "sl", "sr")
        .withColumn("g", Comparisons.forenameSurnameComparison(
          col("fl"), col("fr"), col("sl"), col("sr"))))
    assert(fs("john", "john", "smith", "smith") == 5)
    assert(fs("john", "smith", "smith", "john") == 4) // reversed
    assert(fs("martha", "marhta", "dunlap", "dunlop") == 3) // both jw >= 0.9
    assert(fs("john", "peter", "smith", "smith") == 2)
    assert(fs("john", "john", "smith", "jones") == 1)
    assert(fs("john", "peter", "smith", "jones") == 0)
    assert(fs(null, "x", "y", "z") == -1)
  }

  test("cleaning functions F1-F3, P2, P8") {
    val df = Seq(("O'Brien-Smith", "mary anne therese  ", "U"))
      .toDF("name", "gns", "sex")
      .withColumn("clean", PersonOps.cleanName(col("name")))
      .withColumn("sex_n", PersonOps.codesToNull(col("sex"), "U", "X", "V"))
    val r = df.select("clean", "sex_n").as[(String, Option[String])].head()
    assert(r == (("obriensmith", None)))

    val (g1c, g2c, g3c) = PersonOps.splitGivenNames(col("gns"))
    val s = df.select(g1c.as("a"), g2c.as("b"), g3c.as("c"))
      .as[(String, Option[String], Option[String])].head()
    assert(s._1 == "mary" && s._2.contains("anne"))

    val nc = Seq((Some("jo"), None: Option[String])).toDF("gn", "sn")
      .select(PersonOps.nameConcat(col("gn"), col("sn")).as("x")).as[String].head()
    assert(nc == "jo")

    def ce(gn: Option[String], sn: Option[String], dob: Option[String]): Boolean =
      Seq((gn, sn, dob)).toDF("gn", "sn", "dobs")
        .withColumn("dob", to_timestamp(col("dobs")))
        .select(PersonOps.canExclude(col("gn"), col("sn"), col("dob")).as("x"))
        .as[Boolean].head()
    assert(ce(None, None, Some("1990-01-01")))
    assert(ce(Some("jo"), None, None))
    assert(!ce(Some("jo"), Some("smith"), None))
    assert(!ce(Some("unborn baby"), None, None)) // unborn exempt
  }

  test("clampDob nulls out-of-range timestamps (P7 parity)") {
    val df = Seq("2988-02-16", "1990-05-05", "1600-01-01").toDF("s")
      .withColumn("dob", to_timestamp(col("s")))
      .select(PersonOps.clampDob(col("dob")).as("x"))
    assert(df.filter(col("x").isNotNull).count() == 1)
  }
}
