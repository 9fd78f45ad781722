package graft.compare

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Relational parity vs the reference T-SQL post-processing
  * (`person_1/dedup_per.sql`, `person_2/fv_all_person_lookup.sql`). */
class PersonParitySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("W5 master selection: completeness desc, try_cast asc nulls last, id asc; underscore rules") {
    val rows = Seq(
      // cluster A: 12 most complete → master despite higher id
      ("2", "A", Some("x"), Some("y")),
      ("12", "A", Some("x"), Some("y")),  // tie on completeness → try_cast: 2 < 12 → "2" wins
      ("7_1", "A", Some("x"), Some("y")), // underscore id excluded (mixed cluster)
      // cluster B: all-underscore cluster keeps its rows eligible
      ("9_1", "B", Some("x"), None),
      ("3_2", "B", None, None)
    ).toDF("id", "cluster_id", "c1", "c2")
    val m = PersonParity.selectMasters(rows, Seq("c1", "c2"))
      .select("cluster_id", "id").as[(String, String)].collect().toMap
    assert(m("A") == "2")
    assert(m("B") == "9_1") // more complete than 3_2
  }

  test("W4/A7 golden fill: per-column latest non-null by last_updated") {
    val rows = Seq(
      ("A", ts("2024-01-01"), Some("old-name"), Some("111")),
      ("A", ts("2024-02-01"), Some("new-name"), None),
      ("A", ts("2024-03-01"), None, Some("222"))
    ).toDF("cluster_id", "last_updated", "name", "phone")
    val g = PersonParity.goldenFill(rows, Seq("name", "phone"))
      .as[(String, String, String)].head()
    assert(g == (("A", "new-name", "222")))
  }

  test("DOB repair: >=100 boundary-years or within 12mo of created → latest valid member DOB") {
    val masters = Seq(
      ("A", ts("1890-01-01"), ts("2020-06-15"), ts("2024-01-01")), // 130 yr → invalid
      ("B", ts("2020-03-01"), ts("2020-06-15"), ts("2024-01-01")), // within 12mo of created → invalid
      ("C", ts("1985-05-05"), ts("2020-06-15"), ts("2024-01-01"))  // valid, untouched
    ).toDF("cluster_id", "date_of_birth", "date_created", "last_updated")
    val members = Seq(
      ("A", ts("1975-02-02"), ts("2020-06-15"), ts("2024-02-01")),
      ("A", ts("1976-03-03"), ts("2020-06-15"), ts("2024-03-01")), // latest valid → replacement
      ("B", ts("2020-05-30"), ts("2020-06-15"), ts("2024-03-01"))  // also invalid → no repair
    ).toDF("cluster_id", "date_of_birth", "date_created", "last_updated")
    val r = PersonParity.repairDob(masters, members)
      .select("cluster_id", "date_of_birth")
      .as[(String, java.sql.Timestamp)].collect().toMap
    assert(r("A") == ts("1976-03-03"))
    assert(r("B") == ts("2020-03-01")) // invalid but no valid replacement → kept
    assert(r("C") == ts("1985-05-05"))
  }

  test("T-SQL DATEDIFF(YEAR) semantics: boundary crossings, not full years") {
    // 1924-12-31 → 2024-01-01 is 100 boundary crossings though only ~99.0 years
    val masters = Seq(
      ("X", ts("1924-12-31"), ts("2024-01-01"), ts("2024-01-01"))
    ).toDF("cluster_id", "date_of_birth", "date_created", "last_updated")
    val members = Seq(
      ("X", ts("1980-01-01"), ts("2024-01-01"), ts("2024-05-01"))
    ).toDF("cluster_id", "date_of_birth", "date_created", "last_updated")
    val r = PersonParity.repairDob(masters, members)
      .select("date_of_birth").as[java.sql.Timestamp].head()
    assert(r == ts("1980-01-01"), "1924-12-31 must count as >=100 via year boundaries")
  }

  test("W6 namespaced dense ids per entity type (1M/2M ranges)") {
    val lookup = Seq(
      ("person", 5L), ("person", 5L), ("person", 9L),
      ("child", 2L), ("child", 7L)
    ).toDF("entity_type", "cluster_id")
    val ids = PersonParity.namespacedIds(lookup,
      Map("person" -> 1000000L, "child" -> 2000000L))
      .select("entity_type", "cluster_id", "new_id")
      .distinct().as[(String, Long, Long)].collect().toSet
    assert(ids == Set(
      ("person", 5L, 1000000L), ("person", 9L, 1000001L),
      ("child", 2L, 2000000L), ("child", 7L, 2000001L)))
  }

  test("F2 sentence-case restore: given-name re-emission vectors (fv_dedup_per.sql:13-87)") {
    val rows = Seq(
      Some("mary anne LOUISE de la cruz"), // 3+ tokens: remainder cased as ONE value
      Some("JOHN paul"),                   // 2 tokens
      Some("  ALICE  "),                   // 1 token, outer whitespace trimmed
      Some(""),                            // empty → all NULL
      None                                 // NULL → all NULL
    ).toDF("given_names")
    val (g1, g2, g3) = PersonOps.splitGivenNamesCased(col("given_names"))
    val out = rows.select(g1.as("a"), g2.as("b"), g3.as("c"))
      .as[(Option[String], Option[String], Option[String])].collect()
    assert(out(0) == ((Some("Mary"), Some("Anne"), Some("Louise de la cruz"))),
      s"remainder must get ONE capital (not initcap): ${out(0)}")
    assert(out(1) == ((Some("John"), Some("Paul"), None)))
    assert(out(2) == ((Some("Alice"), None, None)))
    assert(out(3) == ((None, None, None)))
    assert(out(4) == ((None, None, None)))
  }

  test("cross-entity COALESCE fill: master's NULL filled from highest-id non-master member") {
    // mirrors the cni_number fill (fv_person.sql:276-302): members span
    // entity types in the unioned namespace; only NULL masters change;
    // donor = non-null member with the greatest numeric id, masters
    // themselves never donate
    val masters = Seq(
      (10L, Option.empty[String]),        // filled from member 31 (highest donor)
      (40L, Some("KEEP")),                // non-null → untouched
      (50L, Option.empty[String])         // cluster without donors → stays NULL
    ).toDF("cluster_id", "cni_number")
    val members = Seq(
      (10L, 10L, Some("MASTER-VAL")),     // master row: excluded as donor
      (10L, 22L, Some("CNI-22")),
      (10L, 31L, Some("CNI-31")),         // highest id wins
      (10L, 35L, Option.empty[String]),   // null member: not a donor
      (40L, 41L, Some("CNI-41")),
      (50L, 51L, Option.empty[String])
    ).toDF("cluster_id", "id", "cni_number")
    val out = PersonParity.crossEntityFill(masters, members, "cni_number",
        orderKey = col("id"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(10L) == Some("CNI-31"))
    assert(out(40L) == Some("KEEP"))
    assert(out(50L) == None)
  }
}
