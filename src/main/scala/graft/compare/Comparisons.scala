package graft.compare

import graft.expr.GraftFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The comparison DSL — Splink's gamma-level semantics re-expressed as
  * composable Column builders (SURVEY §2.11). Every comparison is an
  * ordered level table evaluated top-down, "first match wins"; gamma = −1
  * when either side is NULL ("Invalid (NULL)",
  * `person_1/link_model_per.py:1156`).
  *
  * Level tables are bit-faithful to the reference configs at
  * `person_1/link_model_per.py:616-651` (semantics spelled out at
  * `:1153-1201`); the spec reproduces each table on constructed cases.
  */
object Comparisons {

  /** Ordered-levels evaluator: levels as (condition, gamma), highest first;
    * −1 if either input NULL; 0 otherwise. */
  def gamma(nullCols: Seq[Column], levels: Seq[(Column, Int)]): Column = {
    val anyNull = nullCols.map(_.isNull).reduce(_ || _)
    levels.foldLeft(when(anyNull, lit(-1))) { case (acc, (cond, g)) =>
      acc.when(cond, lit(g))
    }.otherwise(lit(0))
  }

  /** NameComparison(col, jw=0.9, dmeta_col):
    * 3 exact; 2 JW ≥ 0.9; 1 dmetaphone arrays overlap; 0; −1
    * (`person_1/link_model_per.py:616-628`, levels `:1157-1173`). */
  def nameComparison(l: Column, r: Column, dmL: Column, dmR: Column,
                     jwThreshold: Double = 0.9): Column =
    gamma(Seq(l, r), Seq(
      (l === r, 3),
      (GraftFunctions.jaroWinkler(l, r) >= jwThreshold, 2),
      (arrays_overlap(dmL, dmR), 1)))

  /** DateOfBirthComparison(thresholds=[1 month, 1 yr, 10 yr] + DL ≤ 1 on
    * the string form): 5 exact; 4 DL ≤ 1; 3 ≤ 1 month; 2 ≤ 1 yr;
    * 1 ≤ 10 yr; 0; −1 (`:630-635`, semantics `:1175-1183`). */
  def dateOfBirthComparison(l: Column, r: Column): Column = {
    val ls = date_format(l, "yyyy-MM-dd")
    val rs = date_format(r, "yyyy-MM-dd")
    val mb = abs(months_between(l, r))
    gamma(Seq(l, r), Seq(
      (l === r, 5),
      (GraftFunctions.damerauLevenshtein(ls, rs) <= 1, 4),
      (mb <= 1, 3),
      (mb <= 12, 2),
      (mb <= 120, 1)))
  }

  /** ExactMatch: 1 exact; 0; −1 (`:638-640`). */
  def exactMatch(l: Column, r: Column): Column =
    gamma(Seq(l, r), Seq((l === r, 1)))

  /** DamerauLevenshteinAtThresholds(col, 2): 2 exact; 1 DL ≤ 2; 0; −1
    * (`:642-644`, semantics `:1186-1190`). */
  def damerauLevenshteinAtThresholds(l: Column, r: Column, threshold: Int = 2): Column =
    gamma(Seq(l, r), Seq(
      (l === r, 2),
      (GraftFunctions.damerauLevenshtein(l, r) <= threshold, 1)))

  /** ForenameSurnameComparison(gn1, surname, jw=0.9):
    * 5 exact concat; 4 reversed columns ("both directions", `:1195`);
    * 3 JW ≥ 0.9 on both; 2 exact surname; 1 exact forename; 0; −1
    * (`:646-651`, semantics `:1192-1200`). */
  def forenameSurnameComparison(fnL: Column, fnR: Column,
                                snL: Column, snR: Column,
                                jwThreshold: Double = 0.9): Column = {
    val jw = (a: Column, b: Column) => GraftFunctions.jaroWinkler(a, b)
    gamma(Seq(fnL, fnR, snL, snR), Seq(
      (fnL === fnR && snL === snR, 5),
      (fnL === snR && snL === fnR, 4),
      (jw(fnL, fnR) >= jwThreshold && jw(snL, snR) >= jwThreshold, 3),
      (snL === snR, 2),
      (fnL === fnR, 1)))
  }

  /** Web-text analog levels (engine §2.11 mapping): exact-hash equal >
    * Jaccard ≥ t > SimHash-Hamming ≤ h > substring — see
    * [[graft.stages.Scoring]]. */
}

/** The reference's cleaning / derivation scalar functions (SURVEY §2.4),
  * as pure Catalyst column expressions — no UDFs. */
object PersonOps {

  /** F1: remove apostrophes and hyphens, lowercase
    * (`person_1/link_model_per.py:371-395`). */
  def cleanName(c: Column): Column = lower(translate(c, "'-", ""))

  /** F3: name_concat = trim(gn1 ' ' surname), NULL-safe coalesce
    * (`person_1/link_model_per.py:594-597`). */
  def nameConcat(gn1: Column, surname: Column): Column =
    trim(concat_ws(" ", coalesce(gn1, lit("")), coalesce(surname, lit(""))))

  /** F2: given_names 3-way split — first token, second token, remainder
    * (`person_2/person_a/person_a.py:46-65`). */
  def splitGivenNames(c: Column): (Column, Column, Column) = {
    val parts = split(trim(c), " ", 3)
    (element_at(parts, 1),
      when(size(parts) >= 2, element_at(parts, 2)),
      when(size(parts) >= 3, element_at(parts, 3)))
  }

  /** Sentence-case one value: UPPER(first char) + LOWER(everything after) —
    * the `UPPER(LEFT(val,1)) + LOWER(SUBSTRING(val,2,LEN(val)))` chain the
    * dedup SQL applies when re-emitting names
    * (`person_2/person_a/fv_dedup_per.sql:67`, `person_2/fv_person.sql:185-256`).
    * NULL or empty → NULL (the reference's `WHEN val = '' THEN NULL`).
    * NOT initcap: a multi-word remainder gets ONE leading capital and the
    * rest lowered ("mary anne" → "Mary anne"), exactly the T-SQL form. */
  def sentenceCase(c: Column): Column =
    when(c.isNull || c === "", lit(null))
      .otherwise(concat(upper(c.substr(lit(1), lit(1))),
        lower(c.substr(lit(2), length(c)))))

  /** F2 sentence-case variant: the dedup SQL's given-name re-emission
    * (`person_2/person_a/fv_dedup_per.sql:13-87`): gn1 = first token
    * sentence-cased, gn2 = second token sentence-cased, gn3 = ALL text
    * after the second space sentence-cased AS A WHOLE (first char upper,
    * every later word lowered — see [[sentenceCase]]). Missing parts →
    * NULL. Assumes single-space-separated input like the reference
    * (its CHARINDEX arithmetic mis-slices doubled spaces). */
  def splitGivenNamesCased(c: Column): (Column, Column, Column) = {
    val (g1, g2, g3) = splitGivenNames(c)
    (sentenceCase(g1), sentenceCase(g2), sentenceCase(g3))
  }

  /** P2: code-to-NULL normalisation (`person_1/link_model_per.py:129-137`). */
  def codesToNull(c: Column, codes: String*): Column =
    when(c.isin(codes: _*), lit(null)).otherwise(c)

  /** F4: double-metaphone pair column. */
  def dmetaphone(c: Column): Column = GraftFunctions.dmetaphone(c)

  /** P8: can_exclude flag — both names NULL, or one name + DOB NULL;
    * 'unborn' rows exempt (`person_2/person_a/person_a.py:838-856`). */
  def canExclude(gn1: Column, surname: Column, dob: Column): Column = {
    val unborn = lower(coalesce(gn1, lit(""))).contains("unborn") ||
      lower(coalesce(surname, lit(""))).contains("unborn")
    when(unborn, lit(false))
      .when(gn1.isNull && surname.isNull, lit(true))
      .when((gn1.isNull || surname.isNull) && dob.isNull, lit(true))
      .otherwise(lit(false))
  }

  /** P7: out-of-range DOB → NULL (pandas ns-timestamp range kept for
    * parity, `person_1/link_model_per.py:1026-1041`). */
  def clampDob(c: Column): Column = {
    val lo = to_timestamp(lit("1677-09-21 00:12:44"))
    val hi = to_timestamp(lit("2262-04-11 23:47:16"))
    when(c < lo || c > hi, lit(null)).otherwise(c)
  }

  /** F16: TRY_CAST ordering key for hybrid string ids
    * (`person_1/dedup_per.sql:110-112`). */
  def tryCastId(colName: String): Column = expr(s"try_cast($colName AS BIGINT)")

  /** F11: suburb-code regex cleaning pipeline
    * (`person_2/person_a/person_a.py:381-435`) — bracketed qualifiers,
    * digits, road keywords, comma-split head, whitespace squeeze. Pure
    * Catalyst regexp_replace chain, one step per reference step. */
  def cleanSuburb(c: Column): Column = {
    val steps: Seq[Column => Column] = Seq(
      x => regexp_replace(x, "\\(.*?\\)", ""),          // drop (qualifiers)
      x => regexp_replace(x, "[0-9]+", ""),              // drop digits
      x => regexp_replace(x,
        "(?i)\\b(ROAD|RD|STREET|ST|AVENUE|AVE|DRIVE|DR|COURT|CT|HIGHWAY|HWY)\\b", ""),
      x => split(x, ",").getItem(0),                     // head of comma list
      x => regexp_replace(x, "[^A-Za-z ]", " "),        // punctuation → space
      x => regexp_replace(x, "\\s+", " "),              // squeeze
      x => upper(trim(x)))
    val cleaned = steps.foldLeft(c)((acc, f) => f(acc))
    when(cleaned === "", lit(null)).otherwise(cleaned)
  }

  /** F12: address → suburb extraction (`person_2/person_c/person_c.py:404-639`):
    * take the trailing alpha segment after the last street keyword or
    * number, strip state abbreviations and the exclusion list. */
  def extractSuburb(address: Column): Column = {
    val afterKeyword = regexp_extract(address,
      "(?i)(?:\\b(?:ROAD|RD|STREET|ST|AVENUE|AVE|DRIVE|DR|COURT|CT|HIGHWAY|HWY|PLACE|PL|CRESCENT|CRES)\\b)\\s+([A-Za-z ]+)$", 1)
    val fallback = regexp_extract(address, "([A-Za-z ]+)$", 1)
    val raw = when(length(afterKeyword) > 0, afterKeyword).otherwise(fallback)
    val noState = regexp_replace(upper(trim(raw)),
      "\\b(NSW|VIC|QLD|SA|WA|TAS|NT|ACT)\\b", "")
    val squeezed = trim(regexp_replace(noState, "\\s+", " "))
    when(squeezed === "" || squeezed.isin("UNKNOWN", "N A", "NA"), lit(null))
      .otherwise(squeezed)
  }

  /** U1: parent1/parent2 unpivot of the child table via stack
    * (`person_2/person_c/person_c.py:28-96`). */
  def unpivotParents(child: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    child.select(col("child_id"), expr(
      """stack(2,
        |  'parent1', parent1_name, parent1_dob,
        |  'parent2', parent2_name, parent2_dob)
        |AS (parent_role, parent_name, parent_dob)""".stripMargin))
      .filter(col("parent_name").isNotNull)
}

/** A2-analog: sampled pair statistics — the reference's u-estimation shape
  * (`person_1/link_model_per.py:692-701`): sample up to maxPairs random
  * pairs and report the proportion of each comparison level. The MinHash
  * engine needs no m/u, but the sampling operator itself is part of the
  * surface (and doubles as a calibration tool for thresholds). */
object PairSampling {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  def levelProportions(spark: SparkSession, docs: DataFrame, gammaCol: Column,
                       maxPairs: Long, seed: Long = 42L): DataFrame = {
    val n = docs.count()
    if (n < 2) return spark.emptyDataFrame
    // sample each side at sqrt(maxPairs/n^2) rate so the cross of the two
    // samples ≈ maxPairs rows — never materialising the full n^2 space
    val frac = math.min(1.0, math.sqrt(maxPairs.toDouble) / n)
    val l = docs.sample(frac, seed).select(docs.columns.toIndexedSeq.map(c => col(c).as(c + "_l")): _*)
    val r = docs.sample(frac, seed + 1).select(docs.columns.toIndexedSeq.map(c => col(c).as(c + "_r")): _*)
    l.crossJoin(r)
      .withColumn("gamma", gammaCol)
      .groupBy("gamma").agg(count(lit(1)).as("pairs"))
      .withColumn("proportion", col("pairs") / sum("pairs").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
  }
}
