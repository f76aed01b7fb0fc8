package graft

import org.apache.spark.sql.functions._
import graft.operators.Privacy

/** Library checks for the privacy surface: the published k-anonymity
  * guarantee (every non-suppressed equivalence class ≥ K), token
  * determinism, and the PII scrub patterns on a fixture. The
  * hash-exact gate is the q91 DuckDB oracle. */
class PrivacySpec extends SparkSuite {

  test("k-anonymity: every published class has >= K members; class dims broadcast") {
    val df = Privacy.queries("q91_k_anonymity")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.split("BroadcastHashJoin").length - 1 >= 2,
      s"both class-size dims must broadcast:\n$plan")
    val rows = df.collect()
    val published = rows.filter(_.getInt(4) == 0)
      .groupBy(r => (r.getString(1), r.getString(2), r.getString(3)))
    published.foreach { case (cls, members) =>
      assert(members.length >= Privacy.K_ANON,
        s"class $cls has ${members.length} < K=${Privacy.K_ANON} members")
    }
    // suppressed rows expose NO quasi-identifier at all
    rows.filter(_.getInt(4) == 1).foreach { r =>
      assert(Seq(1, 2, 3).forall(i => r.getString(i) == "<redacted>"), s"$r")
    }
    // generalization actually fired somewhere (else the test is vacuous)
    assert(rows.exists(_.getString(3) == "<any>"), "expected generalized rows")
  }

  test("pseudonymize: deterministic, key-distinct, salt-versioned") {
    val s = spark
    import s.implicits._
    val keys = Seq(1L, 2L, 42L, 1L).toDF("k")
      .select(col("k"), Privacy.pseudonymize(col("k")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(keys.toMap.size == 3, "distinct keys → distinct tokens")
    assert(keys.filter(_._1 == 1L).map(_._2).distinct.length == 1,
      "same key → same token on every row")
    assert(keys.forall(_._2.length == 16))
  }

  test("scrubPii: emails, cards, phones, IPs redacted; clean text untouched") {
    val s = spark
    import s.implicits._
    val out = Seq(
      "mail bob.smith+x@corp.example.org now",
      "card 4111 1111 1111 1111 exp 11/28",
      "call (555) 123-4567 or +1 555.123.4567",
      "host 192.168.254.3 port 80",
      "perfectly clean sentence with numbers 12 34"
    ).toDF("text").select(Privacy.scrubPii(col("text")).as("t"))
      .collect().map(_.getString(0))
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "card <CARD> exp 11/28")
    // RE2-portable contract: no lookbehind, so a bare country prefix
    // survives in front of the redacted national number.
    assert(out(2) == "call <PHONE> or +1 <PHONE>")
    assert(out(3) == "host <IP> port 80")
    assert(out(4) == "perfectly clean sentence with numbers 12 34")
  }

  test("q109: planted-span counts match the doc_id formula; corpus is false-positive-free") {
    val rows = Privacy.queries("q109_pii_scrub")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id % 3, s"n_email doc $id")
      assert(r.getLong(2) == id % 2, s"n_phone doc $id")
      assert(r.getLong(3) == 1L, s"n_ip doc $id")
      assert(r.getLong(4) == (id + 1) % 2, s"n_card doc $id")
      assert(r.getInt(5) == 1, s"false positive scrub on clean doc $id")
      assert(r.getString(6).length == 16)
    }
    // the scrub is a pure per-row map: no exchange in the plan
    val plan = Privacy.queries("q109_pii_scrub")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"q109 must not shuffle:\n$plan")
  }
}
