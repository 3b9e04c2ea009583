package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkTestBase

class RetentionSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) =
    Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z").plusSeconds(minute * 60L))

  private val handmade = Seq(
    Ev(1, "insert", ts(0), Some(10)),
    Ev(1, "update", ts(5), Some(11)),
    Ev(1, "update", ts(20), Some(12)),
    Ev(2, "insert", ts(1), Some(20)),
    Ev(2, "delete", ts(6), None), // dead before the horizon
    Ev(3, "insert", ts(15), Some(30)),
    Ev(4, "insert", ts(2), Some(40))) // untouched since before horizon

  private val horizon = ts(10)

  test("expireHistory: per-key latest <= horizon survives, tombstones retained") {
    val expired = Retention.expireHistory(handmade.toDF(), lit(horizon), Seq("pk"))
      .select("pk", "action", "update_date")
      .as[(Long, String, Timestamp)].collect().toSet
    assert(expired == Set(
      (1L, "update", ts(5)),   // pk1: ts(0) dropped, ts(5) is latest <= H
      (2L, "delete", ts(6)),   // tombstone RETAINED
      (4L, "insert", ts(2)),   // single old version survives
      (1L, "update", ts(20)),  // after horizon: untouched
      (3L, "insert", ts(15))))
  }

  test("expireHistory: asOf at/after the horizon is unchanged (handmade)") {
    val orig = handmade.toDF()
    val expired = Retention.expireHistory(orig, lit(horizon), Seq("pk"))
    for (m <- Seq(10, 15, 20, 25)) {
      val a = Versioned.asOf(orig, lit(ts(m)), Seq("pk"))
        .select("pk", "v").as[(Long, Option[Long])].collect().toMap
      val b = Versioned.asOf(expired, lit(ts(m)), Seq("pk"))
        .select("pk", "v").as[(Long, Option[Long])].collect().toMap
      assert(a == b, s"asOf(${ts(m)}) diverged after expiry")
    }
    // and snapshots agree
    val s1 = Versioned.latestSnapshot(orig, Seq("pk")).select("pk", "v")
      .as[(Long, Option[Long])].collect().toMap
    val s2 = Versioned.latestSnapshot(expired, Seq("pk")).select("pk", "v")
      .as[(Long, Option[Long])].collect().toMap
    assert(s1 == s2)
  }

  test("property: expiry preserves every as-of at/after the horizon") {
    val genEv = for {
      k <- Gen.choose(1L, 6L)
      m <- Gen.choose(0, 30)
      act <- Gen.frequency(5 -> Gen.const("insert"), 3 -> Gen.const("update"),
        2 -> Gen.const("delete"))
      v <- Gen.choose(0L, 99L)
    } yield Ev(k, act, ts(m), if (act == "delete") None else Some(v))
    // one event per (pk, ts): same-timestamp ties are broken by action
    // desc in BOTH paths, but the collapse keeps only one row — dedup
    // keeps the generator inside the operator's documented contract
    val genLog = Gen.listOfN(25, genEv)
      .map(_.groupBy(e => (e.pk, e.update_date)).values.map(_.head).toSeq)
    val prop = Prop.forAll(genLog, Gen.choose(5, 25)) { (evs, hMin) =>
      evs.nonEmpty ==> {
        val orig = evs.toDF()
        val expired = Retention.expireHistory(orig, lit(ts(hMin)), Seq("pk"))
        (hMin to 30 by 5).forall { m =>
          val a = Versioned.asOf(orig, lit(ts(m)), Seq("pk"))
            .select("pk", "v").as[(Long, Option[Long])].collect().toMap
          val b = Versioned.asOf(expired, lit(ts(m)), Seq("pk"))
            .select("pk", "v").as[(Long, Option[Long])].collect().toMap
          a == b
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("expireHistory: changesBetween after the horizon is unchanged") {
    val orig = handmade.toDF()
    val expired = Retention.expireHistory(orig, lit(horizon), Seq("pk"))
    def changes(df: org.apache.spark.sql.DataFrame) =
      Versioned.changesBetween(df, lit(ts(11)), lit(ts(30)))
        .select("pk", "action", "update_date")
        .as[(Long, String, Timestamp)].collect().toSet
    assert(changes(orig) == changes(expired) && changes(orig).nonEmpty)
  }

  test("eraseKeys: every version of the key vanishes, others byte-identical") {
    val orig = handmade.toDF()
    val erased = Retention.eraseKeys(orig, Seq(Tuple1(1L)).toDF("pk"), Seq("pk"))
    assert(erased.filter($"pk" === 1L).count() == 0L)
    assert(erased.count() == orig.count() - 3) // pk1 had 3 versions
    // erasing a tombstoned key removes the tombstone too
    val erased2 = Retention.eraseKeys(orig, Seq(Tuple1(2L)).toDF("pk"), Seq("pk"))
    assert(erased2.filter($"pk" === 2L).count() == 0L)
    // non-erased keys' rows are identical
    assert(erased.filter($"pk" =!= 1L).exceptAll(orig.filter($"pk" =!= 1L)).isEmpty)
  }
}
