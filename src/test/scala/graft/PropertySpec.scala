package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.codec.JsonEnvelope
import graft.model.Connect
import graft.sinks.MergeSink
import graft.operators.AsOfJoin

/** ScalaCheck properties over the core algebra (driven directly — the
  * scalatestplus bridge isn't on the offline classpath). Mirrors the
  * reference's soak-style testing (CONNECT_DML_TEST interleavings) with
  * generated changelogs instead of stored procedures. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, p: Prop, minSuccessful: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val changelogGen: Gen[List[(Int, String, Int, Boolean)]] =
    Gen.listOfN(60, for {
      key <- Gen.choose(1, 8)
      payload <- Gen.alphaStr.map(_.take(5))
      del <- Gen.prob(0.2)
    } yield (key, payload, 0, del)).map(_.zipWithIndex.map {
      case ((k, p, _, d), i) => (k, p, i, d) // unique increasing seq
    })

  private def materialize(log: List[(Int, String, Int, Boolean)]) = {
    val df = log.toDF("id", "payload", "s", "del")
    val frame = Connect.toConnectFrame(df, Seq("id"), "t", "s")
      .withColumn("value", when(!col("value.del"), col("value").dropFields("del")))
    MergeSink.materialize(frame).select("id", "payload")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
  }

  test("merge = last-write-wins reference semantics on random changelogs") {
    check("lastWriteWins", Prop.forAll(changelogGen) { log =>
      val expected = log.groupBy(_._1).flatMap { case (k, entries) =>
        val last = entries.maxBy(_._3)
        if (last._4) None else Some((k, last._2))
      }.toSet
      materialize(log) == expected
    })
  }

  test("merge is replay-idempotent: applying the log twice changes nothing") {
    check("idempotent", Prop.forAll(changelogGen) { log =>
      materialize(log ++ log) == materialize(log)
    })
  }

  test("json envelope round-trip is identity for random primitive rows") {
    val rowGen = Gen.listOfN(8, for {
      id <- Gen.choose(-1000000, 1000000)
      s <- Gen.asciiPrintableStr.map(_.take(12))
      d <- Gen.choose(-1e6, 1e6)
      b <- Gen.oneOf(true, false)
    } yield (id, s, d, b))
    check("envelopeRoundTrip", Prop.forAll(rowGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((i, s, d, b), idx) => (idx, i, s, d, b) }
        .toDF("k", "i", "s", "d", "b")
      val frame = Connect.toConnectFrame(df, Seq("k"), "t", "k")
      val rt = JsonEnvelope.roundTrip(frame).select("value.*")
      rt.exceptAll(df).count() == 0 && df.exceptAll(rt).count() == 0
    }, minSuccessful = 10)
  }

  test("asof join agrees with the brute-force definition") {
    val gen = for {
      lefts <- Gen.listOfN(15, Gen.zip(Gen.choose(1, 4), Gen.choose(0L, 100L)))
      rights <- Gen.listOfN(10, Gen.zip(Gen.choose(1, 4), Gen.choose(0L, 100L)))
    } yield (lefts.zipWithIndex.map { case ((k, t), i) => (i, k, t) },
      // dedup right on (key, ts) for determinism
      rights.distinctBy(r => (r._1, r._2)).zipWithIndex
        .map { case ((k, t), i) => (i, k, t) })
    check("asof", Prop.forAll(gen) { case (lefts, rights) =>
      val l = lefts.toDF("lid", "k", "ts")
      val r = rights.toDF("rid", "k", "ts")
      val got = AsOfJoin.asof(l, r, "k", "k", "ts", "ts")
        .select(col("lid"), col("asof.rid"))
        .collect().map(x => x.getInt(0) -> (if (x.isNullAt(1)) None else Some(x.getInt(1)))).toMap
      val want = lefts.map { case (lid, k, ts) =>
        val cands = rights.filter(r => r._2 == k && r._3 <= ts)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(c => (c._3, c._1))._1))
      }.toMap
      got == want
    }, minSuccessful = 10)
  }
}
