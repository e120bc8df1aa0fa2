package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Property tests for the algorithmic claims the round-6 analytics
  * operators rest on: the SymSpell deletion-neighborhood pigeonhole
  * (any distance-1 pair shares a band key), split-assignment
  * stability and balance, and the stride-chunk arithmetic — random
  * inputs against exact reference semantics. */
class AnalyticsPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  /** The band keys q_fuzzy_resolve generates: the word itself plus
    * every single-deletion variant (driver-side mirror of the SQL
    * fragment). */
  private def delKeys(w: String): Set[String] =
    Set(w) ++ w.indices.map(i => w.substring(0, i) + w.substring(i + 1))

  test("pigeonhole: ANY single edit shares a deletion key with its source") {
    val word = for {
      n <- Gen.choose(2, 12)
      cs <- Gen.listOfN(n, Gen.alphaLowerChar)
    } yield cs.mkString
    val edit = for {
      w <- word
      op <- Gen.oneOf("sub", "ins", "del")
      i <- Gen.choose(0, w.length - 1)
      c <- Gen.alphaLowerChar
    } yield (w, op match {
      case "sub" => w.updated(i, if (c == w(i)) ((c - 'a' + 1) % 26 + 'a').toChar else c)
      case "ins" => w.substring(0, i) + c + w.substring(i)
      case "del" => w.substring(0, i) + w.substring(i + 1)
    })
    check(Prop.forAll(edit) { case (w, w2) =>
      w == w2 || delKeys(w).intersect(delKeys(w2)).nonEmpty
    })
  }

  test("split assignment is a pure function of id and lands near 80/10/10") {
    val ids = (0L until 4000L).toDF("doc_id")
    val s1 = ids.select(col("doc_id"),
      graft.text.Mixing.splitAssign("split1", col("doc_id")).as("split"))
    // purity: the same ids through a filtered, re-ordered frame get
    // identical labels
    val s2 = ids.filter(col("doc_id") % 3 === 0).orderBy(col("doc_id").desc)
      .select(col("doc_id"), graft.text.Mixing.splitAssign("split1", col("doc_id")).as("split"))
    assert(s1.join(s2, "doc_id")
      .filter(s1("split") =!= s2("split")).count() == 0)
    val frac = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 4000.0).toMap
    assert(frac("train") > 0.75 && frac("train") < 0.85, frac.toString)
    assert(frac("val") > 0.06 && frac("val") < 0.14, frac.toString)
    assert(frac("test") > 0.06 && frac("test") < 0.14, frac.toString)
  }

  test("stride chunks reproduce the reference arithmetic for any length") {
    // one Spark job over many random lengths, checked against the
    // driver-side reference: chunk i of an n-token doc holds
    // min(W, n - i*S) tokens, i = 0 .. floor((max(n,1)-1)/S)
    val W = 32; val S = 24
    val rng = new scala.util.Random(7)
    val lens = Seq.fill(60)(rng.nextInt(200)) :+ 0 :+ 1 :+ W :+ (W + 1) :+ S
    val df = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("t").mkString(" "))
    }.toDF("doc_id", "text")
    val got = df
      .select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), expr(
        s"""explode(transform(
           |  sequence(cast(0 AS BIGINT), (greatest(size(toks), 1) - 1) div $S),
           |  i -> struct(i AS chunk_idx, size(slice(toks, i*$S + 1, $W)) AS n_toks)))"""
          .stripMargin).as("e"))
      .select(col("doc_id"), col("e.chunk_idx"), col("e.n_toks"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(r => (r.getLong(1), r.getInt(2))).toSeq
      }
    lens.zipWithIndex.foreach { case (n, i) =>
      val expected = (0L to ((math.max(n, 1) - 1) / S).toLong)
        .map(k => (k, math.min(W, n - k * S).toInt max 0))
      assert(got(i.toLong) == expected, s"n=$n: ${got(i.toLong)} vs $expected")
    }
  }
}
