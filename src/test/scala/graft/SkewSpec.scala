package graft

import graft.ops.Skew

/** Salted join produces exactly the plain join's rows. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join equals plain inner join (incl. a hot key)") {
    val fact = ((1 to 500).map(i => (1L, s"hot_$i")) ++
      (1 to 50).map(i => (i.toLong % 7 + 2, s"cold_$i")))
      .toDF("k", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "three"), (9L, "unused"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "name")
      .collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 8)
      .select("k", "payload", "name").collect().toSet
    assert(plain == salted)
    assert(plain.size == 500 + fact.filter($"k".isin(2L, 3L)).count())
  }

  test("salted left join preserves unmatched fact rows once") {
    val fact = Seq((1L, "a"), (99L, "b")).toDF("k", "payload")
    val dim = Seq((1L, "one")).toDF("k", "name")
    val out = Skew.saltedJoin(fact, dim, "k", buckets = 4, joinType = "left")
    assert(out.count() == 2)
    assert(out.filter($"name".isNull).count() == 1)
  }
}
