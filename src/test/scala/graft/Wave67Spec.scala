package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational48, Tables}
import graft.functions.TextFunctions

/** Wave 67 (q337–q338): featurization infrastructure. Teeth: the
  * scoring decomposition is internally consistent (score = pos −
  * neg mass), one (source, topic) cell is brute-forced, and the
  * collision audit's pigeonhole bounds hold. */
class Wave67Spec extends SparkTestBase {

  test("q337 score equals pos minus neg mass, and one cell brute-forces") {
    import spark.implicits._
    val d = Relational48.q337SparseScoring(spark, sf).cache()
    try {
      assert(d.filter($"score" =!= $"pos_mass" - $"neg_mass").count() === 0)
      val row = d.orderBy($"source", $"topic").head()
      val (src, k) = (row.getAs[String]("source"), row.getAs[Long]("topic").toInt)
      val md = java.security.MessageDigest.getInstance("MD5")
      val score = Tables.documents(spark, sf).filter($"source" === src)
        .select(explode(TextFunctions.tokens($"text")).as("t"))
        .filter($"t" =!= "").as[String].collect()
        .map { t =>
          val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (hex.charAt(k).toInt % 7 - 3).toLong
        }.sum
      assert(row.getAs[Long]("score") === score)
    } finally d.unpersist()
  }

  test("q338 collision bounds are pigeonhole-consistent") {
    import spark.implicits._
    val row = Relational48.q338HashingCollisions(spark, sf).head()
    val vocab = row.getAs[Long]("vocab")
    val used = row.getAs[Long]("buckets_used")
    val collided = row.getAs[Long]("collided_terms")
    assert(used <= math.min(vocab, 4096L))
    // every collided bucket holds >= 2 terms: collided >= 2*(vocab - used
    // singles)... exact identity: collided = vocab - n_single_buckets and
    // used = n_single + n_multi, so collided = vocab - used + n_multi.
    assert(collided >= vocab - used, "pigeonhole floor")
    assert(collided === 0 || collided >= 2)
    val p = row.getAs[Long]("collided_mass_permille")
    assert(p >= 0 && p <= 1000)
    // with vocab >> 4096 the fixture must actually collide
    if (vocab > 8192) assert(collided > 0)
  }
}
