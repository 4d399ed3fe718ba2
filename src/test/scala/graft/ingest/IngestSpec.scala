package graft.ingest

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IngestSpec extends SparkTestBase {
  import spark.implicits._

  // MovieLens-shaped fixture (FIXTURES.md A1): sparse movie ids, one user
  // with few >=4 ratings, one single-rater movie
  private val ratings = Seq(
    (1, 1, 5.0, 100L), (1, 2, 4.0, 101L), (1, 5, 3.0, 102L), (1, 9, 4.5, 103L),
    (1, 17, 4.0, 104L), (1, 33, 4.0, 105L), (1, 40, 4.0, 106L), (1, 41, 4.5, 107L),
    (1, 42, 5.0, 108L), (1, 43, 4.0, 109L), (1, 44, 4.0, 110L),
    (2, 1, 2.0, 200L), (2, 5, 1.5, 201L), (2, 9, 4.0, 202L),
    (3, 99, 5.0, 300L))
    .toDF("userId", "movieId", "rating", "timestamp")

  test("prepareRatings: timestamp dropped, rating_10, 0-based ids, dense order") {
    val out = Ingest.prepareRatings(ratings)
    assert(!out.columns.contains("timestamp"))
    val r = out.filter(col("userId") === 0 && col("movieId") === 0).head()
    assert(r.getAs[Int]("rating_10") == 10)
    // dense order is rank of 0-based movieId among distinct
    val orders = out.select("movieId", "movieId_order").distinct()
      .as[(Int, Int)].collect().toMap
    val distinctSorted = orders.keys.toSeq.sorted
    distinctSorted.zipWithIndex.foreach { case (mid, idx) =>
      assert(orders(mid) == idx, s"movieId $mid")
    }
    assert(out.count() == ratings.count())
  }

  test("prepareImplicit keeps only rating>=4 and users with enough positives") {
    val out = Ingest.prepareImplicit(ratings, minUserRatings = 10)
    // user 1 (0-based 0) has 10 ratings >= 4; user 2 has 1; user 3 has 1
    assert(out.select("userId").distinct().as[Int].collect().toSeq == Seq(0))
    assert(out.count() == 10)
    assert(out.agg(min("rating")).as[Double].head() >= 4.0)
    // dense user index exists
    assert(out.select("userId_order").distinct().as[Int].collect().toSeq == Seq(0))
  }

  test("prepareMovies splits genres and maps to the fixed vocabulary") {
    val movies = Seq((1, "Toy Story (1995)", "Adventure|Animation|Children"),
      (2, "Some Doc", "Documentary"), (3, "Nothing", null.asInstanceOf[String]))
      .toDF("movieId", "title", "genres")
    val out = Ingest.prepareMovies(movies)
    val r = out.filter(col("movieId") === 0).head()
    assert(r.getAs[scala.collection.Seq[String]]("genre_names").toSeq ==
      Seq("Adventure", "Animation", "Children"))
    assert(r.getAs[scala.collection.Seq[Int]]("genre_values").toSeq == Seq(6, 12, 5))
    assert(r.getAs[Int]("genre_count") == 3)
    val noGenre = out.filter(col("movieId") === 2).head()
    assert(noGenre.getAs[scala.collection.Seq[Int]]("genre_values").toSeq == Seq(7))
  }

  test("prepareMoviesFromList parses stringified genre lists to the same values") {
    // the reference's genres_v2 form: a stringified Python list per cell
    val listForm = Seq(
      (1, "Toy Story (1995)", "['Adventure', 'Animation', 'Children']"),
      (2, "Some Doc", "['Documentary']"),
      (3, "Nothing", "['(no genres listed)']"))
      .toDF("movieId", "title", "genres_v2")
    val pipeForm = Seq((1, "Toy Story (1995)", "Adventure|Animation|Children"),
      (2, "Some Doc", "Documentary"), (3, "Nothing", null.asInstanceOf[String]))
      .toDF("movieId", "title", "genres")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("movieId", "genre_names", "genre_values", "genre_count")
      .as[(Int, Seq[String], Seq[Int], Int)].collect().sortBy(_._1).toSeq
    assert(rows(Ingest.prepareMoviesFromList(listForm)) ==
      rows(Ingest.prepareMovies(pipeForm)))
    // malformed cell -> the "(no genres listed)" sentinel, like a NULL
    // genres cell in the pipe form
    val bad = Seq((4, "Broken", "not a list")).toDF("movieId", "title", "genres_v2")
    assert(Ingest.prepareMoviesFromList(bad).select("genre_values")
      .as[Seq[Int]].head() == Seq(7))
  }

  test("movieIdTable joins dense index with titles") {
    val prepared = Ingest.prepareRatings(ratings)
    val movies = Seq((1, "A", "Horror"), (5, "B", "Drama"), (99, "C", "Crime"))
      .toDF("movieId", "title", "genres")
    val t = Ingest.movieIdTable(prepared, movies)
      .as[(Int, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(t(0) == (0L, "A"))   // raw movieId 1 -> 0-based 0, densest order 0
    assert(t(4) == (2L, "B"))   // raw 5 -> 0-based 4, third distinct id
    assert(t(98) == (11L, "C")) // raw 99 -> 0-based 98, last of 12 distinct ids
  }

  test("genreInvertedIndex builds genre -> sorted movie list") {
    val movies = Seq((1, "A", "Horror|Crime"), (2, "B", "Horror"))
      .toDF("movieId", "title", "genres")
    val pm = Ingest.prepareMovies(movies)
      .join(graft.ops.Relational.denseReindex(
        Ingest.prepareMovies(movies), "movieId", "movieId_order"), Seq("movieId"))
    val idx = Ingest.genreInvertedIndex(pm)
      .as[(Int, Seq[Long])].collect().toMap
    assert(idx(0) == Seq(0, 1)) // Horror=0
    assert(idx(2) == Seq(0))    // Crime=2
  }
}
