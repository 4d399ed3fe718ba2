package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for the MovieLens-shaped inputs (FIXTURES.md §A).
  * Declared a priori — no `inferSchema` at scale (SURVEY.md §1.2): schema
  * inference on a 100-TB CSV lake means an extra full pass over the data.
  *
  * Reference read sites: ratings /root/reference/explicit_ratings/functions.py:20,
  * movies /root/reference/implicit_feedback/genre_info.py:26-27.
  */
object Schemas {

  /** ratings_{25m,small}.csv */
  val ratings: StructType = StructType(Seq(
    StructField("userId", IntegerType, nullable = false),
    StructField("movieId", IntegerType, nullable = false),
    StructField("rating", DoubleType, nullable = false),
    StructField("timestamp", LongType, nullable = true)))

  /** movies_{25m,small}.csv — genres pipe-separated. */
  val movies: StructType = StructType(Seq(
    StructField("movieId", IntegerType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("genres", StringType, nullable = true)))

  /** Canonical prepared-ratings schema (post-ingest, FIXTURES.md §A2). */
  val ratingsPrepared: StructType = StructType(Seq(
    StructField("userId", IntegerType, nullable = false),
    StructField("movieId", IntegerType, nullable = false),
    StructField("rating", DoubleType, nullable = false),
    StructField("rating_10", IntegerType, nullable = false),
    StructField("movieId_order", IntegerType, nullable = false)))

  /** Factor table schema (ALSModel.userFactors/itemFactors-compatible). */
  val factors: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Bias table. */
  val bias: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("bias", DoubleType, nullable = false)))

  /** A/B experiment log (FIXTURES.md §A7,
    * /root/reference/explicit_ratings/ab_test.py:205-232). */
  val abLog: StructType = StructType(Seq(
    StructField("user_id", IntegerType, nullable = false),
    StructField("genre_1_name", StringType, nullable = false),
    StructField("genre_2_name", StringType, nullable = false),
    StructField("movie_id", IntegerType, nullable = false),
    StructField("movie_title", StringType, nullable = true),
    StructField("score", DoubleType, nullable = false),
    StructField("group", StringType, nullable = false)))

  /** The fixed 20-entry genre vocabulary
    * (/root/reference/explicit_ratings/incl_genre.py:25-46). */
  val genreIds: Map[String, Int] = Map(
    "Horror" -> 0, "War" -> 1, "Crime" -> 2, "IMAX" -> 3,
    "Western" -> 4, "Children" -> 5, "Adventure" -> 6, "(no genres listed)" -> 7,
    "Drama" -> 8, "Romance" -> 9, "Thriller" -> 10, "Film-Noir" -> 11,
    "Animation" -> 12, "Comedy" -> 13, "Sci-Fi" -> 14, "Fantasy" -> 15,
    "Action" -> 16, "Musical" -> 17, "Mystery" -> 18, "Documentary" -> 19)
}
