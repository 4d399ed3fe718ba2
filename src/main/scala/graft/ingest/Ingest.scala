package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Relational
import graft.schema.Schemas

/** MovieLens-shaped ingest + cleaning, re-expressing the reference's
  * `create_ratings_df` / implicit-curation pipelines as declarative Spark
  * plans (timestamp dropped at scan via column pruning; dense re-index via a
  * broadcast-joined dimension, not a row-at-a-time merge).
  *
  * Reference: /root/reference/explicit_ratings/functions.py:7-46 (explicit),
  * /root/reference/implicit_feedback/functions.py:263-325 (implicit).
  */
object Ingest {

  def readRatingsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(Schemas.ratings).csv(path)

  def readMoviesCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(Schemas.movies).csv(path)

  /** Canonical "prepared ratings": drop timestamp, rating_10 = rating*2,
    * 0-base ids, dense movieId_order (rank of movieId among distinct ids).
    * The dense index is a small dimension (≤ #distinct movies) broadcast back
    * onto the fact table — no fact-side shuffle.
    * (/root/reference/explicit_ratings/functions.py:7-46.) */
  def prepareRatings(ratings: DataFrame): DataFrame = {
    val zeroBased = ratings
      .drop("timestamp")
      .withColumn("rating_10", (col("rating") * 2).cast("int"))
      .withColumn("userId", col("userId") - 1)
      .withColumn("movieId", col("movieId") - 1)
    val movieIndex = Relational.denseReindex(zeroBased, "movieId", "movieId_order")
      .withColumn("movieId_order", col("movieId_order").cast("int"))
    zeroBased.join(broadcast(movieIndex), Seq("movieId"))
  }

  /** Implicit-feedback curation: keep rating >= 4 as positives, drop users
    * with < minUserRatings remaining, dense userId_order + movieId_order.
    * (/root/reference/implicit_feedback/functions.py:263-325.)
    *
    * The user filter is an aggregate-driven semi-join (P8+J3), not a
    * collected id list — scales to any user count. */
  def prepareImplicit(ratings: DataFrame, minUserRatings: Int = 10): DataFrame = {
    val positives = ratings
      .drop("timestamp")
      .filter(col("rating") >= 4)
      .withColumn("userId", col("userId") - 1)
      .withColumn("movieId", col("movieId") - 1)
    val keepUsers = positives.groupBy(col("userId"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minUserRatings)
      .select(col("userId"))
    // user-cardinality frames are NOT broadcast: at the design point users
    // number 10^7+, and a forced broadcast bypasses the size threshold; the
    // semi/equi joins below shuffle on userId (or AQE picks broadcast when
    // genuinely small)
    val kept = positives.join(keepUsers, Seq("userId"), "left_semi")
    val movieIndex = Relational.denseReindex(kept, "movieId", "movieId_order")
      .withColumn("movieId_order", col("movieId_order").cast("int"))
    val userIndex = Relational.denseReindex(kept, "userId", "userId_order")
      .withColumn("userId_order", col("userId_order").cast("int"))
    kept.join(broadcast(movieIndex), Seq("movieId"))
      .join(userIndex, Seq("userId"))
  }

  /** movies + genre arrays: split the pipe-separated genres, map names to the
    * fixed 20-id vocabulary via a literal map (broadcast dict lookup, J4),
    * genre_count = |genres|. (/root/reference/implicit_feedback/genre_info.py:26-36,
    * /root/reference/explicit_ratings/incl_genre.py:48-56.) */
  def prepareMovies(movies: DataFrame): DataFrame = {
    val genreMap = typedLit(Schemas.genreIds)
    movies
      .withColumn("movieId", col("movieId") - 1)
      .withColumn("genre_names", split(coalesce(col("genres"), lit("(no genres listed)")), "\\|"))
      .withColumn("genre_values",
        transform(col("genre_names"), g => element_at(genreMap, g)))
      .withColumn("genre_count", size(col("genre_values")))
      .drop("genres")
  }

  /** Parse the reference's stringified-Python-list genre column
    * (`genres_v2`, e.g. "['Adventure', 'Children']", read there with
    * pandas `converters={"genres_v2": pd.eval}` —
    * /root/reference/explicit_ratings/functions.py:466,
    * incl_genre.py:17-19): normalize the single quotes to double quotes,
    * then `from_json` as ARRAY<STRING>. The fixed 20-name genre vocabulary
    * contains no quotes or escapes, so the quote swap is lossless; a
    * malformed or NULL cell parses to NULL (from_json semantics), which
    * [[prepareMoviesFromList]] folds to the "(no genres listed)" sentinel —
    * the same treatment [[prepareMovies]] gives a NULL genres cell.
    * Codegen'd — no UDF, no driver-side eval. */
  def parseGenreList(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    from_json(regexp_replace(c, "'", "\""),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))

  /** [[prepareMovies]] for inputs carrying the stringified-list `genres_v2`
    * form instead of pipe-separated `genres` — same output schema
    * (genre_names, genre_values, genre_count), so the two ingest forms are
    * interchangeable downstream. */
  def prepareMoviesFromList(movies: DataFrame, listCol: String = "genres_v2"): DataFrame = {
    val genreMap = typedLit(Schemas.genreIds)
    movies
      .withColumn("movieId", col("movieId") - 1)
      .withColumn("genre_names",
        coalesce(parseGenreList(col(listCol)), array(lit("(no genres listed)"))))
      .withColumn("genre_values",
        transform(col("genre_names"), g => element_at(genreMap, g)))
      .withColumn("genre_count", size(col("genre_values")))
      .drop(listCol)
  }

  /** Dense movie index joined with titles (= derived movie_ids*.csv,
    * /root/reference/implicit_feedback/prac_2_results.py:11-19). */
  def movieIdTable(prepared: DataFrame, movies: DataFrame): DataFrame =
    Relational.denseReindex(prepared, "movieId", "movieId_order")
      .join(movies.select(col("movieId") - 1 as "movieId", col("title")), Seq("movieId"), "left")

  /** Genre inverted index: genreId -> sorted [idCol...] — the reference
    * builds it over the DENSE movieId_order (explicit_ratings/
    * functions.py:455-488), so the default id column is movieId_order; the
    * input frame must carry it (join prepareMovies with denseReindex). */
  def genreInvertedIndex(preparedMovies: DataFrame,
                         idCol: String = "movieId_order"): DataFrame =
    preparedMovies
      .select(col(idCol).as("__mid"), explode(col("genre_values")).as("genreId"))
      .groupBy(col("genreId"))
      .agg(sort_array(collect_list(col("__mid"))).as("movieIds"))
}
