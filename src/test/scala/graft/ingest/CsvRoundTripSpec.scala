package graft.ingest

import graft.SparkTestBase
import graft.schema.Schemas
import java.nio.file.Files

/** S1/S3: CSV source + sink fidelity with explicit schemas (the reference's
  * read/write surface — pd.read_csv / to_csv — without schema inference). */
class CsvRoundTripSpec extends SparkTestBase {
  import spark.implicits._

  test("ratings CSV round-trips through the declared schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val ratings = Seq((1, 1, 4.5, 100L), (2, 7, 0.5, 200L))
      .toDF("userId", "movieId", "rating", "timestamp")
    ratings.write.option("header", "true").mode("overwrite").csv(s"$dir/ratings")
    val back = Ingest.readRatingsCsv(spark, s"$dir/ratings")
    // CSV sources report every column nullable; compare names + types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Schemas.ratings.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.as[(Int, Int, Double, Long)].collect().toSet ==
      Set((1, 1, 4.5, 100L), (2, 7, 0.5, 200L)))
  }

  test("movies CSV with quoted titles (commas) survives the round trip") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val movies = Seq((1, "Movie, The (1995)", "Horror|Crime"), (2, "Plain", "Drama"))
      .toDF("movieId", "title", "genres")
    movies.write.option("header", "true").mode("overwrite").csv(s"$dir/movies")
    val back = Ingest.readMoviesCsv(spark, s"$dir/movies")
    assert(back.as[(Int, String, String)].collect().toSet ==
      Set((1, "Movie, The (1995)", "Horror|Crime"), (2, "Plain", "Drama")))
  }
}
