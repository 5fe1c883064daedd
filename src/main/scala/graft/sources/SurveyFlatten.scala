package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested survey-response flattening: one input survey object with
  * `questions[]` and `customQuestions[]` arrays becomes one output row
  * per question, carrying the survey-level fields on every row.
  *
  * reference: SF_Notebooks/Rater8_Surveys.ipynb / Rater8_Reviews.ipynb
  * (flatten_internal_surveys) — reimplemented as a declarative
  * from_json + explode plan (executor-side, scales with the scan)
  * instead of the reference's driver-side pandas loop.
  */
object SurveyFlatten {

  val questionSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("rating", LongType),
    StructField("Comment", StringType)))

  val customQuestionSchema: StructType = StructType(Seq(
    StructField("questionType", StringType),
    StructField("rating", LongType),
    StructField("comment", StringType)))

  val surveySchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("patientMrn", StringType),
    StructField("companyId", StringType),
    StructField("companyName", StringType),
    StructField("ReviewMonth", StringType),
    StructField("ReviewDate", StringType),
    StructField("apptLocationCode", StringType),
    StructField("employeeRating", LongType),
    StructField("Comment", StringType),
    StructField("questions", ArrayType(questionSchema)),
    StructField("customQuestions", ArrayType(customQuestionSchema))))

  /** Parse a column of survey JSON documents and flatten: standard
    * questions and custom questions union into one row-per-question
    * relation with a question_kind discriminator. */
  def flatten(df: DataFrame, jsonCol: String): DataFrame = {
    val parsed = df.withColumn("__s", from_json(col(jsonCol), surveySchema))
    val base = parsed.select(
      col("__s.id").as("SURVEY_ID"),
      col("__s.patientMrn").as("PATIENT_MRN"),
      col("__s.companyName").as("COMPANY_NAME"),
      col("__s.ReviewDate").as("REVIEW_DATE"),
      col("__s.employeeRating").as("EMPLOYEE_RATING"),
      col("__s.questions").as("__qs"),
      col("__s.customQuestions").as("__cqs"))
    val std = base
      .select(col("SURVEY_ID"), col("PATIENT_MRN"), col("COMPANY_NAME"),
        col("REVIEW_DATE"), col("EMPLOYEE_RATING"),
        explode_outer(col("__qs")).as("__q"))
      .select(col("SURVEY_ID"), col("PATIENT_MRN"), col("COMPANY_NAME"),
        col("REVIEW_DATE"), col("EMPLOYEE_RATING"),
        lit("standard").as("QUESTION_KIND"),
        col("__q.id").as("QUESTION_ID"),
        col("__q.name").as("QUESTION_NAME"),
        col("__q.rating").as("RATING"),
        col("__q.Comment").as("COMMENT"))
    val custom = base
      .select(col("SURVEY_ID"), col("PATIENT_MRN"), col("COMPANY_NAME"),
        col("REVIEW_DATE"), col("EMPLOYEE_RATING"),
        posexplode_outer(col("__cqs")).as(Seq("__i", "__q")))
      .select(col("SURVEY_ID"), col("PATIENT_MRN"), col("COMPANY_NAME"),
        col("REVIEW_DATE"), col("EMPLOYEE_RATING"),
        lit("custom").as("QUESTION_KIND"),
        concat(lit("custom_"), col("__i").cast("string")).as("QUESTION_ID"),
        col("__q.questionType").as("QUESTION_NAME"),
        col("__q.rating").as("RATING"),
        col("__q.comment").as("COMMENT"))
    std.filter(col("QUESTION_ID").isNotNull)
      .unionByName(custom.filter(col("QUESTION_NAME").isNotNull))
  }

  /** End-to-end: records from an API response body → flattened rows
    * ready for the (SURVEY_ID, QUESTION_ID) MERGE upsert (W5). */
  def fromResponse(spark: SparkSession, body: String): DataFrame = {
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val records = RestSource.extractRecords(body).map(mapper.writeValueAsString)
    flatten(records.toDF("json"), "json")
  }
}
