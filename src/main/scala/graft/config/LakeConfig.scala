package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}

/** Pipeline configuration — the engine's "query language" entry point.
  *
  * Mirrors the reference's config contract
  * (`config/data_lake_config.json:1-4` → `lambda_code/lambda_handler.py:21-28`
  * → Glue job args): a file type selecting the source format, a table name
  * under which the cleaned data is registered, and an arbitrary Spark SQL
  * string executed against that view.
  *
  * @param fileType  "csv" or "parquet" — selects source reader AND flips the
  *                  sink format (csv-in → parquet-out and vice versa)
  * @param tableName temp-view name the SQL query addresses
  * @param psQuery   arbitrary Spark SQL — the full dialect is the surface
  */
final case class LakeConfig(fileType: String, tableName: String, psQuery: String)

object LakeConfig {
  private val mapper = new ObjectMapper()

  /** Parse the reference's JSON shape: {"file_type", "table_name", "ps_query"}. */
  def fromJson(json: String): LakeConfig = {
    val node = mapper.readTree(json)
    def req(field: String): String = {
      val n = node.get(field)
      require(n != null, s"config missing required field '$field'")
      n.asText()
    }
    LakeConfig(req("file_type").toLowerCase, req("table_name"), req("ps_query"))
  }

  def fromFile(path: String): LakeConfig =
    fromJson(Files.readString(Paths.get(path)))
}
