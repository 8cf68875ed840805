package graft

import org.apache.spark.sql.functions._
import graft.operators.JsonImport

/** Session-JSON ingest: both entries shapes, uid fallback recovery, and
  * wide key-value extraction.
  */
class JsonImportSpec extends SparkSpec {

  private val listShape =
    """{"scriptid":"adm","scriptVersion":"3","appVersion":"v12","facility":"F1",
       "started_at":"2026-01-01T08:00:00","completed_at":"2026-01-01T08:30:00",
       "uid":null,
       "entries":[{"key":"NeoTreeID","values":[{"value":"ab-12","label":"ID"}]},
                  {"key":"Temp","values":[{"value":"36.6","label":"Temperature"}]}]}"""
      .replaceAll("\n\\s*", "")

  private val dictShape =
    """{"scriptid":"dis","scriptVersion":"4","appVersion":"v13","facility":"F2",
       "started_at":"2026-01-02T09:00:00","completed_at":"2026-01-02T09:45:00",
       "entries":{"UID":{"values":{"value":["cd-34"]}},
                  "Temp":{"values":{"value":["37.1"]}}}}"""
      .replaceAll("\n\\s*", "")

  private val topLevelUid =
    """{"scriptid":"adm","uid":"ef-56","facility":"F3","entries":[]}"""

  private def raw = {
    import spark.implicits._
    Seq(listShape, dictShape, topLevelUid).toDF("json")
  }

  test("uid recovery: top-level wins, else entries fallbacks, uppercased") {
    val parsed = JsonImport.parseSessions(raw, "json")
    val uids = parsed.select("scriptid", "uid").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(uids == Set(("adm", "AB-12"), ("dis", "CD-34"), ("adm", "EF-56")))
  }

  test("routing by script id filters the right sessions") {
    val parsed = JsonImport.parseSessions(raw, "json")
    assert(JsonImport.routeByScript(parsed, "adm").count() == 2)
    assert(JsonImport.routeByScript(parsed, "dis").count() == 1)
  }

  test("timestamps and metadata parse") {
    val row = JsonImport.parseSessions(raw, "json")
      .filter(col("scriptid") === "dis")
      .select("facility", "script_version", "started_at", "completed_at").head
    assert(row.getString(0) == "F2" && row.getString(1) == "4")
    assert(row.getTimestamp(2).toString.startsWith("2026-01-02 09:00"))
    assert(row.getTimestamp(3).toString.startsWith("2026-01-02 09:45"))
  }

  test("extractKeyValues widens both entry shapes into value/label columns") {
    val parsed = JsonImport.parseSessions(raw, "json")
    val wide = JsonImport.extractKeyValues(parsed, Seq("Temp"))
    val byScript = wide.collect().map(r =>
      r.getString(1) -> (r.getString(2), r.getString(3))).toMap
    assert(byScript("adm") == (("36.6", "Temperature")) ||
      byScript.get("adm").exists(_._1 == null)) // the empty-entries adm row
    val nonNull = wide.filter(col("Temp_value").isNotNull).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(nonNull == Set(("adm", "36.6", "Temperature"), ("dis", "37.1", null)))
  }
}
