package graft

import graft.api.{Catalog, Server}
import graft.cube.GridRef
import graft.ops.Scan
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

class ServerSpec extends SparkSpec {

  lazy val collectionDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("api-coll").toString
    val rows = for { d <- 1 to 2; b <- Seq("B04", "B08"); y <- 0 to 1; x <- 0 to 1 }
      yield (ts(f"2022-06-0$d 00:00:00"), b, y.toDouble, x.toDouble, d * 100.0 + y + x)
    rows.toDF("time", "band", "y", "x", "value")
      .write.mode("overwrite").parquet(s"$dir/c")
    dir
  }

  lazy val server: Server = {
    val catalog = new Catalog(Map("c1" -> Scan.CollectionSpec(
      s"$collectionDir/c", crs = Some("EPSG:32632"),
      bandOrder = Seq("B04", "B08"), grid = Some(GridRef(0, 0, 1, 1)))))
    new Server(spark, catalog,
      java.nio.file.Files.createTempDirectory("api-res").toString).start()
  }

  def http(method: String, path: String, body: String = ""): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${server.boundPort}$path"))
      .method(method,
        if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
        else HttpRequest.BodyPublishers.ofString(body))
      .build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  test("GET /collections lists registered collections") {
    val (code, body) = http("GET", "/collections")
    code shouldBe 200
    body should include(""""id":"c1"""")
  }

  test("GET /collections/<id> synthesizes cube:dimensions from the store") {
    val (code, body) = http("GET", "/collections/c1")
    code shouldBe 200
    body should include("\"bands\":{\"type\":\"bands\",\"values\":[\"B04\",\"B08\"]}")
    body should include("2022-06-01")
    // reference STAC layout: datacube extension, DATE/X/Y dimension names,
    // axis + reference_system on spatial dims, top-level extent object
    body should include(""""stac_extensions":["datacube"]""")
    body should include(""""DATE":{"type":"temporal"""")
    body should include(""""axis":"x"""")
    body should include(""""reference_system":32632""")
    body should include(""""spatial":{"bbox":[[""")
    // step synthesis: spatial step from the registered grid, temporal
    // step from the daily label cadence as an ISO-8601 duration
    body should include(""""step":"P1D"""")
    body should include(""""axis":"x","extent":[0.0,1.0],"reference_system":32632,"step":1.0""")
    val (code404, _) = http("GET", "/collections/nope")
    code404 shouldBe 404
  }

  test("supplementary metadata merges with the reference's whitelist") {
    val supp = """{
      "title": "Test Cube", "license": "MIT",
      "sci:citation": "Someone et al. 2024",
      "hacker_key": "must not pass through",
      "extent": {"temporal": {"interval": [["2000-01-01", null]]}},
      "summaries": {"gsd": [10], "platform": ["unit-test"],
                    "unlisted": "dropped"},
      "cube:dimensions": {"bands": {"values": ["B04", "B08", "SCL"]}}
    }"""
    val catalog = new Catalog(Map("c2" -> Scan.CollectionSpec(
      s"$collectionDir/c", crs = Some("EPSG:32632"),
      bandOrder = Seq("B04", "B08"), grid = Some(GridRef(0, 0, 1, 1)))),
      supplementary = Map("c2" -> supp))
    val body = catalog.describeJson(spark, "c2").get
    body should include(""""title":"Test Cube"""")
    body should include(""""license":"MIT"""")
    // citation flips the extension list exactly like odc_backend.py
    body should include(""""stac_extensions":["datacube","scientific"]""")
    // temporal override lands inside the synthesized extent object
    body should include(""""interval":[["2000-01-01",null]]""")
    // summaries whitelist: listed keys pass, unlisted are dropped
    body should include(""""gsd":[10]""")
    body should include(""""platform":["unit-test"]""")
    body should not include "unlisted"
    body should not include "hacker_key"
    // bands-values override replaces the synthesized band list
    body should include(""""values":["B04","B08","SCL"]""")
    // synthesized dimensions survive the merge
    body should include(""""axis":"x"""")
  }

  test("per-band nodata/scale/offset synthesize from CollectionSpec.adjust") {
    val catalog = new Catalog(Map("c3" -> Scan.CollectionSpec(
      s"$collectionDir/c", crs = Some("EPSG:32632"),
      bandOrder = Seq("B04", "B08"), grid = Some(GridRef(0, 0, 1, 1)),
      adjust = Map(
        "B04" -> Scan.BandAdjust(nodata = Some(0.0),
          scale = 0.0001, offset = -0.1),
        // B08 deliberately unregistered: defaults synthesize
      ))))
    val body = catalog.describeJson(spark, "c3").get
    // openEO-client shape: summaries.eo:bands, one entry per band in
    // band order, adjusted fields on registered bands, identity
    // defaults (scale 1, offset 0, no nodata) on the rest
    body should include(""""summaries":{"eo:bands":[""")
    body should include(
      """{"name":"B04","scale":1.0E-4,"offset":-0.1,"nodata":0.0}""")
    body should include("""{"name":"B08","scale":1.0,"offset":0.0}""")
    // the whole document must stay parseable JSON
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    // a collection without adjusts emits no summaries block
    val plain = new Catalog(Map("c4" -> Scan.CollectionSpec(
      s"$collectionDir/c", crs = Some("EPSG:32632"),
      bandOrder = Seq("B04", "B08"), grid = Some(GridRef(0, 0, 1, 1)))))
    plain.describeJson(spark, "c4").get should not include "summaries"
  }

  test("POST /graph executes a process graph and caches by md5") {
    val graph = """{
      "load": {"process_id": "load_collection", "arguments": {"id": "c1"}},
      "max": {"process_id": "reduce_dimension", "arguments": {
        "data": {"from_node": "load"}, "dimension": "t",
        "reducer": {"process_graph": {
          "m": {"process_id": "max",
                "arguments": {"data": {"from_parameter": "data"}},
                "result": true}}}}, "result": true}}"""
    val (code, body) = http("POST", "/graph", graph)
    code shouldBe 200
    body should include(""""cached":false""")
    val out = body.split("\"output\":\"")(1).split("\"")(0)
    spark.read.parquet(out).count() shouldBe 8 // 2 bands × 2×2 pixels
    // second POST of the same graph hits the result cache
    val (_, body2) = http("POST", "/graph", graph)
    body2 should include(""""cached":true""")
  }

  test("POST /graph runs run_udf + folded resample_spatial end to end") {
    val graph = """{
      "load": {"process_id": "load_collection", "arguments": {"id": "c1"}},
      "rs": {"process_id": "resample_spatial", "arguments": {
        "data": {"from_node": "load"}, "resolution": 2}},
      "udf": {"process_id": "run_udf", "arguments": {
        "data": {"from_node": "rs"},
        "udf": "function(x, context) { x * 2 + 1 }",
        "runtime": "R"}, "result": true}}"""
    val (code, body) = http("POST", "/graph", graph)
    code shouldBe 200
    val out = body.split("\"output\":\"")(1).split("\"")(0)
    val df = spark.read.parquet(out)
    // 2 m regrid of the 2×2 grid keeps 4 cells per band/time
    df.select("x").distinct().count() shouldBe 2
    df.agg(org.apache.spark.sql.functions.min("value")).head().getDouble(0) should be > 1.0
  }

  test("POST /graph accepts a proj-string crs in filter_bbox") {
    // bbox corners in the cube's own CRS given as a +proj string: the
    // DefRef path round-trips through lon/lat (mm error) and keeps all
    // cells of the tiny grid
    val graph = """{
      "load": {"process_id": "load_collection", "arguments": {"id": "c1"}},
      "bb": {"process_id": "filter_bbox", "arguments": {
        "data": {"from_node": "load"},
        "extent": {"west": -1, "south": -1, "east": 2, "north": 2,
          "crs": "+proj=utm +zone=32 +ellps=WGS84"}},
        "result": true}
    }"""
    val (code, body) = http("POST", "/graph", graph)
    code shouldBe 200
    val out = body.split("\"output\":\"")(1).split("\"")(0)
    spark.read.parquet(out).count() shouldBe 16 // nothing filtered
  }

  test("POST /graph with a typed openEO error returns the spec shape") {
    val graph = """{
      "load": {"process_id": "load_collection", "arguments": {"id": "c1"}},
      "d": {"process_id": "divide", "arguments": {
        "x": {"from_node": "load"}, "y": 0}, "result": true}}"""
    val (code, body) = http("POST", "/graph", graph)
    code shouldBe 400
    body should include(""""code":"DivisionByZero"""")
    body should include(""""message":"Division by zero""")
  }

  test("POST /graph with a bad graph returns a JSON error") {
    val (code, body) = http("POST", "/graph",
      """{"load": {"process_id": "load_collection",
         "arguments": {"id": "unknown_coll"}, "result": true}}""")
    code shouldBe 500
    body should include("unknown collection")
  }

  test("DELETE /stop_job on an unknown job is a 404") {
    val (code, _) = http("DELETE", "/stop_job?id=deadbeef")
    code shouldBe 404
  }
}
