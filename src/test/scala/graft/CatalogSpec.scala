package graft

import java.nio.file.Files

import graft.sources.Catalog

/** S2: pattern-based dataset discovery (reference bucket listing +
  * str_subset selection, /root/reference/scripts/etl/fetch-data.R:45-56). */
class CatalogSpec extends SparkSpec {

  test("discoverTables selects datasets by name regex, sorted, full paths") {
    val root = Files.createTempDirectory("cat").toString
    for (n <- Seq("sleeplogs", "sleeplogdetails", "dailydata", "intradaycombined"))
      Files.createDirectory(java.nio.file.Paths.get(root, n))
    // anchored regex picks exactly one ("sleeplogs$" must not match details)
    assert(Catalog.discoverTables(spark, root, "sleeplogs$").map(p => new java.io.File(p).getName)
      == Seq("sleeplogs"))
    // substring regex picks both sleep tables, name-sorted
    assert(Catalog.discoverTables(spark, root, "sleeplog").map(p => new java.io.File(p).getName)
      == Seq("sleeplogdetails", "sleeplogs"))
    assert(Catalog.discoverTables(spark, root, "nomatch").isEmpty)
  }

  test("discoverByName strips .parquet and opens real testdata tables") {
    val found = Catalog.discoverByName(spark, "/root/testdata/sf0.001", "^(nation|region)\\.parquet$")
    assert(found.map(_._1) == Seq("nation", "region"))
    val n = found.map { case (_, p) => Catalog.open(spark, p).count() }.sum
    assert(n > 0)
  }
}
