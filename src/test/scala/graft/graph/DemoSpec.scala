package graft.graph

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end slice: the reference's demo catalogue built through the API,
  * queried via search-term and genre traversals — expected results from
  * /root/reference/executables/Demo.hs:66-110.
  */
class DemoSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def demoGraph(): GraphSession[DemoV] = {
    val g = GraphSession.inMemory(spark, DemoModel, DemoRoot: DemoV)
    val rollingStones = g.newNode(DArtist("The Rolling Stones"))
    val beatles = g.newNode(DArtist("The Beatles"))
    val metallica = g.newNode(DArtist("Metallica"))
    val nirvana = g.newNode(DArtist("Nirvana"))
    val rock = g.newNode(DGenre("Rock"))
    val grunge = g.newNode(DGenre("Grunge"))
    val metal = g.newNode(DGenre("Metal"))
    Seq(rollingStones, beatles, metallica, nirvana, rock, grunge, metal)
      .foreach(g.addTarget(g.root, _))
    Seq(rollingStones, beatles, metallica, nirvana).foreach(g.addTarget(rock, _))
    g.addTarget(grunge, nirvana)
    g.addTarget(metal, metallica)
    g
  }

  private def names(g: GraphSession[DemoV], ids: Seq[Long]): Set[String] =
    ids.map(g.getValue(_) match {
      case DArtist(n) => n
      case DGenre(n) => n
      case DemoRoot => "<root>"
    }).toSet

  test("""search term "The" finds Rolling Stones and Beatles [Demo.hs:66-71]""") {
    val g = demoGraph()
    val hits = g.getTargets(g.root, IndexKey("Catalogue_Artist_SearchTerm", "The"))
    assert(names(g, hits) === Set("The Rolling Stones", "The Beatles"))
  }

  test("""genre "Rock" has all four artists (2-hop) [Demo.hs:73-79]""") {
    val g = demoGraph()
    val artists = g
      .getTargets(g.root, IndexKey("Catalogue_Genre_Name", "Rock"))
      .flatMap(genre => g.getTargets(genre, IndexKey("Genre_Artist")))
    assert(names(g, artists) ===
      Set("The Rolling Stones", "The Beatles", "Metallica", "Nirvana"))
  }

  test("demo graph stats: 8 nodes") {
    val g = demoGraph()
    val (n, e, i) = g.getStats()
    assert(n === 8L)
    assert(e === 13L) // 7 root edges + 4 rock + grunge + metal
    // index entries: artists from root emit 1 + wordcount each:
    // RS: 1+3, Beatles: 1+2, Metallica: 1+1, Nirvana: 1+1 = 11
    // genres from root: 2 each = 6; genre->artist: 1 each = 6
    assert(i === 23L)
  }
}
