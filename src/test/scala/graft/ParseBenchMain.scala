package graft
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
object ParseBenchMain {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("/tmp/graft_bench_pages_150")
    val pages = Files.list(dir).iterator().asScala.toVector
      .sortBy(_.toString).map(p => Files.readString(p))
    println(s"pages: ${pages.length}, totalMB: ${pages.map(_.length).sum / 1e6}")
    var i = 0
    while (i < 3) { // warmup + JIT
      pages.foreach(h => graft.ingest.SuumoPages.extractPage(h, 0.0, "f"))
      i += 1
    }
    val t0 = System.nanoTime()
    var rows = 0
    pages.foreach { h =>
      rows += graft.ingest.SuumoPages.extractPage(h, 0.0, "f").length
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"rows: $rows, total: $dt%.3f s, per-page: ${dt * 1000 / pages.length}%.2f ms")
  }
}
