// scratch micro-benchmark main — not part of the library
package graft.tools

/** Single-thread micro-attribution of the multimodal codec slot: times
  * PNG encode (pixel fill vs ImageIO.write separately), header-only vs
  * full decode, and WAV encode/decode over the generation-formula size
  * distribution, so the sf1 wall can be attributed to named codec phases.
  */
object MicroCodec {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    import graft.multimodal.Multimodal._
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (n=$n)")
    }
    // representative size mix: nChars ~ uniform-ish over the corpus domain
    val sizes = (0 until n).map(i => (i * 37L) % 4096L)
    // warm
    sizes.take(500).foreach { c => val (w, h) = imageDims(c); makePng(w, h, c) }
    var pngs: IndexedSeq[Array[Byte]] = null
    time("png encode (fill+write)") {
      pngs = sizes.map { c => val (w, h) = imageDims(c); makePng(w, h, c) }
    }
    time("png pixel fill only") {
      sizes.foreach { c =>
        val (w, h) = imageDims(c)
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) { var x = 0; while (x < w) { px(y * w + x) = ((x * 31 + y * 17 + c) & 0xffffff).toInt; x += 1 }; y += 1 }
        img.setRGB(0, 0, w, h, px, 0, w)
      }
    }
    time("png full decode") { pngs.foreach(decodePng) }
    val reader = newPngReader()
    time("png header-only decode") { pngs.foreach(b => decodePngHeader(reader, b)) }
    var wavs: IndexedSeq[Array[Byte]] = null
    time("wav encode") {
      wavs = sizes.map { c => val (r, ch, s) = audioParams(c | 1L); makeWav(r, ch, s, c) }
    }
    time("wav decode") { wavs.foreach(decodeWav) }
    def par(label: String)(work: Long => Unit): Unit = time(label) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      val chunks = sizes.grouped(sizes.size / 32 + 1).toSeq
      val tasks = chunks.map { chunk =>
        pool.submit(new Runnable { def run(): Unit = chunk.foreach(work) })
      }
      tasks.foreach(_.get()); pool.shutdown()
    }
    par("par png encode x32") { c => val (w, h) = imageDims(c); val wtr = newPngWriter(); makePngWith(wtr, w, h, c); wtr.dispose() }
    val tl = new ThreadLocal[javax.imageio.ImageReader] { override def initialValue() = newPngReader() }
    val pngSample = pngs.head
    par("par png header decode x32") { _ => decodePngHeader(tl.get(), pngSample); () }
    par("par wav encode x32") { c => val (r, ch, sN) = audioParams(c | 1L); makeWav(r, ch, sN, c); () }
    val wavSample = wavs.head
    par("par wav decode x32") { _ => decodeWav(wavSample); () }
    // 32-thread parallel version of the full encode+decode mix — does the
    // javax stack parallelize, or is there a hidden global lock?
    time("parallel mix x32") {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      val tasks = (0 until 32).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val writer = newPngWriter(); val reader = newPngReader()
            sizes.grouped(sizes.size / 32 + 1).toSeq(t % 32).foreach { c =>
              if (c % 2 == 0) {
                val (w, h) = imageDims(c)
                decodePngHeader(reader, makePngWith(writer, w, h, c))
              } else {
                val (r, ch, sN) = audioParams(c | 1L)
                decodeWav(makeWav(r, ch, sN, c))
              }
            }
            writer.dispose(); reader.dispose()
          }
        })
      }
      tasks.foreach(_.get())
      pool.shutdown()
    }
    val pngBytes = pngs.map(_.length.toLong).sum
    val wavBytes = wavs.map(_.length.toLong).sum
    println(f"png bytes total ${pngBytes / 1e6}%.1f MB; wav bytes total ${wavBytes / 1e6}%.1f MB")
  }
}
