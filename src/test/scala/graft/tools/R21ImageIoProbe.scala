package graft.tools

import java.awt.image.BufferedImage

/** Scratch: is ImageIO encode/decode throughput hurt by concurrency (a
  * registry/global lock), and does a per-thread reader/writer instance fix
  * it? No Spark — pure JVM measurement.
  */
object R21ImageIoProbe {
  private def img(id: Int): BufferedImage = {
    val b = new BufferedImage(10, 8, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) { var x = 0; while (x < 10) {
      b.setRGB(x, y, (id * 31 + y * 11 + x * 7) & 0xffffff); x += 1 }; y += 1 }
    b
  }
  private def encStatic(b: BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    javax.imageio.ImageIO.write(b, "jpg", out); out.close(); baos.toByteArray
  }
  private def decStatic(bytes: Array[Byte]): BufferedImage = {
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    javax.imageio.ImageIO.read(in)
  }
  private def encInst(w: javax.imageio.ImageWriter, b: BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    w.setOutput(out)
    w.write(null, new javax.imageio.IIOImage(b, null, null), null)
    out.close(); baos.toByteArray
  }
  private def decInst(r: javax.imageio.ImageReader, bytes: Array[Byte]): BufferedImage = {
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    r.setInput(in)
    val o = r.read(0)
    in.close(); o
  }

  def main(args: Array[String]): Unit = {
    val n = 6000
    def run(label: String, threads: Int)(work: Int => Unit): Unit = {
      val t0 = System.nanoTime()
      if (threads == 1) (0 until n).foreach(work)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        val per = n / threads
        val fs = (0 until threads).map(t => pool.submit(new Runnable {
          def run(): Unit = (t * per until (t + 1) * per).foreach(work)
        }))
        fs.foreach(_.get()); pool.shutdown()
      }
      println(f"[imgprobe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      run("static enc+dec, 1 thread", 1) { i =>
        decStatic(encStatic(img(i))) }
      run("static enc+dec, 32 threads", 32) { i =>
        decStatic(encStatic(img(i))) }
      val tl = new ThreadLocal[(javax.imageio.ImageWriter, javax.imageio.ImageReader)] {
        override def initialValue() = (
          javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next(),
          javax.imageio.ImageIO.getImageReadersByFormatName("jpg").next())
      }
      run("instance enc+dec, 1 thread", 1) { i =>
        val (w, r) = tl.get(); decInst(r, encInst(w, img(i))) }
      run("instance enc+dec, 32 threads", 32) { i =>
        val (w, r) = tl.get(); decInst(r, encInst(w, img(i))) }
    }
  }
}
