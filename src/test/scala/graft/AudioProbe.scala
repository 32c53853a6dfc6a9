package graft

/** Dev probe: single-threaded per-payload cost breakdown of the audio
  * decode path — synth only, + getAudioFileFormat, + getAudioInputStream,
  * + full sample scan — to attribute the per-clip milliseconds before
  * optimizing. Usage: Test/runMain graft.AudioProbe [nPayloads]
  */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val payloads = (0 until n).map(i =>
      graft.plans.WavSynth.compute(i.toLong, (i % 400) + 100, 8000)).toArray
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  " +
        f"(${(System.nanoTime() - t0) / 1e3 / n}%.1f us/clip)")
    }
    time("synth only (pre-built)") { payloads.foreach(p => assert(p.length > 44)) }
    time("getAudioFileFormat") {
      payloads.foreach { p =>
        javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(p))
      }
    }
    time("getAudioInputStream") {
      payloads.foreach { p =>
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(p)).close()
      }
    }
    time("full stream read") {
      payloads.foreach { p =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(p))
        val buf = new Array[Byte](8192)
        while (ais.read(buf) > 0) {}
        ais.close()
      }
    }
    // the per-partition-cached provider path (what a reused-reader fix buys)
    val readers = {
      val it = java.util.ServiceLoader.load(
        classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) b += it.next()
      b.result()
    }
    println(s"providers: ${readers.map(_.getClass.getSimpleName).mkString(", ")}")
    time("cached-provider format+read") {
      payloads.foreach { p =>
        val r = readers.iterator.flatMap { rd =>
          try Some(rd.getAudioInputStream(new java.io.ByteArrayInputStream(p)))
          catch { case _: Exception => None }
        }.take(1).toSeq.headOption.orNull
        if (r != null) {
          val buf = new Array[Byte](8192)
          while (r.read(buf) > 0) {}
          r.close()
        }
      }
    }
  }
}
