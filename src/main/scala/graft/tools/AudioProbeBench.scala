package graft.tools

/** r19 scratch: does the pinned WAV reader resolve, and what does the
  * per-record decode cost with vs without the AudioSystem provider
  * sweep? No Spark — pure JVM microbench over synthesized WAV bytes. */
object AudioProbeBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](480)), fmt, 240),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    def viaSystem(): Unit = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      ais.readAllBytes(); ais.close()
    }
    def viaPinned(): Unit = {
      val ais = graft.multimodal.Multimodal.openAudio(wav)
      ais.readAllBytes(); ais.close()
    }
    // warmup both
    (1 to 2000).foreach(_ => viaSystem())
    (1 to 2000).foreach(_ => viaPinned())
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f())
      (System.nanoTime() - t0) / 1e9
    }
    val ts = time(() => viaSystem())
    val tp = time(() => viaPinned())
    println(f"n=$n audiosystem=${ts}%.3f s pinned=${tp}%.3f s speedup=${ts / tp}%.2fx per_record_us system=${ts / n * 1e6}%.1f pinned=${tp / n * 1e6}%.1f")
  }
}
