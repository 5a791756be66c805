package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal payload plumbing: header codec stub, entropy, resize,
  * frame sampling — pure-function determinism checks.
  */
class MultimodalSpec extends AnyFunSuite {

  test("fake image encode/decode round-trips the header") {
    val img = Multimodal.encodeFakeImage(16, 9, seed = 42L)
    val m = Multimodal.decodeMeta(img)
    assert(m.format === "image")
    assert(m.width === 16 && m.height === 9)
    assert(m.nBytes === 12 + 16 * 9)
    assert(m.nFrames === 1)
  }

  test("decode is total: garbage bytes -> unknown, null-safe") {
    assert(Multimodal.decodeMeta(Array[Byte](1, 2, 3)).format === "unknown")
    assert(Multimodal.decodeMeta(null).nBytes === 0L)
    assert(Multimodal.decodeMeta("XXXXaaaabbbbcc".getBytes).format === "unknown")
  }

  test("real PNG bytes probe via javax.imageio: format/width/height") {
    val png = Multimodal.encodeRealPng(37, 23, seed = 99L)
    // genuine PNG signature, not the synthetic layout
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
    val m = Multimodal.decodeMeta(png)
    assert(m.format === "png")
    assert(m.width === 37 && m.height === 23)
    assert(m.nFrames === 1 && m.nBytes === png.length.toLong)
    // determinism: same (w, h, seed) -> same bytes -> same meta
    assert(java.util.Arrays.equals(png, Multimodal.encodeRealPng(37, 23, 99L)))
  }

  test("corrupt real-image header -> unknown, not a crash") {
    val png = Multimodal.encodeRealPng(8, 8, seed = 1L)
    val cut = png.take(8) ++ Array.fill[Byte](8)(0x7f) // signature, no IHDR
    assert(Multimodal.decodeMeta(cut).format === "unknown")
  }

  test("real WAV RIFF header parse: rate/channels/frames/duration") {
    val wav = Multimodal.encodeWav(16000, 2, 1234, seed = 5L)
    assert(wav.take(4).toSeq === "RIFF".getBytes("US-ASCII").toSeq)
    val m = Multimodal.decodeMeta(wav)
    assert(m.format === "wav")
    assert(m.sampleRate === 16000 && m.channels === 2)
    assert(m.nFrames === 1234)
    assert(m.durationMs === 1234L * 1000 / 16000)
    assert(m.nBytes === wav.length.toLong)
    // determinism + mono variant
    assert(java.util.Arrays.equals(wav, Multimodal.encodeWav(16000, 2, 1234, 5L)))
    val mono = Multimodal.decodeMeta(Multimodal.encodeWav(8000, 1, 80, 1L))
    assert(mono.channels === 1 && mono.durationMs === 10L)
    // truncated RIFF (no fmt/data chunks) -> unknown, not a crash
    assert(Multimodal.decodeMeta(wav.take(12)).format === "unknown")
  }

  test("real MP4 moov/mvhd/tkhd parse: duration + track dims") {
    val mp4 = Multimodal.encodeTinyMp4(640, 360, durationUnits = 2500,
      timescale = 1000)
    assert(new String(mp4.slice(4, 8), "US-ASCII") === "ftyp")
    val m = Multimodal.decodeMeta(mp4)
    assert(m.format === "mp4")
    assert(m.width === 640 && m.height === 360)
    assert(m.durationMs === 2500L)
    // non-millisecond timescale converts
    val m2 = Multimodal.decodeMeta(
      Multimodal.encodeTinyMp4(320, 240, durationUnits = 90000, timescale = 30000))
    assert(m2.durationMs === 3000L)
    // an ftyp with no moov -> unknown, not a crash
    assert(Multimodal.decodeMeta(mp4.take(24)).format === "unknown")
  }

  test("entropy is deterministic and bounded [0,8]") {
    val img = Multimodal.encodeFakeImage(32, 32, seed = 7L)
    val e1 = Multimodal.byteEntropy(img)
    assert(e1 === Multimodal.byteEntropy(img))
    assert(e1 > 0.0 && e1 <= 8.0)
    assert(Multimodal.byteEntropy(Array.fill[Byte](100)(5)) === 0.0)
  }

  test("resize stub halves dimensions and keeps the format") {
    val img = Multimodal.encodeFakeImage(16, 10, seed = 1L)
    val half = Multimodal.resizeStub(img, 2)
    val m = Multimodal.decodeMeta(half)
    assert(m.width === 8 && m.height === 5)
    assert(half.length === 12 + 8 * 5)
    // non-image payloads pass through untouched
    val junk = Array[Byte](9, 9, 9)
    assert(Multimodal.resizeStub(junk, 2) eq junk)
  }

  test("video frame sampling picks every k-th frame") {
    val body = Array.tabulate[Byte](4 * 10)(i => (i / 4).toByte) // 10 frames of 2x2
    val vid = Multimodal.VideoMagic ++
      Array[Byte](0, 0, 0, 2, 0, 0, 0, 2) ++ body
    val m = Multimodal.decodeMeta(vid)
    assert(m.format === "video" && m.nFrames === 10)
    assert(Multimodal.sampleFrames(vid, 3).toSeq === Seq[Byte](0, 3, 6, 9))
  }
}
