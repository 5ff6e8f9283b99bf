package graft.chunk

import graft.util.Determinism

/** Fixed-size, overlapping text splitter with approximate (word-boundary)
  * ends — the engine's analog of the [lib] FixedSizeSplitter(chunk_size,
  * chunk_overlap, approximate=True) configured at
  * ref:pipelines/kg_ingest.yaml:41-46 (600/120) with CLI defaults 600/100
  * (ref:src/fancyrag/kg/pipeline.py:319-320).
  *
  * Semantics (documented, deterministic):
  *   - chunk 0 starts at offset 0; each chunk tentatively spans `size` chars;
  *   - if `approximate` and the tentative end cuts a word, the end is pulled
  *     back to the last whitespace inside the window (if any strictly after
  *     the start), so chunks end on word boundaries where possible;
  *   - the next chunk starts `overlap` chars before the previous chunk's end;
  *   - offsets (start, end) are emitted so downstream stages can map any
  *     source position to its covering chunk without re-tokenizing.
  *
  * Invariants (property-tested):
  *   - coverage: chunk 0 starts at 0, the last chunk ends at text.length,
  *     and consecutive chunks overlap (next.start < prev.end when overlap>0,
  *     next.start >= prev.start + 1);
  *   - reconstruction: dropping the first (prev.end - next.start) chars of
  *     each chunk after the first and concatenating reproduces the text.
  */
object Chunker {

  final case class RawChunk(index: Int, start: Int, end: Int, text: String)

  def split(text: String, size: Int, overlap: Int, approximate: Boolean = true): Seq[RawChunk] = {
    require(size > 0 && overlap >= 0 && overlap < size)
    if (text.isEmpty) return Seq.empty
    val out = Seq.newBuilder[RawChunk]
    var s = 0
    var idx = 0
    var done = false
    while (!done) {
      var e = math.min(s + size, text.length)
      if (approximate && e < text.length && !text.charAt(e).isWhitespace) {
        var w = e - 1
        while (w > s && !text.charAt(w).isWhitespace) w -= 1
        if (w > s) e = w + 1 // keep the trailing whitespace inside this chunk
      }
      out += RawChunk(idx, s, e, text.substring(s, e))
      if (e >= text.length) done = true
      else {
        s = math.max(e - overlap, s + 1)
        idx += 1
      }
    }
    out.result()
  }

  /** Deterministic chunk uid (FIXTURES.md §4):
    * sha256(conv_id ':' index ':' sha256(chunk_text)). Replaces the
    * reference's uuid4 uids (ref:src/fancyrag/splitters/caching_fixed_size.py:32)
    * so reruns and resume dedupe naturally (SURVEY.md §7.5 hard part 2).
    */
  def chunkUid(convId: String, index: Int, chunkText: String): String =
    Determinism.sha256(s"$convId:$index:${Determinism.sha256(chunkText)}")
}
