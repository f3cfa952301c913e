package graft.functions

/** The ONE ASCII-whitespace byte predicate every byte-scanning text
  * kernel shares (Tokens, TokenCount, TokenSetHits, TokenPairs,
  * HashedTokens, TextShingleHashes, GopherAdmit, LangId...). The set —
  * Java regex `\s`: space, tab, LF, VT, FF, CR — IS the cross-kernel
  * tokenization equivalence contract pinned corpus-wide by
  * TextKernelSpec; it lives here exactly once so an edit to "what is
  * whitespace" can never bring one kernel out of bit-parity with the
  * others. In UTF-8 these six values occur only as standalone bytes
  * (never inside a multi-byte sequence), so byte-level scans using this
  * predicate are exact for any UTF-8 input. */
private[functions] object TextBytes {
  @inline final def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C ||
      b == 0x0D
}
