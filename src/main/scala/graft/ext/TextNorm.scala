package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unicode text canonicalization for corpus curation — the cleaning
  * pass that runs BEFORE dedup keys, shingles, or tokenizer vocab are
  * derived: crawled text mixes precomposed and combining accent forms,
  * non-breaking/typographic spaces, and stray C0 control characters,
  * all of which split what should be one dedup key into many.
  *
  * Pipeline (fixed order — the order IS the contract, replicated by the
  * DuckDB oracle step for step):
  *   1. Unicode NFC (native codegen'd expression, plans/NfcNormalizeExpr)
  *   2. strip C0 controls + DEL (keeping \t \n \r, which are whitespace)
  *   3. map typographic space code points (NBSP, en/em quads, narrow
  *      NBSP, math space, ideographic space, ogham mark) to ASCII space
  *   4. collapse ASCII whitespace runs to one space, trim
  *
  * Step 3 before step 4 matters: Java's and RE2's `\s` are both
  * ASCII-only, so unicode spaces must become ASCII first (and the one
  * divergence between them — Java counts VT in `\s`, RE2 does not — is
  * neutralized because step 2 already removed VT).
  *
  * Shape at 100 TB: one shuffle-free projection, all four steps inside
  * whole-stage codegen (the NFC expression generates a direct
  * Normalizer call with a scan-only fast path for already-normal text).
  */
object TextNorm {

  // \x{..} escapes parse identically in Java regex and RE2; public —
  // the classes are part of the cross-engine contract (oracles embed
  // them verbatim)
  val ControlClass =
    "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{007F}]"
  val SpaceClass =
    "[\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]"

  def canonicalText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(graft.plans.NfcNormalizeExpr.nfcNormalize(c),
          ControlClass, ""),
        SpaceClass, " "),
      "\\s+", " "))
}
