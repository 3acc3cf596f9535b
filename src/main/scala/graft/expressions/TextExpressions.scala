package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics for the quality score. The declarative
  * formulation re-tokenizes the document ~8× (each `size(filter(split(...)))`
  * subtree is its own interpreted HOF chain); this walks the UTF-8 bytes
  * once, tracking chars, punctuation, token boundaries, token lengths, and
  * stopword hits. Byte-wise tokenization on ASCII whitespace is exact for
  * any UTF-8 input (continuation bytes are ≥ 0x80, so multibyte characters
  * can never alias `\s`), matching Java's `\s+` split.
  */
object TextUtil {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Unrounded quality score, arithmetic identical (same left-to-right
    * double operations) to the Column formulation in
    * `TextFunctions.qualityScore`:
    * `min(len/500,1)*0.3 + [punctRatio<=0.2]*0.2 + min(stopRatio*5,1)*0.3 +
    * [2<=meanTokLen<=12]*0.2`.
    */
  def qualityRaw(s: UTF8String, stops: Array[Array[Byte]]): Double = {
    val n = s.numBytes
    var chars = 0
    var punct = 0
    var nTok = 0L
    var sumTokChars = 0L
    var stopHits = 0L
    var tokStart = -1
    var tokChars = 0
    var tokAscii = true

    def isStop(start: Int, endExcl: Int, ascii: Boolean): Boolean = {
      val tokLen = endExcl - start
      if (ascii) {
        var k = 0
        while (k < stops.length) {
          val st = stops(k)
          if (st.length == tokLen) {
            var j = 0
            var ok = true
            while (ok && j < tokLen) {
              var b = s.getByte(start + j)
              if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
              if (b != st(j)) ok = false
              j += 1
            }
            if (ok) return true
          }
          k += 1
        }
        false
      } else {
        // rare non-ASCII token: materialize, lowercase via UTF8String
        val bytes = new Array[Byte](tokLen)
        var j = 0
        while (j < tokLen) { bytes(j) = s.getByte(start + j); j += 1 }
        val low = UTF8String.fromBytes(bytes).toLowerCase
        var k = 0
        while (k < stops.length) {
          if (low.equals(UTF8String.fromBytes(stops(k)))) return true
          k += 1
        }
        false
      }
    }

    def endToken(endExcl: Int): Unit =
      if (tokStart >= 0) {
        nTok += 1
        sumTokChars += tokChars
        if (isStop(tokStart, endExcl, tokAscii)) stopHits += 1
        tokStart = -1
        tokChars = 0
        tokAscii = true
      }

    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val cont = (b & 0xC0) == 0x80
      if (!cont) chars += 1
      if (isWs(b)) endToken(i)
      else {
        if (tokStart < 0) tokStart = i
        if (!cont) tokChars += 1
        if (b < 0) tokAscii = false
        if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?') punct += 1
      }
      i += 1
    }
    endToken(n)

    val lenScore = math.min(chars / 500.0, 1.0)
    val punctRatio = if (chars > 0) punct.toDouble / chars else 0.0
    val punctOk = if (punctRatio <= 0.2) 1.0 else 0.0
    val stopRatio = if (nTok > 0) stopHits.toDouble / nTok else 0.0
    val stopOk = math.min(stopRatio * 5.0, 1.0)
    val mean = if (nTok > 0) sumTokChars.toDouble / nTok else 0.0
    val tokLenOk = if (mean >= 2.0 && mean <= 12.0) 1.0 else 0.0
    lenScore * 0.3 + punctOk * 0.2 + stopOk * 0.3 + tokLenOk * 0.2
  }
}

/** Unrounded composite quality score over a string column — native
  * replacement for the four-signal HOF formulation (one byte pass instead
  * of ~8 tokenizations; the caller wraps `round(_, 6)` so results are
  * bit-identical to the declarative version, which `ExpressionParitySpec`
  * asserts). `stops` is the lowercase stopword list used by the
  * stopword-ratio signal — a `Seq`, NOT an `Array`: case-class equality on
  * an Array field is reference identity, which defeats Catalyst
  * canonicalization (two semantically identical score columns would never
  * compare equal, so common-subexpression elimination never fires).
  */
case class QualityScoreRaw(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  private val stopBytes: Array[Array[Byte]] =
    stops.map(_.getBytes("UTF-8")).toArray

  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score_raw"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextUtil.qualityRaw(input.asInstanceOf[UTF8String], stopBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("qualityStops", stopBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextUtil.qualityRaw($c, $stopsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
