package graft
package extract

import java.util.regex.Pattern
import scala.collection.mutable

/** Port of the reference's lxml query/text helpers
  * (/root/reference/extraction_tools/explorer.py) over [[Dom]].
  *
  * CRITICAL quirk preserved: `TreeExplorer.remove(node)` with the default
  * `remove_tail=False` is a NO-OP in the reference (the clear+remove sits
  * inside `if parent is not None and remove_tail:` —
  * explorer.py:218-234). Every "removal" pass that relies on the default
  * therefore never mutates the tree; [[remove]] replicates that exactly.
  */
object Explorer {

  /** explorer.py:218-234. remove_tail=false → no-op (faithful). */
  def remove(node: Dom, removeTail: Boolean = false): Unit = {
    val parent = node.parent
    if (parent != null && removeTail) {
      if (node.tail != null && node.tail.nonEmpty) {
        val prev = node.getprevious
        if (prev == null) {
          if (parent.text == null) parent.text = ""
          parent.text += " " + node.tail
        } else {
          if (prev.tail == null) prev.tail = ""
          prev.tail += " " + node.tail
        }
      }
      // node.clear()
      node.text = null; node.tail = null
      node.attrs.clear(); node.children.foreach(_.parent = null)
      node.children.clear()
      parent.removeChild(node)
    }
  }

  /** lxml parent.remove(child) — the REAL removal used directly by the
    * formatter (outputformatters.py:119).
    */
  def lxmlRemove(node: Dom): Unit =
    if (node.parent != null) node.parent.removeChild(node)

  /** explorer.py:241-248: " "+chunk per itertext entry, then cleaned. */
  def getText(node: Dom, clean: Boolean = true): String = {
    val sb = new StringBuilder
    node.itertext.foreach { t => sb.append(' ').append(t) }
    if (clean) cleanText(sb.toString) else sb.toString
  }

  /** Java-regex `\s`: the six ASCII whitespace chars. */
  private[extract] def isRegexSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Single-pass `split("\\s+").filter(_.nonEmpty).mkString(" ")`:
    * called per candidate node in gravity scoring — the regex-split
    * token array was hot-path garbage at crawl scale.
    */
  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isRegexSpace(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Count of maximal non-`\s` runs of length ≥ minLen — equivalent to
    * `s.split("\\s+").count(w => w.length >= minLen)` for minLen ≥ 1,
    * without the token array (per-node gravity/formatter hot path).
    */
  private[extract] def countTokens(s: String, minLen: Int): Int = {
    var i = 0; var c = 0; var run = 0
    while (i < s.length) {
      if (isRegexSpace(s.charAt(i))) { if (run >= minLen) c += 1; run = 0 }
      else run += 1
      i += 1
    }
    if (run >= minLen) c += 1
    c
  }

  /** explorer.py:415-418. */
  def cleanText(value: String): String =
    if (value == null) "" else collapseWs(value)

  /** explorer.py:251-257. */
  def getTextWithoutChild(node: Dom, clean: Boolean = true): String = {
    val t = if (node == null) null else node.text
    if (clean) cleanText(t) else t
  }

  /** explorer.py:168-172: descendant:: (self excluded). */
  def getElementsByTags(node: Dom, tags: Seq[String]): List[Dom] = {
    val ts = tags.toSet
    val all = ts.contains("*")
    node.descendants.filter(d => all || ts.contains(d.tag)).toList
  }

  /** explorer.py:105-126 get_elements_by_tag_name:
    * 'descendant-or-self::tag' with optional attr filters; self is dropped
    * from the result when a tag (or childs) was given.
    */
  def getElementsByTagName(node: Dom, tag: String = null, attr: String = null,
                           value: String = null, childs: Boolean = false,
                           useRegex: Boolean = false): List[Dom] = {
    val pat = if (useRegex && attr != null && value != null)
      Pattern.compile(value, Pattern.CASE_INSENSITIVE) else null
    def matches(d: Dom): Boolean = {
      if (tag != null && d.tag != tag) return false
      if (attr != null && value != null) {
        val av = d.attrs.getOrElse(attr, null)
        if (av == null) return false
        if (useRegex) pat.matcher(av).find()
        else av.toLowerCase.contains(value.toLowerCase)
      } else if (attr != null) {
        val av = d.attrs.getOrElse(attr, null)
        av != null && av.nonEmpty // xpath [translate(@attr,...)] truthiness
      } else true
    }
    var elems = node.iter.filter(matches).toList
    if (elems.exists(_ eq node) && (tag != null || childs))
      elems = elems.filterNot(_ eq node)
    elems
  }

  /** css 'tag[attr=val]' / 'tag[attr*=sub]' / '*[attr]' selects, comma
    * lists (the subset the reference uses via css_select) — exact,
    * case-sensitive attribute VALUE match like cssselect→xpath.
    * Matches descendant-or-self like element.cssselect.
    */
  // selectors are a fixed vocabulary (the reference's css_select call
  // sites); compiling them per call put Pattern.compile on the per-page
  // hot path — cache predicate arrays by selector string
  private val selectorCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Dom => Boolean]]()
  private val cssPattern = Pattern.compile(
    "^([a-zA-Z0-9*]+)?(?:\\[([^\\]=*]+)(\\*?=)?(?:[\"']?([^\\]\"']*)[\"']?)?\\])?$")

  def cssSelect(node: Dom, selector: String): List[Dom] = {
    val preds = selectorCache.computeIfAbsent(selector, compileSelector)
    node.iter.filter(d => preds.exists(p => p(d))).toList
  }

  private val compileSelector =
    new java.util.function.Function[String, Array[Dom => Boolean]] {
      def apply(selector: String): Array[Dom => Boolean] = compileSelector0(selector)
    }

  private def compileSelector0(selector: String): Array[Dom => Boolean] = {
    val alts = selector.split(",").map(_.trim).filter(_.nonEmpty)
    alts.map { sel =>
      val m = cssPattern.matcher(sel)
      if (!m.matches()) throw new IllegalArgumentException(s"css subset: $sel")
      val tag = Option(m.group(1)).filter(_ != "*").map(_.toLowerCase)
      val attr = Option(m.group(2))
      val op = Option(m.group(3))
      val value = Option(m.group(4))
      (d: Dom) => {
        tag.forall(_ == d.tag) && (attr match {
          case None => true
          case Some(a) =>
            d.attrs.get(a) match {
              case None => false
              case Some(av) => op match {
                case None => true
                case Some("=") => av == value.getOrElse("")
                case Some("*=") => av.contains(value.getOrElse(""))
                case _ => false
              }
            }
        })
      }
    }
  }

  /** explorer.py:369-374 (unescapes the attribute value again). */
  def getAttribute(node: Dom, attr: String): String = {
    val v = node.attrs.getOrElse(attr, null)
    if (v != null) Dom.unescape(v) else null
  }

  def setAttribute(node: Dom, attr: String, value: String): Unit =
    if (attr != null && value != null) node.attrs(attr) = value

  /** explorer.py:31-36. */
  def dropTag(node: Dom): Unit = node.dropTag()

  /** explorer.py:94-95. */
  def stripTags(node: Dom, tags: String*): Unit = Dom.stripTags(node, tags: _*)

  /** explorer.py:389-395. */
  def getNodeDepth(node: Dom): Int = {
    var result = 0
    var p = node.parent
    while (p != null) { result += 1; p = p.parent }
    result
  }

  /** explorer.py:398-404: child count (tagstoevaluate unused by callers
    * that matter — NavHunter passes nothing → len(list(node))).
    */
  def subtreeWidth(node: Dom): Int = node.children.length

  /** explorer.py:270-288. */
  def getTextWithCount(node: Dom, tagsToIgnore: Set[String],
                       clean: Boolean): (String, Int) = {
    val result = new java.lang.StringBuilder
    var count = 0
    if (tagsToIgnore != null) {
      node.iter.foreach { elem =>
        if (!tagsToIgnore.contains(elem.tag) && elem.text != null) {
          var text = elem.text
          if (clean) text = collapseWs(text)
          if (text.length > 1) { result.append(' ').append(text); count += 1 }
        }
      }
    } else {
      node.itertext.foreach { t0 =>
        val t = collapseWs(t0)
        if (t.length > 1) { result.append(' ').append(t); count += 1 }
      }
    }
    (result.toString, count)
  }

  /** explorer.py:290-308 (tags branch over node.iter). */
  def getLinks(node: Dom, tags: Set[String]): List[Dom] =
    node.iter.filter(d => tags.contains(d.tag)).toList

  /** explorer.py:191-204. */
  def getNearestParentByTag(element: Dom, tags: Set[String]): Dom = {
    var parent = element.parent
    while (parent != null) {
      if (tags.contains(parent.tag)) return parent
      parent = parent.parent
    }
    null
  }
}

/** Port of texthelper.py StopWords (stopword files loaded byte-faithfully:
  * the it file's UTF-8 BOM stays glued to its first word, exactly as
  * codecs.open('utf-8') leaves it — texthelper.py:53-57).
  */
final class StopWords(language: String) {
  val stopWords: Set[String] = StopWords.load(language)

  /** string.punctuation strip (texthelper.py:59-68). */
  def removePunctuation(content: String): String = {
    val sb = new StringBuilder(content.length)
    content.foreach { c => if (!StopWords.Punct.contains(c)) sb.append(c) }
    sb.toString
  }

  /** texthelper.py:73-89: split(' ') on the lowered stripped input;
    * returns (wordCount incl. empties, stopwordCount).
    */
  def stopwordCount(content: String): (Int, Int) = {
    if (content == null || content.isEmpty) return (0, 0)
    val stripped = removePunctuation(content).toLowerCase
    // split(" ", -1) semantics without the token array: tokens are the
    // substrings between single-space delimiters, empties included
    var c = 0; var stops = 0
    var start = 0; var i = 0
    val n = stripped.length
    while (i <= n) {
      if (i == n || stripped.charAt(i) == ' ') {
        c += 1
        if (stopWords.contains(stripped.substring(start, i))) stops += 1
        start = i + 1
      }
      i += 1
    }
    (c, stops)
  }
}

object StopWords {
  val Punct: Set[Char] = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".toSet

  // Both maps are consulted once PER PAGE on the parse hot path.
  // Class.getResource takes the JVM-global URLClassPath monitor and scans
  // the (hundreds-of-jars) classpath — uncached it serialized 24/32
  // executor threads (measured via jstack during a 140 s wave stall).
  private val availCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  def available(language: String): Boolean =
    availCache.computeIfAbsent(language, lang =>
      getClass.getResource(s"/graft/stopwords/stopwords-$lang.txt") != null)

  def load(language: String): Set[String] =
    cache.computeIfAbsent(language, { lang =>
      val in = getClass.getResourceAsStream(s"/graft/stopwords/stopwords-$lang.txt")
      if (in == null) throw new java.io.FileNotFoundException(s"stopwords-$lang")
      val content = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      in.close()
      // Python splitlines: interior empty lines kept, no trailing ''
      val lines = content.split("\r\n|\n|\r", -1)
      val trimmed = if (lines.nonEmpty && lines.last.isEmpty) lines.dropRight(1) else lines
      trimmed.toSet
    })
}
