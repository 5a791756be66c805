package graft
package extract

import scala.collection.mutable

/** Minimal mutable HTML DOM with lxml-compatible semantics for the node
  * operations the extraction pipeline performs (SURVEY.md §2.7):
  * text/tail model, itertext ordering, drop_tag / strip_tags merging,
  * real removal (element + its tail leave the tree together).
  *
  * Reference semantics: lxml.html as driven by
  * /root/reference/extraction_tools/explorer.py. The parser handles the
  * well-formed page shapes the corpus/fixtures contain (explicit
  * html/head/body, matched tags, void elements, quoted attributes,
  * comments, raw-text script/style) — NOT a recovering browser parser;
  * malformed input fails loudly rather than diverging silently.
  */
final class Dom(var tag: String) {
  var text: String = _ // lxml .text (before first child)
  var tail: String = _ // lxml .tail (after this element's close tag)
  var parent: Dom = _
  val attrs: mutable.LinkedHashMap[String, String] = mutable.LinkedHashMap.empty
  val children: mutable.ArrayBuffer[Dom] = mutable.ArrayBuffer.empty

  def attr(name: String): Option[String] = attrs.get(name)

  def append(c: Dom): Unit = { c.parent = this; children += c }

  def insert(idx: Int, c: Dom): Unit = { c.parent = this; children.insert(idx, c) }

  def index(c: Dom): Int = children.indexWhere(_ eq c)

  /** lxml parent.remove(child): child and its tail leave the tree. */
  def removeChild(c: Dom): Unit = {
    val i = index(c)
    if (i >= 0) { children.remove(i); c.parent = null }
  }

  def getprevious: Dom =
    if (parent == null) null
    else { val i = parent.index(this); if (i > 0) parent.children(i - 1) else null }

  def getnext: Dom =
    if (parent == null) null
    else {
      val i = parent.index(this)
      if (i >= 0 && i < parent.children.length - 1) parent.children(i + 1) else null
    }

  /** preceding siblings, nearest first (lxml itersiblings(preceding=True)). */
  def precedingSiblings: List[Dom] = {
    val out = mutable.ListBuffer.empty[Dom]
    var p = getprevious
    while (p != null) { out += p; p = p.getprevious }
    out.toList
  }

  /** document-order iteration including self (lxml .iter()).
    *
    * Explicit-stack iterator: the extraction pipeline walks each tree
    * ~10× (language/meta scans, link harvest, gravity, cleanup) and the
    * chained per-node `Iterator ++ flatMap` version allocated O(nodes)
    * iterator states per walk — at crawl scale that garbage was a
    * measurable share of the parse path's DRAM-bandwidth bill.
    */
  def iter: Iterator[Dom] = new Dom.TreeIter(this)

  def descendants: Iterator[Dom] = { val it = iter; it.next(); it }

  /** lxml .itertext(): text, then per child (child.itertext, child.tail).
    * Same explicit-stack shape as [[iter]]; the root's own tail is never
    * emitted, matching lxml.
    */
  def itertext: Iterator[String] = new Dom.TextIter(this)

  /** lxml drop_tag(): remove this element, splicing text/children/tail
    * into the parent at this position.
    */
  def dropTag(): Unit = {
    val p = parent
    if (p == null) return
    val idx = p.index(this)
    // merge .text
    if (text != null && text.nonEmpty) {
      val prev = if (idx > 0) p.children(idx - 1) else null
      if (prev != null) prev.tail = (if (prev.tail == null) "" else prev.tail) + text
      else p.text = (if (p.text == null) "" else p.text) + text
    }
    // merge .tail
    if (tail != null && tail.nonEmpty) {
      if (children.nonEmpty) {
        val last = children.last
        last.tail = (if (last.tail == null) "" else last.tail) + tail
      } else {
        val prev = if (idx > 0) p.children(idx - 1) else null
        if (prev != null) prev.tail = (if (prev.tail == null) "" else prev.tail) + tail
        else p.text = (if (p.text == null) "" else p.text) + tail
      }
    }
    // splice children
    p.children.remove(idx)
    var k = idx
    for (c <- children) { c.parent = p; p.children.insert(k, c); k += 1 }
    children.clear()
    parent = null
  }

  def deepCopy: Dom = {
    val n = new Dom(tag)
    n.text = text; n.tail = tail
    attrs.foreach { case (k, v) => n.attrs(k) = v }
    children.foreach { c => val cc = c.deepCopy; cc.parent = n; n.children += cc }
    n
  }
}

object Dom {

  /** Document-order (pre-order) walk over one array-backed stack. */
  private final class TreeIter(root: Dom) extends Iterator[Dom] {
    private[this] var stack = new Array[Dom](32)
    private[this] var top = 1
    stack(0) = root

    def hasNext: Boolean = top > 0

    def next(): Dom = {
      top -= 1
      val node = stack(top)
      val cs = node.children
      val m = cs.length
      if (m > 0) {
        if (top + m > stack.length) grow(top + m)
        var k = m - 1
        while (k >= 0) { stack(top) = cs(k); top += 1; k -= 1 }
      }
      node
    }

    private def grow(min: Int): Unit = {
      val ns = new Array[Dom](math.max(stack.length * 2, min))
      System.arraycopy(stack, 0, ns, 0, top)
      stack = ns
    }
  }

  /** Iterative itertext: stack holds Dom nodes to expand and String
    * tails to emit; child/tail pairs are pushed in reverse so pops
    * replay lxml's text → (child subtree, child tail)* order.
    */
  private final class TextIter(root: Dom) extends Iterator[String] {
    private[this] var stack = new Array[AnyRef](32)
    private[this] var top = 1
    stack(0) = root
    private[this] var pending: String = _
    advance()

    def hasNext: Boolean = pending != null

    def next(): String = { val r = pending; advance(); r }

    private def advance(): Unit = {
      pending = null
      while (pending == null && top > 0) {
        top -= 1
        stack(top) match {
          case s: String => pending = s
          case d: Dom =>
            val cs = d.children
            var k = cs.length - 1
            if (top + 2 * (k + 1) > stack.length) grow(top + 2 * (k + 1))
            while (k >= 0) {
              val c = cs(k)
              if (c.tail != null && c.tail.nonEmpty) { stack(top) = c.tail; top += 1 }
              stack(top) = c; top += 1
              k -= 1
            }
            if (d.text != null && d.text.nonEmpty) pending = d.text
        }
      }
    }

    private def grow(min: Int): Unit = {
      val ns = new Array[AnyRef](math.max(stack.length * 2, min))
      System.arraycopy(stack, 0, ns, 0, top)
      stack = ns
    }
  }

  val VoidTags: Set[String] = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")
  val RawTextTags: Set[String] = Set("script", "style", "textarea", "noscript")

  /** etree.strip_tags(node, tags*): drop_tag every strict descendant with
    * a matching tag (document order, restart after each mutation).
    */
  def stripTags(node: Dom, tags: String*): Unit = {
    val ts = tags.toSet
    var found = true
    while (found) {
      node.descendants.find(d => ts.contains(d.tag)) match {
        case Some(d) => d.dropTag()
        case None => found = false
      }
    }
  }

  // ---------------- entities ----------------

  private val named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ", "raquo" -> "»",
    "laquo" -> "«", "mdash" -> "—", "ndash" -> "–",
    "rsquo" -> "’", "lsquo" -> "‘", "eacute" -> "é",
    "egrave" -> "è", "agrave" -> "à", "ograve" -> "ò",
    "ugrave" -> "ù", "igrave" -> "ì", "copy" -> "©")

  /** html.unescape subset (named above + numeric). Unknown entities are
    * left as-is — matching html.unescape for out-of-table names.
    */
  def unescape(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val rep =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16))))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(body.substring(1).toInt)))
              catch { case _: Exception => None }
            else named.get(body)
          rep match {
            case Some(r) => sb.append(r); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ---------------- parser ----------------

  case class ParseError(msg: String) extends RuntimeException(msg)

  /** Parse an HTML document (comments removed, entities decoded — matching
    * lxml.html.HTMLParser(remove_comments=True) for well-formed input).
    */
  def parse(html: String): Dom = {
    val p = new Parser(html)
    p.document()
  }

  private final class Parser(s: String) {
    private var i = 0
    private val n = s.length

    def document(): Dom = {
      skipMisc()
      val root = element()
      if (root.tag != "html") throw ParseError(s"expected <html>, got <${root.tag}>")
      root
    }

    private def skipMisc(): Unit = {
      var progress = true
      while (progress) {
        progress = false
        while (i < n && Character.isWhitespace(s.charAt(i))) { i += 1; progress = true }
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i); i = if (e < 0) n else e + 3; progress = true
        } else if (s.startsWith("<!", i) || s.startsWith("<?", i)) {
          val e = s.indexOf(">", i); i = if (e < 0) n else e + 1; progress = true
        }
      }
    }

    /** parse one element starting at '<'. */
    private def element(): Dom = {
      if (i >= n || s.charAt(i) != '<') throw ParseError(s"expected '<' at $i")
      i += 1
      val tag = name().toLowerCase
      val node = new Dom(tag)
      attrsInto(node)
      skipWs()
      val selfClose = i < n && s.charAt(i) == '/'
      if (selfClose) i += 1
      expect('>')
      if (selfClose || VoidTags.contains(tag)) return node
      if (RawTextTags.contains(tag)) {
        // case-insensitive scan for "</tag" without lowercasing (and
        // re-allocating) the remaining document per raw-text element
        val close = s"</$tag"
        var e = -1
        var j = i
        val limit = n - close.length
        while (e < 0 && j <= limit) {
          if (s.charAt(j) == '<' &&
            s.regionMatches(true, j, close, 0, close.length)) e = j
          else j += 1
        }
        val end = if (e < 0) n else e
        node.text = s.substring(i, end)
        i = end
        if (e >= 0) { i += close.length; skipWs(); expect('>') }
        return node
      }
      content(node)
      node
    }

    /** children + text until matching close tag. */
    private def content(node: Dom): Unit = {
      val textBuf = new StringBuilder
      var lastChild: Dom = null
      def flushText(): Unit = {
        if (textBuf.nonEmpty) {
          val t = unescape(textBuf.toString)
          if (lastChild == null)
            node.text = (if (node.text == null) "" else node.text) + t
          else
            lastChild.tail = (if (lastChild.tail == null) "" else lastChild.tail) + t
          textBuf.clear()
        }
      }
      while (i < n) {
        val c = s.charAt(i)
        if (c == '<') {
          if (s.startsWith("<!--", i)) {
            val e = s.indexOf("-->", i); i = if (e < 0) n else e + 3
          } else if (s.startsWith("</", i)) {
            flushText()
            i += 2
            val closeName = name().toLowerCase
            skipWs(); expect('>')
            if (closeName != node.tag)
              throw ParseError(s"mismatched </$closeName> inside <${node.tag}>")
            return
          } else if (i + 1 < n && (Character.isLetter(s.charAt(i + 1)))) {
            flushText()
            val child = element()
            node.append(child)
            lastChild = child
          } else { textBuf.append(c); i += 1 }
        } else { textBuf.append(c); i += 1 }
      }
      flushText() // EOF closes remaining (html root without </html>)
    }

    private def name(): String = {
      val start = i
      while (i < n && (s.charAt(i).isLetterOrDigit || "-_:".indexOf(s.charAt(i)) >= 0)) i += 1
      if (i == start) throw ParseError(s"expected name at $start")
      s.substring(start, i)
    }

    private def attrsInto(node: Dom): Unit = {
      var more = true
      while (more) {
        skipWs()
        if (i < n && (s.charAt(i).isLetter || s.charAt(i) == '_')) {
          val an = name().toLowerCase
          skipWs()
          var av = ""
          if (i < n && s.charAt(i) == '=') {
            i += 1; skipWs()
            if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
              val q = s.charAt(i); i += 1
              val e = s.indexOf(q, i)
              if (e < 0) throw ParseError(s"unterminated attr at $i")
              av = unescape(s.substring(i, e)); i = e + 1
            } else {
              val start = i
              while (i < n && !Character.isWhitespace(s.charAt(i)) &&
                s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
              av = unescape(s.substring(start, i))
            }
          }
          if (!node.attrs.contains(an)) node.attrs(an) = av
        } else more = false
      }
    }

    private def skipWs(): Unit = { while (i < n && Character.isWhitespace(s.charAt(i))) i += 1 }

    private def expect(c: Char): Unit = {
      if (i >= n || s.charAt(i) != c) throw ParseError(s"expected '$c' at $i")
      i += 1
    }
  }
}
