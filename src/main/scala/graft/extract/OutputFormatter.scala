package graft
package extract

/** Port of newspaperlite's OutputFormatter
  * (/root/reference/newspaperlite/outputformatters.py:37-172) — produces
  * the byte-identical `text_art`. Order of passes and the no-op removals
  * are preserved exactly:
  *   1. remove_negativescores_nodes — REAL removal (direct lxml
  *      getparent().remove, line 119)
  *   2. links_to_text — strip 'a'
  *   3. add_newline_to_br — br.text = literal "\n" two-char sequence
  *   4. add_newline_to_li — li.text gets text + literal "\n"; child
  *      removal is the TreeExplorer no-op (children stay, text doubles)
  *   5. replace_with_text — strip b/strong/i/br/sup
  *   6. remove_empty_tags / remove_trailing_media_div — no-ops (default
  *      remove)
  *   7. convert_to_text — per CHILD of top_node: get_text → unescape →
  *      whitespace-join; children joined with single spaces. top_node's
  *      own leading .text is NOT included (list(top_node) = children).
  */
object OutputFormatter {

  def getFormatted(topNode: Dom): String = {
    removeNegativescoresNodes(topNode)
    linksToText(topNode)
    addNewlineToBr(topNode)
    addNewlineToLi(topNode)
    replaceWithText(topNode)
    // remove_empty_tags / remove_trailing_media_div: faithful no-ops
    convertToText(topNode)
  }

  private def removeNegativescoresNodes(topNode: Dom): Unit = {
    val items = Explorer.cssSelect(topNode, "*[gravityScore]")
    for (item <- items) {
      val s = Explorer.getAttribute(item, "gravityScore")
      val score = if (s != null && s.nonEmpty) s.toDouble else 0.0
      if (score < 1) {
        // reference: item.getparent().remove(item) — crashes on the root;
        // unreachable for any selected top node (its score is >= 1)
        if (item.parent != null) Explorer.lxmlRemove(item)
      }
    }
  }

  private def linksToText(topNode: Dom): Unit = Explorer.stripTags(topNode, "a")

  private def addNewlineToBr(topNode: Dom): Unit =
    for (e <- Explorer.getElementsByTagName(topNode, tag = "br"))
      e.text = "\\n"

  private def addNewlineToLi(topNode: Dom): Unit =
    for (e <- Explorer.getElementsByTagName(topNode, tag = "ul")) {
      val lis = Explorer.getElementsByTagName(e, tag = "li")
      for (li <- lis.dropRight(1)) {
        li.text = Explorer.getText(li) + "\\n"
        // children removal is the faithful no-op (explorer.py remove default)
      }
    }

  private def replaceWithText(topNode: Dom): Unit =
    Explorer.stripTags(topNode, "b", "strong", "i", "br", "sup")

  private def convertToText(topNode: Dom): String = {
    val txts = topNode.children.toList.flatMap { node =>
      val txt = Explorer.getText(node)
      if (txt != null && txt.nonEmpty) {
        val un = Dom.unescape(txt)
        Some(un.split("\\s+").filter(_.nonEmpty).mkString(" "))
      } else None
    }
    txts.mkString(" ")
  }
}

/** Port of NavigationContentHunter (/root/reference/extraction_tools/
  * navigationcontenthunter.py:31-101): post-order link-density pruning
  * that flags nav-block candidate ids. In the reference this runs on a
  * DEEP COPY and the subsequent apply-removal is the TreeExplorer no-op,
  * so it has zero effect on extracted text — it is exposed here as the
  * standalone analysis operator (F8) and invoked with its result
  * discarded when fidelity mode is on.
  */
object NavHunter {

  val ImportantTags: Set[String] = Set("div", "table", "tr", "td", "ul",
    "article", "tbody", "section", "nav", "footer", "iframe", "header",
    "body", "html", "head") // utils.py:15-16

  /** Returns the candidate block ids (possibly null entries, like the
    * reference appending get_attribute(...,'id') of id-less nodes).
    */
  def findCandidates(htmlTree: Dom): List[String] = {
    val bodys = Explorer.getElementsByTags(htmlTree, Seq("body"))
    if (bodys.isEmpty) return Nil
    val body = bodys.head
    val blocks = scala.collection.mutable.ListBuffer.empty[String]

    realignDomElements(body)

    def pruning(subtree: Dom): Option[(Double, Double, Double, Double, Double, Double, Double)] = {
      var tagCount = 0.0
      var anchorCount = 0.0
      var tagTextLength = 0.0
      var anchorTextLength = 0.0
      var wordCount = 0.0
      var anchorWordCount = 0.0
      val subtreeWidth = (Explorer.subtreeWidth(subtree) + 1).toDouble
      for (importantE <- subtree.children.toList if ImportantTags.contains(importantE.tag)) {
        pruning(importantE).foreach { tmp =>
          val childWidth = tmp._7
          val influence = childWidth / subtreeWidth
          tagCount += tmp._1 * influence
          anchorCount += tmp._2 * influence
          tagTextLength += tmp._3 * influence
          anchorTextLength += tmp._4 * influence
          wordCount += tmp._5 * influence
          anchorWordCount += tmp._6 * influence
        }
      }
      if (subtreeWidth > 30) return None
      for (insignificantE <- subtree.children.toList if !ImportantTags.contains(insignificantE.tag)) {
        val (textTagTmp, tagCountTmp) =
          Explorer.getTextWithCount(insignificantE, ImportantTags, clean = false)
        val links = Explorer.getLinks(insignificantE, Set("a"))
        val anchorTextBuf = new java.lang.StringBuilder
        var anchorCountTmp = 0
        for (l <- links) {
          val (t, c) = Explorer.getTextWithCount(l, ImportantTags, clean = false)
          anchorTextBuf.append(t); anchorCountTmp += c
        }
        val anchorTextTmp = anchorTextBuf.toString
        tagCount += tagCountTmp
        tagTextLength += textTagTmp.length
        anchorCount += anchorCountTmp
        anchorTextLength += anchorTextTmp.length
        wordCount += Explorer.countTokens(textTagTmp, 2)
        anchorWordCount += Explorer.countTokens(anchorTextTmp, 1)
      }
      var tagCountRatio = 0.0
      var textLengthRatio = 0.0
      if (tagTextLength > 0) textLengthRatio = anchorTextLength / tagTextLength
      if (tagCount > 0) tagCountRatio = anchorCount / tagCount
      var score = 0
      var wordRatio = 0.0
      if (wordCount > 0) wordRatio = anchorWordCount / wordCount
      if (tagCountRatio > 0.6) score += 1
      if (textLengthRatio > 0.6 && wordRatio > 0.8 && wordCount < 20) score += 1
      if (score >= 2) {
        blocks += Explorer.getAttribute(subtree, "id")
        return None
      }
      Some((tagCount, anchorCount, tagTextLength, anchorTextLength,
        wordCount, anchorWordCount, subtreeWidth))
    }

    pruning(body)

    // micro-data candidates
    for (e <- htmlTree.iter if e.attrs.get("itemtype").exists(v =>
        v == "http://schema.org/SiteNavigationElement" || v == "http://schema.org/WPFooter" ||
        v == "http://schema.org/WPSideBar" || v == "http://schema.org/WPHeader")) {
      val id = Explorer.getAttribute(e, "id")
      if (!blocks.contains(id)) blocks += id
    }
    blocks.toList
  }

  /** navigationcontenthunter.py:113-123. */
  private def realignDomElements(body: Dom): Unit = {
    try {
      for (element <- body.iter.toList) {
        val parent = element.parent
        if (parent != null && (parent ne body) && !ImportantTags.contains(parent.tag)) {
          val newParent = Explorer.getNearestParentByTag(element, ImportantTags)
          changeParent(element, newParent)
        }
      }
    } catch { case _: Exception => () }
  }

  /** explorer.py:207-215: insert after the last child of new_parent. */
  private def changeParent(node: Dom, newParent: Dom): Boolean = {
    if (node != null && newParent != null) {
      val oldParent = node.parent
      if (oldParent != null) oldParent.removeChild(node)
      if (newParent.children.nonEmpty) {
        val last = newParent.children.last
        val idx = newParent.index(last)
        newParent.insert(idx + 1, node)
      } else {
        // reference: new_parent[len-1].addnext → IndexError when empty,
        // caught upstream; replicate by aborting the realign pass
        throw new IndexOutOfBoundsException("empty new_parent")
      }
      true
    } else false
  }
}
