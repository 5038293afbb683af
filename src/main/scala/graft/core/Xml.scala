package graft.core

/** Minimal XML reader shared by the KML, GML and GPX drivers: elements
  * with attributes (captured — GPX carries lat/lon as attributes), text
  * content, self-closing tags, comments, prologs; namespace prefixes
  * strip to the local name; entities: the five XML predefined ones.
  * Extracted verbatim from the KML driver so all format parsers share
  * one tolerance contract. */
private[core] object Xml {

  final case class Node(name: String, children: Vector[Node], text: String,
      attrs: Map[String, String] = Map.empty)

  final class Reader(s: String, label: String) {
    private var i = 0
    def pos: Int = i
    def eof: Boolean = i >= s.length

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$label parse error at $i: $msg")

    private def ws(): Unit =
      while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1

    def wsAndComments(): Unit = {
      var go = true
      while (go) {
        ws()
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          if (e < 0) fail("unterminated comment")
          i = e + 3
        } else go = false
      }
    }

    def prolog(): Unit = {
      wsAndComments()
      while (s.startsWith("<?", i)) {
        val e = s.indexOf("?>", i + 2)
        if (e < 0) fail("unterminated <? ?>")
        i = e + 2
        wsAndComments()
      }
    }

    private def name(): String = {
      val start = i
      while (i < s.length && { val c = s.charAt(i)
        Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == ':' || c == '.' }) i += 1
      if (i == start) fail("expected an element name")
      val n = s.substring(start, i)
      val colon = n.lastIndexOf(':')
      if (colon >= 0) n.substring(colon + 1) else n
    }

    // returns (attrs, selfClosing); attribute names strip their namespace
    // prefix like element names, values unescape the predefined entities
    private def readAttrs(): (Map[String, String], Boolean) = {
      var done = false
      var selfClosing = false
      var attrs = Map.empty[String, String]
      while (!done) {
        ws()
        if (i >= s.length) fail("unterminated tag")
        s.charAt(i) match {
          case '>' => i += 1; done = true
          case '/' =>
            if (!s.startsWith("/>", i)) fail("stray '/' in tag")
            i += 2; done = true; selfClosing = true
          case _ =>
            val an = name(); ws()
            if (i < s.length && s.charAt(i) == '=') {
              i += 1; ws()
              if (i >= s.length || (s.charAt(i) != '"' && s.charAt(i) != '\'')) fail("expected quoted attribute")
              val q = s.charAt(i); i += 1
              val e = s.indexOf(q, i)
              if (e < 0) fail("unterminated attribute value")
              attrs += (an -> unescape(s.substring(i, e)))
              i = e + 1
            }
        }
      }
      (attrs, selfClosing)
    }

    private def unescape(t: String): String =
      if (t.indexOf('&') < 0) t
      else t.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
        .replace("&apos;", "'").replace("&amp;", "&")

    def element(): Node = {
      wsAndComments()
      if (i >= s.length || s.charAt(i) != '<') fail("expected '<'")
      elementAtTag()
    }

    private def elementAtTag(): Node = {
      // cursor is AT '<'
      i += 1
      val n = name()
      val (attrs, selfClosing) = readAttrs()
      if (selfClosing) return Node(n, Vector.empty, "", attrs)
      val kids = Vector.newBuilder[Node]
      val text = new StringBuilder
      var closed = false
      while (!closed) {
        if (i >= s.length) fail(s"unterminated <$n>")
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          if (e < 0) fail("unterminated comment")
          i = e + 3
        } else if (s.startsWith("<![CDATA[", i)) {
          // CDATA section: raw text, no entity unescaping (reference KML/GML
          // readers tolerate CDATA-wrapped coordinates/descriptions)
          val e = s.indexOf("]]>", i + 9)
          if (e < 0) fail("unterminated CDATA section")
          text.append(s.substring(i + 9, e))
          i = e + 3
        } else if (s.startsWith("</", i)) {
          i += 2
          val en = name()
          if (en != n) fail(s"mismatched </$en> closing <$n>")
          ws()
          if (i >= s.length || s.charAt(i) != '>') fail("malformed close tag")
          i += 1
          closed = true
        } else if (s.charAt(i) == '<') {
          kids += elementAtTag()
        } else {
          val start = i
          while (i < s.length && s.charAt(i) != '<') i += 1
          text.append(unescape(s.substring(start, i)))
        }
      }
      Node(n, kids.result(), text.toString, attrs)
    }
  }
}
